"""Smoke test for the full SSL cycle orchestration (scripts/ssl_cycle.py):
cold cross-val -> prepare -> pseudo_labelling -> main_ssl -> warm-started
cross-val, all through the real CLI entry points (reference main_SSL.py
workflow). Tiny scale; asserts each stage produced its artifact and the
summary line carries both MAEs."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ssl_cycle_smoke(tmp_path):
    # hang protection is the subprocess.run(timeout=850) below
    # (pytest-timeout is not installed, so a marker would be inert)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        STRATANET2_NO_TENSORBOARD="1",
    )
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "ssl_cycle.py"),
            "--root", str(tmp_path / "cycle"),
            "--mode", "DEV",
            "--n_plots", "10", "--n_parcels", "1", "--points", "1200",
            "--subsample_size", "512", "--batch_size", "4", "--folds", "2",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=850,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    stages = {}
    for line in out.stdout.splitlines():
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and "stage" in rec:
            stages[rec["stage"]] = rec

    for name in (
        "data", "cold_crossval", "cold_result", "prepare", "pseudo_label",
        "ssl_pretrain", "warm_crossval", "summary",
    ):
        assert name in stages, f"missing stage {name}: {sorted(stages)}"
    s = stages["summary"]
    assert 0.0 < s["cold_val_MAE"] < 1.0
    assert 0.0 < s["warm_val_MAE"] < 1.0

    root = tmp_path / "cycle"
    # pseudo-label pickles exist for the cold model
    model_id = stages["cold_result"]["model_id"]
    pl_dir = root / "parcelles_dataset_20m" / "pseudo_labelling" / model_id
    assert any(p.suffix == ".pkl" for p in pl_dir.iterdir())
    # the SSL pretraining checkpoint (fold -1 -> "full") exists
    pret = root / "experiments" / "pretraining" / "DEV"
    ckpts = list(pret.glob("*/PCC_model_*full*.pt")) + list(
        pret.glob("*/PCC_model_*.pt")
    )
    assert ckpts, f"no pretrained checkpoint under {pret}"
