"""Utility-layer tests: worklists, checkpoints, metric sink, config, resume."""

import json
import os

import numpy as np
import pytest


class TestWorklist:
    def test_diff_and_sharding(self, tmp_path):
        from stratanet2_tpu.utils.worklist import get_unprocessed_files

        inp, out = tmp_path / "in", tmp_path / "out"
        inp.mkdir(), out.mkdir()
        for i in range(10):
            (inp / f"parcel_{i}.las").touch()
        (out / "parcel_3.tif").touch()
        (out / "parcel_7.pkl").touch()
        todo = get_unprocessed_files(str(inp), str(out))
        stems = {os.path.basename(p).split(".")[0] for p in todo}
        assert stems == {f"parcel_{i}" for i in range(10)} - {"parcel_3", "parcel_7"}
        # host sharding partitions the worklist
        shards = [
            set(get_unprocessed_files(str(inp), str(out), host_id=h, n_hosts=3))
            for h in range(3)
        ]
        assert set().union(*shards) == set(todo)
        assert sum(len(s) for s in shards) == len(todo)

    def test_missing_output_folder(self, tmp_path):
        from stratanet2_tpu.utils.worklist import get_unprocessed_files

        inp = tmp_path / "in"
        inp.mkdir()
        (inp / "a.las").touch()
        assert len(get_unprocessed_files(str(inp), str(tmp_path / "nope"))) == 1


class TestConcurrentWorkers:
    def test_two_workers_cover_worklist(self, tmp_path):
        """Two concurrent workers draining the same worklist produce all
        outputs; duplicated work is idempotent (the reference's implicit
        multi-process pattern, prepare.py:48-59)."""
        import threading
        import time as _time

        from stratanet2_tpu.utils.worklist import get_unprocessed_files, stem

        inp, out = tmp_path / "in", tmp_path / "out"
        inp.mkdir(), out.mkdir()
        for i in range(12):
            (inp / f"p{i}.las").touch()

        def worker(wid):
            while True:
                todo = get_unprocessed_files(str(inp), str(out), shuffle_seed=wid)
                if not todo:
                    return
                f = todo[0]
                _time.sleep(0.001)
                # idempotent output write (atomic rename)
                tmp = out / f".{stem(f)}.{wid}.tmp"
                tmp.write_text(str(wid))
                tmp.rename(out / (stem(f) + ".pkl"))

        threads = [threading.Thread(target=worker, args=(w,)) for w in (1, 2)]
        [t.start() for t in threads]
        [t.join(timeout=30) for t in threads]
        done = {p.name for p in out.iterdir()}
        assert done == {f"p{i}.pkl" for i in range(12)}


class TestCheckpoint:
    def test_roundtrip_and_discovery(self, tmp_path):
        import jax.numpy as jnp

        from stratanet2_tpu.utils import checkpoint as C

        params = {"w": jnp.ones((3, 3)), "nested": {"b": jnp.zeros(2)}}
        state = {"mean": jnp.full((4,), 0.5)}
        run = tmp_path / "experiments" / "learning" / "PROD" / "2026-01-01_00h00m00s"
        run.mkdir(parents=True)
        p = str(run / C.checkpoint_name(2))
        assert p.endswith("PCC_model_fold_n=2.pt")
        C.save_checkpoint(p, params, state, metadata={"epoch": 7})
        payload = C.load_checkpoint(p)
        np.testing.assert_array_equal(payload["params"]["w"], np.ones((3, 3)))
        assert payload["metadata"]["epoch"] == 7
        found = C.find_checkpoint_by_experiment(
            str(tmp_path / "experiments"), "2026-01-01_00h00m00s"
        )
        assert found == p
        # 'full' checkpoints take precedence (utils/utils.py:145-153)
        pf = str(run / C.checkpoint_name(-1))
        assert pf.endswith("PCC_model_full.pt")
        C.save_checkpoint(pf, params, state)
        assert C.find_checkpoint_by_experiment(
            str(tmp_path / "experiments"), "2026-01-01_00h00m00s"
        ) == pf

    def test_fold1_preference_not_fooled_by_fold_10(self, tmp_path):
        """'fold_n=1' must match exactly — not fold_n=10..19 — regardless
        of directory enumeration order (>=10-fold CV)."""
        import jax.numpy as jnp

        from stratanet2_tpu.utils import checkpoint as C

        run = tmp_path / "exp" / "learning" / "PROD" / "2026-02-02_00h00m00s"
        run.mkdir(parents=True)
        params, state = {"w": jnp.ones(2)}, {}
        # write fold 12 and 10 BEFORE fold 1 so os.walk's file order
        # cannot accidentally put fold 1 first
        for k in (12, 10, 1, 3):
            C.save_checkpoint(str(run / C.checkpoint_name(k)), params, state)
        found = C.find_checkpoint_by_experiment(
            str(tmp_path / "exp"), "2026-02-02_00h00m00s"
        )
        assert found.endswith("PCC_model_fold_n=1.pt"), found


class TestExperimentFolder:
    def test_same_second_runs_get_distinct_folders(self, tmp_path):
        from stratanet2_tpu.utils.experiment import setup_experiment_folder

        a = setup_experiment_folder(str(tmp_path), "learning", "PROD")
        b = setup_experiment_folder(str(tmp_path), "learning", "PROD")
        c = setup_experiment_folder(str(tmp_path), "learning", "PROD")
        assert len({a, b, c}) == 3
        for p in (a, b, c):
            assert os.path.isdir(p)


class TestMetricSink:
    def test_jsonl_contexts(self, tmp_path):
        from stratanet2_tpu.utils.experiment import MetricSink

        sink = MetricSink(str(tmp_path))
        with sink.context("fold_1_train"):
            sink.log_metrics({"total_loss": 0.5}, epoch=3, step=10)
        sink.log_metric("Fold_ID", 1)
        sink.close()
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["context"] == "fold_1_train"
        assert lines[0]["metrics"]["total_loss"] == 0.5
        assert lines[1]["context"] == ""


class TestConfig:
    def test_dev_profile(self):
        from stratanet2_tpu.config import parse_config

        cfg, ns = parse_config(["--mode", "DEV"])
        assert cfg.train.n_epoch == 2 and cfg.train.n_epoch_test == 1

    def test_overrides(self):
        from stratanet2_tpu.config import parse_config

        cfg, _ = parse_config(
            ["--mode", "PROD", "--n_epoch", "42", "--subsample_size", "512", "--lr", "0.01"]
        )
        assert cfg.train.n_epoch == 42
        assert cfg.model.subsample_size == 512
        assert cfg.train.lr == 0.01
        assert cfg.model.n_centroids1 == 128

    def test_hashable_for_jit(self):
        from stratanet2_tpu.config import ModelConfig

        assert hash(ModelConfig()) == hash(ModelConfig())


class TestResume:
    def test_training_resumes_from_checkpoint(self, tmp_path):
        from dataclasses import replace

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning.train import train_full
        from stratanet2_tpu.utils.experiment import MetricSink

        cfg = tiny_config()
        cfg = replace(
            cfg,
            train=replace(
                cfg.train,
                n_epoch=2,
                n_epoch_test=1,
                # exercise best-metric tracking across the resume without
                # triggering an actual stop
                use_early_stopping=True,
                epoch_to_start_early_stop=100,
                patience_in_epochs=100,
            ),
        )
        ds = make_plot_dataset(np.random.default_rng(0), n_plots=8, n_points=200)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))
        sink = MetricSink(str(tmp_path))
        # run 2 epochs; resume checkpoint is written each eval epoch
        train_full(ds, ids[:6], ids[6:], cfg, kde, str(tmp_path), sink, fold_id=1)
        assert os.path.exists(tmp_path / "PCC_model_fold_n=1.pt.resume")
        # early-stopping state travels with the resume checkpoint: without
        # it a resumed run resets best_metric_value to 1e6 and the first
        # post-resume eval overwrites the pre-crash best model
        from stratanet2_tpu.utils.checkpoint import load_checkpoint

        stopper_state = load_checkpoint(
            str(tmp_path / "PCC_model_fold_n=1.pt.resume")
        )["metadata"]["stopper"]
        assert stopper_state["best_metric_value"] < 1e6
        pre_best = load_checkpoint(str(tmp_path / "PCC_model_fold_n=1.pt"))[
            "metadata"
        ]
        # the resume checkpoint is saved AFTER the epoch's eval/should_stop,
        # so its stopper state is never one eval stale: it must agree with
        # the best checkpoint's metadata exactly (a stale stopper would let
        # a resumed run overwrite an improved best model with worse weights)
        assert stopper_state["best_metric_value"] == pre_best["best_metric_value"]
        assert stopper_state["best_metric_epoch"] == pre_best["best_metric_epoch"]
        # extend schedule and resume: only epochs 3..4 run
        cfg4 = replace(cfg, train=replace(cfg.train, n_epoch=4))
        _, train_losses, _, _ = train_full(
            ds, ids[:6], ids[6:], cfg4, kde, str(tmp_path), sink, fold_id=1, resume=True
        )
        assert [d["epoch"] for d in train_losses] == [3, 4]
        post_best = load_checkpoint(str(tmp_path / "PCC_model_fold_n=1.pt"))[
            "metadata"
        ]
        if "best_metric_value" in post_best:  # early stopping enabled path
            assert (
                post_best["best_metric_value"]
                <= pre_best.get("best_metric_value", 1e6) + 1e-9
            )

    def test_resume_skips_already_stopped_fold(self, tmp_path):
        """A fold whose resume checkpoint records stopped_early=True must
        not retrain past the stop point on resume=True (it would append
        duplicate evals and could overwrite the best checkpoint)."""
        from dataclasses import replace

        from tests.synthetic import make_plot_dataset, tiny_config
        from stratanet2_tpu.learning.kde import fit_kde_mixture_from_dataset
        from stratanet2_tpu.learning.train import train_full
        from stratanet2_tpu.utils.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )
        from stratanet2_tpu.utils.experiment import MetricSink

        cfg = tiny_config()
        cfg = replace(
            cfg,
            train=replace(
                cfg.train, n_epoch=1, n_epoch_test=1, use_early_stopping=True
            ),
        )
        ds = make_plot_dataset(np.random.default_rng(1), n_plots=8, n_points=200)
        kde = fit_kde_mixture_from_dataset(ds)
        ids = np.array(sorted(ds.keys()))
        sink = MetricSink(str(tmp_path))
        train_full(ds, ids[:6], ids[6:], cfg, kde, str(tmp_path), sink, fold_id=1)
        rp = str(tmp_path / "PCC_model_fold_n=1.pt.resume")
        payload = load_checkpoint(rp)
        # doctor the metadata to a mid-schedule early stop (deterministic:
        # whether a real stop fires depends on the loss trajectory)
        md = dict(payload["metadata"])
        md["stopper"] = dict(md["stopper"], stopped_early=True)
        save_checkpoint(
            rp, payload["params"], payload["model_state"],
            payload["opt_state"], metadata=md,
        )
        cfg6 = replace(cfg, train=replace(cfg.train, n_epoch=6))
        _, train_losses, test_losses, _ = train_full(
            ds, ids[:6], ids[6:], cfg6, kde, str(tmp_path), sink,
            fold_id=1, resume=True,
        )
        sink.close()
        assert train_losses == []  # no retraining happened
        # the final best-weights eval still runs (one last_epoch entry)
        assert len(test_losses) <= 1


class TestCompilationCache:
    def test_enable_and_opt_out(self, tmp_path, monkeypatch):
        import jax

        from stratanet2_tpu.utils.experiment import enable_compilation_cache

        import os

        monkeypatch.delenv("STRATANET2_NO_COMPILE_CACHE", raising=False)
        prior = jax.config.jax_compilation_cache_dir
        d = str(tmp_path / "cc")
        try:
            enable_compilation_cache(d)
            assert jax.config.jax_compilation_cache_dir == d
            assert os.path.isdir(d)
            # opt-out leaves the current setting untouched
            monkeypatch.setenv("STRATANET2_NO_COMPILE_CACHE", "1")
            enable_compilation_cache(str(tmp_path / "other"))
            assert jax.config.jax_compilation_cache_dir == d
        finally:
            # restore the suite-wide cache dir even on failure — a tmp_path
            # left configured would make the rest of the compile-heavy
            # suite cache into a throwaway dir
            jax.config.update("jax_compilation_cache_dir", prior)
