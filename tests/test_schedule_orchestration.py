"""The schedule orchestrator's spawn -> poll -> SIGTERM -> resume path
(scripts/prod_schedule_run.py --orchestrate), smoke-tested at tiny scale
on CPU via its STRATANET2_SCHED_* env knobs — so the crash-recovery
machinery is validated without burning TPU time."""

import json
import os
import subprocess
import sys


class TestScheduleOrchestration:
    def test_orchestrate_kill_resume_two_folds(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
        }
        env.update(
            PYTHONPATH=repo,
            JAX_PLATFORMS="cpu",
            STRATANET2_SCHED_PLOTS="20",
            STRATANET2_SCHED_POINTS="600",
            STRATANET2_SCHED_BATCH="4",
            STRATANET2_SCHED_SUBSAMPLE="256",
            STRATANET2_SCHED_KILL_AFTER="3",
        )
        r = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "scripts", "prod_schedule_run.py"),
                "--orchestrate", "--root", str(tmp_path), "--n_epoch", "8",
            ],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        assert r.returncode == 0, f"rc={r.returncode}\n{r.stdout}\n{r.stderr}"
        assert "KILLING fold-1 run" in r.stdout
        assert "fold 1 resumed run exit code 0" in r.stdout
        assert "fold 2 exit code 0" in r.stdout
        summaries = [
            json.loads(line)
            for line in open(tmp_path / "fold1_summary.json")
        ]
        # the resumed run appends its own summary after the killed run's
        assert summaries[-1]["resumed"] is True
        f2 = [json.loads(line) for line in open(tmp_path / "fold2_summary.json")]
        assert f2[-1]["fold"] == 2 and f2[-1]["epochs_run"] == 8
