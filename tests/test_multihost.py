"""Two-process multihost validation (VERDICT round-1 item 6).

Spawns 2 fresh CPU processes that `jax.distributed.initialize` against a
local coordinator, then asserts in each: global process/device counts,
`host_batch_slice` covers the global batch disjointly, and the crc32
worklist shards are disjoint and exhaustive. Runs the real
`parallel.multihost` code path (the reference has nothing here; SURVEY.md
§2.4 made it part of the plan).
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys, json
import jax

sys.path.insert(0, os.environ["REPO_ROOT"])
jax.config.update("jax_platforms", "cpu")

from stratanet2_tpu.parallel import multihost
from stratanet2_tpu.utils.worklist import get_unprocessed_files

NPROC = int(os.environ["NPROC"])
if os.environ.get("USE_ENV") == "1":
    # env-var launch path: JAX_* vars must be forwarded into
    # jax.distributed.initialize by multihost.initialize itself
    os.environ["JAX_COORDINATOR_ADDRESS"] = os.environ["COORD"]
    os.environ["JAX_NUM_PROCESSES"] = str(NPROC)
    os.environ["JAX_PROCESS_ID"] = os.environ["PID"]
    pid, n = multihost.initialize()
else:
    pid, n = multihost.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=NPROC,
        process_id=int(os.environ["PID"]),
    )
assert n == NPROC, f"process_count={n}"
assert jax.device_count() == NPROC * jax.local_device_count()

sl = multihost.host_batch_slice(8)
work = get_unprocessed_files(os.environ["WORK_IN"], os.environ["WORK_OUT"],
                             host_id=pid, n_hosts=n, shuffle_seed=0)
print("RESULT " + json.dumps({
    "pid": pid,
    "slice": [sl.start, sl.stop],
    "work": sorted(os.path.basename(w) for w in work),
}))
"""


class TestMultihost:
    @pytest.mark.skipif(sys.platform != "linux", reason="local coordinator")
    @pytest.mark.parametrize("nproc,use_env", [(2, False), (2, True), (4, False)],
                             ids=["explicit-args", "env-vars", "4-process"])
    def test_multi_process_initialize(self, tmp_path, nproc, use_env):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # free port for the coordinator
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        work_in = tmp_path / "in"
        work_out = tmp_path / "out"
        work_in.mkdir()
        work_out.mkdir()
        names = [f"parcel_{i:03d}.las" for i in range(20)]
        for nm in names:
            (work_in / nm).write_text("x")
        (work_out / "parcel_000.pkl").write_text("done")  # already processed

        env_base = {
            k: v
            for k, v in os.environ.items()
            if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
        }
        env_base.update(
            {
                "JAX_PLATFORMS": "cpu",
                "REPO_ROOT": repo,
                "PYTHONPATH": repo,
                "COORD": f"127.0.0.1:{port}",
                "WORK_IN": str(work_in),
                "WORK_OUT": str(work_out),
                "USE_ENV": "1" if use_env else "0",
                "NPROC": str(nproc),
            }
        )
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                  "JAX_PROCESS_ID"):
            env_base.pop(k, None)
        procs = []
        for pid in range(nproc):
            env = dict(env_base, PID=str(pid))
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", _CHILD],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                    text=True,
                )
            )
        results = {}
        for pr in procs:
            out, err = pr.communicate(timeout=300)
            assert pr.returncode == 0, f"rc={pr.returncode}\n{out}\n{err}"
            import json

            line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
            rec = json.loads(line[len("RESULT "):])
            results[rec["pid"]] = rec

        assert set(results) == set(range(nproc))
        # host batch slices partition [0, 8) in pid order, equally sized
        per = 8 // nproc
        for pid in range(nproc):
            assert results[pid]["slice"] == [pid * per, (pid + 1) * per]
        # crc32 worklist shards are disjoint and exhaustive over the todo set
        shards = [set(results[pid]["work"]) for pid in range(nproc)]
        for a in range(nproc):
            for b in range(a + 1, nproc):
                assert not (shards[a] & shards[b]), (
                    f"overlap {a}/{b}: {shards[a] & shards[b]}"
                )
        todo = {n for n in names if n != "parcel_000.las"}
        assert {os.path.splitext(n)[0] for s in shards for n in s} == {
            os.path.splitext(n)[0] for n in todo
        }
        assert all(shards)  # every host got work (20 files, <=4 hosts)
