"""Multi-host orchestration.

The reference scales across machines only via the shuffled idempotent file
worklist (utils/utils.py:118-134, SURVEY.md §2.4 "poor-man's"). Here the
same worklist composes with a real multi-host JAX runtime:

- `initialize()` — `jax.distributed.initialize` wrapper (coordinator from
  env or args); after it, `jax.devices()` spans all hosts and the standard
  data-parallel mesh (parallel/mesh.py) stripes the global batch while each
  host feeds its own shard (`host_batch_slice`).
- worklist sharding — `utils.worklist.get_unprocessed_files(host_id,
  n_hosts)` deterministically partitions parcels across hosts for the
  embarrassingly-parallel prepare/predict stages (no collectives needed;
  outputs are per-parcel files).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax

logger = logging.getLogger("stratanet2_tpu")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize the multi-host runtime. Returns (process_id, n_processes).

    jax.distributed.initialize runs when any of these hold:
    - `coordinator_address`/`num_processes` passed explicitly, or
    - JAX_NUM_PROCESSES env set (the two-process test path), or
    - STRATANET2_DISTRIBUTED=1 env set — the TPU-pod case, where a BARE
      jax.distributed.initialize() auto-detects peers via TPU metadata.
      This one is opt-in because bare auto-detection on a single dev host
      can hang probing the metadata server; without it a pod launch would
      silently run every host as its own single process (full batch and
      full worklist each — duplicated work, no error).

    Safe to call on a single host (no-op without any of the above)."""
    # JAX does not read JAX_NUM_PROCESSES/JAX_PROCESS_ID itself — forward
    # them (explicit args win; previously the env value only GATED the call
    # and initialize() raised "Number of processes must be defined")
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_n:
        num_processes = int(env_n)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("STRATANET2_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # TPU-pod metadata auto-detection
    pid, n = jax.process_index(), jax.process_count()
    logger.info("multihost: process %d/%d, %d local / %d global devices",
                pid, n, jax.local_device_count(), jax.device_count())
    return pid, n


def host_batch_slice(
    global_batch: int,
    process_id: Optional[int] = None,
    n_processes: Optional[int] = None,
) -> slice:
    """The slice of the global batch this host must feed (contiguous
    striping; combine with PlotLoader over the host's plot subset).

    `process_id`/`n_processes` default to the live runtime values; passing
    them explicitly makes the arithmetic testable without spawning hosts
    (the dryrun exercises n_hosts in {2, 4, 8} this way)."""
    n = jax.process_count() if n_processes is None else n_processes
    assert global_batch % n == 0, f"global batch {global_batch} % hosts {n} != 0"
    per = global_batch // n
    pid = jax.process_index() if process_id is None else process_id
    assert 0 <= pid < n, f"process_id {pid} out of range for {n} hosts"
    return slice(pid * per, (pid + 1) * per)
