"""Bounded TPU-backend liveness probe (driver-contract hardening).

Round-3 postmortem (VERDICT.md): both driver artifacts failed because the
contract entry points touched the axon TPU backend *unboundedly* in-process.
``jax.devices()`` on a wedged relay hangs forever inside the client's retry
loop — a try/except cannot catch a hang, and once any jax backend query runs
the process's platform is latched, so there is no in-process recovery.

Rules encoded here (see CLAUDE.md for the incident history):

- NEVER call ``jax.devices()`` in-process unless (a) the backend registry is
  already initialized, or (b) the resolved platform is ``cpu`` (the CPU
  backend cannot hang).
- Probe the axon backend only in a *bounded subprocess* — the child is
  killed by PID via ``subprocess.run(timeout=...)``, never by pattern.
  ``jax.devices()`` compiles nothing, so killing a hung probe cannot wedge a
  healthy relay mid-compile (a healthy relay answers a device query in
  seconds; one that stays silent for the full bound is already gone).
- Fast-fail without even spawning the probe when the relay's TCP port
  refuses connections (the axon client retries connection-refused forever,
  which is exactly the hang we are avoiding).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from dataclasses import dataclass

#: Ports the loopback axon relay listens on when healthy. When the relay
#: process dies these refuse connections (observed rounds 3/3b/3c).
RELAY_PORTS = (8082,)
RELAY_HOST = "127.0.0.1"


@dataclass(frozen=True)
class ProbeResult:
    ok: bool
    platform: str | None
    n_devices: int
    error: str | None

    def to_json(self) -> str:
        return json.dumps(self.__dict__)


def honor_platform_env() -> None:
    """Re-assert the JAX_PLATFORMS env var through jax.config.

    The axon sitecustomize force-selects its platform via jax.config at
    interpreter start, which silently overrides a user's
    ``JAX_PLATFORMS=cpu`` (CLAUDE.md) — so ``JAX_PLATFORMS=cpu python -m
    stratanet2_tpu.cli.main ...`` would still dial the TPU relay (and hang
    forever if it is down). Every CLI entry point calls this first. No-op
    when the env var is unset or a backend is already initialized."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env or backend_already_initialized():
        return
    import jax

    if str(jax.config.jax_platforms or "") != env:
        jax.config.update("jax_platforms", env)


def resolved_platform() -> str:
    """The platform jax will resolve to, WITHOUT initializing a backend.

    Precedence: an in-process ``jax.config.update('jax_platforms', ...)``
    (conftest does this) wins over the JAX_PLATFORMS env var set by the axon
    sitecustomize.
    """
    try:
        import jax

        val = jax.config.jax_platforms  # None unless explicitly set
        if val:
            return str(val).split(",")[0]
    except Exception:
        pass
    env = os.environ.get("JAX_PLATFORMS", "")
    return env.split(",")[0] if env else ""


def backend_already_initialized() -> bool:
    """True if this process has already initialized a jax backend (in which
    case ``jax.devices()`` is a dict lookup and cannot hang)."""
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        return False


def relay_port_open(timeout: float = 1.0) -> bool:
    """Cheap TCP liveness check on the loopback relay."""
    for port in RELAY_PORTS:
        try:
            with socket.create_connection((RELAY_HOST, port), timeout=timeout):
                return True
        except OSError:
            continue
    return False


# The axon sitecustomize force-selects its platform via jax.config at
# interpreter start, overriding the JAX_PLATFORMS env var (CLAUDE.md) — so
# the probe child re-asserts the env var through jax.config to stay
# deterministic w.r.t. the environment it was launched with.
_PROBE_CODE = (
    "import os, jax, json;"
    "p = os.environ.get('JAX_PLATFORMS');"
    "jax.config.update('jax_platforms', p) if p else None;"
    "ds = jax.devices();"
    "print(json.dumps({'platform': ds[0].platform, 'n': len(ds)}))"
)


def probe_backend(timeout_s: float = 120.0) -> ProbeResult:
    """Decide whether the default jax backend is usable, without ever
    hanging the calling process.

    Returns quickly (sub-second) when the answer is knowable from process
    state or a TCP check; otherwise spends at most ``timeout_s`` on a
    subprocess ``jax.devices()`` probe.
    """
    if backend_already_initialized():
        import jax

        try:
            ds = jax.devices()
            return ProbeResult(True, ds[0].platform, len(ds), None)
        except Exception as e:  # initialized-but-failed registry
            return ProbeResult(False, None, 0, f"{type(e).__name__}: {e}")

    platform = resolved_platform()
    if platform == "cpu":
        import jax

        ds = jax.devices()
        return ProbeResult(True, "cpu", len(ds), None)

    # axon / tpu / unset: only a bounded subprocess may touch the backend.
    if platform in ("axon", "tpu") and not relay_port_open():
        return ProbeResult(
            False,
            None,
            0,
            f"relay port(s) {RELAY_PORTS} refused on {RELAY_HOST} "
            "(axon relay process is down; only the driver can re-provision)",
        )
    return _subprocess_probe(timeout_s)


def _subprocess_probe(timeout_s: float) -> ProbeResult:
    # Kill discipline (CLAUDE.md): never SIGKILL a client mid-relay-RPC —
    # that wedged the relay in rounds 3/3b. A timed-out probe is stopped
    # with SIGTERM (the relay itself SIG_IGNs TERM; the CLIENT dies
    # cleanly) and given a generous grace period; SIGKILL only as the very
    # last resort for a client that ignores TERM. A probe that answers
    # during the grace window is still used. Note a timeout does NOT prove
    # the relay is dead — a healthy relay busy with another client's long
    # compile queues queries behind it (round-3b: 63 s phantom fetches) —
    # so the error message distinguishes busy-or-wedged from port-refused.
    proc = subprocess.Popen(
        [sys.executable, "-c", _PROBE_CODE],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout_s)
        r = subprocess.CompletedProcess(proc.args, proc.returncode, out, err)
    except subprocess.TimeoutExpired:
        proc.terminate()  # SIGTERM, by PID — never by pattern
        try:
            out, err = proc.communicate(timeout=60.0)
            if proc.returncode == 0 and out.strip():
                r = subprocess.CompletedProcess(proc.args, 0, out, err)
                return _parse_probe(r)
        except subprocess.TimeoutExpired:
            proc.kill()  # last resort: TERM was ignored for 60 s
            proc.communicate()
        return ProbeResult(
            False,
            None,
            0,
            f"backend probe exceeded {timeout_s:.0f}s (relay busy with "
            "another client or wedged; probe stopped with SIGTERM)",
        )
    return _parse_probe(r)


def _parse_probe(r) -> ProbeResult:
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        return ProbeResult(False, None, 0, f"probe rc={r.returncode}: {tail}")
    try:
        info = json.loads(r.stdout.strip().splitlines()[-1])
        return ProbeResult(True, info["platform"], int(info["n"]), None)
    except Exception as e:
        return ProbeResult(False, None, 0, f"unparseable probe output: {e}")
