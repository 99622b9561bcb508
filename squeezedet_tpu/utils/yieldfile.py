"""TPU-claim yield protocol (sentinel-file handshake).

The axon relay admits exactly ONE claimant per container (CLAUDE.md); a
long training run therefore starves any other measurement that needs the
chip — observed in production when the round-4 driver bench exited rc=14
because `exp/hyb_ft150` held the claim for the whole bench window
(BENCH_r04.json is empty for exactly this reason).

The fix is a tiny cooperative handshake through a well-known sentinel
file:

1. the process that WANTS the chip (bench.py) writes the sentinel
   (``request_yield()``) with its own pid, then probes/retries backend
   init as before;
2. the training loop checks ``yield_requested()`` at every epoch
   boundary (cheap: one stat), and when set saves ``state_last`` and
   exits with rc=15 — releasing the claim within one epoch (~20 s for
   the production --device_data config);
3. ``train_supervisor`` treats rc=15 as "paused, not failed": it waits
   until the sentinel clears (not counted against the restart budget),
   then relaunches with ``--resume <state_last>``;
4. the requester clears the sentinel (``clear_yield()``) on EVERY exit
   path, including the crash-only ``os._exit`` ones.

Self-healing: the sentinel records the requester's pid, and
``yield_requested()`` treats a dead requester as a stale sentinel and
removes it — a bench that was SIGKILLed without cleanup can pause
training for at most one epoch-boundary check.

The path is shared knowledge, not configuration: a fixed /tmp path
overridable via ``SQDT_YIELD_FILE`` (tests point it into tmp_path).
"""

from __future__ import annotations

import os

DEFAULT_PATH = "/tmp/sqdt_tpu_yield"

# Distinct from rc=14 (backend-init/dispatch watchdog = environment
# outage): rc=15 means "training yielded the TPU claim on request".
YIELD_EXIT_CODE = 15


def yield_path() -> str:
    return os.environ.get("SQDT_YIELD_FILE", DEFAULT_PATH)


def request_yield() -> str:
    """Ask any cooperating TPU holder to release the claim.

    Idempotent; returns the sentinel path. The file body is the
    requester's pid (used for staleness detection).
    """
    path = yield_path()
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        f.write(str(os.getpid()))
    os.replace(tmp, path)  # atomic: checkers never see a partial write
    return path


def clear_yield() -> None:
    """Remove the sentinel (idempotent). Call on every requester exit
    path — including before ``os._exit`` — so training auto-resumes."""
    try:
        os.remove(yield_path())
    except OSError:
        pass


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # exists, owned by someone else
        return True
    return True


def yield_requested() -> bool:
    """True iff a LIVE requester currently asks for the chip.

    A sentinel whose recorded pid no longer exists is stale (requester
    died without cleanup) — it is removed here and reported False, so a
    crashed bench can never wedge training or the supervisor. An
    unparsable body is treated as stale for the same reason.
    """
    path = yield_path()
    try:
        with open(path) as f:
            body = f.read().strip()
    except OSError:
        return False
    try:
        pid = int(body)
    except ValueError:
        pid = -1
    if pid > 0 and _pid_alive(pid):
        return True
    try:
        os.remove(path)
    except OSError:
        pass
    return False
