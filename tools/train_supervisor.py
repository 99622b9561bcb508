#!/usr/bin/env python
"""Auto-resuming training supervisor.

The axon TPU relay can wedge an RPC mid-run (observed twice in
production: hard300 epoch 235, plus150 epoch 130 — see CLAUDE.md); the
in-process dispatch watchdog (engine/device_trainer.py) turns the silent
hang into a loud failure, and this supervisor turns the failure into an
automatic resume: it launches `main.py train` with the given flags and,
whenever the process dies before writing the final epoch, relaunches it
with `--resume <save_dir>/state_last` (which restores optimizer state,
epoch and the best-metric tracker). Combined with `--save_intervals`,
an unattended multi-hour run survives any number of relay wedges.

Usage:
    python tools/train_supervisor.py [--max_restarts N] -- <train flags...>

Example:
    python tools/train_supervisor.py --max_restarts 10 -- \\
        --dataset kitti --exp_id my_run --device_data --num_epochs 300
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from squeezedet_tpu.utils.yieldfile import (  # noqa: E402
    YIELD_EXIT_CODE,
    yield_requested,
)


def parse_flag(flags: list[str], name: str, default=None):
    for i, f in enumerate(flags):
        if f == f"--{name}" and i + 1 < len(flags):
            return flags[i + 1]
        if f.startswith(f"--{name}="):
            return f.split("=", 1)[1]
    return default


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_restarts", type=int, default=10)
    ap.add_argument("--retry_delay_s", type=float, default=30.0,
                    help="pause before relaunch (lets the relay recover)")
    ap.add_argument("--outage_backoff_max_s", type=float, default=600.0,
                    help="ceiling for the exponential backoff between "
                    "init-wedge (rc=14) retries during a relay outage")
    ap.add_argument("--max_outage_attempts", type=int, default=200,
                    help="separate (large) cap on CONSECUTIVE rc=14 "
                    "retries: ~33h of outage at the default backoff. "
                    "Distinguishes a deterministic in-code hang that "
                    "trips a watchdog on every launch (which must "
                    "eventually surface as a failure) from a relay "
                    "outage (which resolves well within the cap). "
                    "0 = retry forever")
    ap.add_argument("--snapshot_git_s", type=float, default=0.0,
                    help="if >0, persist the run's save_dir (logs + "
                    "resumable state_last) into git every N seconds: "
                    "timer ticks replace refs/snapshots/<exp_id> (no "
                    "history growth on main; state_last is force-added "
                    "past gitignore), completion makes one real commit. "
                    "Encodes the Aug-19/Aug-20 lesson: container "
                    "restarts wipe uncommitted state, and an in-flight "
                    "multi-hour run is only as durable as its last "
                    "git-reachable state_last. On launch, a missing "
                    "state_last is restored from the ref automatically. "
                    "Requires save_dir to be inside the repo.")
    ap.add_argument("--snapshot_repo", default=REPO,
                    help="git repo the snapshots commit into (testing)")
    ap.add_argument("--train_cmd", default="",
                    help="override the launched command (testing)")
    ap.add_argument("flags", nargs=argparse.REMAINDER,
                    help="-- followed by main.py train flags")
    args = ap.parse_args(argv)
    flags = [f for f in args.flags if f != "--"]

    exp_id = parse_flag(flags, "exp_id", "default")
    save_dir = parse_flag(
        flags, "save_dir", os.path.join(REPO, "exp", exp_id)
    )
    state_last = os.path.join(save_dir, "state_last")

    base_cmd = (
        args.train_cmd.split() if args.train_cmd
        else [sys.executable, os.path.join(REPO, "main.py"), "train"]
    )

    def state_mtime() -> float:
        try:
            return os.stat(state_last).st_mtime
        except OSError:
            return 0.0

    snapshot_ref = f"refs/snapshots/{exp_id}"

    def _git(*argv, env=None, timeout=300):
        return subprocess.run(
            ["git", "-C", args.snapshot_repo, *argv],
            capture_output=True, text=True, timeout=timeout, env=env,
        )

    def snapshot_once(final: bool = False) -> None:
        """Persist the run's logs + resumable state_last into git.

        Timer ticks write a single REPLACED ref (``refs/snapshots/<exp_id>``,
        built through a temp index so the real index, worktree and any
        concurrent interactive commit are untouched): each tick supersedes
        the last, so a 600-epoch run does not stack hundreds of ~80 MB
        orbax checkpoint blobs on main's history (advisor round-4) — the
        superseded blobs become unreachable and gc-able, while the ref
        keeps the LATEST state reachable across container restarts.
        Completion makes one real commit on main (the permanent artifact),
        scoped by pathspec so nothing else staged is swept up."""
        rel = os.path.relpath(save_dir, args.snapshot_repo)
        try:
            if final:
                _git("add", "-A", "--", rel)
                r = _git(
                    "commit", "-q", "-m",
                    f"{exp_id} auto-snapshot (supervisor): logs + resumable "
                    "state_last", "--", rel,
                )
                if r.returncode == 0:
                    print(f"[supervisor] committed snapshot of {rel}",
                          flush=True)
                return
            tmp_index = os.path.join(save_dir, ".snapshot_index")
            env = {**os.environ, "GIT_INDEX_FILE": tmp_index}
            try:
                _git("read-tree", "HEAD", env=env)
                _git("add", "-A", "--", rel, env=env)
                # state_last is what resumability needs; force past any
                # per-run gitignore line (model_NNN stay excluded — they
                # would make the reachable set grow with the run)
                _git("add", "-f", "--", os.path.join(rel, "state_last"),
                     env=env)
                tree = _git("write-tree", env=env).stdout.strip()
                if not tree:
                    return
                head = _git("rev-parse", "HEAD").stdout.strip()
                commit = _git(
                    "commit-tree", tree, "-p", head, "-m",
                    f"{exp_id} auto-snapshot (supervisor, ref tick)",
                    env=env,
                ).stdout.strip()
                if commit:
                    _git("update-ref", snapshot_ref, commit)
                    print(
                        f"[supervisor] snapshot ref {snapshot_ref} -> "
                        f"{commit[:10]}", flush=True,
                    )
            finally:
                try:
                    os.remove(tmp_index)
                except OSError:
                    pass
        except Exception as e:  # snapshotting must never kill the run
            print(f"[supervisor] snapshot failed: {e}", flush=True)

    restored_from_ref = False
    if args.snapshot_git_s > 0 and not os.path.isdir(state_last):
        # container restarts wipe uncommitted files; if the last tick's
        # state only survives in the snapshot ref, restore it so the
        # first attempt below resumes instead of restarting from scratch
        if _git("rev-parse", "-q", "--verify", snapshot_ref).returncode == 0:
            rel = os.path.relpath(save_dir, args.snapshot_repo)
            r = _git("restore", "--source", snapshot_ref, "--", rel)
            if r.returncode == 0 and os.path.isdir(state_last):
                restored_from_ref = True
                print(
                    f"[supervisor] restored {rel} from {snapshot_ref}",
                    flush=True,
                )

    if args.snapshot_git_s > 0:
        import threading

        def _snapshot_loop():
            while True:
                time.sleep(args.snapshot_git_s)
                snapshot_once()

        threading.Thread(target=_snapshot_loop, daemon=True).start()

    # --max_restarts bounds CONSECUTIVE no-progress failures, not total
    # restarts: a relay outage mid-way through a multi-hour run must not
    # exhaust the budget that a 95%-complete run still needs (observed:
    # the plus_ft300 outage burned 4 attempts in 15 minutes). Any attempt
    # that advances state_last resets the counter.
    attempt, failures, outage_streak = 0, 0, 0
    while failures <= args.max_restarts:
        cmd = list(base_cmd) + flags
        if (attempt > 0 or restored_from_ref) and os.path.isdir(state_last):
            # appended LAST so argparse last-wins overrides any
            # user-pinned --resume with the live state on relaunch (or on
            # attempt 0 after a ref restore — the state exists only
            # because a previous incarnation of this run saved it)
            cmd += ["--resume", state_last]
        print(f"[supervisor] attempt {attempt}: {' '.join(cmd)}", flush=True)
        before = state_mtime()
        rc = subprocess.call(cmd)
        attempt += 1
        progressed = state_mtime() > before
        if rc == 0:
            # a relaunch that resumes past the final epoch exits 0
            # immediately, so completion detection needs no metadata
            print("[supervisor] training completed", flush=True)
            if args.snapshot_git_s > 0:
                snapshot_once(final=True)  # one real commit on main
            return 0
        if rc == YIELD_EXIT_CODE:
            # Training released the TPU claim on request (the yield
            # sentinel — see utils/yieldfile.py): paused, not failed.
            # Wait for the requester to clear the sentinel (staleness is
            # handled inside yield_requested: a dead requester's file is
            # removed automatically), then relaunch with --resume. Never
            # counted against the restart budget.
            print(
                "[supervisor] training yielded the TPU claim (rc="
                f"{YIELD_EXIT_CODE}); waiting for the requester to finish",
                flush=True,
            )
            waited = 0.0
            while yield_requested():
                time.sleep(5.0)
                waited += 5.0
                if waited and waited % 300.0 < 5.0:
                    print(
                        f"[supervisor] still yielded after {waited:.0f}s",
                        flush=True,
                    )
            outage_streak = 0
            print(
                f"[supervisor] yield cleared after {waited:.0f}s; resuming",
                flush=True,
            )
            continue
        if not os.path.isdir(state_last) and rc != 14:
            # A non-outage failure before the first checkpoint is a real
            # training failure (bad flags, crash in staging) — relaunching
            # would just repeat it. rc=14 is excluded: an init/first-execute
            # wedge on a FRESH run (observed live 2026-08-19) is an
            # environment outage and falls through to the backoff loop.
            print(
                f"[supervisor] exited rc={rc} with no resumable state at "
                f"{state_last}; giving up", flush=True,
            )
            return rc
        if rc == 14 and not progressed:
            # rc=14 is the init watchdog: the backend-init RPC wedged, a
            # positively-identified ENVIRONMENT outage, not a training
            # failure — it must never exhaust the restart budget (observed:
            # the 2026-08-17 3h outage burned 30 attempts of a 96%-complete
            # run). Retry forever with exponential backoff so a long outage
            # costs a handful of probe launches per hour, and the run
            # resumes by itself the moment the relay returns.
            outage_streak += 1
            if args.max_outage_attempts and (
                outage_streak > args.max_outage_attempts
            ):
                print(
                    f"[supervisor] {outage_streak} consecutive rc=14 "
                    "attempts without progress exceeds "
                    f"--max_outage_attempts={args.max_outage_attempts}. "
                    "An outage this long is implausible — suspect a "
                    "deterministic in-code hang tripping the watchdog "
                    "every launch; giving up.", flush=True,
                )
                return 14
            delay = min(
                args.retry_delay_s * (2 ** min(outage_streak - 1, 16)),
                args.outage_backoff_max_s,
            )
            if outage_streak % 10 == 0:
                print(
                    f"[supervisor] WARNING: {outage_streak} consecutive "
                    "rc=14 launches with no progress. If the relay is "
                    "healthy for other processes, this may be a "
                    "deterministic in-code hang, not an outage "
                    f"(cap: {args.max_outage_attempts or 'none'}).",
                    flush=True,
                )
            print(
                f"[supervisor] init wedge (rc=14, outage attempt "
                f"{outage_streak}); retrying in {delay:.0f}s — not counted "
                f"against the restart budget", flush=True,
            )
            time.sleep(delay)
            continue
        outage_streak = 0
        failures = 0 if progressed else failures + 1
        print(
            f"[supervisor] exited rc={rc}; resuming from {state_last} in "
            f"{args.retry_delay_s:.0f}s", flush=True,
        )
        time.sleep(args.retry_delay_s)
    print("[supervisor] restart budget exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
