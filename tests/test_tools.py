import os

import numpy as np
import pytest

from squeezedet_tpu.tools.compute_dataset_mean_and_std import compute_mean_and_std
from squeezedet_tpu.tools.compute_dataset_seed_anchors import (
    _kmeans_pp,
    compute_seed_anchors,
)
from squeezedet_tpu.tools.random_split_train_val import split


class FakeDataset:
    def __init__(self, n=20, seed=0):
        rng = np.random.default_rng(seed)
        self.images = [
            rng.uniform(0, 255, (8, 10, 3)).astype(np.float32) for _ in range(n)
        ]
        self.boxes = []
        for _ in range(n):
            k = rng.integers(1, 4)
            x1 = rng.uniform(0, 50, (k, 1))
            y1 = rng.uniform(0, 50, (k, 1))
            w = rng.uniform(10, 100, (k, 1))
            h = rng.uniform(10, 60, (k, 1))
            self.boxes.append(
                np.concatenate([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)
            )

    def __len__(self):
        return len(self.images)

    def load_image(self, i):
        return self.images[i], str(i)

    def load_annotations(self, i):
        return np.zeros(len(self.boxes[i]), np.int16), self.boxes[i]


def test_split_is_seeded_and_disjoint(tmp_path):
    ids = [f"{i:06d}" for i in range(11)]
    (tmp_path / "trainval.txt").write_text("\n".join(ids) + "\n")
    train_file, val_file = split(str(tmp_path), seed=42)
    train = open(train_file).read().split()
    val = open(val_file).read().split()
    assert len(train) == 5 and len(val) == 6
    assert not set(train) & set(val)
    assert sorted(train + val) == ids
    assert train == sorted(train) and val == sorted(val)

    # deterministic
    train2, _ = split(str(tmp_path), seed=42)
    assert open(train2).read().split() == train


def test_mean_and_std():
    ds = FakeDataset()
    mean, std = compute_mean_and_std(ds, num_workers=2)
    want_mean = np.mean([im.mean(axis=(0, 1)) for im in ds.images], axis=0)
    want_std = np.mean([im.std(axis=(0, 1)) for im in ds.images], axis=0)
    np.testing.assert_allclose(mean, want_mean, rtol=1e-6)
    np.testing.assert_allclose(std, want_std, rtol=1e-6)


def test_seed_anchors_shape_and_sorted():
    ds = FakeDataset(40)
    seeds = compute_seed_anchors(ds, anchors_per_grid=4, num_workers=2)
    assert seeds.shape == (4, 2)
    areas = seeds[:, 0] * seeds[:, 1]
    assert np.all(np.diff(areas) >= 0)


def test_kmeans_pp_fallback_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal([10, 10], 1, (50, 2))
    b = rng.normal([100, 50], 1, (50, 2))
    centers = _kmeans_pp(np.concatenate([a, b]), 2, seed=1)
    centers = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(centers[0], [10, 10], atol=1.5)
    np.testing.assert_allclose(centers[1], [100, 50], atol=1.5)


def test_train_supervisor_resumes(tmp_path):
    """Supervisor relaunches a crashed run with --resume and stops on
    success (tools/train_supervisor.py; the relay-wedge recovery loop)."""
    import subprocess
    import sys

    import squeezedet_tpu  # noqa: F401  (repo root on sys.path)

    state = tmp_path / "exp" / "run1" / "state_last"
    marker = tmp_path / "attempts.txt"
    # fake trainer: writes state_last, fails twice, succeeds on the third
    fake = tmp_path / "fake_train.py"
    fake.write_text(
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(n + 1))\n"
        f"os.makedirs({str(state)!r}, exist_ok=True)\n"
        "resumed = '--resume' in sys.argv\n"
        "if n >= 2:\n"
        "    assert resumed, 'relaunch must pass --resume'\n"
        "    sys.exit(0)\n"
        "sys.exit(3)\n"
    )
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "5", "--retry_delay_s", "0.1",
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "run1", "--save_dir", str(tmp_path / "exp" / "run1"),
        ],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert open(marker).read() == "3"
    assert "resuming from" in out.stdout


def test_train_supervisor_budget_resets_on_progress(tmp_path):
    """--max_restarts bounds CONSECUTIVE no-progress failures: a run that
    keeps advancing state_last must survive more crashes than the budget
    (production: a relay outage must not spend the restarts a long run
    still needs)."""
    import subprocess
    import sys

    state = tmp_path / "exp" / "run2" / "state_last"
    marker = tmp_path / "attempts.txt"
    # fake trainer: ALWAYS advances state_last (adds a new entry so the
    # dir mtime moves), crashes 4x, succeeds on the 5th; budget is 1
    fake = tmp_path / "fake_train.py"
    fake.write_text(
        "import os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(n + 1))\n"
        f"os.makedirs({str(state)!r}, exist_ok=True)\n"
        f"open(os.path.join({str(state)!r}, 'tick%d' % n), 'w').close()\n"
        "time.sleep(0.01)\n"
        "sys.exit(0 if n >= 4 else 3)\n"
    )
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "1", "--retry_delay_s", "0.05",
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "run2", "--save_dir", str(tmp_path / "exp" / "run2"),
        ],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert open(marker).read() == "5"


def test_train_supervisor_gives_up_without_progress(tmp_path):
    """Consecutive failures that never advance state_last exhaust the
    budget (a permanently broken run must not loop forever)."""
    import subprocess
    import sys

    state = tmp_path / "exp" / "run3" / "state_last"
    marker = tmp_path / "attempts.txt"
    fake = tmp_path / "fake_train.py"
    fake.write_text(
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(n + 1))\n"
        f"os.makedirs({str(state)!r}, exist_ok=True)\n"
        "sys.exit(3)\n"
    )
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "2", "--retry_delay_s", "0.05",
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "run3", "--save_dir", str(tmp_path / "exp" / "run3"),
        ],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 1
    assert "budget exhausted" in out.stdout
    # attempt 0 created state_last (= progress, resets); then 3
    # consecutive no-progress failures spend budget 0/1/2 -> give up
    assert open(marker).read() == "4"


def test_train_supervisor_outage_retries_do_not_burn_budget(tmp_path):
    """rc=14 (init watchdog: a positively-identified relay outage) must be
    retried with backoff WITHOUT spending the restart budget — a multi-hour
    outage cannot kill a 96%-complete run (production 2026-08-17: 30
    attempts burned in 3h under the old semantics). Real failures after
    the outage still count."""
    import subprocess
    import sys

    state = tmp_path / "exp" / "run4" / "state_last"
    marker = tmp_path / "attempts.txt"
    # fake trainer: 3 outage exits (rc=14) — the first also creates
    # state_last (progress), the next two hit the outage branch — then one
    # real failure (rc=3) with budget 0 -> exhausted after exactly 4
    # launches
    fake = tmp_path / "fake_train.py"
    fake.write_text(
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(n + 1))\n"
        f"os.makedirs({str(state)!r}, exist_ok=True)\n"
        "sys.exit(14 if n < 3 else 3)\n"
    )
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "0", "--retry_delay_s", "0.05",
            "--outage_backoff_max_s", "0.1",
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "run4", "--save_dir", str(tmp_path / "exp" / "run4"),
        ],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 1, out.stdout + out.stderr
    assert open(marker).read() == "4"
    assert out.stdout.count("not counted against the restart budget") == 2
    assert "budget exhausted" in out.stdout


def test_train_supervisor_fresh_run_outage_retries(tmp_path):
    """rc=14 on a FRESH run (no state_last ever written) must retry, not
    give up: an init/first-execute wedge before the first checkpoint is an
    environment outage, not a training failure (observed live 2026-08-19:
    a new run wedged in init_params and the supervisor abandoned it)."""
    import subprocess
    import sys

    marker = tmp_path / "attempts.txt"
    # fake trainer: two outage exits (rc=14, never writes state_last),
    # then succeeds — under the old semantics the supervisor gave up
    # after the first rc=14 because state_last did not exist
    fake = tmp_path / "fake_train.py"
    fake.write_text(
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(n + 1))\n"
        "sys.exit(14 if n < 2 else 0)\n"
    )
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "0", "--retry_delay_s", "0.05",
            "--outage_backoff_max_s", "0.1",
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "run5", "--save_dir", str(tmp_path / "exp" / "run5"),
        ],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert open(marker).read() == "3"
    assert out.stdout.count("not counted against the restart budget") == 2


def test_train_supervisor_git_snapshots(tmp_path):
    """--snapshot_git_s persists the run's save_dir into git while training
    runs: timer ticks REPLACE a single snapshot ref (refs/snapshots/<exp_id>,
    so a 600-epoch run never stacks hundreds of checkpoint blobs on main's
    history — advisor round-4), plus ONE real commit at completion. A
    container wipe can never lose more than one snapshot interval of an
    in-flight run (the Aug-19/Aug-20 restarts each killed a multi-hour run
    whose state_last had never actually been committed)."""
    import subprocess
    import sys

    repo = tmp_path / "repo"
    save_dir = repo / "exp" / "run6"
    save_dir.mkdir(parents=True)
    for cmd in (
        ["git", "init", "-q"],
        ["git", "config", "user.email", "t@t"],
        ["git", "config", "user.name", "t"],
        ["git", "commit", "-q", "--allow-empty", "-m", "root"],
    ):
        subprocess.run(cmd, cwd=repo, check=True, capture_output=True)
    # an unrelated dirty file must NOT be swept into snapshot commits
    (repo / "unrelated.txt").write_text("dirty")

    # fake trainer: writes state_last, keeps appending log lines long
    # enough for at least one mid-run snapshot tick, then exits 0
    fake = tmp_path / "fake_train.py"
    fake.write_text(
        "import os, time\n"
        f"sd = {str(save_dir)!r}\n"
        "os.makedirs(os.path.join(sd, 'state_last'), exist_ok=True)\n"
        "open(os.path.join(sd, 'state_last', 'ckpt'), 'w').write('s')\n"
        "for i in range(8):\n"
        "    open(os.path.join(sd, 'log.txt'), 'a').write(f'epoch {i}\\n')\n"
        "    time.sleep(0.25)\n"
    )
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "1", "--retry_delay_s", "0.05",
            "--snapshot_git_s", "0.4", "--snapshot_repo", str(repo),
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "run6", "--save_dir", str(save_dir),
        ],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    log = subprocess.run(
        ["git", "log", "--oneline"], cwd=repo,
        capture_output=True, text=True, check=True,
    ).stdout
    # main's history gets exactly ONE snapshot commit (the final one) no
    # matter how many timer ticks fired — that is the whole point
    assert log.count("run6 auto-snapshot") == 1, log
    assert "[supervisor] snapshot ref refs/snapshots/run6" in out.stdout
    # the ref's tree carries the resumable state for restart recovery
    ref_files = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", "refs/snapshots/run6"],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout
    assert "exp/run6/state_last/ckpt" in ref_files
    assert "unrelated.txt" not in ref_files  # scoped: never swept up
    # the committed tree has the resumable state and the latest log
    files = subprocess.run(
        ["git", "ls-files"], cwd=repo, capture_output=True, text=True,
        check=True,
    ).stdout
    assert "exp/run6/state_last/ckpt" in files
    assert "exp/run6/log.txt" in files
    assert "unrelated.txt" not in files  # scoped: never swept up
    status = subprocess.run(
        ["git", "status", "--porcelain"], cwd=repo,
        capture_output=True, text=True, check=True,
    ).stdout
    assert "unrelated.txt" in status  # still dirty, still uncommitted


def test_train_supervisor_restores_state_from_snapshot_ref(tmp_path):
    """A container restart wipes uncommitted files; on relaunch the
    supervisor restores save_dir from refs/snapshots/<exp_id> so the run
    RESUMES instead of restarting from scratch."""
    import subprocess
    import sys

    repo = tmp_path / "repo"
    save_dir = repo / "exp" / "run7"
    save_dir.mkdir(parents=True)
    for cmd in (
        ["git", "init", "-q"],
        ["git", "config", "user.email", "t@t"],
        ["git", "config", "user.name", "t"],
        ["git", "commit", "-q", "--allow-empty", "-m", "root"],
    ):
        subprocess.run(cmd, cwd=repo, check=True, capture_output=True)
    # simulate the pre-wipe tick: a snapshot ref carrying state_last
    (save_dir / "state_last").mkdir()
    (save_dir / "state_last" / "ckpt").write_text("resume-me")
    env = {**os.environ, "GIT_INDEX_FILE": str(tmp_path / "idx")}
    subprocess.run(["git", "read-tree", "HEAD"], cwd=repo, env=env,
                   check=True, capture_output=True)
    subprocess.run(["git", "add", "-f", "--", "exp/run7"], cwd=repo,
                   env=env, check=True, capture_output=True)
    tree = subprocess.run(["git", "write-tree"], cwd=repo, env=env,
                          capture_output=True, text=True,
                          check=True).stdout.strip()
    commit = subprocess.run(
        ["git", "commit-tree", tree, "-p", "HEAD", "-m", "tick"],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.strip()
    subprocess.run(["git", "update-ref", "refs/snapshots/run7", commit],
                   cwd=repo, check=True, capture_output=True)
    # the wipe
    import shutil

    shutil.rmtree(save_dir)

    fake = tmp_path / "fake_train.py"
    fake.write_text(
        "import sys\n"
        "assert '--resume' in sys.argv, 'must resume from restored state'\n"
        f"body = open({str(save_dir / 'state_last' / 'ckpt')!r}).read()\n"
        "assert body == 'resume-me', body\n"
        "sys.exit(0)\n"
    )
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "0",
            "--snapshot_git_s", "600", "--snapshot_repo", str(repo),
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "run7", "--save_dir", str(save_dir),
        ],
        capture_output=True, text=True, timeout=120, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "restored exp/run7 from refs/snapshots/run7" in out.stdout


def test_average_checkpoints(tmp_path):
    """SWA tool: leaf-wise mean of orbax params checkpoints; refuses
    structural mismatches; output loads through the normal eval path."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import average_checkpoints as avg

    from squeezedet_tpu.utils.checkpoint import load_params, save_params

    rng = np.random.default_rng(0)
    trees = []
    for i in range(3):
        t = {
            "stem": {"w": rng.normal(size=(3, 3, 3, 8)).astype(np.float32),
                     "b": rng.normal(size=(8,)).astype(np.float32)},
            "convdet": {"w": rng.normal(size=(3, 3, 8, 4)).astype(np.float32),
                        "b": rng.normal(size=(4,)).astype(np.float32)},
        }
        trees.append(t)
        save_params(str(tmp_path / f"model_{i}"), t, epoch=10 * (i + 1))

    out = str(tmp_path / "model_swa")
    avg.main([str(tmp_path / "model_0"), str(tmp_path / "model_1"),
              str(tmp_path / "model_2"), "--out", out])

    restored, epoch = load_params(out, trees[0])
    assert epoch == 30
    expect = np.mean(
        [t["stem"]["w"] for t in trees], axis=0, dtype=np.float64
    ).astype(np.float32)
    np.testing.assert_allclose(restored["stem"]["w"], expect, rtol=1e-6)
    expect_b = np.mean(
        [t["convdet"]["b"] for t in trees], axis=0, dtype=np.float64
    ).astype(np.float32)
    np.testing.assert_allclose(restored["convdet"]["b"], expect_b, rtol=1e-6)

    # shape mismatch -> refusal
    bad = {k: {kk: vv.copy() for kk, vv in v.items()} for k, v in trees[0].items()}
    bad["stem"]["w"] = np.zeros((3, 3, 3, 16), np.float32)
    save_params(str(tmp_path / "model_bad"), bad, epoch=1)
    with pytest.raises(SystemExit, match="shape|structure"):
        avg.main([str(tmp_path / "model_0"), str(tmp_path / "model_bad"),
                  "--out", str(tmp_path / "nope")])

    # fewer than two inputs -> refusal
    with pytest.raises(SystemExit, match="two"):
        avg.main([str(tmp_path / "model_0"), "--out", str(tmp_path / "nope2")])


def test_bench_ensure_backend_exits_on_wedge():
    """bench.py must exit crash-only (rc=14), never hang the round
    driver, when the relay wedges the backend-init RPC (bench runs
    standalone, outside main.py's init watchdog)."""
    import subprocess
    import sys

    code = (
        "import time, jax\n"
        "jax.devices = lambda: time.sleep(60)\n"
        "import bench\n"
        "bench._ensure_backend()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "SQDT_BENCH_RETRY": "5",
             "SQDT_BENCH_INIT_TIMEOUT_S": "0.3"},
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 14, proc.stderr
    assert "stalled" in proc.stderr


def test_seed_anchors_out_roundtrip(tmp_path):
    """--out writes a table that --anchor_seeds_file loads verbatim."""
    from squeezedet_tpu.config import Config
    from squeezedet_tpu.data.base import BaseDataset

    ds = FakeDataset(40)
    seeds = compute_seed_anchors(ds, anchors_per_grid=4, num_workers=2)
    path = tmp_path / "seeds.txt"
    np.savetxt(path, seeds, fmt="%d")  # the tool's --out format
    loaded = BaseDataset.load_anchor_seeds(
        Config(mode="eval", anchor_seeds_file=str(path)),
        default=np.zeros((9, 2), np.float32),
    )
    np.testing.assert_array_equal(loaded, seeds.astype(np.float32))


def test_train_supervisor_outage_cap_surfaces_deterministic_hang(tmp_path):
    """--max_outage_attempts bounds CONSECUTIVE rc=14 retries: a
    deterministic in-code hang that trips a watchdog on every fresh
    launch must eventually surface as a failure instead of looping
    forever (advisor finding, round 3)."""
    import subprocess
    import sys

    marker = tmp_path / "attempts.txt"
    fake = tmp_path / "fake_train.py"  # always the init wedge
    fake.write_text(
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(n + 1))\n"
        "sys.exit(14)\n"
    )
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "0", "--retry_delay_s", "0.02",
            "--outage_backoff_max_s", "0.05", "--max_outage_attempts", "4",
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "run6", "--save_dir", str(tmp_path / "exp" / "run6"),
        ],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 14, out.stdout + out.stderr
    # cap+1 launches: 4 counted outage attempts, the 5th trips the cap
    assert open(marker).read() == "5"
    assert "max_outage_attempts" in out.stdout
    assert "deterministic in-code hang" in out.stdout


def test_train_supervisor_waits_for_yield(tmp_path):
    """rc=15 (TPU-claim yield) pauses the supervisor until the requester's
    sentinel clears, then relaunches with --resume — never counted against
    the restart budget (utils/yieldfile.py handshake)."""
    import subprocess
    import sys

    state = tmp_path / "exp" / "runy" / "state_last"
    marker = tmp_path / "attempts.txt"
    fake = tmp_path / "fake_train.py"
    fake.write_text(
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(n + 1))\n"
        f"os.makedirs({str(state)!r}, exist_ok=True)\n"
        "if n == 0:\n"
        "    sys.exit(15)\n"  # yielded the claim
        "assert '--resume' in sys.argv, 'relaunch must pass --resume'\n"
        "sys.exit(0)\n"
    )
    # the "bench": a live process whose pid the sentinel records; when it
    # exits, yield_requested() treats the sentinel as stale and clears it.
    # Reap it from a thread the moment it dies — in production the bench
    # is not the supervisor's child, so it never lingers as a zombie
    # (a zombie pid still passes os.kill(pid, 0) and would wedge the wait).
    import threading

    holder = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(2)"])
    reaper = threading.Thread(target=holder.wait)
    reaper.start()
    yf = tmp_path / "yield"
    yf.write_text(str(holder.pid))
    out = subprocess.run(
        [
            sys.executable, "tools/train_supervisor.py",
            "--max_restarts", "0",  # any budget accounting would fail this
            "--retry_delay_s", "0.1",
            "--train_cmd", f"{sys.executable} {fake}",
            "--",
            "--exp_id", "runy", "--save_dir", str(tmp_path / "exp" / "runy"),
        ],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "SQDT_YIELD_FILE": str(yf)},
    )
    reaper.join()
    assert out.returncode == 0, out.stdout + out.stderr
    assert open(marker).read() == "2"
    assert "yielded the TPU claim" in out.stdout
    assert "yield cleared" in out.stdout
