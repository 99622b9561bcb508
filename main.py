#!/usr/bin/env python
"""SqueezeDet-TPU CLI: ``python main.py {train|eval|demo|pretrain|serve|bench}``.

Flag-compatible with the reference CLI (src/main.py:5-18,
src/utils/config.py:9-85) plus TPU-specific options; see
``python main.py train --help``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from squeezedet_tpu.config import parse
from squeezedet_tpu.utils.misc import init_env


def run() -> None:
    cfg = parse()
    init_env(cfg)

    from squeezedet_tpu.utils.cache import enable_compilation_cache
    from squeezedet_tpu.utils.misc import guarded_backend_init

    enable_compilation_cache()
    # Backend init can wedge like any other relay RPC; guard it before any
    # mode touches a device. Normal init is seconds; reuse the dispatch
    # watchdog flag (0 disables) with a tighter ceiling.
    timeout_s = float(getattr(cfg, "dispatch_timeout_s", 600.0))
    guarded_backend_init(min(180.0, timeout_s) if timeout_s > 0 else 0.0)
    print("results dir:", cfg.save_dir)

    if cfg.mode == "train":
        from squeezedet_tpu.train import train

        train(cfg)
    elif cfg.mode == "eval":
        from squeezedet_tpu.eval import evaluate

        evaluate(cfg)
    elif cfg.mode == "demo":
        from squeezedet_tpu.demo import demo

        demo(cfg)
    elif cfg.mode == "pretrain":
        from squeezedet_tpu.pretrain import pretrain

        pretrain(cfg)
    elif cfg.mode == "serve":
        from squeezedet_tpu.serve import serve

        serve(cfg)
    elif cfg.mode == "bench":
        import bench

        bench.main()
    else:
        raise ValueError(f"invalid mode: {cfg.mode}")


if __name__ == "__main__":
    try:
        run()
    except SystemExit as e:
        # deliberate exits (e.g. the TPU-claim yield, rc=15) keep their
        # code but still leave crash-only: any non-daemon relay thread
        # would otherwise block interpreter shutdown and turn a clean
        # yield into a hang the supervisor cannot distinguish
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(e.code if isinstance(e.code, int) else 0)
    except Exception:
        # crash-only exit: print the error and leave via os._exit so a
        # wedged TPU-relay RPC (whose thread/destructor would block a
        # normal interpreter shutdown — observed in production) can never
        # turn a failed run into a hung one. The supervisor
        # (tools/train_supervisor.py) relies on the process dying.
        import traceback

        traceback.print_exc()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(13)
