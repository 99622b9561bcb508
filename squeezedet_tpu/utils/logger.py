"""Experiment logger: config dump, append-only log, metric curves, bests.

Same observable surface as the reference logger (src/utils/logger.py:10-96):
``config.txt`` with library versions and argv, a timestamped ``logs_*`` dir,
``log.txt`` appender, per-metric train/val PNG curves (matplotlib, gated),
and best-epoch reporting.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import sys
import time

import numpy as np


class Logger:
    def __init__(self, cfg):
        os.makedirs(cfg.save_dir, exist_ok=True)

        import jax

        config_path = os.path.join(cfg.save_dir, "config.txt")
        with open(config_path, "w") as fp:
            fp.write(f"jax version: {jax.__version__}\n")
            fp.write(f"backend: {jax.default_backend()}\n")
            fp.write(f"devices: {[str(d) for d in jax.devices()]}\n")
            fp.write(f"cmd: {sys.argv}\n\nconfig:\n")
            fp.write(cfg.describe() + "\n")

        self.log_dir = os.path.join(
            cfg.save_dir, "logs_" + time.strftime("%Y-%m-%d-%H-%M")
        )
        os.makedirs(self.log_dir, exist_ok=True)
        shutil.copy(config_path, self.log_dir)

        self.metrics_history: dict[int, dict[str, dict[str, float]]] = {}

    def write(self, text: str) -> None:
        print(text)
        stamp = time.strftime("%Y-%m-%d-%H-%M")
        with open(os.path.join(self.log_dir, "log.txt"), "a") as fp:
            fp.write(f"{stamp}: {text}\n")

    def update(self, metrics: dict[str, float], phase: str, epoch: int) -> None:
        history = self.metrics_history.setdefault(epoch, {}).setdefault(phase, {})
        parts = [f"epoch {epoch:<3d} {phase:<5s}"]
        for metric, value in metrics.items():
            history[metric] = float(value)
            if "time" in metric:
                parts.append(f"| {metric} {value:.2f}min")
            elif metric == "lr":
                parts.append(f"| lr {value:.2e}")  # decayed lrs underflow .3f
            else:
                parts.append(f"| {metric} {value:.3f}")
        self.write(" ".join(parts))

    def _series(self, metric: str, phase: str):
        xs, ys = [], []
        for epoch in sorted(self.metrics_history):
            v = self.metrics_history[epoch].get(phase, {})
            if metric in v:
                xs.append(epoch)
                ys.append(v[metric])
        return xs, ys

    def plot(self, metrics: list[str]) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # pragma: no cover - matplotlib optional
            return

        for metric in metrics:
            plt.figure(figsize=(9, 6), dpi=100)
            for phase in ("train", "val"):
                xs, ys = self._series(metric, phase)
                if xs:
                    plt.plot(xs, ys, label=phase)
            plt.xlabel("epoch")
            plt.ylabel(metric)
            plt.grid()
            plt.legend()
            plt.savefig(os.path.join(self.log_dir, metric + ".png"))
            plt.close()

    def print_bests(self, metrics: list[str]) -> None:
        for metric in metrics:
            xs, ys = self._series(metric, "val")
            if not ys:
                continue
            pick = int(np.argmin(ys) if "loss" in metric else np.argmax(ys))
            print(f"Best {metric}: {ys[pick]:.3f} (epoch {xs[pick]})")
