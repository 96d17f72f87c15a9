"""Training/eval metrics logging.

Replaces the reference's tensorboardX writers (mid.py:14,1154) and the SB3
CustomCallback per-episode event rates (RL_nav/SB3_Support/callbacks.py:62-77)
with a dependency-free JSONL writer plus the same episode-rate aggregation.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricsLogger:
    """Append-only JSONL metrics stream (one dict per step/epoch), with
    optional tensorboard event files (``tensorboard=True``) in the same
    format the reference's tensorboardX writers produce — so existing
    TB dashboards keep working."""

    def __init__(self, log_dir: str, name: str = "metrics",
                 tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")
        self.t0 = time.time()
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:  # torch TB backend unavailable: JSONL only
                self._tb = None

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "wall_s": round(time.time() - self.t0, 2)}
        for k, v in scalars.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
            if self._tb is not None and isinstance(rec[k], float):
                self._tb.add_scalar(k, rec[k], int(step))
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def episode_event_rates(stats) -> Dict[str, float]:
    """Per-episode event-occurrence rates from EpisodeStats (the quantities
    CustomCallback tensorboards: Collision/Frozen/Danger/... per episode)."""
    steps = np.maximum(np.asarray(stats.steps, np.float64), 1.0)
    return {
        "rate/success": float(np.mean(stats.success)),
        "rate/timeout": float(np.mean(stats.timeout)),
        "rate/collision": float(np.mean(np.asarray(stats.collision_steps) > 0)),
        "rate/wall_collision": float(np.mean(np.asarray(stats.wall_collision_steps) > 0)),
        "rate/frozen": float(np.mean(np.asarray(stats.frozen_steps) > 0)),
        "rate/danger": float(np.mean(np.asarray(stats.danger_steps) > 0)),
        "freq/collision_steps": float(np.mean(stats.collision_steps / steps)),
        "freq/danger_steps": float(np.mean(stats.danger_steps / steps)),
        "mean/nav_time": float(np.mean(stats.nav_time)),
        "mean/total_reward": float(np.mean(stats.total_reward)),
    }
