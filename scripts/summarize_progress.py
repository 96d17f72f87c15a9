#!/usr/bin/env python
"""Summarize a (possibly partial) harness progress JSONL into the standard
eval_suite summary metrics.

`harness.evaluate_policy(progress_file=...)` fsyncs per-batch episode
stats exactly so a worker kill or a round deadline cannot lose a prefix
of a long suite; this reads that prefix back and reports the same
summary dict the finished run would have printed (over however many
cases completed), so partial rows are reportable with their true
denominator instead of being discarded.
"""
import argparse
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("progress_file")
    p.add_argument("--time_limit", type=float, default=30.0)
    p.add_argument("--scenario", default="hallway_bottleneck")
    args = p.parse_args()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from sicnav_tpu import harness
    from sicnav_tpu.env.types import EnvConfig
    import jax

    completed = harness._load_progress(args.progress_file)
    if not completed:
        print(json.dumps({"num_cases": 0}))
        return
    parts = [completed[k] for k in sorted(completed)]
    stats = jax.tree.map(
        lambda *xs: np.concatenate([np.atleast_1d(x) for x in xs]), *parts)
    cfg = EnvConfig(scenario=args.scenario, time_limit=args.time_limit)
    out = harness.summarize(stats, cfg)
    out["num_cases"] = int(np.atleast_1d(stats.success).shape[0])
    out["batches"] = sorted(completed)
    print(json.dumps({k: (v if isinstance(v, (int, list)) else float(v))
                      for k, v in out.items()}, indent=2))


if __name__ == "__main__":
    main()
