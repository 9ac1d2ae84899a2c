"""Observability: structured per-stage timers, loss charts, rank-0 logging,
and jax.profiler hooks.

The reference has only tqdm bars and ad-hoc prints (SURVEY §5.1/5.5);
here tracing is first-class: `stage_timer` records wall times into a
shared registry, `profile_trace` wraps a block in a jax.profiler trace
viewable in TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

_TIMINGS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def stage_timer(name: str, sink: Optional[Dict[str, float]] = None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _TIMINGS[name].append(dt)
        if sink is not None:
            sink[name] = dt


def timing_summary() -> Dict[str, Dict[str, float]]:
    out = {}
    for name, vals in _TIMINGS.items():
        out[name] = {
            "count": len(vals),
            "total_s": sum(vals),
            "mean_s": sum(vals) / len(vals),
            "min_s": min(vals),
        }
    return out


def reset_timings():
    _TIMINGS.clear()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace around a block (xprof/TensorBoard viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def plot_loss_chart(save_path: str, *series: Tuple[str, List, List]) -> None:
    """PNG loss chart (ref:latentsync/utils/util.py:263-276)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    for name, xs, ys in series:
        plt.plot(xs, ys, label=name)
    plt.xlabel("Step")
    plt.ylabel("Loss")
    plt.legend()
    plt.savefig(save_path)
    plt.close()


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def log_main(message: str) -> None:
    """rank-0-only print (ref:util.py:226-233)."""
    if is_main_process():
        print(f"### {message}")


def write_metrics(path: str, metrics: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(metrics) + "\n")
