"""Continuous window batching for multi-clip serving.

The reference serializes whole requests behind a Semaphore(1)
(ref:scripts/api.py:24-27) — one clip owns the GPU end-to-end. Here the
unit of scheduling is a 16-frame WINDOW, not a clip: windows from
concurrent clips are aggregated into fixed-size denoise batches (the
same shape-bucketed program the single-clip path compiles), so a v5e
mesh stays saturated across short overlapping requests — BASELINE
config 5's "concurrent 5-10s clips continuous-batched".

Design: producers enqueue WorkItems (one per window, already holding the
per-window latent/audio tensors); the scheduler thread drains up to
`max_windows` items, stacks them into one device call, and delivers
results to per-item futures. Item order within a clip is irrelevant —
windows are independent (see pipelines/lipsync.py rationale).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np


@dataclass
class WindowItem:
    inputs: Dict[str, np.ndarray]  # per-window arrays, identical shapes
    future: Future = field(default_factory=Future)


class WindowBatcher:
    """Continuous batcher around a batched window function.

    batch_fn(stacked: Dict[str, np.ndarray]) -> np.ndarray with a leading
    window axis; max_windows matches the compiled bucket size.
    """

    def __init__(self, batch_fn: Callable[[Dict[str, np.ndarray]], np.ndarray],
                 max_windows: int = 2, max_wait_ms: float = 5.0):
        self.batch_fn = batch_fn
        self.max_windows = max_windows
        self.max_wait = max_wait_ms / 1000.0
        self.queue: "queue.Queue[WindowItem]" = queue.Queue()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, inputs: Dict[str, np.ndarray]) -> Future:
        item = WindowItem(inputs)
        self.queue.put(item)
        return item.future

    def submit_clip(self, per_window_inputs: List[Dict[str, np.ndarray]]) -> List[Future]:
        return [self.submit(w) for w in per_window_inputs]

    def _collect(self) -> List[WindowItem]:
        items = [self.queue.get()]
        deadline = self.max_wait
        import time

        t0 = time.monotonic()
        while len(items) < self.max_windows:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                items.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _loop(self):
        while not self._stop.is_set():
            try:
                items = self._collect()
            except Exception:  # pragma: no cover
                continue
            n = len(items)
            pad = self.max_windows - n
            stacked = {}
            for key in items[0].inputs:
                arrs = [it.inputs[key] for it in items]
                if pad:
                    arrs += [arrs[-1]] * pad  # bucket fill
                stacked[key] = np.stack(arrs)
            try:
                out = np.asarray(self.batch_fn(stacked))
                for i, item in enumerate(items):
                    item.future.set_result(out[i])
            except Exception as e:  # noqa: BLE001 — propagate per item
                for item in items:
                    if not item.future.done():
                        item.future.set_exception(e)

    def close(self):
        self._stop.set()


def make_denoise_batch_fn(pipeline, num_steps: int = 20, guidance: float = 1.5):
    """Adapter: LipsyncPipeline's jitted denoise → WindowBatcher batch_fn."""
    import jax.numpy as jnp

    denoise = pipeline._denoise_fn(num_steps, guidance, guidance > 1.0)

    def batch_fn(stacked):
        return denoise(
            pipeline.unet_params,
            jnp.asarray(stacked["latents0"]),
            jnp.asarray(stacked["mask"]),
            jnp.asarray(stacked["masked"]),
            jnp.asarray(stacked["ref"]),
            jnp.asarray(stacked["audio"]),
        )

    return batch_fn
