"""Data-loading infrastructure (basicsr/torch DataLoader parity,
TPU-host idiomatic).

- `EnlargedSampler` — re-derivation of ref:basicsr/data/data_sampler.py:
  enlarges a dataset by `ratio` so epoch boundaries don't force restarts
  of iteration-oriented training, with per-epoch seeded shuffling and
  per-host sharding (torch DistributedSampler semantics: rank r takes
  indices r::world).
- `Prefetcher` — host-side analogue of basicsr's CPU/CUDAPrefetcher
  (ref:basicsr/data/prefetch_dataloader.py): a daemon thread keeps a
  bounded queue of ready batches, `jax.device_put` overlaps H2D with
  compute (replaces cuda-stream prefetch).
- `BackgroundGenerator`-style iteration for any sample iterable.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class EnlargedSampler:
    """Sharded, epoch-seeded index sampler over `num_samples` items,
    virtually enlarged `ratio`× (ref:basicsr/data/data_sampler.py:8-54)."""

    def __init__(self, num_samples: int, world_size: int = 1, rank: int = 0,
                 ratio: int = 1, shuffle: bool = True, seed: int = 0):
        if not 0 <= rank < world_size:
            raise ValueError(f"rank {rank} out of range for world {world_size}")
        self.num_samples = num_samples
        self.world_size = world_size
        self.rank = rank
        self.total = int(np.ceil(num_samples * ratio / world_size)) * world_size
        self.per_rank = self.total // world_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.per_rank

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(self.total)
        else:
            order = np.arange(self.total)
        indices = order % self.num_samples
        return iter(indices[self.rank :: self.world_size].tolist())


class Prefetcher:
    """Bounded background prefetch of batches from `make_batch(idx)`.

    `device_put` (optional) moves each batch to device inside the worker
    thread so the H2D transfer overlaps the previous step's compute —
    the TPU-host equivalent of basicsr's CUDAPrefetcher side stream."""

    _DONE = object()

    def __init__(
        self,
        index_iter: Iterator,
        make_batch: Callable,
        depth: int = 2,
        device_put: bool = False,
    ):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._device_put = device_put
        self._thread = threading.Thread(
            target=self._run, args=(index_iter, make_batch), daemon=True
        )
        self._thread.start()

    def _run(self, index_iter, make_batch):
        try:
            for idx in index_iter:
                batch = make_batch(idx)
                if self._device_put:
                    import jax

                    batch = jax.device_put(batch)
                self._q.put(batch)
        except BaseException as e:  # surfaced on next __next__
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def batched_indices(sampler: Sequence[int] | Iterator[int], batch_size: int,
                    drop_last: bool = True) -> Iterator[list]:
    """Group a sampler's indices into batch-sized lists."""
    buf: list = []
    for i in sampler:
        buf.append(i)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf and not drop_last:
        yield buf
