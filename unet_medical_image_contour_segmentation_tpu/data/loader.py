"""Batched, multi-worker, device-prefetching input pipeline.

TPU-native replacement for the reference's
``DataLoader(num_workers=os.cpu_count(), pin_memory=True)`` (``train.py:56``):
a thread pool decodes/augments samples (PIL + numpy release the GIL), batches
are collated NHWC, and a one-deep background prefetcher overlaps
``jax.device_put`` (and host->HBM DMA) with the device step, so input never
sits on the critical path.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np

__all__ = ["DataLoader", "prefetch_to_device"]


class DataLoader:
    """Minimal epoch iterator over an indexable dataset of dict samples."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        process_slice=None,
    ):
        """``process_slice``: on a multi-host mesh, this host's row range of
        every (globally-ordered) batch — the host decodes only its own rows
        (SURVEY.md §2.7 per-host data loading).  The shuffle order is seeded,
        so all hosts agree on the global batch composition without talking."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.process_slice = process_slice
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        n_batches = len(self)
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            for b in range(n_batches):
                idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                if self.process_slice is not None:
                    idxs = idxs[self.process_slice]
                samples = list(ex.map(self.dataset.__getitem__, idxs))
                yield {
                    k: np.stack([s[k] for s in samples], axis=0)
                    for k in samples[0]
                }


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Background-thread device_put prefetcher.

    Keeps up to ``size`` batches in flight on device so the host input
    pipeline runs ahead of the training step (the reference's pin_memory +
    worker-process analogue, minus the processes).  ``sharding`` (a
    ``jax.sharding.Sharding``) places batches directly into their
    data-parallel layout.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for batch in iterator:
                # single-channel images go to the device rank-3: a (B,H,W,1)
                # program input is lane-padded 128x in TPU HBM; (B,H,W) is
                # dense.  The models re-expand the channel dim inside jit.
                if "image" in batch and batch["image"].ndim == 4 and batch["image"].shape[-1] == 1:
                    batch = dict(batch, image=batch["image"][..., 0])
                if sharding is not None and not sharding.is_fully_addressable:
                    # multi-host: this process holds only its local rows;
                    # assemble the global batch-sharded Array in place
                    from ..parallel.distributed import assemble_global_batch

                    batch = assemble_global_batch(batch, sharding)
                elif sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        except BaseException as e:  # propagate into the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
