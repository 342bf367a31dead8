"""Multiprocess prefetching data loader (the DataLoader analog).

The reference leans on torch DataLoader workers to hide its heavy
__getitem__ (codec subprocesses etc. — SURVEY §7 'CPU data pipeline
throughput'). Here: worker processes run Dataset.__getitem__ over an index
queue and a collator thread assembles ready batches, keeping `prefetch`
batches in flight so the TPU step never waits on the host.
"""
from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


def _worker_loop(dataset, index_q, result_q, seed: int):
    np.random.seed(seed)
    import random as _random

    _random.seed(seed + 1)
    while True:
        item = index_q.get()
        if item is None:
            break
        batch_id, idx = item
        try:
            result_q.put((batch_id, idx, dataset[idx]))
        except Exception as e:  # keep the pipeline alive; report the item
            result_q.put((batch_id, idx, e))


class DataLoader:
    """Map-style dataset -> iterator of collated batches.

    num_workers=0 runs in-process (tests, debugging)."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 0,
        collate_fn: Optional[Callable[[List[Dict]], Dict]] = None,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        mp_context: str = "spawn",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.collate_fn = collate_fn or (lambda xs: xs)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = max(prefetch, 1)
        # spawn (not fork): the parent has usually initialized JAX by the
        # time the first epoch starts, and forking a multithreaded JAX
        # process can deadlock the child. Spawned workers start clean and
        # import the dataset module once; they are long-lived, so the
        # startup cost amortizes over the epoch.
        self.mp_context = mp_context
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self) -> List[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        bs = self.batch_size
        batches = [order[i : i + bs].tolist() for i in range(0, len(order), bs)]
        if self.drop_last and batches and len(batches[-1]) < bs:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict]:
        self._epoch += 1
        batches = self._batches()
        if self.num_workers == 0:
            for batch in batches:
                yield self.collate_fn([self.dataset[i] for i in batch])
            return

        ctx = mp.get_context(self.mp_context)
        index_q: mp.Queue = ctx.Queue()
        result_q: mp.Queue = ctx.Queue(maxsize=self.prefetch * self.batch_size * 2)
        workers = [
            ctx.Process(
                target=_worker_loop,
                args=(self.dataset, index_q, result_q, self.seed + self._epoch * 1000 + w),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for w in workers:
            w.start()

        try:
            # enqueue all work up front (indices are tiny)
            for bid, batch in enumerate(batches):
                for i in batch:
                    index_q.put((bid, i))
            pending: Dict[int, Dict[int, Dict]] = {}
            next_bid = 0
            received = 0
            total = sum(len(b) for b in batches)
            while next_bid < len(batches):
                while received < total and (
                    next_bid not in pending
                    or len(pending[next_bid]) < len(batches[next_bid])
                ):
                    bid, idx, item = result_q.get()
                    if isinstance(item, Exception):
                        raise RuntimeError(f"worker failed on index {idx}") from item
                    pending.setdefault(bid, {})[idx] = item
                    received += 1
                ready = pending.pop(next_bid)
                order = batches[next_bid]
                yield self.collate_fn([ready[i] for i in order])
                next_bid += 1
        finally:
            for _ in workers:
                index_q.put(None)
            for w in workers:
                w.join(timeout=2)
                if w.is_alive():
                    w.terminate()
