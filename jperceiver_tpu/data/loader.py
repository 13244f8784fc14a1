"""Multi-threaded prefetching data loader with per-host sharding.

Replaces the reference's torch DataLoader + epoch-seeded
`DistributedGroupSampler` (`mono/datasets/loader/build_loader.py:18-54`,
`sampler.py:16-163`): each JAX process takes a rank-strided shard of an
epoch-seeded permutation (same determinism contract), worker threads decode
images (PIL releases the GIL), and a bounded queue keeps batches ready so
the TPU never waits on the host. Pads the index list to a multiple of the
global batch (`sampler.py:31-36` semantics) and drops the last partial
batch (`build_loader.py` drop_last=True).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        global_batch = self.batch_size * self.process_count
        if self.drop_last:
            usable = (n // global_batch) * global_batch
            idx = idx[:usable]
        else:
            # Pad to a multiple of the global batch with wrap-around
            # repeats (`sampler.py:31-36` semantics); np.resize wraps, so
            # this is correct even when the pad exceeds the dataset size.
            pad = (-n) % global_batch
            if pad:
                idx = np.resize(idx, n + pad)
        # Rank-strided shard (`sampler.py:37-39`).
        return idx[self.process_index :: self.process_count]

    def __len__(self) -> int:
        return len(self._epoch_indices()) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        n_batches = len(indices) // self.batch_size
        sample_q: queue.Queue = queue.Queue(maxsize=self.prefetch * self.batch_size)
        results: dict[int, dict] = {}
        results_lock = threading.Lock()
        todo = queue.Queue()
        for pos, ds_idx in enumerate(indices[: n_batches * self.batch_size]):
            todo.put((pos, int(ds_idx)))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    pos, ds_idx = todo.get_nowait()
                except queue.Empty:
                    return
                sample = self.dataset[ds_idx]
                with results_lock:
                    results[pos] = sample
                sample_q.put(pos)

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        try:
            next_pos = 0
            ready: set[int] = set()
            for _ in range(n_batches):
                batch_samples = []
                while len(batch_samples) < self.batch_size:
                    while next_pos not in ready:
                        ready.add(sample_q.get())
                    with results_lock:
                        batch_samples.append(results.pop(next_pos))
                    ready.discard(next_pos)
                    next_pos += 1
                yield collate(batch_samples)
        finally:
            stop.set()
        self.epoch += 1
