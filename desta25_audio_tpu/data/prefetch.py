"""Prefetching data loader: thread-pool collation + batch pipeline.

The reference relies on torch DataLoader worker *processes* for its
CPU-bound collate (audio decode + STFT inside BaseCollateFn,
simple_dataset.py:139-243).  Here the heavy lifting is GIL-free (native C++
decode/resample; mel runs on device), so a thread pool suffices: N worker
threads run collate on item buckets while the device executes the previous
step, and a bounded queue applies backpressure.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

from .dataset import AudioTextDataset, CollateFn


class PrefetchLoader:
    """Iterable over collated batches with background workers.

    depth: max batches buffered ahead of the consumer.
    """

    def __init__(self, dataset: AudioTextDataset, collate: CollateFn,
                 batch_size: int, epoch: int = 0, num_workers: int = 4,
                 depth: int = 4, drop_last: bool = True):
        self.dataset = dataset
        self.collate = collate
        self.batch_size = batch_size
        self.epoch = epoch
        self.num_workers = max(num_workers, 1)
        self.depth = depth
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        item_q: "queue.Queue" = queue.Queue(maxsize=self.depth * 2)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        seq_lock = threading.Lock()
        results: Dict[int, Dict[str, Any]] = {}
        next_emit = [0]

        def producer():
            buf: List[Dict[str, Any]] = []
            seq = 0
            for item in self.dataset.iter_valid(self.epoch):
                if stop.is_set():
                    return
                buf.append(item)
                if len(buf) == self.batch_size:
                    item_q.put((seq, buf))
                    seq += 1
                    buf = []
            if buf and not self.drop_last:
                item_q.put((seq, buf))
                seq += 1
            for _ in range(self.num_workers):
                item_q.put(None)

        def worker():
            while not stop.is_set():
                task = item_q.get()
                if task is None:
                    out_q.put(None)
                    return
                seq, items = task
                batch = self.collate(items)
                # in-order emission so training stays deterministic
                with seq_lock:
                    results[seq] = batch
                    while next_emit[0] in results:
                        out_q.put((next_emit[0],
                                   results.pop(next_emit[0])))
                        next_emit[0] += 1

        threads = [threading.Thread(target=producer, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        finished_workers = 0
        try:
            while finished_workers < self.num_workers:
                got = out_q.get()
                if got is None:
                    finished_workers += 1
                    continue
                _, batch = got
                yield batch
            # drain any stragglers emitted between worker exits
            while True:
                try:
                    got = out_q.get_nowait()
                except queue.Empty:
                    break
                if got is not None:
                    yield got[1]
        finally:
            stop.set()
