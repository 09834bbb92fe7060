"""Host input pipeline.

Replaces torch DataLoader + DistributedSampler + worker processes (reference
tools/train_classification_model.py:74-94). Multi-host sharding comes from
`jax.process_index()`; within a host we use a background thread pool (cv2 and
numpy release the GIL) and a prefetch queue so augmentation overlaps device
steps. Batches are host-global; the engine lays them onto the mesh.

Seeding parity: `set_epoch`-style determinism via per-epoch reshuffle keyed on
(seed, epoch) (reference DistributedSampler.set_epoch, scripts loop :191).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np

import jax


# process-mode worker state (set by fork; never touches jax in the child)
_WORKER_DS = None
_WORKER_COLLATE = None


def _proc_init(ds, collate):
    global _WORKER_DS, _WORKER_COLLATE
    _WORKER_DS, _WORKER_COLLATE = ds, collate


def _proc_fetch_batch(idxs):
    return _WORKER_COLLATE([_WORKER_DS[int(i)] for i in idxs])


class DataLoader:

    def __init__(self, dataset, batch_size: int, collater: Callable,
                 shuffle: bool = True, drop_last: bool = True,
                 num_workers: int = 4, seed: int = 0, prefetch: int = 4,
                 worker_mode: str = "thread"):
        """worker_mode: "thread" (default — right when the per-sample work
        releases the GIL: cv2, numpy, native JPEG decode) or "process"
        (fork-based worker pool, one collated batch per task — right for
        GIL-bound python/PIL augmentation like AutoAugment, where threads
        serialise; measured 10x+ loader throughput in bench_all's
        input-pipeline benchmark). Process workers never touch jax."""
        self.dataset = dataset
        self.global_batch_size = batch_size
        self.collater = collater
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.prefetch = prefetch
        self.worker_mode = worker_mode
        assert worker_mode in ("thread", "process"), worker_mode
        self.epoch = 0

        n_proc = jax.process_count()
        assert batch_size % n_proc == 0, (batch_size, n_proc)
        self.local_batch_size = batch_size // n_proc

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // jax.process_count()
        if self.drop_last:
            return n // self.local_batch_size
        return (n + self.local_batch_size - 1) // self.local_batch_size

    def _local_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # contiguous per-process shard (same semantics as DistributedSampler:
        # every process sees disjoint data, together covering the epoch)
        pid, np_ = jax.process_index(), jax.process_count()
        per = n // np_
        return order[pid * per:(pid + 1) * per]

    def _iter_process(self, indices, bs, n_batches) -> Iterator:
        """Fork-pool iteration: one task = one collated batch. Bounded
        in-flight via a semaphore so result memory stays capped at
        ~(prefetch + workers) batches; worker exceptions re-raise in the
        consumer through imap."""
        import multiprocessing as mp
        ctx = mp.get_context("fork")
        sem = threading.Semaphore(self.prefetch + self.num_workers)
        stop = threading.Event()

        def tasks():
            # n_batches (= len(self)) already counts the remainder batch
            # when drop_last=False
            for b in range(n_batches):
                while not stop.is_set():
                    if sem.acquire(timeout=0.05):
                        break
                else:
                    return
                if stop.is_set():
                    return
                yield list(indices[b * bs:min((b + 1) * bs, len(indices))])

        pool = ctx.Pool(self.num_workers, initializer=_proc_init,
                        initargs=(self.dataset, self.collater))
        try:
            for batch in pool.imap(_proc_fetch_batch, tasks()):
                sem.release()
                yield batch
        finally:
            stop.set()
            pool.terminate()
            pool.join()

    def __iter__(self) -> Iterator:
        indices = self._local_indices()
        bs = self.local_batch_size
        n_batches = len(self)
        n_samples = n_batches * bs if self.drop_last else len(indices)
        if self.worker_mode == "process":
            yield from self._iter_process(indices, bs, n_batches)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_stoppable(obj):
            """Blocking put that gives up once the consumer has stopped
            (stop set) — never deadlocks on a full queue with no reader."""
            while not stop.is_set():
                try:
                    q.put(obj, timeout=0.05)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            """Per-sample futures with a BOUNDED in-flight window — all
            workers cooperate on the next batches, and memory is capped at
            (window samples + prefetch collated batches) regardless of epoch
            length (the round-1 version submitted the whole epoch up front).
            A dataset/collater exception is forwarded to the consumer (and
            re-raised there); the end-of-epoch sentinel is ALWAYS delivered
            or provably unneeded (consumer already stopped), so the main
            thread can never hang in q.get()."""
            from collections import deque
            err = None
            try:
                window = self.num_workers + bs * max(self.prefetch, 1)
                with ThreadPoolExecutor(self.num_workers) as pool:
                    inflight: deque = deque()
                    next_i = 0
                    cur = []
                    done = 0
                    while done < n_samples and not stop.is_set():
                        while next_i < n_samples and len(inflight) < window:
                            inflight.append(
                                pool.submit(self.dataset.__getitem__,
                                            int(indices[next_i])))
                            next_i += 1
                        cur.append(inflight.popleft().result())
                        done += 1
                        if len(cur) == bs:
                            put_stoppable(self.collater(cur))
                            cur = []
                    if cur and not self.drop_last and not stop.is_set():
                        put_stoppable(self.collater(cur))
                    for f in inflight:
                        f.cancel()
            except Exception as e:  # noqa: BLE001 — forwarded to consumer
                err = e
            put_stoppable(err if err is not None else StopIteration)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is StopIteration:
                    break
                if isinstance(item, Exception):
                    raise item
                if item is not None:
                    yield item
        finally:
            stop.set()
            # drain so the producer can observe `stop` and exit
            while True:
                try:
                    if q.get_nowait() is StopIteration:
                        break
                except queue.Empty:
                    break
