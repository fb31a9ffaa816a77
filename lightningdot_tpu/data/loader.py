"""Batching, task mixing, and device prefetch.

Replaces torch DataLoader + uniter_model/data/loader.py:

  * :class:`DataLoader` — index shuffling + collate with a background-thread
    prefetch queue (the host-side half of PrefetchLoader).
  * :class:`DevicePrefetcher` — double-buffered ``jax.device_put``: batch
    N+1 is transferred while batch N computes (TPU equivalent of the CUDA
    side-stream copy, loader.py:83-138).
  * :class:`MetaLoader` — multi-task round-robin with per-task mix ratios
    (loader.py:13-53). Task choice uses a *seeded* RNG shared by
    construction across hosts, replacing the ``any_broadcast`` sync
    (loader.py:39-43): same seed -> same task sequence on every host, no
    collective needed.
  * :class:`TokenBucketSampler` — token-budget batching
    (uniter_model/data/sampler.py:11-56 semantics).
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence



class TokenBucketSampler:
    """sampler.py:11-56: shuffle -> bucket -> sort by len -> fill to budget."""

    def __init__(self, lens: Sequence[int], bucket_size: int, batch_size: int,
                 droplast: bool = False, size_multiple: int = 8,
                 seed: Optional[int] = None):
        self._lens = lens
        self._max_tok = batch_size
        self._bucket_size = bucket_size
        self._droplast = droplast
        self._size_mul = size_multiple
        self._rng = random.Random(seed)

    def __iter__(self) -> Iterator[List[int]]:
        ids = list(range(len(self._lens)))
        self._rng.shuffle(ids)
        buckets = [sorted(ids[i:i + self._bucket_size],
                          key=lambda i: self._lens[i], reverse=True)
                   for i in range(0, len(ids), self._bucket_size)]
        batches = []
        for bucket in buckets:
            max_len = 0
            batch_indices: List[int] = []
            for st in range(0, len(bucket), self._size_mul):
                indices = bucket[st:st + self._size_mul]
                max_len = max(max_len, max(self._lens[i] for i in indices))
                if (max_len * (len(batch_indices) + self._size_mul)
                        > self._max_tok):
                    if not batch_indices:
                        raise ValueError(
                            "max_tokens too small / max_seq_len too long")
                    batches.append(batch_indices)
                    batch_indices = list(indices)
                else:
                    batch_indices.extend(indices)
            if not self._droplast and batch_indices:
                batches.append(batch_indices)
        self._rng.shuffle(batches)
        return iter(batches)


class DistributedSampler:
    """Epoch-seeded per-rank batch sampler (uniter sampler.py:59-116).

    Mostly superseded by TxtTokDb's strided id sharding, but provided for
    datasets that are not rank-sharded at the DB level. Matching the
    reference: the FULL index list is shuffled with an epoch-seeded RNG
    before the rank partition, so examples redistribute across replicas
    every epoch; wrap-around padding repeats until every rank has
    ``num_samples`` indices.
    """

    def __init__(self, dataset_len: int, num_replicas: int, rank: int,
                 batch_size: int = 1, shuffle: bool = True,
                 drop_last: bool = False, seed: int = 0):
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        # callers MUST call set_epoch(e) each epoch or every epoch reuses
        # the same permutation (torch.DistributedSampler contract)
        self.epoch = 0
        self.num_samples = -(-dataset_len // num_replicas)
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self):
        if self.drop_last:
            return self.num_samples // self.batch_size
        return -(-self.num_samples // self.batch_size)

    def __iter__(self):
        indices = list(range(self.dataset_len))
        if self.shuffle:
            # shuffle BEFORE partitioning (sampler.py:93-107 semantics);
            # seed+epoch like torch's sampler so args.seed matters
            random.Random(self.seed + self.epoch).shuffle(indices)
        while len(indices) < self.total_size:
            indices += indices[:self.total_size - len(indices)]
        indices = indices[self.rank:self.total_size:self.num_replicas]
        assert len(indices) == self.num_samples
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk


class DataLoader:
    """Minimal map-style loader: sampler/batching + threaded collate."""

    def __init__(self, dataset, batch_size: Optional[int] = None,
                 shuffle: bool = False, drop_last: bool = False,
                 collate_fn: Callable = None, sampler=None,
                 seed: Optional[int] = None, prefetch: int = 2,
                 on_epoch: Optional[Callable] = None,
                 num_workers: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or (lambda x: x)
        self.sampler = sampler
        self._rng = random.Random(seed)
        # queue.Queue treats maxsize<=0 as UNBOUNDED — clamp so
        # prefetch=0 cannot silently collate the whole epoch ahead
        self._prefetch = max(1, prefetch)
        # >1: N threads each fetch+collate WHOLE batches concurrently; the
        # consumer reorders by sequence number, so batch order is identical
        # to num_workers=1. Items of one batch stay on one thread. Only use
        # with datasets whose __getitem__ is deterministic (the ITM
        # fine-tune datasets pre-sample their epoch; the pre-train datasets
        # draw masks from a shared rng in __getitem__ and must keep
        # num_workers=1). numpy/ldkv release the GIL, so collate threads
        # genuinely overlap.
        self.num_workers = num_workers
        # called at the start of every epoch (TokenBucketSamplerForItm's
        # new_epoch hook, dvl/data/itm_pre.py:20-29)
        self._on_epoch = on_epoch

    def _batches(self) -> Iterator[List[int]]:
        if self.sampler is not None:
            yield from iter(self.sampler)
            return
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                continue
            yield chunk

    def __len__(self) -> int:
        if self.sampler is not None:
            try:
                return len(self.sampler)
            except (TypeError, ValueError):
                raise ValueError(
                    "length unknown with a token-bucket sampler")
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        if self._on_epoch is not None:
            self._on_epoch()
        # num_workers=1 runs the same pipeline with one worker thread:
        # identical ordering and single-threaded __getitem__ semantics
        # (a bespoke single-worker path previously duplicated the
        # bounded-put / stop-event / error protocol with drift hazards)
        yield from self._iter_multi(max(1, self.num_workers))

    def _iter_multi(self, n_workers: int):
        """Order-preserving N-thread batch pipeline (see num_workers).

        A ticket semaphore bounds total in-flight batches (queued +
        reorder-buffered): without it, one slow in-order batch would let
        the workers collate the whole epoch into the reorder buffer."""
        max_ahead = max(self._prefetch, n_workers) + n_workers
        tickets = threading.Semaphore(max_ahead)
        q: queue.Queue = queue.Queue(maxsize=max(self._prefetch, n_workers))
        stop = threading.Event()
        gen = enumerate(self._batches())
        gen_lock = threading.Lock()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def _acquire_ticket() -> bool:
            while not stop.is_set():
                if tickets.acquire(timeout=0.2):
                    return True
            return False

        def worker():
            while not stop.is_set():
                if not _acquire_ticket():
                    return
                with gen_lock:
                    try:
                        seq, batch_idx = next(gen)
                    except StopIteration:
                        break
                    except BaseException as e:
                        _put(("err", None, e))
                        return
                try:
                    items = [self.dataset[i] for i in batch_idx]
                    out = self.collate_fn(items)
                except BaseException as e:
                    _put(("err", None, e))
                    return
                if not _put(("ok", seq, out)):
                    return
            _put(("done", None, None))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(n_workers)]
        for t in threads:
            t.start()
        buffered = {}
        next_seq = 0
        done = 0
        try:
            while done < n_workers:
                kind, seq, item = q.get()
                if kind == "err":
                    raise item
                if kind == "done":
                    done += 1
                    continue
                buffered[seq] = item
                while next_seq in buffered:
                    yield buffered.pop(next_seq)
                    next_seq += 1
                    tickets.release()
            # all workers finished; drain any stragglers in order
            while next_seq in buffered:
                yield buffered.pop(next_seq)
                next_seq += 1
                tickets.release()
        finally:
            stop.set()


class DevicePrefetcher:
    """Wrap a host-batch iterable; run ``put`` one batch ahead.

    Pure prefetch. Buffer-pool recycling of spent batches lives in the
    consumer loops via ``padding.Recycler`` — only the consumer holds the
    step output whose ``is_ready()`` proves the batch's transfers drained
    (see the Recycler docstring for why dispatch order is not enough).
    """

    def __init__(self, loader, put: Callable[[Any], Any]):
        self.loader = loader
        self.put = put

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        it = iter(self.loader)
        try:
            nxt = self.put(next(it))
        except StopIteration:
            return
        for host_batch in it:
            cur, nxt = nxt, self.put(host_batch)
            yield cur
        yield nxt


class MetaLoader:
    """Multi-task sampling loader (loader.py:13-53).

    loaders: name -> loader or (loader, ratio). The task is re-drawn every
    ``accum_steps`` steps from a seeded RNG (host-synchronized by seed).
    """

    def __init__(self, loaders: Dict[str, Any], accum_steps: int = 1,
                 seed: int = 0):
        self.name2loader = {}
        self.name2iter = {}
        self.sampling_pools: List[str] = []
        for n, l in loaders.items():
            if isinstance(l, tuple):
                l, r = l
            else:
                r = 1
            self.name2loader[n] = l
            self.name2iter[n] = iter(l)
            self.sampling_pools.extend([n] * r)
        self.accum_steps = accum_steps
        self.step = 0
        self._rng = random.Random(seed)

    def __iter__(self):
        """Runs indefinitely (loader.py:35-53)."""
        task = self.sampling_pools[0]
        while True:
            if self.step % self.accum_steps == 0:
                task = self._rng.choice(self.sampling_pools)
            self.step += 1
            iter_ = self.name2iter[task]
            try:
                batch = next(iter_)
            except StopIteration:
                iter_ = iter(self.name2loader[task])
                try:
                    batch = next(iter_)
                except StopIteration:
                    # re-raising StopIteration inside a generator becomes
                    # an opaque PEP 479 RuntimeError — name the real issue
                    raise ValueError(
                        f"task {task!r} loader yielded no batches (empty "
                        f"dataset or drop_last ate the only batch)") from None
                self.name2iter[task] = iter_
            yield task, batch

    def fast_forward(self, n_steps: int) -> None:
        """Advance the task-sampling stream to micro-step ``n_steps``
        without touching data: on auto-resume the task SEQUENCE continues
        exactly where the interrupted run stopped (the reference replays
        it from scratch; data iterators restart in both designs)."""
        while self.step < n_steps:
            if self.step % self.accum_steps == 0:
                self._rng.choice(self.sampling_pools)
            self.step += 1
