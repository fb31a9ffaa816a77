"""Micro-batching front-end for the real-time retriever.

The reference serves queries one at a time (``retrieve_query``,
dvl/utils.py:204-211). On TPU the fused query program saturates near batch
64 (PERF.md quantized-serving sweep: ~0.5 ms/call at batch 1 vs ~3 ms/call
for 64 queries — a 10x per-query difference), so a production deployment
wants concurrent requests *coalesced* into one device call.

``BatchingFrontend`` is that coalescer: callers submit queries from any
thread; a single dispatch thread drains the queue, groups up to
``max_batch`` requests (waiting at most ``max_wait_ms`` after the first),
issues one ``retrieve_batch`` per group, and resolves per-request futures.
One dispatch thread means device calls stay serialized (required — programs
share the chip; concurrent relay submissions also serialize server-side),
while request threads only block on their own future.

Requests with different ``top`` values batch together: the call runs at the
group's maximum and each result is sliced to its request's ``top`` (the
fused program's top-k output is sorted).
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, List, Sequence, Tuple


class BatchingFrontend:
    """Coalesce concurrent ``retrieve(query)`` calls into batched device
    calls against a :class:`lightningdot_tpu.serving.Retriever`."""

    def __init__(self, retriever, max_batch: int = 64,
                 max_wait_ms: float = 2.0,
                 batch_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64)):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.retriever = retriever
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        # group sizes pad up this ladder (static shapes: every distinct
        # batch size is a separate compiled program through the relay)
        self.batch_buckets = sorted(b for b in set(batch_buckets)
                                    if b <= max_batch) or [max_batch]
        if self.batch_buckets[-1] < max_batch:
            self.batch_buckets.append(max_batch)
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self.batches_dispatched = 0      # instrumentation (tests, metrics)
        self.requests_served = 0
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="ldot-serving-dispatch")
        self._thread.start()

    # -- client API ----------------------------------------------------------
    def submit(self, query: str, top: int = 100) -> "Future":
        """Enqueue a query; the future resolves to [(db_id, score)]."""
        if self._closed:
            raise RuntimeError("frontend is closed")
        fut: Future = Future()
        self._queue.put((query, top, fut))
        return fut

    def retrieve(self, query: str, top: int = 100
                 ) -> List[Tuple[Any, float]]:
        """Blocking convenience wrapper (retrieve_query semantics)."""
        return self.submit(query, top).result()

    def retrieve_many(self, queries: Sequence[str], top: int = 100):
        """Submit a burst, wait for all (preserves order)."""
        futs = [self.submit(q, top) for q in queries]
        return [f.result() for f in futs]

    def warmup(self, top: int = 100, query: str = "warmup") -> None:
        """Precompile one program per batch bucket (at ``query``'s length
        bucket). Other (length, top) shapes compile on first use."""
        for b in self.batch_buckets:
            self.retriever.retrieve_batch([query] * b, top=top)

    def close(self) -> None:
        """Drain outstanding requests and stop the dispatch thread."""
        if self._closed:
            return
        self._closed = True
        self._queue.put(None)            # wake the dispatcher
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatch loop ---------------------------------------------------------
    def _next_group(self):
        """Block for the first request, then drain up to max_batch more,
        waiting at most max_wait_s for stragglers. None = shutdown marker."""
        first = self._queue.get()
        if first is None:
            return None
        group = [first]
        t_end = time.monotonic() + self.max_wait_s
        while len(group) < self.max_batch:
            timeout = t_end - time.monotonic()
            try:
                item = (self._queue.get_nowait() if timeout <= 0
                        else self._queue.get(timeout=timeout))
            except queue.Empty:
                break
            if item is None:
                # keep the marker: outstanding groups still run, then stop
                self._queue.put(None)
                break
            group.append(item)
        return group

    def _loop(self) -> None:
        while True:
            group = self._next_group()
            if group is None:
                break
            queries = [q for q, _, _ in group]
            tops = [t for _, t, _ in group]
            k = max(tops)
            # pad the group up the batch-bucket ladder so every dispatch
            # reuses one of a bounded set of compiled programs
            nb = next(b for b in self.batch_buckets if b >= len(queries))
            padded = queries + [""] * (nb - len(queries))
            try:
                results = self.retriever.retrieve_batch(padded, top=k)
            except Exception as e:  # resolve, don't kill the dispatcher
                for _, _, fut in group:
                    fut.set_exception(e)
                continue
            self.batches_dispatched += 1
            self.requests_served += len(group)
            for (_, top, fut), res in zip(group, results):
                fut.set_result(res[:top])
        # shutdown: fail anything still queued
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[2].set_exception(RuntimeError("frontend closed"))
