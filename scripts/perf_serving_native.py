"""Closed-loop load test of the NATIVE serving frontend (ldserve + ldloadgen).

Methodology (same as scripts/perf_frontend.py, which characterizes the
Python frontend): the device call is SIMULATED by sleeping the measured
per-batch latency of the headline serving config (int8 tower + int8 corpus
+ approx top-k, PERF.md quantized-serving sweep) — a live closed loop
through the axon relay would measure the relay's ~100s-of-ms host-pull RTT,
not the serving stack (the relay is a harness artifact; a production TPU
host pulls results in microseconds). Everything else is real: C++ HTTP
server, C++ open-loop load generator over loopback, per-batch Python
callback, JSON responses with k results.

Run: python scripts/perf_serving_native.py [rates...]
Host: single shared core — the client and server compete for it, which
only makes the numbers conservative.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from lightningdot_tpu.serving_native import (NativeRetrievalServer,  # noqa: E402
                                             run_loadgen)

# ms/call at the measured batch sizes (PERF.md: int8+int8+approx sweep)
MEASURED = {1: 0.451, 16: 1.02, 64: 3.08, 128: 7.52}


def call_ms(batch: int) -> float:
    pts = sorted(MEASURED.items())
    if batch <= pts[0][0]:
        return pts[0][1]
    for (b0, m0), (b1, m1) in zip(pts, pts[1:]):
        if batch <= b1:
            return m0 + (m1 - m0) * (batch - b0) / (b1 - b0)
    return pts[-1][1] * batch / pts[-1][0]


class SimulatedDevice:
    """retrieve_arrays contract; emulates the chip as a serially-busy
    resource with absolute-deadline accounting: each batch advances a
    busy-until deadline by the measured batch latency and the callback
    returns when the deadline passes. Naive per-call ``time.sleep`` is NOT
    equivalent on this 1-core VM — the timer overshoots by ~0.4-1 ms under
    load (measured p50 3.51 ms for a 3.08 ms sleep) and the error
    accumulates, capping the emulated device ~40% below the real chip.
    With deadline accounting the oversleep self-corrects, so long-run
    throughput equals the modeled device rate exactly."""

    def __init__(self, n_ids: int, k: int = 100):
        self.calls = 0
        self.total_batched = 0
        self._cache = {}
        self.n_ids = n_ids
        self.k = k
        self._busy_until = 0.0

    def __call__(self, queries, k):
        n = len(queries)
        self.calls += 1
        self.total_batched += n
        now = time.perf_counter()
        # allow the deadline to trail `now` by ~2 batch times: a real
        # device accepts the next program while one runs (bounded dispatch
        # queue), so host-side lateness (timer overshoot, formatting) is
        # absorbed instead of serializing onto every cycle
        self._busy_until = (max(self._busy_until, now - 0.006)
                            + call_ms(n) / 1000.0)
        delay = self._busy_until - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        got = self._cache.get((n, k))
        if got is None:
            rng = np.random.default_rng(0)
            idx = rng.integers(0, self.n_ids, (n, k)).astype(np.int32)
            scores = np.sort(rng.random((n, k)).astype(np.float32) * 80
                             )[:, ::-1]
            got = (np.ascontiguousarray(idx),
                   np.ascontiguousarray(scores))
            self._cache[(n, k)] = got
        return got


def main() -> None:
    rates = [float(r) for r in sys.argv[1:]] or [
        5_000, 10_000, 15_000, 20_000, 22_000, 25_000]
    ids = [f"coco_{i:06d}.npz" for i in range(123_287)]
    dev = SimulatedDevice(len(ids))
    srv = NativeRetrievalServer(ids, dev, max_batch=64, max_wait_ms=1.0,
                                max_top=100)
    print(f"native server on {srv.address} (max_batch=64, max_wait=1 ms, "
          f"k=100, simulated device = measured int8+approx latencies)")
    try:
        # warm the socket path
        run_loadgen(srv.port, rate=500, duration_s=0.5, conns=4)
        for rate in rates:
            c0, b0 = dev.total_batched, dev.calls
            stats = run_loadgen(srv.port, rate=rate, duration_s=5.0,
                                conns=16, top=100)
            mean_batch = ((dev.total_batched - c0)
                          / max(dev.calls - b0, 1))
            print(f"offered {rate:8,.0f}/s -> achieved "
                  f"{stats['achieved_per_s']:8,.0f}/s  mean batch "
                  f"{mean_batch:5.1f}  p50 {stats['p50_ms']:7.2f} ms  "
                  f"p90 {stats['p90_ms']:7.2f}  p99 {stats['p99_ms']:7.2f}"
                  f"  errors {stats['errors']}")
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
