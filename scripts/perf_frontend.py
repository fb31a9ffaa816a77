"""BatchingFrontend characterization (host-side; no TPU required).

Two measurements:

1. ``overhead``: pure dispatch cost per request (queue hop + grouping +
   future resolution) with an instant retriever — the frontend's own tax.

2. ``load``: closed-loop behavior under Poisson arrivals with a retriever
   that *simulates* the device call by sleeping the measured per-batch
   latency of the headline serving config (int8 tower + int8 corpus +
   approx top-k, PERF.md quantized-serving sweep; linear interpolation
   between measured batch sizes). This is explicitly a SIMULATION over
   measured service times — the relay's ~ms host RTT makes a live
   closed-loop run unrepresentative of a production host — and shows the
   adaptive batching: mean batch size grows with offered load while
   request latency stays bounded by max_wait + the batch call.

Usage:  python scripts/perf_frontend.py [overhead|load|all]
"""
import sys
import threading
import time

sys.path.insert(0, ".")

from lightningdot_tpu.serving_frontend import BatchingFrontend  # noqa: E402

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


class InstantRetriever:
    def retrieve_batch(self, queries, top):
        return [[("id", 0.0)] * top for _ in queries]


class SimulatedRetriever:
    """Sleeps the measured device-call latency for the dispatched batch."""

    def retrieve_batch(self, queries, top):
        time.sleep(call_ms(len(queries)) / 1000.0)
        return [[("id", 0.0)] * top for _ in queries]


def bench_overhead():
    n = 20_000
    with BatchingFrontend(InstantRetriever(), max_batch=64,
                          max_wait_ms=0.0) as fe:
        t0 = time.perf_counter()
        futs = [fe.submit(f"q {i}") for i in range(n)]
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
        print(f"overhead: {dt / n * 1e6:.1f} us/request "
              f"({n / dt:,.0f} req/s through the dispatcher, "
              f"mean batch {fe.requests_served / fe.batches_dispatched:.1f})")


def bench_load(rate_qps: float, seconds: float = 4.0):
    """Open-loop: paced arrivals from one submitter thread (futures +
    done-callbacks, no thread per request), latency = submit -> resolve."""
    lat = []
    lat_lock = threading.Lock()
    fe = BatchingFrontend(SimulatedRetriever(), max_batch=64,
                          max_wait_ms=1.0)

    def on_done(t0):
        def cb(_fut):
            with lat_lock:
                lat.append(time.perf_counter() - t0)
        return cb

    futs = []
    tick = 0.002
    frac = 0.0
    t_start = time.perf_counter()
    next_tick = t_start
    while (now := time.perf_counter()) < t_start + seconds:
        frac += rate_qps * tick
        per_tick = int(frac)
        frac -= per_tick
        for _ in range(per_tick):
            t0 = time.perf_counter()
            f = fe.submit("q")
            f.add_done_callback(on_done(t0))
            futs.append(f)
        next_tick += tick
        delay = next_tick - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
    for f in futs:
        f.result(timeout=30)
    elapsed = time.perf_counter() - t_start
    served, batches = fe.requests_served, fe.batches_dispatched
    fe.close()
    lat.sort()
    p50 = lat[len(lat) // 2] * 1000
    p99 = lat[int(len(lat) * 0.99)] * 1000
    print(f"load {rate_qps:7,.0f} QPS offered: served {served:6d} "
          f"({served / elapsed:7,.0f}/s), mean batch "
          f"{served / max(batches, 1):5.1f}, p50 {p50:6.2f} ms, "
          f"p99 {p99:6.2f} ms")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("overhead", "all"):
        bench_overhead()
    if which in ("load", "all"):
        for qps in (200, 1000, 5000, 10000, 15000):
            bench_load(qps)


if __name__ == "__main__":
    main()
