"""Drive the NATIVE serving frontend (ldserve) against the REAL TPU chip.

VERDICT r4 item 3: every prior ldserve number was measured with a
simulated device callback; the C++-dispatcher-thread -> ctypes trampoline
-> GIL re-entry -> JAX -> axon-relay seam had never touched hardware.
This script closes that:

  1. builds the headline serving config (full-size text tower, int8
     weights + int8 corpus + approx top-k) over a synthetic corpus,
  2. starts ldserve over the live Retriever,
  3. CORRECTNESS: issues concurrent HTTP queries (forcing micro-batch
     coalescing) and asserts every response's ranking and scores equal a
     direct retrieve_batch() call,
  4. LOAD: runs the C++ open-loop generator at a relay-tolerant rate and
     reports stats.

Relay caveat (CLAUDE.md): each device call pays the tunnel's host-pull
RTT (~100s of ms), so latency/throughput here characterizes the RELAY,
not the serving stack — the simulated-device numbers in PERF.md remain
the stack's capability statement. What hardware validates here is the
SEAM: trusted batching, GIL re-entry from the C++ dispatcher, numpy
memmove contract, response formatting, and ranking equality.

Run: PYTHONPATH=/root/.axon_site:/root/repo python \
         scripts/tpu_serving_native_live.py [rate=20] [duration_s=10]
"""
import json
import sys
import threading
import time
import urllib.request
from urllib.parse import quote

import numpy as np

sys.path.insert(0, ".")


class SimpleTokenizer:
    def encode(self, text):
        return [101] + [200 + (hash(w) % 20000) for w in text.split()] \
            + [102]


def main():
    rate = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

    import jax.numpy as jnp

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models.bi_encoder import BiEncoder
    from lightningdot_tpu.serving import Retriever
    from lightningdot_tpu.serving_native import run_loadgen, serve_retriever
    from lightningdot_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax

    print(f"devices: {jax.devices()}")
    txt_cfg = EncoderConfig(vocab_size=28996, project_dim=768)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048, project_dim=768)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    n = 10000
    ids = [f"img_{i:08d}" for i in range(n)]
    corpus = rng.standard_normal((n, 768)).astype(np.float32)
    retriever = Retriever(model, params, SimpleTokenizer(),
                          quantization="int8", weight_quantization="int8",
                          topk="approx")
    retriever.set_corpus(ids, corpus)

    t0 = time.time()
    with serve_retriever(retriever, max_batch=64, max_wait_ms=2.0,
                         max_top=100) as srv:
        print(f"ldserve up on {srv.address} "
              f"(warmup+compile {time.time() - t0:.1f}s)")

        # -- correctness: concurrent GETs must coalesce into device batches
        #    and every ranking must equal the direct batched path ---------
        queries = [f"a photo of a dog near the fountain {i}"
                   for i in range(24)]
        # apples-to-apples: the server always retrieves at max_top and
        # truncates per-request in C++ (serving_native.py:73-80), and
        # approx_max_k's candidate set depends on k — a direct top=10
        # call can MISS items the server's k=100 pass finds (measured:
        # 2/24 queries with a higher served rank-0 score). Retrieve at
        # the server's k and truncate identically.
        direct = [r[:10] for r in retriever.retrieve_batch(queries,
                                                           top=100)]
        results = [None] * len(queries)

        def fetch(i):
            url = f"{srv.address}/search?q={quote(queries[i])}&top=10"
            with urllib.request.urlopen(url, timeout=120) as r:
                results[i] = json.load(r)

        threads = [threading.Thread(target=fetch, args=(i,))
                   for i in range(len(queries))]
        t1 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t1
        from lightningdot_tpu.serving import ranking_equivalent

        n_bad = n_tie_swaps = 0
        for i, (got, want) in enumerate(zip(results, direct)):
            # tie-aware: the served path coalesces into different batch
            # compositions than the one direct call, so near-tied scores
            # may legitimately swap ranks (serving.ranking_equivalent);
            # any divergence beyond score-jitter resolution still fails
            ok, why = ranking_equivalent(got["results"], want)
            if not ok:
                n_bad += 1
                print(f"MISMATCH q{i}: {why}")
            elif [r[0] for r in got["results"]] != [w for w, _ in want]:
                n_tie_swaps += 1
        stats = srv.stats()
        print(f"correctness: {len(queries)} concurrent queries in "
              f"{wall:.1f}s, {n_bad} ranking mismatches "
              f"({n_tie_swaps} tie-band swaps accepted), "
              f"server stats {stats}")
        assert n_bad == 0, "ldserve ranking != retrieve_batch on hardware"
        assert stats["errors"] == 0, stats
        coalesced = stats["batches"] < stats["requests"]
        print(f"micro-batching active: {stats['requests']} requests in "
              f"{stats['batches']} device batches "
              f"({'coalesced' if coalesced else 'NO COALESCING — check'})")

        # -- healthz ------------------------------------------------------
        with urllib.request.urlopen(srv.address + "/healthz",
                                    timeout=60) as r:
            h = json.load(r)
        assert h == {"ok": True, "corpus": n}, h

        # -- open-loop load through the C++ generator ----------------------
        print(f"loadgen: {rate} req/s x {duration}s (relay-tolerant rate; "
              "latency = relay RTT, see header)")
        lg = run_loadgen(srv.port, rate, duration_s=duration, conns=4,
                         top=100, timeout=duration + 120)
        print(json.dumps(lg))
        stats2 = srv.stats()
        assert stats2["errors"] == 0, stats2
        print(f"final server stats: {stats2}")
    print("PASS: ldserve hardware drive — trusted-batch seam validated")


if __name__ == "__main__":
    main()
