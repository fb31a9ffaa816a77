"""Characterize the native HNSW index (native/hnsw.cc) vs exact search.

The reference ships DenseHNSWFlatIndexer (faiss IndexHNSWFlat) as the
CPU-serving ANN option (dvl/indexer/faiss_indexers.py:90-155); this
measures our native equivalent on the full-COCO corpus shape: build
time, host query latency (batch 1 / 64), and recall@{10,100} vs exact
dot-product search on the same vectors.

Usage: python scripts/perf_hnsw.py [n_corpus] [dim] [store_n efC efS]
(store_n/efC/efS default to the DPR parity parameters 512/200/128; pass
e.g. ``32 80 64`` for a standard fast-build HNSW profile.)
"""
from __future__ import annotations

import sys
import time

import numpy as np

from lightningdot_tpu.index.hnsw import DenseHNSWFlatIndexer


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 123_287
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    store_n = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    efc = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    efs = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    rng = np.random.default_rng(0)
    # correlated encoder-like embeddings (low-rank + noise), the shipping
    # regime — matches tests/test_serving.py's int8-overlap methodology
    basis = rng.standard_normal((32, d)).astype(np.float32)
    coef = rng.standard_normal((n, 32)).astype(np.float32)
    corpus = coef @ basis + 0.1 * rng.standard_normal((n, d)).astype(
        np.float32)

    idx = DenseHNSWFlatIndexer(d, store_n=store_n, ef_construction=efc,
                               ef_search=efs)
    t0 = time.perf_counter()
    # chunked add with progress (the DPR parity parameters store_n=512 /
    # efC=200 make large single-threaded builds slow; faiss is the same
    # algorithm, parallelized with OpenMP). NOTE: chunking is only valid
    # here because the phi-norm guard is what index_data enforces — we
    # bypass it by computing phi over the full corpus first, as the
    # reference does for one-shot indexing.
    import ctypes

    norms = (corpus ** 2).sum(axis=1)
    phi = float(norms.max())
    aux = np.sqrt(np.maximum(phi - norms, 0.0)).astype(np.float32)
    hvecs = np.ascontiguousarray(np.concatenate([corpus, aux[:, None]],
                                                axis=1))
    import os
    threads = int(os.environ.get("LDOT_HNSW_THREADS", os.cpu_count() or 1))
    for lo in range(0, n, 5000):
        hi = min(lo + 5000, n)
        chunk = np.ascontiguousarray(hvecs[lo:hi])
        idx._lib.hnsw_add_batch_mt(
            idx._h, chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            hi - lo, threads)
        el = time.perf_counter() - t0
        print(f"  built {hi}/{n} in {el:.0f}s ({hi / el:.0f} vec/s, "
              f"{threads}T)", flush=True)
    idx.index_id_to_db_id = list(range(n))
    idx.phi = phi
    build_s = time.perf_counter() - t0

    n_q = 256
    queries = (rng.standard_normal((n_q, 32)).astype(np.float32) @ basis
               + 0.1 * rng.standard_normal((n_q, d)).astype(np.float32))

    # exact ground truth (host matmul)
    scores = queries @ corpus.T
    exact100 = np.argsort(-scores, axis=1)[:, :100]

    # batch-1 latency
    t0 = time.perf_counter()
    for i in range(n_q):
        idx.search_knn(queries[i:i + 1], 100)
    b1_ms = (time.perf_counter() - t0) / n_q * 1000

    # batch-64 call
    t0 = time.perf_counter()
    got = [idx.search_knn(queries[i:i + 64], 100)
           for i in range(0, n_q, 64)]
    b64_ms = (time.perf_counter() - t0) / (n_q / 64) * 1000

    rows = [list(ids_q) for chunk in got for ids_q, _ in chunk]
    r10 = np.mean([len(set(rows[i][:10]) & set(exact100[i][:10])) / 10
                   for i in range(n_q)])
    r100 = np.mean([len(set(rows[i][:100]) & set(exact100[i][:100])) / 100
                    for i in range(n_q)])
    print(f"hnsw n={n} d={d} M={store_n} efC={efc} efS={efs}: "
          f"build {build_s:.1f}s "
          f"({n / build_s:.0f} vec/s), query b1 {b1_ms:.2f} ms, "
          f"b64 call {b64_ms:.1f} ms ({64 / b64_ms * 1000:.0f} QPS), "
          f"recall@10 {r10:.3f} recall@100 {r100:.3f}", flush=True)


if __name__ == "__main__":
    main()
