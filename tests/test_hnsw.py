"""Native HNSW index: recall vs exact search, serialization."""
import numpy as np
import pytest

from lightningdot_tpu.index.hnsw import DenseHNSWFlatIndexer, hnsw_lib

pytestmark = pytest.mark.skipif(hnsw_lib() is None,
                                reason="native hnsw lib unavailable")


def test_hnsw_recall_vs_exact(rng):
    n, d = 2000, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"v{i}" for i in range(n)]
    index = DenseHNSWFlatIndexer(d, store_n=32, ef_search=128,
                                 ef_construction=200)
    index.index_data(list(zip(ids, vecs)))
    assert index.ntotal == n

    q = rng.standard_normal((50, d)).astype(np.float32)
    exact = np.argsort(-(q @ vecs.T), axis=1)[:, :10]
    res = index.search_knn(q, 10)
    recall = 0.0
    for (got_ids, _), row in zip(res, exact):
        truth = {f"v{j}" for j in row}
        recall += len(truth & set(got_ids)) / 10
    recall /= len(res)
    # inner-product ANN via the L2 aux-dim trick: should be well above chance
    assert recall > 0.85, recall


def test_hnsw_top1_on_planted(rng):
    n, d = 500, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = list(range(n))
    index = DenseHNSWFlatIndexer(d, store_n=32)
    index.index_data(list(zip(ids, vecs)))
    # query near an existing vector (scaled up so IP clearly maximal)
    q = vecs[123] * 2.0
    res = index.search_knn(q, 5)
    assert 123 in res[0][0][:3]


def test_hnsw_parallel_build_deterministic(tmp_path, rng):
    """The mt build is a pure function of the inputs: any thread count
    yields the byte-identical graph (native/hnsw.cc::add_batch_mt —
    frozen-snapshot parallel searches + in-order link application).
    n crosses the 1024-node serial warmup and several 256-node chunks."""
    n, d = 2000, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    data = list(zip(range(n), vecs))
    paths = []
    for t, threads in enumerate((1, 4)):
        idx = DenseHNSWFlatIndexer(d, store_n=16, ef_construction=40,
                                   build_threads=threads)
        idx.index_data(data)
        p = str(tmp_path / f"idx{t}")
        idx.serialize(p)
        paths.append(p + ".index.hnsw")
    import os
    assert os.path.exists(paths[0])
    with open(paths[0], "rb") as a, open(paths[1], "rb") as b:
        assert a.read() == b.read()


def test_hnsw_mt_split_add_equals_one_shot(rng):
    """Splitting a build across several hnsw_add_batch_mt calls at
    chunk-aligned points (or inside the 1024-node serial warmup) yields
    the byte-identical graph to one call: chunk ends are aligned to
    absolute-id multiples of 256, so the frozen snapshots are canonical
    in id space and level draws come from one rng stream. (An unaligned
    split shifts at most one partial chunk's snapshot, then re-aligns —
    perf_hnsw.py's 5000-sized progress chunks are that case.)"""
    import ctypes
    lib = hnsw_lib()
    n, d = 2000, 24
    vecs = np.ascontiguousarray(rng.standard_normal((n, d)).astype(
        np.float32))

    def build(splits, threads):
        h = lib.hnsw_new(d, 16, 40)
        lo = 0
        for hi in list(splits) + [n]:
            chunk = np.ascontiguousarray(vecs[lo:hi])
            lib.hnsw_add_batch_mt(
                h, chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                hi - lo, threads)
            lo = hi
        return h

    import tempfile, os
    paths = []
    # 1000 is inside the warmup; 1280 and 1792 are 256-aligned
    for i, (splits, threads) in enumerate([((), 1), ((1000, 1280, 1792), 4)]):
        h = build(splits, threads)
        p = os.path.join(tempfile.mkdtemp(), f"g{i}")
        assert lib.hnsw_save(h, p.encode()) == 0
        lib.hnsw_free(h)
        paths.append(p)
    with open(paths[0], "rb") as a, open(paths[1], "rb") as b:
        assert a.read() == b.read()


def test_hnsw_one_shot_requirement(rng):
    index = DenseHNSWFlatIndexer(8, store_n=8)
    data = [(i, rng.standard_normal(8).astype(np.float32)) for i in range(10)]
    index.index_data(data)
    with pytest.raises(RuntimeError):
        index.index_data(data)


def test_hnsw_serialize_roundtrip(tmp_path, rng):
    n, d = 300, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    index = DenseHNSWFlatIndexer(d, store_n=16)
    index.index_data(list(zip(range(n), vecs)))
    q = rng.standard_normal((5, d)).astype(np.float32)
    before = [ids for ids, _ in index.search_knn(q, 5)]
    f = str(tmp_path / "idx")
    index.serialize(f)

    index2 = DenseHNSWFlatIndexer(d, store_n=16)
    index2.deserialize_from(f)
    after = [ids for ids, _ in index2.search_knn(q, 5)]
    assert before == after
    with pytest.raises(RuntimeError):
        index2.index_data([(0, vecs[0])])


def test_hnsw_empty_index_data_noop():
    from lightningdot_tpu.index.hnsw import DenseHNSWFlatIndexer

    idx = DenseHNSWFlatIndexer(8)
    idx.index_data([])  # must be a no-op like DenseFlatIndex
    assert idx.index_id_to_db_id == []


def test_hnsw_truncated_index_file_rejected(tmp_path, rng):
    from lightningdot_tpu.index.hnsw import DenseHNSWFlatIndexer

    idx = DenseHNSWFlatIndexer(8)
    idx.index_data([(i, rng.standard_normal(8).astype(np.float32))
                    for i in range(64)])
    path = str(tmp_path / "idx")
    idx.serialize(path)
    import glob
    import os
    fname = [f for f in glob.glob(path + "*") if not f.endswith(".dpr")][0]
    data = open(fname, "rb").read()
    open(fname, "wb").write(data[:len(data) // 2])
    fresh = DenseHNSWFlatIndexer(8)
    with pytest.raises(Exception):
        fresh.deserialize_from(path)
