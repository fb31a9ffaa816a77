"""Dense index correctness: vs numpy brute force; sharded == flat."""
import numpy as np

import jax

from lightningdot_tpu.index import DenseFlatIndex, DenseShardedIndex
from lightningdot_tpu.parallel.mesh import data_parallel_mesh


def make_corpus(rng, n=1000, d=32):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = [f"img_{i}" for i in range(n)]
    return ids, vecs


def brute_force(queries, vecs, ids, k):
    scores = queries @ vecs.T
    order = np.argsort(-scores, axis=1)[:, :k]
    return [[ids[j] for j in row] for row in order]


def test_flat_index_matches_numpy(rng):
    ids, vecs = make_corpus(rng)
    index = DenseFlatIndex(32)
    index.index_data(list(zip(ids, vecs)))
    q = rng.standard_normal((17, 32)).astype(np.float32)
    res = index.search_knn(q, 10)
    expected = brute_force(q, vecs, ids, 10)
    for (got_ids, got_scores), exp in zip(res, expected):
        assert got_ids == exp
        assert np.all(np.diff(got_scores) <= 1e-6)  # descending


def test_flat_index_incremental_and_non_multiple_of_128(rng):
    ids, vecs = make_corpus(rng, n=301)
    index = DenseFlatIndex(32)
    index.index_data(list(zip(ids[:100], vecs[:100])))
    index.index_data(list(zip(ids[100:], vecs[100:])))
    assert index.ntotal == 301
    q = rng.standard_normal((3, 32)).astype(np.float32)
    res = index.search_knn(q, 5)
    expected = brute_force(q, vecs, ids, 5)
    for (got_ids, _), exp in zip(res, expected):
        assert got_ids == exp


def test_padding_never_returned(rng):
    # all-negative scores: zero-padding rows would win without the bias mask
    ids, vecs = make_corpus(rng, n=130)
    vecs = -np.abs(vecs) - 1.0
    q = np.abs(rng.standard_normal((2, 32))).astype(np.float32)
    index = DenseFlatIndex(32)
    index.index_data(list(zip(ids, vecs)))
    res = index.search_knn(q, 10)
    for got_ids, got_scores in res:
        assert len(got_ids) == 10
        assert all(i in ids for i in got_ids)
        assert (np.asarray(got_scores) < 0).all()


def test_sharded_index_matches_flat(rng):
    mesh = data_parallel_mesh()
    assert mesh.devices.size == 8
    ids, vecs = make_corpus(rng, n=2000, d=64)
    flat = DenseFlatIndex(64)
    flat.index_data(list(zip(ids, vecs)))
    sharded = DenseShardedIndex(64, mesh)
    sharded.index_data(list(zip(ids, vecs)))

    q = rng.standard_normal((13, 64)).astype(np.float32)
    res_flat = flat.search_knn(q, 10)
    res_shard = sharded.search_knn(q, 10)
    for (ids_f, sc_f), (ids_s, sc_s) in zip(res_flat, res_shard):
        assert ids_f == ids_s
        np.testing.assert_allclose(sc_f, sc_s, atol=1e-5)


def test_serialize_roundtrip(tmp_path, rng):
    ids, vecs = make_corpus(rng, n=50)
    index = DenseFlatIndex(32)
    index.index_data(list(zip(ids, vecs)))
    f = str(tmp_path / "idx")
    index.serialize(f)
    index2 = DenseFlatIndex(32)
    index2.deserialize_from(f)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    r1 = index.search_knn(q, 5)
    r2 = index2.search_knn(q, 5)
    for (a, _), (b, _) in zip(r1, r2):
        assert a == b


def test_chunked_topk_matches_dense(rng):
    """The streaming chunked kernel must equal the one-shot matmul top-k."""
    import jax.numpy as jnp

    from lightningdot_tpu.index.dense import (_topk_scores,
                                              _topk_scores_chunked)

    n, d, q_n, k, chunk = 1024, 32, 16, 10, 128
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    bias = jnp.zeros((n,), jnp.float32).at[-50:].set(-1e30)
    q = jnp.asarray(rng.standard_normal((q_n, d)).astype(np.float32))
    s1, i1 = _topk_scores(q, corpus, bias, k)
    s2, i2 = _topk_scores_chunked(q, corpus, bias, k, chunk)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_large_corpus_uses_chunked_path(rng):
    """Force the budget trigger with a small budget and verify results."""
    ids, vecs = make_corpus(rng, n=700, d=16)
    index = DenseFlatIndex(16)
    index.CORPUS_CHUNK = 128
    index.SCORE_BUDGET = 1000  # force chunked path
    index.index_data(list(zip(ids, vecs)))
    # corpus must be chunk-aligned for the streaming kernel
    index._build()
    q = rng.standard_normal((9, 16)).astype(np.float32)
    res = index.search_knn(q, 7)
    expected = brute_force(q, vecs, ids, 7)
    for (got_ids, _), exp in zip(res, expected):
        assert got_ids == exp


def test_sharded_topk_wider_than_shard():
    """k can exceed a shard's row count (hard-negative mining asks for
    pools up to 1000 on corpora that shard thin over a wide mesh): the
    local top-k clamps to the shard size and the merge still recovers the
    exact global top-k."""
    import jax

    from lightningdot_tpu.parallel.mesh import data_parallel_mesh

    rng = np.random.default_rng(3)
    n, d = 500, 32                    # pads to 1024 on 8 devices -> 128/shard
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    data = [(f"v{i}", v) for i, v in enumerate(vecs)]
    flat = DenseFlatIndex(d)
    flat.index_data(data)
    sharded = DenseShardedIndex(d, data_parallel_mesh())
    sharded.index_data(data)
    queries = rng.standard_normal((3, d)).astype(np.float32)
    k = 200                           # > 128 rows per shard
    for (ids_f, s_f), (ids_s, s_s) in zip(flat.search_knn(queries, k),
                                          sharded.search_knn(queries, k)):
        assert ids_f == ids_s
        np.testing.assert_allclose(s_f, s_s, rtol=1e-5)
