"""Micro-batching serving front-end (serving_frontend.BatchingFrontend)."""
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np
import pytest

from lightningdot_tpu.serving import Retriever
from lightningdot_tpu.serving_frontend import BatchingFrontend

from test_serving import FakeTokenizer, tiny_biencoder


@pytest.fixture(scope="module")
def retriever():
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    r = Retriever(model, params, FakeTokenizer())
    rng = np.random.default_rng(0)
    ids = [f"img_{i}" for i in range(200)]
    r.set_corpus(ids, rng.standard_normal((200, 32)).astype(np.float32))
    return r


def test_results_match_direct_queries(retriever):
    queries = [f"query number {i} words {i % 3}" for i in range(10)]
    want = [retriever.retrieve_query(q, top=7) for q in queries]
    with BatchingFrontend(retriever, max_batch=4, max_wait_ms=5.0) as fe:
        got = fe.retrieve_many(queries, top=7)
    for g, w in zip(got, want):
        assert [i for i, _ in g] == [i for i, _ in w]
        # group sizes depend on timing, and each batch shape is its own
        # XLA program whose bf16-corpus dot rounds differently — scores
        # agree at bf16 resolution, rankings exactly
        np.testing.assert_allclose([s for _, s in g], [s for _, s in w],
                                   rtol=2e-3)


def test_concurrent_submissions_coalesce(retriever):
    """A burst of concurrent callers is served in fewer device calls than
    requests, and every caller gets its own correct result."""
    n = 32
    with BatchingFrontend(retriever, max_batch=16, max_wait_ms=50.0) as fe:
        barrier = threading.Barrier(n)

        def call(i):
            barrier.wait()           # release the burst at once
            return i, fe.retrieve(f"dog {i}", top=5)

        with ThreadPoolExecutor(n) as pool:
            results = dict(pool.map(call, range(n)))
        assert fe.requests_served == n
        assert fe.batches_dispatched < n   # coalescing happened
    for i in range(n):
        want = retriever.retrieve_query(f"dog {i}", top=5)
        assert [x for x, _ in results[i]] == [x for x, _ in want]


def test_mixed_tops_slice_per_request(retriever):
    with BatchingFrontend(retriever, max_batch=8, max_wait_ms=50.0) as fe:
        f_small = fe.submit("a cat", top=3)
        f_large = fe.submit("a dog", top=20)
        assert len(f_small.result()) == 3
        assert len(f_large.result()) == 20
    want = retriever.retrieve_query("a cat", top=3)
    assert [i for i, _ in f_small.result()] == [i for i, _ in want]


def test_batch_bucket_padding(retriever):
    """Group sizes pad up the bucket ladder (bounded compiled programs);
    results are still per-request correct."""
    fe = BatchingFrontend(retriever, max_batch=8, max_wait_ms=20.0,
                          batch_buckets=(4, 8))
    assert fe.batch_buckets == [4, 8]
    try:
        res = fe.retrieve("one lonely query", top=5)
        assert len(res) == 5
        want = retriever.retrieve_query("one lonely query", top=5)
        assert [i for i, _ in res] == [i for i, _ in want]
    finally:
        fe.close()


def test_close_rejects_new_and_drains(retriever):
    fe = BatchingFrontend(retriever, max_batch=4, max_wait_ms=1.0)
    fut = fe.submit("before close", top=5)
    fe.close()
    assert len(fut.result(timeout=10)) == 5
    with pytest.raises(RuntimeError):
        fe.submit("after close")


def test_dispatch_survives_errors(retriever):
    class Boom:
        def __init__(self, inner):
            self.inner = inner
            self.calls = 0

        def retrieve_batch(self, queries, top):
            self.calls += 1
            if self.calls == 1:
                raise ValueError("injected")
            return self.inner.retrieve_batch(queries, top=top)

    boom = Boom(retriever)
    with BatchingFrontend(boom, max_batch=4, max_wait_ms=1.0) as fe:
        f1 = fe.submit("first", top=5)
        with pytest.raises(ValueError):
            f1.result(timeout=10)
        # the dispatcher survived; later requests succeed
        assert len(fe.retrieve("second", top=5)) == 5


def test_warmup_runs_every_bucket(retriever):
    calls = []

    class Spy:
        def retrieve_batch(self, queries, top):
            calls.append(len(queries))
            return retriever.retrieve_batch(queries, top=top)

    fe = BatchingFrontend(Spy(), max_batch=4, batch_buckets=(1, 2, 4))
    try:
        fe.warmup(top=5)
        assert calls == [1, 2, 4]
    finally:
        fe.close()


def test_frontend_over_sharded_retriever():
    """The frontend composes with the mesh-sharded corpus (multi-chip
    serving): coalesced results equal the single-device retriever's."""
    import jax as _jax
    from lightningdot_tpu.parallel.mesh import data_parallel_mesh

    model = tiny_biencoder()
    params = model.init(_jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    ids = [f"img_{i}" for i in range(256)]
    vecs = rng.standard_normal((256, 32)).astype(np.float32)
    flat = Retriever(model, params, FakeTokenizer())
    flat.set_corpus(ids, vecs)
    sharded = Retriever(model, params, FakeTokenizer(),
                        mesh=data_parallel_mesh())
    sharded.set_corpus(ids, vecs)
    queries = [f"sharded burst {i}" for i in range(6)]
    with BatchingFrontend(sharded, max_batch=4, max_wait_ms=20.0) as fe:
        got = fe.retrieve_many(queries, top=8)
    for q, g in zip(queries, got):
        want = flat.retrieve_query(q, top=8)
        assert [i for i, _ in g] == [i for i, _ in want]


def test_cancelled_future_does_not_kill_resolver(retriever):
    """A caller cancelling its future (e.g. its own timeout) must not
    break result delivery for anyone else."""
    with BatchingFrontend(retriever, max_batch=4, max_wait_ms=30.0) as fe:
        doomed = fe.submit("will be cancelled", top=5)
        doomed.cancel()
        ok = fe.submit("still served", top=5)
        assert len(ok.result(timeout=10)) == 5
        # the resolver survived; a fresh request also works
        assert len(fe.retrieve("after the cancel", top=5)) == 5
        assert fe._resolver.is_alive()


def test_ranking_equivalent_tie_semantics():
    """serving.ranking_equivalent: accepts rank swaps/boundary churn only
    inside score-tie bands (the reproducibility contract for comparing
    differently-coalesced batch compositions), rejects real divergence."""
    from lightningdot_tpu.serving import ranking_equivalent

    want = [("a", 0.90), ("b", 0.800), ("c", 0.7995), ("d", 0.60)]
    # identical -> ok
    assert ranking_equivalent(list(want), want, atol=1e-3)[0]
    # b/c swapped, scores within atol -> tie swap, ok
    got = [("a", 0.90), ("c", 0.7996), ("b", 0.7999), ("d", 0.60)]
    assert ranking_equivalent(got, want, atol=1e-3)[0]
    # boundary churn: last element replaced by a tie at the k-th score
    got = [("a", 0.90), ("b", 0.800), ("c", 0.7995), ("e", 0.6002)]
    assert ranking_equivalent(got, want, atol=1e-3)[0]
    # genuinely different ranking: a and d swapped (scores far apart)
    got = [("d", 0.90), ("b", 0.800), ("c", 0.7995), ("a", 0.60)]
    ok, why = ranking_equivalent(got, want, atol=1e-3)
    assert not ok and "score" in why
    # same ids and rank-wise profile, but one id's own score moved
    got = [("a", 0.90), ("c", 0.800), ("b", 0.7995), ("d", 0.60)]
    ok, why = ranking_equivalent(got, want, atol=1e-4)
    assert not ok
    # non-tie replacement rejected even with a matching score profile
    got = [("a", 0.90), ("b", 0.800), ("x", 0.7995), ("d", 0.60)]
    ok, why = ranking_equivalent(got, want, atol=1e-4)
    assert not ok and "boundary" in why
    # length mismatch
    assert not ranking_equivalent(want[:3], want, atol=1e-3)[0]
    # default atol derives from score scale: jitter of 1e-4 at O(100)
    # scores is a tie at the derived 1e-1 resolution
    big_w = [("a", 100.0), ("b", 99.99)]
    big_g = [("b", 99.992), ("a", 99.998)]
    assert ranking_equivalent(big_g, big_w)[0]
