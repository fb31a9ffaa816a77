"""Headline benchmark: end-to-end query latency on full-COCO-scale retrieval.

The reference's north star (BASELINE.json): real-time image-text retrieval —
encode a text query with the BERT-base tower and retrieve top-100 from a
123,287-image corpus (full MSCOCO scale). Target: <10 ms p50 on one chip.

This drives the SHIPPED serving path: ``serving.Retriever`` builds one fused
query program per (length-bucket, k) — tokenized ids -> text tower -> 768-d
vector -> MXU matmul vs corpus -> top-k (serving.py::_query_fn, parity
dvl/utils.py:204-211). The benchmark body calls exactly that program, and a
correctness self-check first asserts ``Retriever.retrieve_batch`` returns
the same ranking as one program invocation.

Methodology (this harness reaches the TPU through an async relay where
``block_until_ready`` does NOT actually wait — only a host value pull does):
the Retriever program runs inside ONE jitted ``while_loop`` with a serial
dependency between iterations (query i+1's tokens derive from query i's
top-1 result), and latency is the slope between a 2-iteration and an
(2+N)-iteration run, each closed by a real device->host pull. This cancels
dispatch/RTT constants and makes pipelining impossible.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_CORPUS = 123_287          # full-COCO image count
TOP_K = 100
QUERY_LEN = 32              # typical caption length incl CLS/SEP
BASELINE_P50_MS = 10.0      # BASELINE.md target
N_ITERS = 100


class _FixedTokenizer:
    """Deterministic stub: hashes words into the BERT-cased id range."""

    def encode(self, text):
        ids = [101] + [106 + (hash(w) % 28000) for w in text.split()][:30]
        return ids + [102]


def _real_tokenizer_ms() -> tuple:
    """Host-side WordPiece cost per query: (transformers.BertTokenizer,
    native ldtok) — the reference tokenizes inside ``retrieve_query``
    (dvl/utils.py:205-208), so this cost is part of its end-to-end latency;
    this framework ships ``data/tokenizer.WordPieceTokenizer`` (C++,
    golden-identical — tests/test_tokenizer.py). Zero-egress environment: a
    full-size 28,996-entry cased vocab is synthesized locally; WordPiece
    runtime depends on vocab size and longest-prefix structure, not the
    specific merges, and the captions are built from in-vocab pieces so
    real subword splits happen.
    """
    import os
    import random
    import tempfile

    from transformers import BertTokenizer

    from lightningdot_tpu.data.synth import synth_wordpiece_vocab

    rng = random.Random(0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vocab.txt")
        roots, conts = synth_wordpiece_vocab(path)
        tok = BertTokenizer(vocab_file=path, do_lower_case=False)
        # ~12-word captions whose words decompose into 1-3 in-vocab pieces
        caps = []
        for _ in range(64):
            words = []
            for _ in range(12):
                w = rng.choice(roots)
                for _ in range(rng.randint(0, 2)):
                    w += rng.choice(conts)
                words.append(w)
            caps.append(" ".join(words))
        from lightningdot_tpu.data.tokenizer import WordPieceTokenizer

        ms = []
        for t, n_rounds in ((tok, 8),
                            (WordPieceTokenizer(path), 64)):
            for c in caps:              # warm the tokenizer caches
                t.encode(c)
            t0 = time.perf_counter()
            for _ in range(n_rounds):
                for c in caps:
                    t.encode(c)
            ms.append((time.perf_counter() - t0)
                      / (n_rounds * len(caps)) * 1000.0)
        return ms[0], ms[1]


def main():
    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models import encoder as enc
    from lightningdot_tpu.models.bi_encoder import BiEncoder
    from lightningdot_tpu.serving import Retriever
    from lightningdot_tpu.utils.runtime import setup_runtime

    # persistent XLA compile cache: relay compiles run 30 s - 2 min each
    # (20+ min on bad days); caching makes bench re-runs start hot.
    setup_runtime()

    rng = np.random.default_rng(0)
    cfg = EncoderConfig(vocab_size=28996, project_dim=0)
    tower = enc.init_encoder_tower(jax.random.PRNGKey(0), cfg,
                                   with_img=False)
    tower = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), tower)

    model = BiEncoder(cfg, cfg, compute_dtype=jnp.bfloat16)
    retriever = Retriever(model, {"txt_model": tower, "img_model": {}},
                          tokenizer=_FixedTokenizer(),
                          query_buckets=(QUERY_LEN,))
    corpus = rng.standard_normal((N_CORPUS, 768)).astype(np.float32)
    retriever.set_corpus([f"coco_{i:012}.npz" for i in range(N_CORPUS)],
                         corpus)

    # the exact fused program the Retriever serves from
    query_fn = retriever._query_fn(QUERY_LEN, TOP_K)
    enc_params = retriever._enc_params()
    scales = jnp.zeros((0,), jnp.float32)
    mask = jnp.ones((1, QUERY_LEN), jnp.int32)

    # -- self-check: the public API path returns this program's ranking ----
    probe = "a dog runs on the beach"
    api_top = retriever.retrieve_query(probe, top=TOP_K)
    toks = _FixedTokenizer().encode(probe)
    ids_probe = np.zeros((1, QUERY_LEN), np.int32)
    ids_probe[0, :len(toks)] = toks
    mask_probe = np.zeros((1, QUERY_LEN), np.int32)
    mask_probe[0, :len(toks)] = 1
    _, idx = query_fn(enc_params, jnp.asarray(ids_probe),
                      jnp.asarray(mask_probe), retriever._corpus,
                      retriever._bias, scales)
    got = [retriever._ids[i] for i in np.asarray(idx)[0][:5]]
    want = [d for d, _ in api_top[:5]]
    assert got == want, f"bench path diverged from Retriever API: " \
                        f"{got} vs {want}"

    @jax.jit
    def chained(ids, corpus, bias, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, ids, acc = c
            top_s, top_i = query_fn(enc_params, ids, mask, corpus, bias,
                                    scales)
            ids = (ids + top_i[0, 0].astype(jnp.int32)) % 28000 + 106
            return i + 1, ids, acc + top_s[0, 0]

        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), ids, jnp.float32(0)))

    ids0 = jnp.asarray(rng.integers(106, 28996, (1, QUERY_LEN)),
                       dtype=jnp.int32)
    args = (ids0, retriever._corpus, retriever._bias)
    float(chained(*args, jnp.int32(1))[2])  # compile + real sync

    def total(n):
        t0 = time.perf_counter()
        out = chained(*args, jnp.int32(n))
        float(out[2])  # genuine device->host sync
        return time.perf_counter() - t0

    # median of interleaved short/long slope pairs: a single relay hiccup
    # in either run corrupts only one pair (min-of-3 once produced an
    # impossible sub-HBM-floor 0.28 ms when all base samples drew slow
    # RTTs), while the median stays within run-to-run jitter
    slopes = sorted((total(2 + N_ITERS) - total(2)) / N_ITERS
                    for _ in range(5))
    p50_ms = slopes[2] * 1000.0

    # batched-query throughput on the same corpus/program family
    def batch64_qps(r, qlen=QUERY_LEN):
        """Median-of-5 slope QPS for one Retriever's batched query program
        (same while_loop + host-pull methodology as the single-query block
        above). Params/corpus/scales are jit ARGUMENTS — closures bake
        them into the HLO and the relay rejects the upload."""
        mask64 = jnp.ones((64, qlen), jnp.int32)
        ids64 = jnp.asarray(rng.integers(106, 28996, (64, qlen)),
                            dtype=jnp.int32)
        qfn = r._query_fn(qlen, TOP_K)
        sc = (r._scales if r._scales is not None
              else jnp.zeros((0,), jnp.float32))

        @jax.jit
        def chained(params, ids, corpus, bias, sc, n):
            def cond(c):
                return c[0] < n

            def body(c):
                i, ids, acc = c
                top_s, _ = qfn(params, ids, mask64, corpus, bias, sc)
                ids = (ids + top_s[:, :1].astype(jnp.int32)) % 28000 + 106
                return i + 1, ids, acc + top_s[0, 0]

            return jax.lax.while_loop(cond, body,
                                      (jnp.int32(0), ids, jnp.float32(0)))

        cargs = (r._enc_params(), ids64, r._corpus, r._bias, sc)
        float(chained(*cargs, jnp.int32(1))[2])  # compile + real sync

        def total(n):
            t0 = time.perf_counter()
            out = chained(*cargs, jnp.int32(n))
            float(out[2])
            return time.perf_counter() - t0

        slopes = sorted((total(2 + 40) - total(2)) / 40 for _ in range(5))
        return 64 / slopes[2]

    qps64 = batch64_qps(retriever)

    # approx-top-k throughput variant (jax.lax.approx_max_k; the exact
    # lax.top_k over [B,123k] dominates batched calls — PERF.md sweep).
    # Same corpus, same tower; recall>=0.95 candidate retrieval.
    retriever_a = Retriever(model, {"txt_model": tower, "img_model": {}},
                            tokenizer=_FixedTokenizer(),
                            query_buckets=(QUERY_LEN,), topk="approx",
                            topk_recall=0.95)
    retriever_a._corpus = retriever._corpus  # reuse the uploaded corpus
    retriever_a._bias = retriever._bias
    retriever_a._ids = retriever._ids
    qps64a = batch64_qps(retriever_a)

    # production-optimal serving config (PERF.md batch sweep): int8 tower
    # weights + int8 corpus + approx top-k — measured recall vs exact
    # 98.6-99.8 % @100 (scripts/tpu_approx_topk_recall.py)
    retriever_q = Retriever(model, {"txt_model": tower, "img_model": {}},
                            tokenizer=_FixedTokenizer(),
                            query_buckets=(QUERY_LEN,),
                            quantization="int8",
                            weight_quantization="int8", topk="approx",
                            topk_recall=0.95)
    retriever_q.set_corpus([f"coco_{i:012}.npz" for i in range(N_CORPUS)],
                           corpus)
    qps64q = batch64_qps(retriever_q)
    # typical caption-length queries land in the 16-token bucket of the
    # Retriever ladder (tower work halves; PERF.md bucket sweep)
    qps64q16 = batch64_qps(retriever_q, qlen=16)

    tok_ms_hf, tok_ms_native = _real_tokenizer_ms()

    print(json.dumps({
        "metric": "full_coco_123k_query_latency_p50",
        "value": round(p50_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50_ms, 2),
        # host-side WordPiece tokenization (the reference pays this inside
        # retrieve_query too, via the Python BertTokenizer = the _hf
        # number); this framework ships a golden-identical native C++
        # tokenizer — end_to_end = native tokenize + device program
        "tokenize_host_ms_hf": round(tok_ms_hf, 3),
        "tokenize_host_ms": round(tok_ms_native, 4),
        "end_to_end_ms": round(p50_ms + tok_ms_native, 3),
        "batch64_qps_per_chip": round(qps64),
        "batch64_qps_approx_topk": round(qps64a),
        # int8 tower + int8 corpus + approx top-k (QPS-optimal, PERF.md)
        "batch64_qps_best_config": round(qps64q),
        # same config at the 16-token query bucket (typical captions)
        "batch64_qps_16tok_queries": round(qps64q16),
    }))


if __name__ == "__main__":
    main()
