"""Interactive query serving (the demo path).

Parity: dvl/utils.py:191-233 + demo/utils.py — encode a corpus once, build a
dense index, then serve text queries in real time: tokenize -> one text-tower
forward -> ``search_knn`` (retrieve_query, dvl/utils.py:204-211).

TPU-native: the query path is one fused jitted program (token ids -> 768-d
vec -> MXU matmul vs the in-HBM corpus -> top-k) — the configuration measured
by bench.py.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.training.evaluator import BatchEncoder

QUERY_LEN_BUCKETS = (16, 32, 64)
# batch-dimension ladder: every query program is jitted at a bucketed
# batch size, so the compile set is bounded by |batch_buckets| x
# |query_buckets| x |tops| instead of one program per distinct request
# count (the native frontend coalesces ARBITRARY batch sizes; an
# uncached XLA compile through the relay has measured 20+ minutes on a
# bad day — unbounded recompiles are a production stall, not a warmup
# cost)
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def quantize_text_tower(tower, cfg) -> Dict[str, Any]:
    """Per-output-channel int8 quantization of the text tower's dense layers.

    Embeddings, LayerNorms and biases stay full precision; each dense kernel
    [in, out] becomes (int8 kernel, f32 scale[out]). Measured on TPU v5e:
    batch-1 encode 0.40 -> 0.16 ms with embedding cosine 0.9998 vs bf16
    (weight HBM traffic halves and the dequant fuses into the matmul).
    """
    import jax

    def q(kernel):
        k = jnp.asarray(kernel, jnp.float32)
        s = jnp.maximum(jnp.abs(k).max(axis=-2), 1e-8) / 127.0
        qi = jnp.clip(jnp.round(k / s[..., None, :]), -127, 127
                      ).astype(jnp.int8)
        return {"q": qi, "scale": s}

    L = tower["layers"]
    qt = {
        "embeddings": jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                                   tower["embeddings"]),
        "layers": {
            "attn": {
                name: {**q(L["attn"][name]["kernel"]),
                       "bias": jnp.asarray(L["attn"][name]["bias"],
                                           jnp.float32)}
                for name in ("query", "key", "value", "output")},
            "attn_ln": jax.tree.map(jnp.asarray, L["attn"]["ln"]),
            "mlp": {
                name: {**q(L["mlp"][name]["kernel"]),
                       "bias": jnp.asarray(L["mlp"][name]["bias"],
                                           jnp.float32)}
                for name in ("intermediate", "output")},
            "mlp_ln": jax.tree.map(jnp.asarray, L["mlp"]["ln"]),
        },
    }
    if "proj" in tower:
        qt["proj"] = {
            "fc1": {**q(tower["proj"]["fc1"]["kernel"]),
                    "bias": jnp.asarray(tower["proj"]["fc1"]["bias"])},
            "ln": jax.tree.map(jnp.asarray, tower["proj"]["ln"]),
            "fc2": {**q(tower["proj"]["fc2"]["kernel"]),
                    "bias": jnp.asarray(tower["proj"]["fc2"]["bias"])},
        }
    return qt


def _dense_int8(p, x):
    """int8 weight x dynamically-int8-quantized activation dense.

    Runs on the MXU's true 8-bit path with int32 accumulation (per-row
    activation scale x per-output-channel weight scale in the epilogue).
    Upcasting the int8 weights to bf16 before the dot instead (the previous
    form) makes XLA materialize a bf16 weight copy — MORE HBM traffic than
    plain bf16 weights at batch 1.
    """
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.abs(xf).max(axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jnp.dot(xq, p["q"], preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * p["scale"][None, :]
            + p["bias"]).astype(jnp.bfloat16)


def encode_text_int8(qt, cfg, input_ids, attention_mask, position_ids):
    """Text-tower forward on int8 weights (serving fast path)."""
    from lightningdot_tpu.models import encoder as enc
    from lightningdot_tpu.ops import gelu, layer_norm, multi_head_attention
    from lightningdot_tpu.ops.ffn_int8 import ffn_gelu_int8

    h = enc.text_embeddings(qt["embeddings"], cfg, input_ids, position_ids,
                            dtype=jnp.bfloat16)
    bias4 = enc.attention_bias(attention_mask)
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def body(h, xs):
        attn, attn_ln, mlp, mlp_ln = xs
        b, s, hdim = h.shape

        def sh(x):
            return x.reshape(b, s, nh, hd)  # projection-native [B,S,h,d]

        q = _dense_int8(attn["query"], h)
        k = _dense_int8(attn["key"], h)
        v = _dense_int8(attn["value"], h)
        ctx = multi_head_attention(sh(q), sh(k), sh(v), bias4)
        ctx = ctx.reshape(b, s, hdim)
        a = _dense_int8(attn["output"], ctx)
        a = layer_norm(a + h, attn_ln["scale"], attn_ln["bias"],
                       cfg.layer_norm_eps)
        # int8 FFN pair (XLA by default; the fused Pallas kernel is gated —
        # measured neutral at serving shapes, see ops/ffn_int8.py)
        o = ffn_gelu_int8(mlp["intermediate"], mlp["output"], a)
        return layer_norm(o + a, mlp_ln["scale"], mlp_ln["bias"],
                          cfg.layer_norm_eps), None

    L = qt["layers"]
    h, _ = jax.lax.scan(body, h, (L["attn"], L["attn_ln"], L["mlp"],
                                  L["mlp_ln"]))
    pooled = h[:, 0]
    if "proj" in qt:
        pooled = gelu(_dense_int8(qt["proj"]["fc1"], pooled))
        pooled = layer_norm(pooled, qt["proj"]["ln"]["scale"],
                            qt["proj"]["ln"]["bias"], cfg.layer_norm_eps)
        pooled = _dense_int8(qt["proj"]["fc2"], pooled)
    return pooled


class Retriever:
    """Serve text->image retrieval against a pre-encoded corpus."""

    def __init__(self, model: BiEncoder, params, tokenizer,
                 query_buckets: Sequence[int] = QUERY_LEN_BUCKETS,
                 mesh=None, quantization: Optional[str] = None,
                 weight_quantization: Optional[str] = None,
                 topk: str = "exact", topk_recall: float = 0.95,
                 batch_buckets: Sequence[int] = BATCH_BUCKETS):
        """``quantization='int8'`` stores the corpus as per-vector symmetric
        int8 (halves HBM traffic and memory vs bf16; scores accumulate in
        int32 on the MXU's 8-bit path, then rescale).
        ``weight_quantization='int8'`` runs the text tower on int8 weights
        (2.4x faster batch-1 encode; embedding cosine 0.9998 vs bf16).
        ``topk='approx'`` selects candidates with the TPU-native
        ``jax.lax.approx_max_k`` (expected recall >= ``topk_recall``,
        final exact top-k over the aggregated candidates so results stay
        sorted) instead of the exact full-corpus ``lax.top_k``."""
        if quantization not in (None, "int8"):
            raise ValueError(f"unknown quantization {quantization!r}")
        if weight_quantization not in (None, "int8"):
            raise ValueError(
                f"unknown weight_quantization {weight_quantization!r}")
        if topk not in ("exact", "approx"):
            raise ValueError(f"unknown topk {topk!r}")
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.query_buckets = query_buckets
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.mesh = mesh               # shard the corpus over a dp mesh
        self.quantization = quantization
        self.weight_quantization = weight_quantization
        self.topk = topk
        self.topk_recall = topk_recall
        self._qtower = (quantize_text_tower(params["txt_model"],
                                            model.txt_cfg)
                        if weight_quantization == "int8" else None)
        self._corpus = None            # [N_pad, D] device array
        self._scales = None            # [N_pad] per-vector scales (int8)
        self._ids: List[Any] = []
        self._fns: Dict[int, Any] = {}

    # -- corpus --------------------------------------------------------------
    def set_corpus(self, ids: Sequence[Any], vectors: np.ndarray) -> None:
        n = vectors.shape[0]
        align = 128 * (self.mesh.devices.size if self.mesh is not None else 1)
        n_pad = -(-n // align) * align
        mat = np.zeros((n_pad, vectors.shape[1]), np.float32)
        mat[:n] = vectors
        bias = np.zeros((n_pad,), np.float32)
        bias[n:] = -1e30
        if self.quantization == "int8":
            scales = np.abs(mat).max(axis=1) / 127.0
            scales = np.maximum(scales, 1e-12)
            q = np.clip(np.rint(mat / scales[:, None]), -127, 127
                        ).astype(np.int8)
            self._corpus, self._bias, self._scales = self._place(
                q, bias, scales.astype(np.float32))
            self._ids = list(ids)
            self._fns.clear()
            return
        # bf16 corpus: the batch-1 query is corpus-scan bound, so halving
        # the scan bytes is ~0.23 ms on full COCO (scores still accumulate
        # in f32 on the MXU); ranking differences vs f32 are bf16 rounding
        # of the stored embeddings only
        self._corpus, self._bias, self._scales = self._place(
            mat.astype(jnp.bfloat16), bias, None)
        self._ids = list(ids)
        self._fns.clear()

    def _place(self, corpus, bias, scales):
        """Put corpus-aligned arrays on the mesh (row-sharded) or device."""
        if self.mesh is None:
            return (jnp.asarray(corpus), jnp.asarray(bias),
                    jnp.asarray(scales) if scales is not None else None)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lightningdot_tpu.parallel.mesh import DP_AXIS

        rows = NamedSharding(self.mesh, P(DP_AXIS))
        return (jax.device_put(corpus,
                               NamedSharding(self.mesh, P(DP_AXIS, None))),
                jax.device_put(bias, rows),
                jax.device_put(scales, rows) if scales is not None else None)

    def save_corpus(self, path: str) -> None:
        vecs = np.asarray(self._corpus)
        if vecs.dtype != np.int8:
            vecs = vecs.astype(np.float32)  # npz-portable master copy
        arrays = {"vecs": vecs, "bias": np.asarray(self._bias)}
        if self._scales is not None:
            arrays["scales"] = np.asarray(self._scales)
        np.savez(path + ".corpus.npz", **arrays)
        with open(path + ".ids.pkl", "wb") as f:
            pickle.dump((self._ids, self.quantization), f)

    def load_corpus(self, path: str) -> None:
        data = np.load(path + ".corpus.npz")
        with open(path + ".ids.pkl", "rb") as f:
            self._ids, quant = pickle.load(f)
        if quant != self.quantization:
            raise ValueError(
                f"corpus saved with quantization={quant!r}, retriever has "
                f"{self.quantization!r}")
        vecs = data["vecs"]
        self._corpus, self._bias, self._scales = self._place(
            vecs if vecs.dtype == np.int8 else vecs.astype(jnp.bfloat16),
            data["bias"],
            data["scales"] if "scales" in data.files else None)
        self._fns.clear()

    @property
    def corpus_size(self) -> int:
        """Number of indexed corpus entries (excludes padding rows)."""
        return len(self._ids)

    def _enc_params(self):
        return self._qtower if self._qtower is not None else self.params

    def warmup(self, tops: Sequence[int] = (100,),
               batches: Sequence[int] = (1,)) -> None:
        """Precompile the fused query program for every (batch bucket,
        length bucket, k) triple so real queries hit compiled paths (cold
        compiles cost seconds — 20+ minutes through the relay on a bad
        day; p50 latency claims assume warm programs). Servers that
        coalesce variable batches should warm every batch bucket they can
        emit (serve_retriever does)."""
        scales = (self._scales if self._scales is not None
                  else jnp.zeros((0,), jnp.float32))
        for L in self.query_buckets:
            for nb in sorted({self._batch_bucket(b) for b in batches}):
                ids = jnp.zeros((nb, L), jnp.int32)
                mask = jnp.ones((nb, L), jnp.int32)
                for top in tops:
                    k = min(top, len(self._ids))
                    self._query_fn(L, k)(self._enc_params(), ids, mask,
                                         self._corpus, self._bias, scales)

    # -- query ---------------------------------------------------------------
    def _query_fn(self, length: int, k: int):
        key = (length, k)
        fn = self._fns.get(key)
        if fn is None:
            model = self.model
            int8 = self.quantization == "int8"
            # the encoder weights (quantized or not) are passed as a jit
            # ARGUMENT — closures would bake them into the HLO
            use_qtower = self._qtower is not None
            cfg = self.model.txt_cfg

            def run(enc_params, ids, mask, corpus, bias, scales):
                pos = jnp.broadcast_to(
                    jnp.arange(length, dtype=jnp.int32), ids.shape)
                if use_qtower:
                    vec = encode_text_int8(enc_params, cfg, ids, mask, pos)
                else:
                    sb = {"input_ids": ids, "attention_mask": mask,
                          "position_ids": pos}
                    vec = model.encode_txt(enc_params, sb,
                                           deterministic=True)
                if int8:
                    # symmetric per-query int8: MXU 8-bit path, int32 accum
                    q_scale = jnp.maximum(
                        jnp.abs(vec).max(axis=-1, keepdims=True), 1e-12
                    ).astype(jnp.float32) / 127.0
                    q = jnp.clip(jnp.round(vec.astype(jnp.float32) / q_scale),
                                 -127, 127).astype(jnp.int8)
                    acc = jnp.dot(q, corpus.T,
                                  preferred_element_type=jnp.int32)
                    scores = (acc.astype(jnp.float32) * q_scale
                              * scales[None, :])
                else:
                    scores = jnp.dot(vec.astype(corpus.dtype), corpus.T,
                                     preferred_element_type=jnp.float32)
                biased = scores + bias[None, :]
                if self.topk == "approx":
                    # TPU-native approximate max-k (aggregate_to_topk runs
                    # a final exact top-k over the per-block candidates, so
                    # output is sorted); expected recall >= topk_recall
                    return jax.lax.approx_max_k(
                        biased, k, recall_target=self.topk_recall)
                return jax.lax.top_k(biased, k)

            fn = jax.jit(run)
            self._fns[key] = fn
        return fn

    def retrieve_query(self, query: str, top: int = 100
                       ) -> List[Tuple[Any, float]]:
        """dvl/utils.py:204-211 semantics -> [(db_id, score)] ranked."""
        return self.retrieve_batch([query], top=top)[0]

    def retrieve_batch_arrays(self, queries: Sequence[str], top: int = 100
                              ) -> Tuple[np.ndarray, np.ndarray]:
        """Array-level batched query path: ``(idx int32 [n,k], scores f32
        [n,k])`` ranked, with ``idx`` indexing :attr:`ids`.

        This is the hot serving interface — it performs no per-result
        Python work (the tuple-of-(id, score) conversion in
        :meth:`retrieve_batch` costs ~1 ms at batch 64 x k=100, comparable
        to the device call itself; the native HTTP frontend formats
        responses from these raw buffers in C++)."""
        from lightningdot_tpu.data.padding import bucket_len

        token_lists = [self.tokenizer.encode(q) for q in queries]
        L = bucket_len(max(len(t) for t in token_lists), self.query_buckets)
        n = len(queries)
        nb = self._batch_bucket(n)
        ids = np.zeros((nb, L), np.int32)
        mask = np.zeros((nb, L), np.int32)
        for i, t in enumerate(token_lists):
            ids[i, :len(t)] = t[:L]
            mask[i, :len(t)] = 1
        # padding rows: one live [CLS] token each (an all-masked row would
        # softmax over nothing); their results are sliced away below
        ids[n:, 0] = 101
        mask[n:, 0] = 1
        k = min(top, len(self._ids))
        scales = (self._scales if self._scales is not None
                  else jnp.zeros((0,), jnp.float32))
        scores, idx = self._query_fn(L, k)(
            self._enc_params(), jnp.asarray(ids), jnp.asarray(mask),
            self._corpus, self._bias, scales)
        return (np.asarray(idx[:n], np.int32),
                np.asarray(scores[:n], np.float32))

    def _batch_bucket(self, n: int) -> int:
        """Bucketed batch size (see BATCH_BUCKETS). Above the top bucket,
        round up to a multiple of it — never truncate a query batch."""
        for b in self.batch_buckets:
            if n <= b:
                return b
        top_b = self.batch_buckets[-1]
        return ((n + top_b - 1) // top_b) * top_b

    @property
    def ids(self) -> List[Any]:
        """Corpus db_ids, in index order (pairs with retrieve_batch_arrays)."""
        return self._ids

    def retrieve_batch(self, queries: Sequence[str], top: int = 100
                       ) -> List[List[Tuple[Any, float]]]:
        """Batched query path (one fused program per shape bucket)."""
        idx, scores = self.retrieve_batch_arrays(queries, top=top)
        return [[(self._ids[i], float(s)) for i, s in zip(row_i, row_s)]
                for row_i, row_s in zip(idx, scores)]


def ranking_equivalent(got, want, atol: float = None
                       ) -> Tuple[bool, str]:
    """Whether two ``[(id, score), ...]`` rankings agree up to score ties.

    A retrieval ranking is reproducible only up to the numeric resolution
    of the scoring pipeline: the same query scored inside a different
    batch composition pads to a different length bucket and tiles
    differently on the MXU, so corpus items whose scores differ by less
    than the reduction-order jitter can legitimately swap ranks — and swap
    in/out at the top-k boundary. Validation harnesses that compare the
    served path against a direct :meth:`Retriever.retrieve_batch` call
    (different coalescing ⇒ different batch shapes) must therefore accept
    tie swaps at ``atol`` resolution while still rejecting any genuine
    ranking divergence. Equivalence requires:

    1. rank-wise score profiles match within ``atol``;
    2. every id present in both lists sits at a rank whose two scores
       agree within ``atol`` (it moved only inside a tie band);
    3. every id present in exactly one list is a boundary tie: its score
       is within ``atol`` of the other list's k-th (last) score.

    ``atol=None`` derives ``1e-3 * max(1, max |score|)``. Returns
    ``(ok, reason)`` with ``reason`` naming the first violation.
    """
    if len(got) != len(want):
        return False, f"length {len(got)} != {len(want)}"
    if not got:
        return True, ""
    if atol is None:
        peak = max(abs(float(s)) for _, s in list(got) + list(want))
        atol = 1e-3 * max(1.0, peak)
    for p, ((_, gs), (_, ws)) in enumerate(zip(got, want)):
        if abs(gs - ws) > atol:
            return False, (f"rank {p}: score {gs:.6g} vs {ws:.6g} "
                           f"(atol {atol:.3g})")
    g_score = {i: float(s) for i, s in got}
    w_score = {i: float(s) for i, s in want}
    for i in g_score.keys() & w_score.keys():
        if abs(g_score[i] - w_score[i]) > atol:
            return False, (f"id {i!r}: score {g_score[i]:.6g} vs "
                           f"{w_score[i]:.6g} (atol {atol:.3g})")
    for only, other_last, name in (
            (g_score.keys() - w_score.keys(), float(want[-1][1]), "got"),
            (w_score.keys() - g_score.keys(), float(got[-1][1]), "want")):
        src = g_score if name == "got" else w_score
        for i in only:
            if abs(src[i] - other_last) > atol:
                return False, (f"id {i!r} only in {name}, score "
                               f"{src[i]:.6g} not a boundary tie with "
                               f"{other_last:.6g} (atol {atol:.3g})")
    return True, ""


def get_model_encoded_vecs(model: BiEncoder, params, dataloader
                           ) -> Dict[str, Any]:
    """Encode a whole dataloader (dvl/utils.py:214-233)."""
    encoder = BatchEncoder(model, params)
    img_embedding, caption_embedding, query_embedding = {}, {}, {}
    labels_img_name: List[Any] = []
    for batch in dataloader:
        txt, img, cap = encoder(batch)
        n_valid = batch["n_valid"]
        fnames = batch["img_fname"][:n_valid]
        tids = batch["txt_index"][:n_valid]
        img_embedding.update(
            {f: np.asarray(v) for f, v in zip(fnames, img[:n_valid])})
        if cap is not None:
            caption_embedding.update(
                {f: np.asarray(v) for f, v in zip(fnames, cap[:n_valid])})
        query_embedding.update(
            {t: np.asarray(v) for t, v in zip(tids, txt[:n_valid])})
        labels_img_name.extend(fnames)
    return {"img_embed": img_embedding, "caption_embed": caption_embedding,
            "txt_embed": query_embedding, "img_name": labels_img_name}


def display_img(img_meta: dict, name: str, img_only: bool = False) -> None:
    """dvl/utils.py:191-202 (requires matplotlib + image files on disk)."""
    import matplotlib.image as mpimg
    import matplotlib.pyplot as plt

    img = mpimg.imread(img_meta[name]["img_file"])
    plt.imshow(img)
    plt.show()
    if not img_only:
        print("annotation")
        print("\t" + "\n\t".join(img_meta[name]["annotation"]))
        print("caption")
        print("\t" + img_meta[name]["caption"][0])
