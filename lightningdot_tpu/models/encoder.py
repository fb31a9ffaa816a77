"""The shared transformer encoder core (TPU-native).

One functional encoder serves all three model shapes in the reference:

  * text tower  — HF-style ``BertModel`` (dvl/models/bi_encoder.py:76-128):
    word+position+type embeddings -> N BertLayers -> CLS hidden
    [-> projection head];
  * image tower — ``UniterModel`` consuming a single [CLS] text token plus
    region features (dvl/models/bi_encoder.py:131-196,
    uniter_model/model/model.py:249-273,312-387);
  * joint cross-encoder — text + image sequence with gather-index compaction
    (uniter_model/model/model.py:338-354), used by the KD teacher and the
    re-ranker.

Math parity notes (all vs the reference):
  * post-LN BERT layers, erf GELU, additive -10000 attention mask
    (uniter_model/model/layer.py:31-170, model.py:362-365);
  * image embeddings: img_linear(2048->H)+LN, pos_linear(7->H)+LN, type
    embedding, joint LN (model.py:249-273); mask embedding row 0 zeroed on
    every use (model.py:264);
  * pooled output = sequence[:, 0] (NOT the tanh pooler) for both towers
    (bi_encoder.py:120,188); the tanh pooler exists for the cross-encoder
    (layer.py:173-185);
  * optional projection head Linear(H,2H)+GELU+LN+Linear(2H,P)
    (bi_encoder.py:82-90).

TPU-native design: parameters are plain pytrees (f32 master copies); layers
are stacked along a leading axis and executed with ``lax.scan`` (fast compile,
remat-friendly); matmuls run in bf16 with f32 accumulation when
``compute_dtype=bf16``; attention and LayerNorm dispatch to Pallas kernels
(lightningdot_tpu.ops) on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.ops import (dropout_add_ln, ffn_gelu, gelu, layer_norm,
                                  multi_head_attention)

Params = Dict[str, Any]

MASK_BIAS = -10000.0  # model.py:365


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------

def _dense_init(rng, in_dim, out_dim, std):
    wkey, = jax.random.split(rng, 1)
    return {
        "kernel": (jax.random.normal(wkey, (in_dim, out_dim), jnp.float32)
                   * std),
        "bias": jnp.zeros((out_dim,), jnp.float32),
    }


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _embed_init(rng, num, dim, std):
    return jax.random.normal(rng, (num, dim), jnp.float32) * std


def init_layer_stack(rng, cfg: EncoderConfig) -> Params:
    """Stacked BertLayer parameters with leading axis = layer index."""
    h, inter, std = cfg.hidden_size, cfg.intermediate_size, cfg.initializer_range

    def one_layer(key):
        ks = jax.random.split(key, 6)
        return {
            "attn": {
                "query": _dense_init(ks[0], h, h, std),
                "key": _dense_init(ks[1], h, h, std),
                "value": _dense_init(ks[2], h, h, std),
                "output": _dense_init(ks[3], h, h, std),
                "ln": _ln_init(h),
            },
            "mlp": {
                "intermediate": _dense_init(ks[4], h, inter, std),
                "output": _dense_init(ks[5], inter, h, std),
                "ln": _ln_init(h),
            },
        }

    keys = jax.random.split(rng, cfg.num_hidden_layers)
    return jax.vmap(one_layer)(keys)


def init_text_embeddings(rng, cfg: EncoderConfig) -> Params:
    """UniterTextEmbeddings / BertEmbeddings (model.py:218-246)."""
    ks = jax.random.split(rng, 3)
    std = cfg.initializer_range
    word = _embed_init(ks[0], cfg.vocab_size, cfg.hidden_size, std)
    word = word.at[0].set(0.0)  # padding_idx=0 (model.py:221-222)
    return {
        "word": word,
        "position": _embed_init(ks[1], cfg.max_position_embeddings,
                                cfg.hidden_size, std),
        "token_type": _embed_init(ks[2], cfg.type_vocab_size,
                                  cfg.hidden_size, std),
        "ln": _ln_init(cfg.hidden_size),
    }


def init_img_embeddings(rng, cfg: EncoderConfig) -> Params:
    """UniterImageEmbeddings (model.py:249-273)."""
    ks = jax.random.split(rng, 3)
    std = cfg.initializer_range
    return {
        "img_linear": _dense_init(ks[0], cfg.img_dim, cfg.hidden_size, std),
        "img_ln": _ln_init(cfg.hidden_size),
        "pos_linear": _dense_init(ks[1], cfg.pos_dim, cfg.hidden_size, std),
        "pos_ln": _ln_init(cfg.hidden_size),
        "mask_embedding": _embed_init(ks[2], 2, cfg.img_dim, std),
        "ln": _ln_init(cfg.hidden_size),
    }


def init_projection(rng, cfg: EncoderConfig) -> Params:
    """Projection head Linear(H,2H)+GELU+LN+Linear(2H,P) (bi_encoder.py:82-90)."""
    ks = jax.random.split(rng, 2)
    h, std = cfg.hidden_size, cfg.initializer_range
    return {
        "fc1": _dense_init(ks[0], h, 2 * h, std),
        "ln": _ln_init(2 * h),
        "fc2": _dense_init(ks[1], 2 * h, cfg.project_dim, std),
    }


def init_pooler(rng, cfg: EncoderConfig) -> Params:
    """BertPooler (layer.py:173-185), used by the cross-encoder."""
    return _dense_init(rng, cfg.hidden_size, cfg.hidden_size,
                       cfg.initializer_range)


def init_encoder_tower(rng, cfg: EncoderConfig, *, with_img: bool) -> Params:
    """Full tower parameters (text tower or image tower)."""
    ks = jax.random.split(rng, 5)
    params = {
        "embeddings": init_text_embeddings(ks[0], cfg),
        "layers": init_layer_stack(ks[1], cfg),
        "pooler": init_pooler(ks[2], cfg),
    }
    if with_img:
        params["img_embeddings"] = init_img_embeddings(ks[3], cfg)
    if cfg.project_dim > 0:
        params["proj"] = init_projection(ks[4], cfg)
    return params


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------

def matmul_precision(dtype):
    """f32 math must be true f32 (XLA CPU/TPU default to fast low precision);
    bf16 uses the native MXU path."""
    return (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)


def _dense(p: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    return (jnp.dot(x.astype(dtype), p["kernel"].astype(dtype),
                    preferred_element_type=jnp.float32,
                    precision=matmul_precision(dtype))
            + p["bias"]).astype(dtype)


def _dense_heads(p: Params, x, nh, hd, dtype):
    """Head-split projection [B,S,H] -> [B,S,nh,hd] as ONE einsum.

    Identical math to ``_dense(...).reshape(b, s, nh, hd)`` (same contraction
    over H, same f32 accumulation, bias added in f32) — but with the reshape
    folded into the matmul. A separate reshape between the projection and
    the attention einsums materialises as a physical layout copy on TPU
    (hlo_stats: ~2.5 ms/step across q/k/v fwd+bwd at the ITM train shape).
    """
    w = p["kernel"].astype(dtype).reshape(-1, nh, hd)
    y = jnp.einsum("bsh,hnd->bsnd", x.astype(dtype), w,
                   preferred_element_type=jnp.float32,
                   precision=matmul_precision(dtype))
    return (y + p["bias"].reshape(nh, hd)).astype(dtype)


def _dense_merge(p: Params, ctx, dtype):
    """Head-merge projection [B,S,nh,hd] -> [B,S,H]; counterpart of
    :func:`_dense_heads` for the attention output dense."""
    nh, hd = ctx.shape[2], ctx.shape[3]
    w = p["kernel"].astype(dtype).reshape(nh, hd, -1)
    y = jnp.einsum("bsnd,ndh->bsh", ctx.astype(dtype), w,
                   preferred_element_type=jnp.float32,
                   precision=matmul_precision(dtype))
    return (y + p["bias"]).astype(dtype)


def _dense_heads_major(p: Params, x, nh, hd, dtype):
    """[B,S,H] -> [B,nh,S,hd] HEAD-MAJOR in one einsum
    (``LDOT_ATTN_LAYOUT=bnsd``): the attention dot_generals batch over the
    leading (b, n) axes, so producing q/k/v in that layout directly lets
    XLA feed them without the [B,S,H]->[B,S,nh,hd] reshape that
    materialises as a physical layout copy (~7.8 ms/step of 'data
    formatting' in the round-2 trace). Same contraction/accumulation as
    ``_dense``; bias added in f32."""
    w = p["kernel"].astype(dtype).reshape(-1, nh, hd)
    y = jnp.einsum("bsh,hnd->bnsd", x.astype(dtype), w,
                   preferred_element_type=jnp.float32,
                   precision=matmul_precision(dtype))
    return (y + p["bias"].reshape(nh, 1, hd)).astype(dtype)


def _dense_merge_major(p: Params, ctx, dtype):
    """Head-major counterpart of :func:`_dense_merge`:
    [B,nh,S,hd] -> [B,S,H]."""
    nh, hd = ctx.shape[1], ctx.shape[3]
    w = p["kernel"].astype(dtype).reshape(nh, hd, -1)
    y = jnp.einsum("bnsd,ndh->bsh", ctx.astype(dtype), w,
                   preferred_element_type=jnp.float32,
                   precision=matmul_precision(dtype))
    return (y + p["bias"]).astype(dtype)


def _ln(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    return layer_norm(x, p["scale"], p["bias"], eps)


def _dropout(rng, rate: float, deterministic: bool, x: jnp.ndarray):
    """Inverted dropout.

    NOTE a uint16 bits+threshold mask looked 1.6x faster in a microbench
    with a constant key (XLA hoists constant-key bits generation out of the
    timing loop) but is >2x SLOWER in the real step where the key is a jit
    argument — keep the bernoulli form. Pass rbg keys (utils/runtime.
    dropout_key) so mask generation is cheap.
    """
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return x * keep.astype(x.dtype) * jnp.asarray(1.0 / (1.0 - rate),
                                                  x.dtype)


def text_embeddings(p: Params, cfg: EncoderConfig, input_ids, position_ids,
                    token_type_ids=None, *, deterministic=True, rng=None,
                    dtype=jnp.float32):
    """Word + position + type embeddings -> LN -> dropout (model.py:233-246)."""
    words = jnp.take(p["word"], input_ids, axis=0)
    pos = jnp.take(p["position"], position_ids, axis=0)
    if token_type_ids is None:
        types = p["token_type"][0][None, None, :]
    else:
        types = jnp.take(p["token_type"], token_type_ids, axis=0)
    emb = _ln(p["ln"], (words + pos + types).astype(dtype), cfg.layer_norm_eps)
    return _dropout(rng, cfg.hidden_dropout_prob, deterministic, emb)


def img_embeddings(p: Params, cfg: EncoderConfig, img_feat, img_pos_feat,
                   type_embedding, img_masks=None, *, deterministic=True,
                   rng=None, dtype=jnp.float32):
    """Region-feature embeddings (model.py:262-273).

    ``type_embedding``: the token-type embedding row(s) for the image segment
    (reference uses type id 1, model.py:331-333).
    """
    if img_masks is not None:
        # row 0 of mask_embedding is forcibly zero on every forward
        # (model.py:264: weight.data[0,:].fill_(0))
        mask_emb = jnp.asarray(p["mask_embedding"]).at[0].set(0.0)
        img_feat = img_feat + jnp.take(mask_emb, img_masks.astype(jnp.int32),
                                       axis=0)
    eps = cfg.layer_norm_eps
    im = _ln(p["img_ln"], _dense(p["img_linear"], img_feat.astype(dtype), dtype), eps)
    pos = _ln(p["pos_ln"], _dense(p["pos_linear"], img_pos_feat.astype(dtype), dtype), eps)
    emb = _ln(p["ln"], im + pos + type_embedding.astype(dtype), eps)
    return _dropout(rng, cfg.hidden_dropout_prob, deterministic, emb)


def _bert_layer(lp: Params, cfg: EncoderConfig, hidden, mask_bias, *,
                deterministic, rng, dtype):
    """One post-LN BertLayer (layer.py:159-170)."""
    b, s, h = hidden.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    if rng is None:
        rngs = [None] * 4
    else:
        rngs = list(jax.random.split(rng, 4))

    ap = lp["attn"]

    # projection-native [B,S,heads,dim] layout; LDOT_HEADFOLD=1 folds the
    # head split/merge INTO the projection einsums (standalone reshapes
    # materialise as layout copies next to the attention einsums — but the
    # folded einsum's own layouts measured WORSE end-to-end on v5e, so the
    # plain reshape form is the default)
    import os as _os

    # measured-loser kernel parked under ops/experimental: import only when
    # the env gate is set so the default trace path stays kernel-free
    attn_kernel = (not deterministic
                   and _os.environ.get("LDOT_ATTN_KERNEL", "0") != "0")
    if attn_kernel:
        from lightningdot_tpu.ops.experimental.attention_fused import (
            attention_kernel_enabled, fused_attention_train)

        attn_kernel = attention_kernel_enabled(b, nh)
    if attn_kernel:
        # fully fused Pallas attention on the RAW [B,S,H] projections:
        # head split, scores, softmax, prob dropout (in-kernel PRNG) and
        # probs@v never leave VMEM (ops/experimental/attention_fused.py)
        qr = _dense(ap["query"], hidden, dtype)
        kr = _dense(ap["key"], hidden, dtype)
        vr = _dense(ap["value"], hidden, dtype)
        ctx = fused_attention_train(
            qr, kr, vr, mask_bias.reshape(b, -1), rngs[0],
            nh=nh, rate=cfg.attention_probs_dropout_prob)
    else:
        attn_layout = _os.environ.get("LDOT_ATTN_LAYOUT", "bshd")
        if attn_layout == "bnsd":
            q = _dense_heads_major(ap["query"], hidden, nh, hd, dtype)
            k = _dense_heads_major(ap["key"], hidden, nh, hd, dtype)
            v = _dense_heads_major(ap["value"], hidden, nh, hd, dtype)
        elif _os.environ.get("LDOT_HEADFOLD", "0") == "1":
            q = _dense_heads(ap["query"], hidden, nh, hd, dtype)
            k = _dense_heads(ap["key"], hidden, nh, hd, dtype)
            v = _dense_heads(ap["value"], hidden, nh, hd, dtype)
        else:
            q = _dense(ap["query"], hidden, dtype).reshape(b, s, nh, hd)
            k = _dense(ap["key"], hidden, dtype).reshape(b, s, nh, hd)
            v = _dense(ap["value"], hidden, dtype).reshape(b, s, nh, hd)
        ctx = multi_head_attention(
            q, k, v, mask_bias,
            dropout_rate=cfg.attention_probs_dropout_prob,
            dropout_rng=rngs[0], deterministic=deterministic,
            layout="bnsd" if attn_layout == "bnsd" else "bshd")

    from lightningdot_tpu.ops.fused import fused_enabled

    use_fused = not deterministic and fused_enabled()
    if attn_kernel:
        attn_out = _dense(ap["output"], ctx, dtype)  # already [B,S,H]
    elif _os.environ.get("LDOT_ATTN_LAYOUT", "bshd") == "bnsd":
        attn_out = _dense_merge_major(ap["output"], ctx, dtype)
    elif _os.environ.get("LDOT_HEADFOLD", "0") == "1":
        attn_out = _dense_merge(ap["output"], ctx, dtype)
    else:
        attn_out = _dense(ap["output"], ctx.reshape(b, s, h), dtype)
    if use_fused:
        # fused custom-VJP: no keep-mask / LN-input residuals stored
        # (ops/fused.py); the eval path keeps the Pallas LN kernel
        attn_out = dropout_add_ln(attn_out, hidden, ap["ln"]["scale"],
                                  ap["ln"]["bias"], rngs[1],
                                  rate=cfg.hidden_dropout_prob, eps=eps)
    else:
        attn_out = _dropout(rngs[1], cfg.hidden_dropout_prob, deterministic,
                            attn_out)
        attn_out = _ln(ap["ln"], attn_out + hidden, eps)

    mp = lp["mlp"]
    # fused FFN: VMEM-resident GELU intermediate on TPU, identical math
    # elsewhere (ops/ffn.py)
    out = ffn_gelu(attn_out, mp["intermediate"], mp["output"], dtype)
    if use_fused:
        return dropout_add_ln(out, attn_out, mp["ln"]["scale"],
                              mp["ln"]["bias"], rngs[2],
                              rate=cfg.hidden_dropout_prob, eps=eps)
    out = _dropout(rngs[2], cfg.hidden_dropout_prob, deterministic, out)
    return _ln(mp["ln"], out + attn_out, eps)


def _scan_unroll(n_layers: int):
    """Layer-scan unroll factor (env LDOT_SCAN_UNROLL; 0 = auto).

    Auto = full unroll on TPU, rolled elsewhere. Full unroll is the
    measured TPU default: on v5e the ITM train step drops from 80.6 to
    70.8 ms/step at BERT-base depth (scripts/perf_train_ablate2.py) because
    XLA can pipeline across layer boundaries; partial unroll (e.g. 3) is
    strictly worse than either extreme. On CPU (the test harness) full
    unroll only doubles compile time.
    """
    import os

    v = int(os.environ.get("LDOT_SCAN_UNROLL", "0"))
    if v == 0:
        return n_layers if jax.default_backend() == "tpu" else 1
    return min(v, n_layers)


def encoder_stack(layers: Params, cfg: EncoderConfig, hidden, mask_bias, *,
                  deterministic=True, rng=None, dtype=jnp.float32,
                  remat: bool = False, unroll: int | None = None):
    """Run the stacked BertLayers with lax.scan (uniter model.py:276-293)."""
    n = cfg.num_hidden_layers
    has_rng = rng is not None
    if has_rng:
        layer_rngs = jax.random.split(rng, n)
    else:
        # dtype-matching dummy so scan xs stay consistent across key impls
        layer_rngs = jnp.zeros((n, 2), jnp.uint32)

    def layer_fn(h, lp, lrng):
        return _bert_layer(lp, cfg, h, mask_bias,
                           deterministic=deterministic,
                           rng=lrng if has_rng else None, dtype=dtype)

    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    # (a python loop over sliced layers measured within noise of the fully
    # unrolled scan — 67.1 vs 68.2 ms/step — so the scan form stays)
    def body(h, xs):
        lp, lrng = xs
        return layer_fn(h, lp, lrng), None

    hidden, _ = lax.scan(body, hidden, (layers, layer_rngs),
                         unroll=unroll if unroll is not None
                         else _scan_unroll(n))
    return hidden


def attention_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, S] {0,1} mask -> additive [B, 1, 1, S] bias (model.py:362-365)."""
    return ((1.0 - attention_mask.astype(jnp.float32))
            * MASK_BIAS)[:, None, None, :]


def projection_head(p: Params, cfg: EncoderConfig, pooled, dtype=jnp.float32):
    """Linear-GELU-LN-Linear head (bi_encoder.py:82-90)."""
    h = gelu(_dense(p["fc1"], pooled, dtype))
    h = _ln(p["ln"], h, cfg.layer_norm_eps)
    return _dense(p["fc2"], h, dtype)


def pooler(p: Params, hidden, dtype=jnp.float32):
    """tanh pooler over position 0 (layer.py:179-185)."""
    return jnp.tanh(_dense(p, hidden[:, 0], dtype))


# ---------------------------------------------------------------------------
# Tower entry points
# ---------------------------------------------------------------------------

def encode_text(params: Params, cfg: EncoderConfig, input_ids, attention_mask,
                position_ids, *, token_type_ids=None, deterministic=True,
                rng=None, dtype=jnp.float32, remat=False, project=True):
    """Text tower forward -> (sequence [B,S,H], pooled [B,out]).

    Parity: BertEncoder.forward (bi_encoder.py:107-123) — pooled is the raw
    CLS hidden (not tanh pooler), optionally projected.
    """
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    emb = text_embeddings(params["embeddings"], cfg, input_ids, position_ids,
                          token_type_ids, deterministic=deterministic,
                          rng=rngs[0], dtype=dtype)
    bias = attention_bias(attention_mask)
    seq = encoder_stack(params["layers"], cfg, emb, bias,
                        deterministic=deterministic, rng=rngs[1], dtype=dtype,
                        remat=remat)
    pooled = seq[:, 0, :]
    if project and "proj" in params:
        pooled = projection_head(params["proj"], cfg, pooled, dtype)
    return seq, pooled


def encode_image(params: Params, cfg: EncoderConfig, cls_input_ids,
                 attention_mask, img_feat, img_pos_feat, *, img_masks=None,
                 deterministic=True, rng=None, dtype=jnp.float32, remat=False,
                 project=True):
    """Image tower forward -> (sequence [B,1+R,H], pooled [B,out]).

    Sequence = [CLS text-token embedding] ++ region embeddings; this is the
    dvl identity-gather layout (dvl/data/itm.py:252 with txt_lens=[1]*bs and
    uniter_model/data/data.py:286-294 identity gather).

    Args:
      cls_input_ids: [B, 1] (always token 101, dvl/data/itm.py:74 — so
        cfg.vocab_size must exceed 101 even for toy models; jnp.take
        fills out-of-bounds gathers with NaN).
      attention_mask: [B, 1+R].
      img_feat: [B, R, img_dim]; img_pos_feat: [B, R, 7].
    """
    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    b = cls_input_ids.shape[0]
    cls_pos = jnp.zeros_like(cls_input_ids)
    txt_emb = text_embeddings(params["embeddings"], cfg, cls_input_ids,
                              cls_pos, deterministic=deterministic,
                              rng=rngs[0], dtype=dtype)
    # image segment uses token type 1 (model.py:330-333)
    img_type = params["embeddings"]["token_type"][1][None, None, :]
    img_emb = img_embeddings(params["img_embeddings"], cfg, img_feat,
                             img_pos_feat, img_type, img_masks,
                             deterministic=deterministic, rng=rngs[1],
                             dtype=dtype)
    emb = jnp.concatenate([txt_emb, img_emb], axis=1)
    bias = attention_bias(attention_mask)
    seq = encoder_stack(params["layers"], cfg, emb, bias,
                        deterministic=deterministic, rng=rngs[2], dtype=dtype,
                        remat=remat)
    pooled = seq[:, 0, :]
    if project and "proj" in params:
        pooled = projection_head(params["proj"], cfg, pooled, dtype)
    return seq, pooled


def encode_image_only(params: Params, cfg: EncoderConfig, attention_mask,
                      img_feat, img_pos_feat, *, img_masks=None,
                      deterministic=True, rng=None, dtype=jnp.float32,
                      remat=False, n_layers=None):
    """Pure region-sequence forward (no [CLS] text token).

    Parity: UniterModel.forward with input_ids=None — the image stream of
    UniterForImageTextRetrievalFast (uniter_model/model/model.py:318-335,
    itm.py:173-178). ``n_layers`` truncates the stacked layers (the Fast
    variant's img_bert has ``num_hidden_layers_img`` layers).
    """
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    img_type = params["embeddings"]["token_type"][1][None, None, :]
    emb = img_embeddings(params["img_embeddings"], cfg, img_feat,
                         img_pos_feat, img_type, img_masks,
                         deterministic=deterministic, rng=rngs[0],
                         dtype=dtype)
    bias = attention_bias(attention_mask)
    layers = params["layers"]
    if n_layers is not None:
        layers = jax.tree.map(lambda x: x[:n_layers], layers)
        cfg = dataclasses.replace(cfg, num_hidden_layers=n_layers)
    seq = encoder_stack(layers, cfg, emb, bias,
                        deterministic=deterministic, rng=rngs[1], dtype=dtype,
                        remat=remat)
    return seq


def encode_joint(params: Params, cfg: EncoderConfig, input_ids, position_ids,
                 img_feat, img_pos_feat, attention_mask, *, gather_index=None,
                 img_masks=None, txt_type_ids=None, img_type_ids=None,
                 deterministic=True, rng=None, dtype=jnp.float32, remat=False):
    """Joint text+image forward (UniterModel.forward, model.py:356-387).

    Used by the cross-encoder teacher / re-ranker. ``gather_index`` [B, S_out]
    compacts the concatenated [txt_emb; img_emb] back to minimum padding
    (model.py:347-354); None concatenates directly.
    """
    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    txt_emb = text_embeddings(params["embeddings"], cfg, input_ids,
                              position_ids, txt_type_ids,
                              deterministic=deterministic, rng=rngs[0],
                              dtype=dtype)
    if img_type_ids is None:
        img_type = params["embeddings"]["token_type"][1][None, None, :]
    else:
        img_type = jnp.take(params["embeddings"]["token_type"], img_type_ids,
                            axis=0)
    img_emb = img_embeddings(params["img_embeddings"], cfg, img_feat,
                             img_pos_feat, img_type, img_masks,
                             deterministic=deterministic, rng=rngs[1],
                             dtype=dtype)
    emb = jnp.concatenate([txt_emb, img_emb], axis=1)
    if gather_index is not None:
        emb = jnp.take_along_axis(emb, gather_index[:, :, None], axis=1)
    bias = attention_bias(attention_mask)
    seq = encoder_stack(params["layers"], cfg, emb, bias,
                        deterministic=deterministic, rng=rngs[2], dtype=dtype,
                        remat=remat)
    return seq
