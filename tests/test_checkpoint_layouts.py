"""Artifact-day hardening: fuzz the torch->JAX mapping over every released
checkpoint layout variant, and pin the no-silently-dropped-keys property
(VERDICT r3 item 5).

Released-layout space (reference eval_itm.py:97-107, bi_encoder.py:737-752,
uniter_model/model/model.py:149-215):
  * fine-tune CheckpointState  — {'model_dict': {txt_model.*, img_model.*}}
  * pre-train                  — every key 'bert.'-prefixed + DVL head
    families (cls/feat_regress/region_classifier/itm_output/nce_*)
  * historical LayerNorm names — .gamma/.beta for .weight/.bias
  * DataParallel wrapper       — 'module.' prefix on every key
  * teacher                    — UniterForImageTextRetrieval: bert.* +
    itm_output (+ optional rank_output, else seeded — itm.py:23-26)
"""
import itertools

import jax
import numpy as np
import pytest

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.models.checkpoint_torch import (export_bi_encoder,
                                                      export_tower,
                                                      map_bi_encoder,
                                                      map_cross_encoder,
                                                      map_tower)
from lightningdot_tpu.models.cross_encoder import CrossEncoder
from lightningdot_tpu.utils.misc import compare_models


def _cfg(**kw):
    return EncoderConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=48, **kw)


def _biencoder_params(seed=0):
    model = BiEncoder(_cfg(), _cfg(img_dim=16))
    return model.init(jax.random.PRNGKey(seed))


def _dvl_pretrain_heads(rng, hidden=32, vocab=96, img_dim=16, labels=11):
    """Every head family a DVL pre-train checkpoint carries
    (dvl/models/bi_encoder.py:299-313), including the TIED duplicates the
    state dict serializes (cls.predictions.decoder.weight, feat_regress
    .weight)."""
    r = rng.standard_normal

    def lin(i, o):
        return {"weight": r((o, i)).astype(np.float32),
                "bias": r(o).astype(np.float32)}

    sd = {}
    for p, d in (("cls.predictions.transform.dense", lin(hidden, hidden)),
                 ("cls.predictions.transform.LayerNorm", None),
                 ("feat_regress.net.0", lin(hidden, hidden)),
                 ("region_classifier.net.0", lin(hidden, hidden)),
                 ("region_classifier.net.3", lin(hidden, labels)),
                 ("itm_output", lin(hidden, 2)),
                 ("nce_output.0.dense", lin(hidden, hidden)),
                 ("nce_output.1", lin(hidden, hidden))):
        if d is None:
            sd[f"{p}.weight"] = np.ones(hidden, np.float32)
            sd[f"{p}.bias"] = np.zeros(hidden, np.float32)
        else:
            sd[f"{p}.weight"], sd[f"{p}.bias"] = d["weight"], d["bias"]
    for ln in ("feat_regress.net.2", "region_classifier.net.2",
               "nce_output.0.LayerNorm", "nce_norm"):
        sd[f"{ln}.weight"] = np.ones(hidden, np.float32)
        sd[f"{ln}.bias"] = np.zeros(hidden, np.float32)
    sd["cls.predictions.bias"] = np.zeros(vocab, np.float32)
    sd["cls.predictions.decoder.weight"] = r((vocab, hidden)).astype(
        np.float32)  # tied duplicate of the word embedding
    sd["feat_regress.bias"] = np.zeros(img_dim, np.float32)
    sd["feat_regress.weight"] = r((img_dim, hidden)).astype(
        np.float32)  # tied duplicate of img_linear.weight
    return sd


def _apply_gamma_beta(sd):
    return {k.replace("LayerNorm.weight", "LayerNorm.gamma")
             .replace("LayerNorm.bias", "LayerNorm.beta"): v
            for k, v in sd.items()}


def _apply_module_prefix(sd):
    return {f"module.{k}": v for k, v in sd.items()}


@pytest.mark.parametrize(
    "pretrain,gamma_beta,module_prefix,with_heads",
    [c for c in itertools.product([False, True], repeat=4)
     if c[0] or not c[3]])  # head families only ride along in pre-train dumps
def test_biencoder_layout_fuzz(pretrain, gamma_beta, module_prefix,
                               with_heads):
    """Every layout-variant combination maps to the identical tree."""
    params = _biencoder_params()
    want = jax.tree.map(np.asarray, params)
    sd = export_bi_encoder(params)
    if pretrain:
        sd = {f"bert.{k}": v for k, v in sd.items()}
        if with_heads:
            sd.update(_dvl_pretrain_heads(np.random.default_rng(1)))
    if gamma_beta:
        sd = _apply_gamma_beta(sd)
    if module_prefix:
        sd = _apply_module_prefix(sd)
    got = map_bi_encoder(sd, num_layers=2)
    assert compare_models(want, jax.tree.map(np.asarray, got),
                          verbose=False) == 0


def test_unknown_key_raises_biencoder():
    sd = export_bi_encoder(_biencoder_params())
    sd["txt_model.bert.encoder.layer.0.adapter.weight"] = np.zeros(
        4, np.float32)
    with pytest.raises(ValueError, match="neither mapped nor on the "
                                         "explicit skip list"):
        map_bi_encoder(sd, num_layers=2)
    # reference-style behavior remains available explicitly
    got = map_bi_encoder(sd, num_layers=2, strict=False)
    assert compare_models(jax.tree.map(np.asarray, _biencoder_params()),
                          jax.tree.map(np.asarray, got), verbose=False) == 0


def test_unknown_toplevel_key_raises_biencoder():
    sd = export_bi_encoder(_biencoder_params())
    sd["some_new_subsystem.weight"] = np.zeros(4, np.float32)
    with pytest.raises(ValueError, match="neither mapped"):
        map_bi_encoder(sd, num_layers=2)


def test_unknown_head_family_raises_in_pretrain_layout():
    sd = {f"bert.{k}": v
          for k, v in export_bi_encoder(_biencoder_params()).items()}
    sd["mystery_head.weight"] = np.zeros(4, np.float32)
    with pytest.raises(ValueError, match="neither mapped"):
        map_bi_encoder(sd, num_layers=2)


def test_extra_layer_raises():
    """A 12-layer checkpoint loaded as 2 layers must fail loudly: the
    surplus layer keys are unconsumed."""
    params = _biencoder_params()
    sd = export_bi_encoder(params)
    extra = {k.replace("layer.1.", "layer.2."): v for k, v in sd.items()
             if ".layer.1." in k and k.startswith("txt_model.")}
    sd.update(extra)
    with pytest.raises(ValueError, match="neither mapped"):
        map_bi_encoder(sd, num_layers=2)


def test_missing_key_raises():
    sd = export_bi_encoder(_biencoder_params())
    del sd["img_model.bert.img_embeddings.img_linear.weight"]
    with pytest.raises(KeyError):
        map_bi_encoder(sd, num_layers=2)


@pytest.mark.parametrize("with_rank,with_pretrain_heads,gamma_beta",
                         [(True, False, False), (False, False, True),
                          (False, True, False), (True, True, True)])
def test_teacher_layout_fuzz(with_rank, with_pretrain_heads, gamma_beta):
    """UniterForImageTextRetrieval layouts: fine-tuned (rank_output
    present) and uniter-base.pt warm start (pre-train heads ride along,
    rank head seeded from itm row 1 — itm.py:23-26)."""
    model = CrossEncoder(_cfg(img_dim=16))
    params = model.init(jax.random.PRNGKey(3))
    sd = export_tower(params["uniter"], with_img=True)
    if with_pretrain_heads:
        # pre-train families ride along; itm_output is consumed by the
        # cross-encoder, so the real head (set below) wins
        sd.update(_dvl_pretrain_heads(np.random.default_rng(2)))
    itm_k = np.asarray(params["itm_output"]["kernel"])
    sd["itm_output.weight"] = np.ascontiguousarray(itm_k.T)
    sd["itm_output.bias"] = np.asarray(params["itm_output"]["bias"])
    if with_rank:
        rk = np.asarray(params["rank_output"]["kernel"])
        sd["rank_output.weight"] = np.ascontiguousarray(rk.T)
        sd["rank_output.bias"] = np.asarray(params["rank_output"]["bias"])
    else:
        params = CrossEncoder.init_output(params)  # expected seeding
    if gamma_beta:
        sd = _apply_gamma_beta(sd)
    got = map_cross_encoder(sd, num_layers=2)
    assert compare_models(jax.tree.map(np.asarray, params),
                          jax.tree.map(np.asarray, got), verbose=False) == 0


def test_unknown_key_raises_teacher():
    model = CrossEncoder(_cfg(img_dim=16))
    params = model.init(jax.random.PRNGKey(4))
    sd = export_tower(params["uniter"], with_img=True)
    sd["bert.encoder.layer.0.lora_A.weight"] = np.zeros(4, np.float32)
    with pytest.raises(ValueError, match="neither mapped"):
        map_cross_encoder(sd, num_layers=2)


def test_hf_buffers_skipped():
    """HF BertModel dumps serialize position_ids/token_type_ids buffers;
    they are explicitly skipped, not errors."""
    params = _biencoder_params()
    sd = export_tower(params["txt_model"], with_img=False)
    sd["bert.embeddings.position_ids"] = np.arange(48)[None]
    sd["bert.embeddings.token_type_ids"] = np.zeros((1, 48), np.int64)
    got = map_tower(sd, with_img=False, num_layers=2)
    assert compare_models(jax.tree.map(np.asarray, params["txt_model"]),
                          jax.tree.map(np.asarray, got), verbose=False) == 0


def test_stock_bert_heads_skipped():
    """BertForPreTraining dumps (bert-base-cased.pt family) carry MLM+NSP
    heads; loading the text tower skips them like HF from_pretrained."""
    params = _biencoder_params()
    sd = export_tower(params["txt_model"], with_img=False)
    sd["cls.predictions.bias"] = np.zeros(96, np.float32)
    sd["cls.predictions.decoder.weight"] = np.zeros((96, 32), np.float32)
    sd["cls.seq_relationship.weight"] = np.zeros((2, 32), np.float32)
    sd["cls.seq_relationship.bias"] = np.zeros(2, np.float32)
    got = map_tower(sd, with_img=False, num_layers=2)
    assert compare_models(jax.tree.map(np.asarray, params["txt_model"]),
                          jax.tree.map(np.asarray, got), verbose=False) == 0
