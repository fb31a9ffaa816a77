"""Gradient parity vs torch for the remaining training objectives.

tests/test_train_parity.py pins the ITM fine-tune path (grads, optimizer,
5-step curve); this file covers the rest of the training surface the same
way — leaf-wise torch-autograd gradient comparison through FULL models:

  * each pretrain task (MLM / MRFR / MRC-kl / ITM) through
    BiEncoderForPretraining incl. the tied MLM decoder and tied
    feat-regress weight (gradients must ACCUMULATE into the shared
    leaves, bi_encoder.py:300-301 / model.py:390-403) and the
    cls_concat='add' cross-tower fusion;
  * the pretrain KD formulas (T^2-scaled KL / mse, pretrain.py:409-428);
  * the ITM fine-tune KD term end to end through a real cross-encoder
    teacher (train_itm.py:224-239);
  * the teacher's sigmoid-triplet loss through the joint encoder + tanh
    pooler + rank head (uniter_model/model/itm.py:36-51);
  * the VQA BCE head (dvl/models/bi_encoder.py:683-734).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import (BiEncoder,
                                                BiEncoderForPretraining)
from lightningdot_tpu.models.checkpoint_torch import map_cross_encoder, \
    map_tower
from lightningdot_tpu.models.cross_encoder import CrossEncoder
from lightningdot_tpu.models.vqa import BiEncoderForVQA
from lightningdot_tpu.training.itm_step import itm_loss_fn, make_kd_fn
from lightningdot_tpu.training.pretrain_step import kd_loss, task_loss
from lightningdot_tpu.training.vqa_step import vqa_loss_fn
from tests.test_train_parity import (IMG_DIM, SMALL, _grad_sd, _hf_bert,
                                     _jax_batch, _np_batch,
                                     _torch_img_tower_modules)

H = SMALL["hidden_size"]
V = SMALL["vocab_size"]
N_LABELS = 9
ATOL = 2e-5  # f32 accumulation slack; gradients are O(1e-2..1e-1) here,
# so a wrong VJP term or sign sits 3+ orders of magnitude above this


def _snap(tree):
    """Deep-copy into jax arrays (the CPU backend zero-copy-aliases numpy
    views of live torch storage — see test_train_parity._build_pair)."""
    return jax.tree.map(lambda v: jnp.asarray(np.array(v, copy=True)), tree)


def _lin_params(mod):
    return {"kernel": mod.weight.detach().numpy().T,
            "bias": mod.bias.detach().numpy()}


def _ln_params(mod):
    return {"scale": mod.weight.detach().numpy(),
            "bias": mod.bias.detach().numpy()}


def _g(p):
    """Grad as numpy; zeros for params outside the autodiff graph (heads
    unused by the current task)."""
    return (p.grad.numpy() if p.grad is not None
            else np.zeros(tuple(p.shape), np.float32))


def _lin_grads(mod):
    return {"kernel": _g(mod.weight).T, "bias": _g(mod.bias)}


def _ln_grads(mod):
    return {"scale": _g(mod.weight), "bias": _g(mod.bias)}


def _assert_tree_close(ours, ref, atol=ATOL):
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol,
            err_msg=jax.tree_util.keystr(path)),
        ours, ref)


# ---------------------------------------------------------------------------
# Torch golden: the full pretrain model
# ---------------------------------------------------------------------------

class TorchPretrainHeads(torch.nn.Module):
    """MLM transform + tied decoder, feat-regress + tied img_linear,
    region classifier — the head stack of BiEncoderForPretraining
    (bi_encoder.py:295-319), with the ties realised by SHARING the
    parameter objects so torch accumulates gradients exactly like our
    tied-leaf reads do."""

    def __init__(self, word_emb_param, img_linear_param):
        super().__init__()
        self.mlm_dense = torch.nn.Linear(H, H)
        self.mlm_ln = torch.nn.LayerNorm(H, eps=1e-12)
        self.mlm_bias = torch.nn.Parameter(torch.randn(V) * 0.1)
        self.word_emb = word_emb_param          # shared, NOT a copy
        self.fr_dense = torch.nn.Linear(H, H)
        self.fr_ln = torch.nn.LayerNorm(H, eps=1e-12)
        self.fr_bias = torch.nn.Parameter(torch.randn(IMG_DIM) * 0.1)
        self.img_linear_w = img_linear_param    # shared, NOT a copy
        self.rc_dense = torch.nn.Linear(H, H)
        self.rc_ln = torch.nn.LayerNorm(H, eps=1e-12)
        self.rc_out = torch.nn.Linear(H, N_LABELS)

    def mlm(self, x):
        h = self.mlm_ln(torch.nn.functional.gelu(self.mlm_dense(x)))
        return torch.nn.functional.linear(h, self.word_emb) + self.mlm_bias

    def feat_regress(self, x):
        h = self.fr_ln(torch.nn.functional.gelu(self.fr_dense(x)))
        return torch.nn.functional.linear(h, self.img_linear_w.t(),
                                          self.fr_bias)

    def region_classify(self, x):
        return self.rc_out(self.rc_ln(
            torch.nn.functional.gelu(self.rc_dense(x))))


def _build_pretrain_pair(seed=0, cls_concat="add"):
    txt_bert = _hf_bert(seed)
    img_bert, img_emb = _torch_img_tower_modules(seed + 1)
    torch.manual_seed(seed + 50)
    heads = TorchPretrainHeads(img_bert.embeddings.word_embeddings.weight,
                               img_emb.img_linear.weight)

    txt_params = map_tower(txt_bert.state_dict(), with_img=False,
                           num_layers=SMALL["num_hidden_layers"])
    sd = {f"bert.{k}": v for k, v in img_bert.state_dict().items()}
    for k, v in img_emb.state_dict().items():
        sd[f"bert.img_embeddings.{k}"] = v
    img_params = map_tower(sd, with_img=True,
                           num_layers=SMALL["num_hidden_layers"])
    head_params = {
        "mlm": {"transform": {"dense": _lin_params(heads.mlm_dense),
                              "ln": _ln_params(heads.mlm_ln)},
                "bias": heads.mlm_bias.detach().numpy()},
        "feat_regress": {"dense": _lin_params(heads.fr_dense),
                         "ln": _ln_params(heads.fr_ln),
                         "bias": heads.fr_bias.detach().numpy()},
        "region_classifier": {"dense": _lin_params(heads.rc_dense),
                              "ln": _ln_params(heads.rc_ln),
                              "out": _lin_params(heads.rc_out)},
        "itm_output": {"kernel": np.zeros((H, 2), np.float32),
                       "bias": np.zeros((2,), np.float32)},
    }
    params = _snap({"bert": {"txt_model": txt_params,
                             "img_model": img_params},
                    "heads": head_params})

    nodrop = dict(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    txt_cfg = EncoderConfig(**SMALL, **nodrop)
    img_cfg = EncoderConfig(**SMALL, img_dim=IMG_DIM, **nodrop)
    bi = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.float32)
    model = BiEncoderForPretraining(bi, cls_concat=cls_concat,
                                    img_label_dim=N_LABELS)
    return (txt_bert, img_bert, img_emb, heads), model, params


def _torch_txt_seq(bert, nb):
    return bert(input_ids=torch.from_numpy(nb["ids"]),
                attention_mask=torch.from_numpy(nb["tmask"]),
                position_ids=torch.from_numpy(nb["pos"])).last_hidden_state


def _torch_img_seq(bert, img_emb, nb):
    b, r = nb["feat"].shape[:2]
    temb = bert.embeddings(input_ids=torch.from_numpy(nb["cls"]),
                           position_ids=torch.zeros(b, 1, dtype=torch.long),
                           token_type_ids=torch.zeros(b, 1, dtype=torch.long))
    type1 = bert.embeddings.token_type_embeddings(
        torch.ones(b, r, dtype=torch.long))
    iemb = img_emb(torch.from_numpy(nb["feat"]), torch.from_numpy(nb["fpos"]),
                   type1)
    hidden = torch.cat([temb, iemb], dim=1)
    ext = (1.0 - torch.from_numpy(nb["imask"]).float()
           )[:, None, None, :] * -10000.0
    for layer in bert.encoder.layer:
        hidden = layer(hidden, attention_mask=ext)[0]
    return hidden


def _gather(seq, pos):
    return torch.gather(seq, 1,
                        torch.from_numpy(pos)[:, :, None].expand(
                            -1, -1, seq.shape[-1]))


def _weighted_mean_t(loss, w):
    """training.pretrain_step.weighted_mean, torch side."""
    while w.dim() < loss.dim():
        w = w[..., None]
    denom = max(float(w.sum()) * (loss.numel() / w.numel()), 1.0)
    return (loss * w).sum() / denom


def _pretrain_grads(modules, model, params, batch, task):
    """(torch loss, torch grad tree, jax loss, jax grad tree)."""
    txt_bert, img_bert, img_emb, heads = modules

    def loss_fn(p):
        loss, _ = task_loss(model, p, batch, task, rng=None,
                            deterministic=True)
        return loss

    loss_j, g_j = jax.value_and_grad(loss_fn)(params)

    g_txt = map_tower(_grad_sd(txt_bert), with_img=False,
                      num_layers=SMALL["num_hidden_layers"])
    sd = {f"bert.{k}": v for k, v in _grad_sd(img_bert).items()}
    for k, v in _grad_sd(img_emb).items():
        sd[f"bert.img_embeddings.{k}"] = v
    g_img = map_tower(sd, with_img=True,
                      num_layers=SMALL["num_hidden_layers"])

    def g(p):
        return (p.grad.numpy() if p.grad is not None
                else np.zeros(p.shape, np.float32))

    g_heads = {
        "mlm": {"transform": {"dense": _lin_grads(heads.mlm_dense),
                              "ln": _ln_grads(heads.mlm_ln)},
                "bias": g(heads.mlm_bias)},
        "feat_regress": {"dense": {"kernel": g(heads.fr_dense.weight).T,
                                   "bias": g(heads.fr_dense.bias)},
                         "ln": {"scale": g(heads.fr_ln.weight),
                                "bias": g(heads.fr_ln.bias)},
                         "bias": g(heads.fr_bias)},
        "region_classifier": {"dense": {"kernel": g(heads.rc_dense.weight).T,
                                        "bias": g(heads.rc_dense.bias)},
                              "ln": {"scale": g(heads.rc_ln.weight),
                                     "bias": g(heads.rc_ln.bias)},
                              "out": {"kernel": g(heads.rc_out.weight).T,
                                      "bias": g(heads.rc_out.bias)}},
        "itm_output": {"kernel": np.zeros((H, 2), np.float32),
                       "bias": np.zeros((2,), np.float32)},
    }
    g_ref = {"bert": {"txt_model": g_txt, "img_model": g_img},
             "heads": g_heads}
    return loss_j, g_j, g_ref


def test_pretrain_mlm_grads_match_torch():
    """MLM with cls_concat='add' fusion and the TIED decoder: the word
    embedding leaf must receive embedding-lookup + decoder-matmul gradient
    contributions summed, exactly as torch's shared Parameter does."""
    modules, model, params = _build_pretrain_pair()
    txt_bert, img_bert, img_emb, heads = modules
    bs, tl, nr, m = 4, 12, 5, 3
    nb = _np_batch(bs=bs, txt_len=tl, n_regions=nr, seed=31)
    rng = np.random.default_rng(32)
    mpos = np.sort(rng.choice(tl, (bs, m), replace=False).astype(np.int64), 1)
    labels = rng.integers(1, V, (bs, m)).astype(np.int64)
    weights = np.ones((bs, m), np.float32)
    weights[0, 2] = 0.0  # a pad slot

    txt_seq = _torch_txt_seq(txt_bert, nb)
    img_seq = _torch_img_seq(img_bert, img_emb, nb)
    fused = txt_seq + img_seq[:, 0:1, :]
    hidden = _gather(fused, mpos)
    logits = heads.mlm(hidden)
    nll = -torch.log_softmax(logits, -1).gather(
        2, torch.from_numpy(labels)[:, :, None])[:, :, 0]
    loss_t = _weighted_mean_t(nll.reshape(-1),
                              torch.from_numpy(weights).reshape(-1))
    loss_t.backward()

    batch = _jax_batch(nb)
    batch["masked_positions"] = jnp.asarray(mpos, jnp.int32)
    batch["masked_labels"] = jnp.asarray(labels, jnp.int32)
    batch["masked_weights"] = jnp.asarray(weights)
    loss_j, g_j, g_ref = _pretrain_grads(modules, model, params, batch, "mlm")
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5
    _assert_tree_close(g_j, g_ref)


def test_pretrain_mrfr_grads_match_torch():
    """MRFR with the TIED img_linear weight: that leaf accumulates the
    image-embedding gradient AND the regression-head gradient."""
    modules, model, params = _build_pretrain_pair(seed=1)
    txt_bert, img_bert, img_emb, heads = modules
    bs, tl, nr, m = 3, 10, 6, 2
    nb = _np_batch(bs=bs, txt_len=tl, n_regions=nr, seed=41)
    rng = np.random.default_rng(42)
    # positions into the image tower sequence (region idx + 1 for CLS)
    rpos = np.sort(rng.choice(np.arange(1, nr + 1), (bs, m),
                              replace=False).astype(np.int64), 1)
    feat_targets = rng.standard_normal((bs, m, IMG_DIM)).astype(np.float32)
    weights = np.ones((bs, m), np.float32)
    weights[1, 0] = 0.0

    txt_seq = _torch_txt_seq(txt_bert, nb)
    img_seq = _torch_img_seq(img_bert, img_emb, nb)
    fused = img_seq + txt_seq[:, 0:1, :]
    hidden = _gather(fused, rpos)
    pred = heads.feat_regress(hidden)
    mse = (pred - torch.from_numpy(feat_targets)) ** 2
    loss_t = _weighted_mean_t(mse, torch.from_numpy(weights))
    loss_t.backward()

    batch = _jax_batch(nb)
    batch["img_masked_positions"] = jnp.asarray(rpos, jnp.int32)
    batch["feat_targets"] = jnp.asarray(feat_targets)
    batch["img_masked_weights"] = jnp.asarray(weights)
    loss_j, g_j, g_ref = _pretrain_grads(modules, model, params, batch,
                                         "mrfr")
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5
    _assert_tree_close(g_j, g_ref)


def test_pretrain_mrckl_grads_match_torch():
    modules, model, params = _build_pretrain_pair(seed=2)
    txt_bert, img_bert, img_emb, heads = modules
    bs, tl, nr, m = 3, 10, 6, 2
    nb = _np_batch(bs=bs, txt_len=tl, n_regions=nr, seed=51)
    rng = np.random.default_rng(52)
    rpos = np.sort(rng.choice(np.arange(1, nr + 1), (bs, m),
                              replace=False).astype(np.int64), 1)
    soft = rng.random((bs, m, N_LABELS)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    weights = np.ones((bs, m), np.float32)
    weights[2, 1] = 0.0

    txt_seq = _torch_txt_seq(txt_bert, nb)
    img_seq = _torch_img_seq(img_bert, img_emb, nb)
    fused = img_seq + txt_seq[:, 0:1, :]
    logits = heads.region_classify(_gather(fused, rpos))
    kl = torch.nn.functional.kl_div(torch.log_softmax(logits, -1),
                                    torch.from_numpy(soft),
                                    reduction="none")
    loss_t = _weighted_mean_t(kl, torch.from_numpy(weights))
    loss_t.backward()

    batch = _jax_batch(nb)
    batch["img_masked_positions"] = jnp.asarray(rpos, jnp.int32)
    batch["label_targets"] = jnp.asarray(soft)
    batch["img_masked_weights"] = jnp.asarray(weights)
    loss_j, g_j, g_ref = _pretrain_grads(modules, model, params, batch,
                                         "mrckl")
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5
    _assert_tree_close(g_j, g_ref)


def test_pretrain_itm_grads_match_torch():
    """Pretrain ITM: bidirectional NCE over pooled CLS vectors with
    pad-column masking (weights) — positives from the traced batch
    (bi_encoder.py forward_itm)."""
    modules, model, params = _build_pretrain_pair(seed=3)
    txt_bert, img_bert, img_emb, heads = modules
    bs = 4
    nb = _np_batch(bs=bs, txt_len=10, n_regions=5, seed=61)
    weights = np.ones((bs,), np.float32)
    weights[3] = 0.0  # pad row

    txt = _torch_txt_seq(txt_bert, nb)[:, 0]
    img = _torch_img_seq(img_bert, img_emb, nb)[:, 0]

    def nce(q, ctx):
        scores = q @ ctx.T
        col = torch.from_numpy((1.0 - weights))[None, :] * -1e30
        diag = torch.eye(bs)
        scores = scores + col * (1.0 - diag)
        return -torch.log_softmax(scores, 1).diagonal()

    nll = 0.5 * nce(txt, img) + 0.5 * nce(img, txt)
    loss_t = _weighted_mean_t(nll, torch.from_numpy(weights))
    loss_t.backward()

    batch = _jax_batch(nb)
    batch["weights"] = jnp.asarray(weights)
    loss_j, g_j, g_ref = _pretrain_grads(modules, model, params, batch,
                                         "itm")
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5
    _assert_tree_close(g_j, g_ref)


# ---------------------------------------------------------------------------
# KD formulas
# ---------------------------------------------------------------------------

def test_pretrain_kd_formula_grads_match_torch():
    """kd_loss (pretrain.py:409-428): T^2-scaled KL (mlm/mrc) and T-scaled
    mse (mrfr) — gradients wrt the STUDENT logits (the teacher is
    stop-gradient)."""
    rng = np.random.default_rng(70)
    T, w_kd = 2.0, 0.7
    bs, m = 3, 4
    s_logits = rng.standard_normal((bs, m, N_LABELS)).astype(np.float32)
    t_logits = rng.standard_normal((bs, m, N_LABELS)).astype(np.float32)
    weights = np.ones((bs, m), np.float32)
    weights[0, 1] = 0.0

    class _T:
        def task_logits(self, params, batch, task):
            return jnp.asarray(t_logits)

    batch = {"teacher": {}}

    def f(s):
        return kd_loss(_T(), None, batch, "mrc", s, jnp.asarray(weights),
                       T=T, kd_loss_weight=w_kd)

    loss_j, vjp = jax.vjp(f, jnp.asarray(s_logits))
    (ds_j,) = vjp(jnp.ones((), jnp.float32))

    st = torch.tensor(s_logits, requires_grad=True)
    kl = torch.nn.functional.kl_div(
        torch.log_softmax(st / T, -1),
        torch.softmax(torch.from_numpy(t_logits) / T, -1),
        reduction="none")
    loss_t = w_kd * T * T * _weighted_mean_t(kl, torch.from_numpy(weights))
    loss_t.backward()
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-6
    np.testing.assert_allclose(np.asarray(ds_j), st.grad.numpy(), atol=1e-6)

    # mrfr: mse between T-scaled logits
    def f2(s):
        return kd_loss(_T(), None, batch, "mrfr", s, jnp.asarray(weights),
                       T=T, kd_loss_weight=w_kd)

    loss_j2, vjp2 = jax.vjp(f2, jnp.asarray(s_logits))
    (ds_j2,) = vjp2(jnp.ones((), jnp.float32))
    st2 = torch.tensor(s_logits, requires_grad=True)
    sq = (torch.from_numpy(t_logits) / T - st2 / T) ** 2
    loss_t2 = w_kd * _weighted_mean_t(sq, torch.from_numpy(weights))
    loss_t2.backward()
    assert abs(float(loss_j2) - float(loss_t2.detach())) < 1e-6
    np.testing.assert_allclose(np.asarray(ds_j2), st2.grad.numpy(),
                               atol=1e-6)


def _build_teacher_pair(seed=7):
    from tests.test_cross_encoder_parity import _state_dict
    from tests.test_encoder_parity import TorchUniterImageEmbeddings
    bert = _hf_bert(seed)
    torch.manual_seed(seed + 1)
    img_emb = TorchUniterImageEmbeddings(H, img_dim=IMG_DIM)
    itm_output = torch.nn.Linear(H, 2)
    rank_output = torch.nn.Linear(H, 1)
    joint = (bert, img_emb, itm_output, rank_output)
    cfg = EncoderConfig(**SMALL, img_dim=IMG_DIM, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    model = CrossEncoder(cfg, margin=0.2)
    params = _snap(map_cross_encoder(_state_dict(joint),
                                     num_layers=SMALL["num_hidden_layers"]))
    return joint, model, params


def _torch_joint_rank(joint, ids, pos, feat, fpos, mask):
    bert, img_emb, itm_output, rank_output = joint
    b, tl = ids.shape
    nr = feat.shape[1]
    temb = bert.embeddings(input_ids=torch.from_numpy(ids),
                           position_ids=torch.from_numpy(pos),
                           token_type_ids=torch.zeros(b, tl,
                                                      dtype=torch.long))
    type1 = bert.embeddings.token_type_embeddings(
        torch.ones(b, nr, dtype=torch.long))
    iemb = img_emb(torch.from_numpy(feat), torch.from_numpy(fpos), type1)
    hidden = torch.cat([temb, iemb], dim=1)
    ext = (1.0 - torch.from_numpy(mask).float())[:, None, None, :] * -10000.0
    for layer in bert.encoder.layer:
        hidden = layer(hidden, attention_mask=ext)[0]
    pooled = torch.tanh(bert.pooler.dense(hidden[:, 0]))
    return rank_output(pooled)


def _joint_np_batch(n, tl, nr, seed):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, V, (n, tl)).astype(np.int64)
    pos = np.broadcast_to(np.arange(tl), (n, tl)).astype(np.int64).copy()
    feat = rng.standard_normal((n, nr, IMG_DIM)).astype(np.float32)
    fpos = rng.random((n, nr, 7)).astype(np.float32)
    mask = np.ones((n, tl + nr), np.int64)
    return ids, pos, feat, fpos, mask


def test_teacher_triplet_grads_match_torch():
    """Sigmoid-triplet loss through the full joint encoder + tanh pooler +
    rank head (uniter_model/model/itm.py:36-51) vs torch autograd."""
    joint, model, params = _build_teacher_pair()
    bert, img_emb, itm_output, rank_output = joint
    n_groups, sample_size, tl, nr = 2, 3, 8, 4
    n = n_groups * sample_size
    ids, pos, feat, fpos, mask = _joint_np_batch(n, tl, nr, seed=80)

    rank_t = _torch_joint_rank(joint, ids, pos, feat, fpos, mask)
    scores = torch.sigmoid(rank_t).view(-1, sample_size)
    loss_t = torch.clamp(0.2 + scores[:, 1:] - scores[:, :1], min=0).mean()
    loss_t.backward()

    batch = {"input_ids": jnp.asarray(ids, jnp.int32),
             "position_ids": jnp.asarray(pos, jnp.int32),
             "img_feat": jnp.asarray(feat),
             "img_pos_feat": jnp.asarray(fpos),
             "attn_masks": jnp.asarray(mask, jnp.int32)}

    def loss_fn(p):
        elems = model.apply(p, batch, compute_loss=True, deterministic=True,
                            sample_size=sample_size)
        return jnp.mean(elems)

    loss_j, g_j = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5

    from tests.test_cross_encoder_parity import _state_dict
    grad_sd = {}
    for k, v in _grad_sd(bert).items():
        grad_sd[f"bert.{k}"] = v
    for k, v in _grad_sd(img_emb).items():
        grad_sd[f"bert.img_embeddings.{k}"] = v
    for k, v in _grad_sd(itm_output).items():
        grad_sd[f"itm_output.{k}"] = v
    for k, v in _grad_sd(rank_output).items():
        grad_sd[f"rank_output.{k}"] = v
    g_ref = map_cross_encoder(grad_sd,
                              num_layers=SMALL["num_hidden_layers"])
    _assert_tree_close(g_j, g_ref)


def test_itm_kd_grads_match_torch():
    """The ITM fine-tune KD term (train_itm.py:224-239) end to end: student
    embeddings -> symmetrized blended score matrix -> T^2-scaled KL against
    a REAL cross-encoder teacher's rank scores, gradients wrt the student
    embeddings (the teacher is stop-gradient on both sides)."""
    joint, teacher, teacher_params = _build_teacher_pair(seed=9)
    bs, n_teacher, tl, nr, D = 3, 2, 8, 4, 16
    T = 2.0
    rng = np.random.default_rng(90)
    txt_e = rng.standard_normal((bs, D)).astype(np.float32)
    img_e = rng.standard_normal((bs, D)).astype(np.float32)
    # teacher pair grid: for each text, the first n_teacher images
    # (bs * n_teacher joint inputs)
    ids, pos, feat, fpos, mask = _joint_np_batch(bs * n_teacher, tl, nr,
                                                 seed=91)
    t_batch = {"input_ids": jnp.asarray(ids, jnp.int32),
               "position_ids": jnp.asarray(pos, jnp.int32),
               "img_feat": jnp.asarray(feat),
               "img_pos_feat": jnp.asarray(fpos),
               "attn_masks": jnp.asarray(mask, jnp.int32)}

    kd_fn = make_kd_fn(teacher, teacher_params, T=T, n_teacher=n_teacher)
    batch = {"teacher": t_batch}

    def f(txt, img):
        return kd_fn(None, batch, (txt, img, None))

    loss_j, vjp = jax.vjp(f, jnp.asarray(txt_e), jnp.asarray(img_e))
    dtxt_j, dimg_j = vjp(jnp.ones((), jnp.float32))

    with torch.no_grad():
        t_scores = _torch_joint_rank(joint, ids, pos, feat, fpos,
                                     mask).view(bs, n_teacher).T
    txt_t = torch.tensor(txt_e, requires_grad=True)
    img_t = torch.tensor(img_e, requires_grad=True)
    student = (0.5 * (img_t @ txt_t.T) + 0.5 * (txt_t @ img_t.T))[:n_teacher]
    loss_t = torch.nn.functional.kl_div(
        torch.log_softmax(student / T, 1),
        torch.softmax(t_scores / T, 1), reduction="mean") * T * T
    loss_t.backward()

    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5
    np.testing.assert_allclose(np.asarray(dtxt_j), txt_t.grad.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(dimg_j), img_t.grad.numpy(),
                               atol=ATOL)


# ---------------------------------------------------------------------------
# VQA
# ---------------------------------------------------------------------------

def test_vqa_grads_match_torch():
    """VQA BCE-with-logits through both towers + the Linear-GELU-LN-Linear
    answer head (dvl/models/bi_encoder.py:683-734, train_vqa.py:187-188)."""
    from tests.test_train_parity import _build_pair
    (txt_bert, img_bert, img_emb), bi, bi_params = _build_pair(seed=4)
    num_answer = 7
    torch.manual_seed(60)
    fc1 = torch.nn.Linear(2 * H, 4 * H)
    ln = torch.nn.LayerNorm(4 * H, eps=1e-12)
    fc2 = torch.nn.Linear(4 * H, num_answer)

    model = BiEncoderForVQA(bi, hidden_size=H, num_answer=num_answer)
    params = {"biencoder": bi_params,
              "vqa_output": _snap({"fc1": _lin_params(fc1),
                                   "ln": _ln_params(ln),
                                   "fc2": _lin_params(fc2)})}

    bs = 3
    nb = _np_batch(bs=bs, txt_len=10, n_regions=5, seed=62)
    rng = np.random.default_rng(63)
    targets = (rng.random((bs, num_answer)) < 0.3).astype(np.float32)
    valid = np.ones((bs,), np.float32)
    valid[2] = 0.0

    from tests.test_train_parity import _torch_img_pooled, _torch_txt_pooled
    q = _torch_txt_pooled(txt_bert, nb)
    ctx = _torch_img_pooled(img_bert, img_emb, nb)
    pooled = torch.cat([q, ctx], dim=1)
    scores = fc2(ln(torch.nn.functional.gelu(fc1(pooled))))
    elem = torch.nn.functional.binary_cross_entropy_with_logits(
        scores, torch.from_numpy(targets), reduction="none")
    loss_t = ((elem.sum(1) * torch.from_numpy(valid)).sum()
              / max(valid.sum(), 1.0))
    loss_t.backward()

    batch = _jax_batch(nb)
    batch["targets"] = jnp.asarray(targets)
    batch["valid_mask"] = jnp.asarray(valid)

    def loss_fn(p):
        loss, _ = vqa_loss_fn(model, p, batch, None, deterministic=True)
        return loss

    loss_j, g_j = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5

    g_txt = map_tower(_grad_sd(txt_bert), with_img=False,
                      num_layers=SMALL["num_hidden_layers"])
    sd = {f"bert.{k}": v for k, v in _grad_sd(img_bert).items()}
    for k, v in _grad_sd(img_emb).items():
        sd[f"bert.img_embeddings.{k}"] = v
    g_img = map_tower(sd, with_img=True,
                      num_layers=SMALL["num_hidden_layers"])

    def g(p):
        return p.grad.numpy() if p.grad is not None else np.zeros(
            p.shape, np.float32)

    g_ref = {"biencoder": {"txt_model": g_txt, "img_model": g_img},
             "vqa_output": {"fc1": {"kernel": g(fc1.weight).T,
                                    "bias": g(fc1.bias)},
                            "ln": {"scale": g(ln.weight),
                                   "bias": g(ln.bias)},
                            "fc2": {"kernel": g(fc2.weight).T,
                                    "bias": g(fc2.bias)}}}
    _assert_tree_close(g_j, g_ref)
