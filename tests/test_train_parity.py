"""Backward/optimizer parity vs the torch reference stack.

Everything before this file verified the FORWARD math against torch; this
suite closes the training loop:

  * optimizer-step parity on identical synthetic gradients — our
    scale_by_ref_adamw / FusedAdamW vs a torch implementation of the
    reference's AdamW update rule (transformers-2.x formula, vendored at
    uniter_model/optim/adamw.py:41-103), including the no-decay groups
    (dvl/models/bi_encoder.py:566-576), clip-then-step order
    (train_itm.py:252-289), and both schedule-index conventions
    (DPR LambdaLR vs UNITER post-increment);
  * leaf-wise GRADIENT parity of the bidirectional ITM NCE loss through
    both full towers vs torch autograd (the same modules the forward
    parity tests use, now with requires_grad);
  * gradient parity of the fused dropout ops (ops/fused.py custom VJPs)
    against torch autograd with the identical keep mask injected;
  * a 5-step end-to-end fine-tune: loss curve and final parameters of the
    shipped train step vs the torch loop.

Tolerances are stated per assertion; they are f32 accumulation-order
slack, not hidden semantics gaps — the optimizer tests in particular run
at ~1e-7, i.e. bit-level for f32.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.models.checkpoint_torch import map_tower
from lightningdot_tpu.training.itm_step import (create_train_state,
                                                itm_loss_fn,
                                                make_itm_train_step)
from lightningdot_tpu.training.optim import (make_fused_adamw,
                                             make_optimizer,
                                             schedule_linear)

SMALL = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=4, intermediate_size=64,
             max_position_embeddings=48, type_vocab_size=2)
IMG_DIM = 16


# ---------------------------------------------------------------------------
# The torch golden optimizer loop
# ---------------------------------------------------------------------------

class TorchRefAdamW(torch.optim.Optimizer):
    """The reference's AdamW update rule, reimplemented for golden values.

    transformers-2.x AdamW (imported by the DPR path at
    dvl/models/bi_encoder.py:36 and vendored at
    uniter_model/optim/adamw.py:41-103, correct_bias=True):

        m <- b1*m + (1-b1)*g ;  v <- b2*v + (1-b2)*g^2
        p <- p - lr*sqrt(1-b2^t)/(1-b1^t) * m/(sqrt(v)+eps)
        p <- p - lr*wd*p          (decoupled decay on the POST-step p)
    """

    def __init__(self, params, lr, betas=(0.9, 0.999), eps=1e-8,
                 weight_decay=0.0):
        super().__init__(params, dict(lr=lr, betas=betas, eps=eps,
                                      weight_decay=weight_decay))

    @torch.no_grad()
    def step(self, closure=None):
        for group in self.param_groups:
            b1, b2 = group["betas"]
            for p in group["params"]:
                if p.grad is None:
                    continue
                st = self.state[p]
                if not st:
                    st["t"] = 0
                    st["m"] = torch.zeros_like(p)
                    st["v"] = torch.zeros_like(p)
                st["t"] += 1
                t = st["t"]
                st["m"].mul_(b1).add_(p.grad, alpha=1.0 - b1)
                st["v"].mul_(b2).addcmul_(p.grad, p.grad, value=1.0 - b2)
                step_size = (group["lr"] * math.sqrt(1.0 - b2 ** t)
                             / (1.0 - b1 ** t))
                p.addcdiv_(st["m"], st["v"].sqrt().add(group["eps"]),
                           value=-step_size)
                if group["weight_decay"] > 0.0:
                    p.mul_(1.0 - group["lr"] * group["weight_decay"])


def ref_param_groups(model, weight_decay):
    """get_optimizer's grouping (dvl/models/bi_encoder.py:566-574):
    no_decay = ['bias', 'LayerNorm.weight'] matched by substring."""
    no_decay = ["bias", "LayerNorm.weight"]
    return [
        {"params": [p for n, p in model.named_parameters()
                    if not any(nd in n for nd in no_decay)],
         "weight_decay": weight_decay},
        {"params": [p for n, p in model.named_parameters()
                    if any(nd in n for nd in no_decay)],
         "weight_decay": 0.0},
    ]


def lambda_linear(warmup, total):
    """get_schedule_linear's lr_lambda (bi_encoder.py:668-680)."""

    def f(step):
        if step < warmup:
            return float(step) / float(max(1, warmup))
        return max(0.0, float(total - step) / float(max(1, total - warmup)))

    return f


def torch_opt_loop(model, grads_per_step, *, lr, warmup, total, wd,
                   max_norm, betas=(0.9, 0.999), eps=1e-8,
                   first_lr_step=0):
    """Reference driver loop: set grads -> clip -> step, with the schedule
    applied per the convention (train_itm.py:285-289 sets lr via LambdaLR
    = lambda(update_index); UNITER drivers read lr at update_index+1)."""
    opt = TorchRefAdamW(ref_param_groups(model, wd), lr=lr, betas=betas,
                        eps=eps)
    lam = lambda_linear(warmup, total)
    names = [n for n, _ in model.named_parameters()]
    for k, grads in enumerate(grads_per_step):
        for n, p in model.named_parameters():
            p.grad = torch.from_numpy(grads[n]).clone()
        if max_norm and max_norm > 0:
            torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm)
        for group in opt.param_groups:
            group["lr"] = lr * lam(k + first_lr_step)
        opt.step()
        model.zero_grad()
    del names
    return {n: p.detach().numpy().copy() for n, p in model.named_parameters()}


class _OptModel(torch.nn.Module):
    """Param set exercising every decay-group rule: a decayed kernel, a
    no-decay bias, and a LayerNorm (weight AND bias excluded)."""

    def __init__(self):
        super().__init__()
        self.dense = torch.nn.Linear(4, 8)
        self.LayerNorm = torch.nn.LayerNorm(8)


def _opt_pair(seed=0):
    torch.manual_seed(seed)
    model = _OptModel()
    params = {
        "dense": {"kernel": jnp.asarray(model.dense.weight.detach().numpy().T),
                  "bias": jnp.asarray(model.dense.bias.detach().numpy())},
        "ln": {"scale": jnp.asarray(model.LayerNorm.weight.detach().numpy()),
               "bias": jnp.asarray(model.LayerNorm.bias.detach().numpy())},
    }
    return model, params


def _draw_grads(rng, model, step):
    """Per-step torch-keyed grads; step 0 is large to force clipping."""
    scale = 30.0 if step == 0 else 0.3
    return {n: (rng.standard_normal(p.shape) * scale).astype(np.float32)
            for n, p in model.named_parameters()}


def _jax_grads(tg):
    return {
        "dense": {"kernel": jnp.asarray(tg["dense.weight"].T),
                  "bias": jnp.asarray(tg["dense.bias"])},
        "ln": {"scale": jnp.asarray(tg["LayerNorm.weight"]),
               "bias": jnp.asarray(tg["LayerNorm.bias"])},
    }


def _assert_opt_match(model_after, params, atol):
    ours = {
        "dense.weight": np.asarray(params["dense"]["kernel"]).T,
        "dense.bias": np.asarray(params["dense"]["bias"]),
        "LayerNorm.weight": np.asarray(params["ln"]["scale"]),
        "LayerNorm.bias": np.asarray(params["ln"]["bias"]),
    }
    for n, ref in model_after.items():
        np.testing.assert_allclose(ours[n], ref, atol=atol,
                                   err_msg=f"param {n}")


@pytest.mark.parametrize("convention", ["dpr", "uniter"])
def test_optimizer_steps_match_torch_reference(convention):
    """make_optimizer == the torch reference loop, leaf-wise at ~f32 bit
    level, over 6 steps spanning warmup, clip-active, and decay phases."""
    lr, warmup, total, wd, max_norm = 1e-3, 2, 10, 0.01, 0.5
    betas, eps, first = ((0.9, 0.999), 1e-8, 0) if convention == "dpr" \
        else ((0.9, 0.98), 1e-6, 1)
    model, params = _opt_pair()
    rng = np.random.default_rng(7)
    grads = [_draw_grads(rng, model, k) for k in range(6)]

    tx = make_optimizer(schedule_linear(lr, warmup, total), betas=betas,
                        adam_eps=eps, weight_decay=wd, max_grad_norm=max_norm,
                        first_lr_step=first)
    opt_state = tx.init(params)
    import optax
    for g in grads:
        updates, opt_state = tx.update(_jax_grads(g), opt_state, params)
        params = optax.apply_updates(params, updates)

    ref = torch_opt_loop(model, grads, lr=lr, warmup=warmup, total=total,
                         wd=wd, max_norm=max_norm, betas=betas, eps=eps,
                         first_lr_step=first)
    # 3e-7: f32 round-off between torch's in-place addcdiv chain and our
    # fused tree ops; torch's clip adds 1e-6 to the norm denominator (a
    # ~1e-7-relative scale difference when clipping engages)
    _assert_opt_match(ref, params, atol=3e-7)


def test_fused_adamw_matches_torch_reference():
    """The single-pass FusedAdamW == the torch reference loop (same run as
    above, through the fused apply)."""
    lr, warmup, total, wd, max_norm = 1e-3, 2, 10, 0.01, 0.5
    model, params = _opt_pair(seed=1)
    rng = np.random.default_rng(8)
    grads = [_draw_grads(rng, model, k) for k in range(6)]

    fused = make_fused_adamw(schedule_linear(lr, warmup, total),
                             weight_decay=wd, max_grad_norm=max_norm)
    st = fused.init(params)
    for g in grads:
        params, st = fused.apply(_jax_grads(g), st, params)

    ref = torch_opt_loop(model, grads, lr=lr, warmup=warmup, total=total,
                         wd=wd, max_norm=max_norm)
    _assert_opt_match(ref, params, atol=3e-7)


# ---------------------------------------------------------------------------
# Gradient parity through the full towers (ITM NCE loss)
# ---------------------------------------------------------------------------

def _hf_bert(seed):
    from transformers import BertConfig, BertModel
    cfg = BertConfig(hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, **SMALL)
    torch.manual_seed(seed)
    return BertModel(cfg)


def _torch_img_tower_modules(seed):
    from tests.test_encoder_parity import TorchUniterImageEmbeddings
    bert = _hf_bert(seed)
    torch.manual_seed(seed + 100)
    img_emb = TorchUniterImageEmbeddings(SMALL["hidden_size"], IMG_DIM)
    return bert, img_emb


def _build_pair(seed=0):
    """Matched (torch modules, jax BiEncoder+params)."""
    txt_bert = _hf_bert(seed)
    img_bert, img_emb = _torch_img_tower_modules(seed + 1)

    txt_params = map_tower(txt_bert.state_dict(), with_img=False,
                           num_layers=SMALL["num_hidden_layers"])
    sd = {f"bert.{k}": v for k, v in img_bert.state_dict().items()}
    for k, v in img_emb.state_dict().items():
        sd[f"bert.img_embeddings.{k}"] = v
    img_params = map_tower(sd, with_img=True,
                           num_layers=SMALL["num_hidden_layers"])

    nodrop = dict(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    txt_cfg = EncoderConfig(**SMALL, **nodrop)
    img_cfg = EncoderConfig(**SMALL, img_dim=IMG_DIM, **nodrop)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.float32)
    # np.array(copy) before jnp.asarray: the CPU backend zero-copy-aliases
    # numpy buffers, and the mapped arrays are views of the LIVE torch
    # storage — without the copy, the torch loop's in-place opt.step()
    # would silently mutate our params too
    params = jax.tree.map(lambda v: jnp.asarray(np.array(v, copy=True)),
                          {"txt_model": txt_params, "img_model": img_params})
    return (txt_bert, img_bert, img_emb), model, params


def _np_batch(bs, txt_len, n_regions, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ids": rng.integers(1, SMALL["vocab_size"], (bs, txt_len)).astype(
            np.int64),
        "tmask": np.ones((bs, txt_len), np.int64),
        "pos": np.broadcast_to(np.arange(txt_len), (bs, txt_len)).astype(
            np.int64).copy(),
        "cls": np.full((bs, 1), 42, np.int64),
        "imask": np.ones((bs, 1 + n_regions), np.int64),
        "feat": rng.standard_normal((bs, n_regions, IMG_DIM)).astype(
            np.float32),
        "fpos": rng.random((bs, n_regions, 7)).astype(np.float32),
    }


def _torch_txt_pooled(bert, nb):
    out = bert(input_ids=torch.from_numpy(nb["ids"]),
               attention_mask=torch.from_numpy(nb["tmask"]),
               position_ids=torch.from_numpy(nb["pos"]))
    # pooled = raw CLS hidden, NOT the tanh pooler (bi_encoder.py:120)
    return out.last_hidden_state[:, 0]


def _torch_img_pooled(bert, img_emb, nb):
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
    return hidden[:, 0]


def _torch_itm_loss(txt, img):
    """Bidirectional in-batch NCE (train_itm.py:197-222), torch golden."""
    pos = torch.arange(txt.shape[0])
    l1 = torch.nn.functional.nll_loss(
        torch.log_softmax(img @ txt.T, dim=1), pos)
    l2 = torch.nn.functional.nll_loss(
        torch.log_softmax(txt @ img.T, dim=1), pos)
    return 0.5 * l1 + 0.5 * l2


def _jax_batch(nb):
    return {
        "txts": {"input_ids": jnp.asarray(nb["ids"], jnp.int32),
                 "attention_mask": jnp.asarray(nb["tmask"], jnp.int32),
                 "position_ids": jnp.asarray(nb["pos"], jnp.int32)},
        "imgs": {"input_ids": jnp.asarray(nb["cls"], jnp.int32),
                 "attention_mask": jnp.asarray(nb["imask"], jnp.int32),
                 "img_feat": jnp.asarray(nb["feat"]),
                 "img_pos_feat": jnp.asarray(nb["fpos"])},
        "caps": None,
    }


def _grad_sd(model) -> dict:
    """{name: grad-as-numpy}, zeros for params outside the autodiff graph
    (e.g. the unused tanh pooler)."""
    return {n: (p.grad.numpy().copy() if p.grad is not None
                else np.zeros(p.shape, np.float32))
            for n, p in model.named_parameters()}


def _tree_max_diff(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(np.max(np.abs(np.asarray(x) - np.asarray(y)))),
        a, b)
    return max(jax.tree.leaves(diffs))


def test_itm_grads_match_torch():
    """Leaf-wise gradients of the bidirectional ITM NCE loss through BOTH
    towers vs torch autograd. Covers the shipped custom VJPs on the
    deterministic path (ops/layernorm, ops/attention._attention_nodrop,
    ops/ffn._ffn) end to end.

    Torch grads are carried into our tree layout through map_tower — the
    same (linear) mapping the checkpoints use, so a transpose/stack error
    there would also fail here.
    """
    (txt_bert, img_bert, img_emb), model, params = _build_pair()
    nb = _np_batch(bs=4, txt_len=12, n_regions=5, seed=3)

    txt = _torch_txt_pooled(txt_bert, nb)
    img = _torch_img_pooled(img_bert, img_emb, nb)
    loss_t = _torch_itm_loss(txt, img)
    loss_t.backward()

    g_txt = map_tower(_grad_sd(txt_bert), with_img=False,
                      num_layers=SMALL["num_hidden_layers"])
    sd = {f"bert.{k}": v for k, v in _grad_sd(img_bert).items()}
    for k, v in _grad_sd(img_emb).items():
        sd[f"bert.img_embeddings.{k}"] = v
    g_img = map_tower(sd, with_img=True,
                      num_layers=SMALL["num_hidden_layers"])
    g_ref = {"txt_model": g_txt, "img_model": g_img}

    batch = _jax_batch(nb)

    def loss_fn(p):
        loss, _ = itm_loss_fn(model, p, batch, None, deterministic=True)
        return loss

    loss_j, g_j = jax.value_and_grad(loss_fn)(params)

    assert abs(float(loss_j) - float(loss_t.detach())) < 1e-5
    # 1e-5: f32 order-of-accumulation slack; gradients are O(1e-2..1e-1)
    # at this size, so a sign error or a wrong VJP term is 3+ orders of
    # magnitude above this bound
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(path)),
        g_j, g_ref)


# ---------------------------------------------------------------------------
# Fused dropout ops (ops/fused.py custom VJPs) vs torch, identical mask
# ---------------------------------------------------------------------------

def test_dropout_add_ln_grads_match_torch():
    """_dal (dropout->residual-add->LayerNorm, ops/fused.py:99-129) vs
    torch autograd with the SAME keep mask injected on both sides."""
    from lightningdot_tpu.ops import fused

    rate, eps = 0.25, 1e-12
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 6, 32)).astype(np.float32)
    res = rng.standard_normal((4, 6, 32)).astype(np.float32)
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)
    g_out = rng.standard_normal((4, 6, 32)).astype(np.float32)

    key = jax.random.PRNGKey(11)
    keydata, impl = fused.key_data_of(key)
    keep = np.asarray(fused._keep_mask(keydata, rate, x.shape, impl))

    def f(x_, res_, scale_, bias_):
        return fused.dropout_add_ln(x_, res_, scale_, bias_, key, rate=rate,
                                    eps=eps)

    out_j, vjp = jax.vjp(f, jnp.asarray(x), jnp.asarray(res),
                         jnp.asarray(scale), jnp.asarray(bias))
    dx_j, dres_j, dscale_j, dbias_j = vjp(jnp.asarray(g_out))

    xt = torch.tensor(x, requires_grad=True)
    rt = torch.tensor(res, requires_grad=True)
    st = torch.tensor(scale, requires_grad=True)
    bt = torch.tensor(bias, requires_grad=True)
    keep_t = torch.from_numpy(keep.astype(np.float32))
    dropped = xt * keep_t / (1.0 - rate)
    out_t = torch.nn.functional.layer_norm(dropped + rt, (32,), st, bt, eps)
    out_t.backward(torch.from_numpy(g_out))

    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               atol=2e-6)
    for ours, ref in [(dx_j, xt.grad), (dres_j, rt.grad),
                      (dscale_j, st.grad), (dbias_j, bt.grad)]:
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_attention_prob_dropout_grads_match_torch():
    """_attn_drop (attention with probability dropout,
    ops/fused.py:183-283) vs torch autograd with the identical keep mask."""
    from lightningdot_tpu.ops import fused

    b, s, h, d = 2, 6, 4, 8
    rate = 0.2
    scale = d ** -0.5
    rng = np.random.default_rng(6)
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    bias = np.zeros((b, 1, 1, s), np.float32)
    bias[0, :, :, 4:] = -10000.0
    g_out = rng.standard_normal((b, s, h, d)).astype(np.float32)

    key = jax.random.PRNGKey(13)
    keydata, impl = fused.key_data_of(key)
    keep = np.asarray(fused._keep_mask(keydata, rate, (b, h, s, s), impl))

    def f(q_, k_, v_):
        return fused.attention_prob_dropout(
            q_, k_, v_, jnp.asarray(bias), key, rate=rate, scale=scale,
            prec=jax.lax.Precision.HIGHEST)

    out_j, vjp = jax.vjp(f, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    dq_j, dk_j, dv_j = vjp(jnp.asarray(g_out))

    qt = torch.tensor(q, requires_grad=True)
    kt = torch.tensor(k, requires_grad=True)
    vt = torch.tensor(v, requires_grad=True)
    keep_t = torch.from_numpy(keep.astype(np.float32))
    scores = torch.einsum("bqhd,bkhd->bhqk", qt, kt) * scale
    scores = scores + torch.from_numpy(bias)
    probs = torch.softmax(scores, dim=-1)
    probs = probs * keep_t / (1.0 - rate)
    out_t = torch.einsum("bhqk,bkhd->bqhd", probs, vt)
    out_t.backward(torch.from_numpy(g_out))

    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               atol=2e-5)
    for ours, ref in [(dq_j, qt.grad), (dk_j, kt.grad), (dv_j, vt.grad)]:
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# End-to-end: 5 fine-tune steps, loss curve + final params
# ---------------------------------------------------------------------------

def test_itm_finetune_5steps_matches_torch():
    """The shipped train step (itm_loss_fn + make_optimizer) tracks the
    torch reference loop (forward -> backward -> clip -> AdamW -> LambdaLR)
    step for step: per-step losses within 2e-5 and final params within
    1e-4 after 5 updates."""
    lr, warmup, total, max_norm = 1e-3, 2, 10, 2.0
    (txt_bert, img_bert, img_emb), model, params = _build_pair(seed=2)
    batches = [_np_batch(bs=4, txt_len=12, n_regions=5, seed=20 + i)
               for i in range(3)]

    # --- torch loop (get_optimizer defaults: wd=0, eps=1e-8)
    class _Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.txt = txt_bert
            self.img = img_bert
            self.img_emb = img_emb

    wrap = _Wrap()
    opt = TorchRefAdamW(ref_param_groups(wrap, 0.0), lr=lr)
    lam = lambda_linear(warmup, total)
    losses_t = []
    for step in range(5):
        nb = batches[step % len(batches)]
        loss = _torch_itm_loss(_torch_txt_pooled(txt_bert, nb),
                               _torch_img_pooled(img_bert, img_emb, nb))
        wrap.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(wrap.parameters(), max_norm)
        for group in opt.param_groups:
            group["lr"] = lr * lam(step)
        opt.step()
        losses_t.append(float(loss.detach()))

    # --- our loop
    tx = make_optimizer(schedule_linear(lr, warmup, total),
                        max_grad_norm=max_norm)
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_itm_train_step(model, tx), donate_argnums=())
    losses_j = []
    for step in range(5):
        batch = _jax_batch(batches[step % len(batches)])
        batch["valid_mask"] = jnp.ones((4,), jnp.float32)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        losses_j.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses_j, losses_t, atol=2e-5)

    ref_txt = map_tower({n: p.detach().numpy() for n, p in
                         txt_bert.named_parameters()}, with_img=False,
                        num_layers=SMALL["num_hidden_layers"])
    sd = {f"bert.{k}": v.detach().numpy()
          for k, v in img_bert.named_parameters()}
    for k2, v in img_emb.named_parameters():
        sd[f"bert.img_embeddings.{k2}"] = v.detach().numpy()
    ref_img = map_tower(sd, with_img=True,
                        num_layers=SMALL["num_hidden_layers"])

    # 1e-4 over 5 lr=1e-3 updates: Adam normalizes roundoff-scale gradient
    # differences toward +/-lr-scale updates, so the bound is a few percent
    # of one update's magnitude accumulated over the run — a wrong decay
    # mask or schedule index diverges by ~lr per step (10-50x this bound)
    drift = _tree_max_diff(state.params["txt_model"], ref_txt)
    assert drift < 1e-4, f"txt tower drift {drift}"
    drift = _tree_max_diff(state.params["img_model"], ref_img)
    assert drift < 1e-4, f"img tower drift {drift}"
