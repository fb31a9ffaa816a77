"""Torch-golden parity for the pre-training heads and their key mapping.

MLM head (tied decoder), region-feature regression (tied img_linear), and
region classification vs hand-built torch modules in the reference layout
(uniter_model/model/layer.py:205-233, model.py:390-416).
"""
import jax.numpy as jnp
import numpy as np
import torch

from lightningdot_tpu.models.bi_encoder import (apply_feat_regress,
                                                apply_mlm_head,
                                                apply_region_classifier,
                                                mrc_loss_from_logits)
from lightningdot_tpu.models.checkpoint_torch import map_pretrain_model

H, V, IMG_DIM, N_LABELS = 32, 50, 16, 9


class TorchMlmHead(torch.nn.Module):
    """BertOnlyMLMHead layout (layer.py:205-233): cls.predictions.*"""

    def __init__(self, emb_weight):
        super().__init__()
        self.transform_dense = torch.nn.Linear(H, H)
        self.transform_ln = torch.nn.LayerNorm(H, eps=1e-12)
        self.decoder = torch.nn.Linear(H, V, bias=False)
        self.decoder.weight = torch.nn.Parameter(emb_weight)
        self.bias = torch.nn.Parameter(torch.randn(V) * 0.1)

    def forward(self, x):
        h = torch.nn.functional.gelu(self.transform_dense(x))
        h = self.transform_ln(h)
        return self.decoder(h) + self.bias

    def state_dict_ref(self):
        return {
            "cls.predictions.transform.dense.weight": self.transform_dense.weight,
            "cls.predictions.transform.dense.bias": self.transform_dense.bias,
            "cls.predictions.transform.LayerNorm.weight": self.transform_ln.weight,
            "cls.predictions.transform.LayerNorm.bias": self.transform_ln.bias,
            "cls.predictions.decoder.weight": self.decoder.weight,
            "cls.predictions.bias": self.bias,
        }


def test_mlm_head_matches_torch(rng):
    emb = torch.randn(V, H)
    torch.manual_seed(0)
    head = TorchMlmHead(emb)
    head.eval()
    sd = dict(head.state_dict_ref())
    tree = map_pretrain_model({**sd}, num_layers=0)
    x = rng.standard_normal((4, 6, H)).astype(np.float32)
    with torch.no_grad():
        ref = head(torch.from_numpy(x)).numpy()
    ours = apply_mlm_head(tree["heads"]["mlm"], jnp.asarray(x),
                          jnp.asarray(emb.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_feat_regress_matches_torch(rng):
    """RegionFeatureRegression (model.py:390-403): net + tied weight."""
    torch.manual_seed(1)
    dense = torch.nn.Linear(H, H)
    ln = torch.nn.LayerNorm(H, eps=1e-12)
    img_linear_weight = torch.randn(H, IMG_DIM) * 0.1  # torch [out=H, in=img]
    bias = torch.randn(IMG_DIM) * 0.1
    x = rng.standard_normal((3, 5, H)).astype(np.float32)
    with torch.no_grad():
        h = ln(torch.nn.functional.gelu(dense(torch.from_numpy(x))))
        ref = torch.nn.functional.linear(h, img_linear_weight.t(), bias).numpy()

    sd = {"feat_regress.net.0.weight": dense.weight,
          "feat_regress.net.0.bias": dense.bias,
          "feat_regress.net.2.weight": ln.weight,
          "feat_regress.net.2.bias": ln.bias,
          "feat_regress.bias": bias}
    tree = map_pretrain_model(sd, num_layers=0)
    # our jax img_linear kernel layout is [img_dim, H] = torch weight.T
    kernel = jnp.asarray(img_linear_weight.numpy().T)
    ours = apply_feat_regress(tree["heads"]["feat_regress"], jnp.asarray(x),
                              kernel)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_region_classifier_and_mrc_loss_match_torch(rng):
    """RegionClassification (model.py:406-416) + kl/hard-label losses."""
    torch.manual_seed(2)
    d0 = torch.nn.Linear(H, H)
    ln = torch.nn.LayerNorm(H, eps=1e-12)
    d3 = torch.nn.Linear(H, N_LABELS)
    x = rng.standard_normal((2, 4, H)).astype(np.float32)
    with torch.no_grad():
        logits_ref = d3(ln(torch.nn.functional.gelu(
            d0(torch.from_numpy(x))))).numpy()

    sd = {"region_classifier.net.0.weight": d0.weight,
          "region_classifier.net.0.bias": d0.bias,
          "region_classifier.net.2.weight": ln.weight,
          "region_classifier.net.2.bias": ln.bias,
          "region_classifier.net.3.weight": d3.weight,
          "region_classifier.net.3.bias": d3.bias}
    tree = map_pretrain_model(sd, num_layers=0)
    logits = apply_region_classifier(tree["heads"]["region_classifier"],
                                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), logits_ref, atol=2e-5)

    soft = rng.random((2, 4, N_LABELS)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    # mrc-kl: F.kl_div(log_softmax(pred), soft, reduction='none')
    kl_ref = torch.nn.functional.kl_div(
        torch.log_softmax(torch.from_numpy(logits_ref), dim=-1),
        torch.from_numpy(soft), reduction="none").numpy()
    kl_ours = mrc_loss_from_logits(jnp.asarray(logits_ref),
                                   jnp.asarray(soft), "mrckl")
    np.testing.assert_allclose(np.asarray(kl_ours), kl_ref, atol=1e-5)

    # hard-label mrc: CE vs argmax over classes 1.. (+1), reference
    # bi_encoder.py:558-562
    hard_tgt = torch.from_numpy(soft[..., 1:]).argmax(-1) + 1
    ce_ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits_ref).reshape(-1, N_LABELS),
        hard_tgt.reshape(-1), reduction="none").numpy()
    ce_ours = np.asarray(mrc_loss_from_logits(
        jnp.asarray(logits_ref), jnp.asarray(soft), "mrc")).reshape(-1)
    np.testing.assert_allclose(ce_ours, ce_ref, atol=1e-5)
