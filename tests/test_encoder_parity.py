"""Golden parity: our JAX towers vs torch reference math.

The text tower must reproduce HF BertModel (the reference's text encoder,
dvl/models/bi_encoder.py:76-123) bit-for-bit in f32; the image tower is
checked against a hand-built torch implementation of UNITER's image
embeddings + BertLayers (uniter_model/model/model.py:249-387).
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.models.checkpoint_torch import map_tower

SMALL = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=4, intermediate_size=64,
             max_position_embeddings=48, type_vocab_size=2)


def small_cfg(**kw):
    return EncoderConfig(**{**SMALL, **kw})


@pytest.fixture(scope="module")
def hf_bert():
    from transformers import BertConfig, BertModel
    cfg = BertConfig(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                     **SMALL)
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()
    return model


def test_text_tower_matches_hf_bert(hf_bert, rng):
    cfg = small_cfg()
    params = map_tower(hf_bert.state_dict(), with_img=False,
                       num_layers=cfg.num_hidden_layers)

    b, s = 3, 12
    ids = rng.integers(1, cfg.vocab_size, (b, s))
    mask = np.ones((b, s), np.int32)
    mask[1, 8:] = 0
    pos = np.broadcast_to(np.arange(s), (b, s))

    with torch.no_grad():
        ref = hf_bert(input_ids=torch.from_numpy(ids),
                      attention_mask=torch.from_numpy(mask).long(),
                      position_ids=torch.from_numpy(pos.copy()),
                      token_type_ids=None).last_hidden_state.numpy()

    seq, pooled = enc.encode_text(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(mask), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(seq), ref, atol=2e-4)
    # pooled = raw CLS hidden (bi_encoder.py:120), not the tanh pooler
    np.testing.assert_allclose(np.asarray(pooled), ref[:, 0], atol=2e-4)


class TorchUniterImageEmbeddings(torch.nn.Module):
    """uniter_model/model/model.py:249-273 reimplemented for golden values."""

    def __init__(self, hidden, img_dim=16, pos_dim=7):
        super().__init__()
        self.img_linear = torch.nn.Linear(img_dim, hidden)
        self.img_layer_norm = torch.nn.LayerNorm(hidden, eps=1e-12)
        self.pos_layer_norm = torch.nn.LayerNorm(hidden, eps=1e-12)
        self.pos_linear = torch.nn.Linear(pos_dim, hidden)
        self.mask_embedding = torch.nn.Embedding(2, img_dim, padding_idx=0)
        self.LayerNorm = torch.nn.LayerNorm(hidden, eps=1e-12)

    def forward(self, img_feat, img_pos_feat, type_embeddings, img_masks=None):
        if img_masks is not None:
            self.mask_embedding.weight.data[0, :].fill_(0)
            img_feat = img_feat + self.mask_embedding(img_masks.long())
        im = self.img_layer_norm(self.img_linear(img_feat))
        pos = self.pos_layer_norm(self.pos_linear(img_pos_feat))
        return self.LayerNorm(im + pos + type_embeddings)


def test_image_tower_matches_torch_reference(hf_bert, rng):
    img_dim = 16
    cfg = small_cfg(img_dim=img_dim)
    torch.manual_seed(1)
    t_img_emb = TorchUniterImageEmbeddings(cfg.hidden_size, img_dim)
    t_img_emb.eval()

    # assemble a tower state dict: HF bert encoder + img embeddings
    sd = {f"bert.{k}": v for k, v in hf_bert.state_dict().items()}
    for k, v in t_img_emb.state_dict().items():
        name = {"img_layer_norm": "img_layer_norm",
                "pos_layer_norm": "pos_layer_norm"}
        sd[f"bert.img_embeddings.{k}"] = v
    params = map_tower(sd, with_img=True, num_layers=cfg.num_hidden_layers)

    b, r = 2, 5
    cls_ids = np.full((b, 1), 42, np.int32)
    img_feat = rng.standard_normal((b, r, img_dim)).astype(np.float32)
    img_pos = rng.random((b, r, 7)).astype(np.float32)
    mask = np.ones((b, 1 + r), np.int32)
    mask[0, 4:] = 0

    # torch reference: [CLS txt emb] ++ img emb -> bert encoder
    with torch.no_grad():
        temb = hf_bert.embeddings(
            input_ids=torch.from_numpy(cls_ids).long(),
            position_ids=torch.zeros(b, 1, dtype=torch.long),
            token_type_ids=torch.zeros(b, 1, dtype=torch.long))
        type1 = hf_bert.embeddings.token_type_embeddings(
            torch.ones(b, r, dtype=torch.long))
        iemb = t_img_emb(torch.from_numpy(img_feat),
                         torch.from_numpy(img_pos), type1)
        emb = torch.cat([temb, iemb], dim=1)
        ext = (1.0 - torch.from_numpy(mask).float())[:, None, None, :] * -10000.0
        hidden = emb
        for layer in hf_bert.encoder.layer:
            hidden = layer(hidden, attention_mask=ext)[0]
        ref = hidden.numpy()

    seq, pooled = enc.encode_image(params, cfg, jnp.asarray(cls_ids),
                                   jnp.asarray(mask), jnp.asarray(img_feat),
                                   jnp.asarray(img_pos))
    np.testing.assert_allclose(np.asarray(seq), ref, atol=2e-4)


def test_masked_region_embedding(hf_bert, rng):
    """img_masks replaces masked features with the mask embedding row 1."""
    img_dim = 16
    cfg = small_cfg(img_dim=img_dim)
    torch.manual_seed(2)
    t_img_emb = TorchUniterImageEmbeddings(cfg.hidden_size, img_dim)
    t_img_emb.eval()
    sd = {f"bert.{k}": v for k, v in hf_bert.state_dict().items()}
    for k, v in t_img_emb.state_dict().items():
        sd[f"bert.img_embeddings.{k}"] = v
    params = map_tower(sd, with_img=True, num_layers=cfg.num_hidden_layers)

    b, r = 2, 4
    img_feat = rng.standard_normal((b, r, img_dim)).astype(np.float32)
    img_pos = rng.random((b, r, 7)).astype(np.float32)
    img_masks = np.zeros((b, r), np.int32)
    img_masks[0, 1] = 1

    with torch.no_grad():
        type1 = hf_bert.embeddings.token_type_embeddings(
            torch.ones(b, r, dtype=torch.long))
        ref = t_img_emb(torch.from_numpy(img_feat), torch.from_numpy(img_pos),
                        type1, torch.from_numpy(img_masks)).numpy()

    type1_j = params["embeddings"]["token_type"][1][None, None, :]
    ours = enc.img_embeddings(params["img_embeddings"], cfg,
                              jnp.asarray(img_feat), jnp.asarray(img_pos),
                              jnp.broadcast_to(type1_j, ref.shape),
                              img_masks=jnp.asarray(img_masks))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_projection_head_matches_torch(rng):
    cfg = small_cfg(project_dim=24)
    h = cfg.hidden_size
    torch.manual_seed(3)
    proj = torch.nn.Sequential(
        torch.nn.Linear(h, h * 2),
        torch.nn.GELU(),
        torch.nn.LayerNorm(h * 2, eps=1e-12),
        torch.nn.Linear(h * 2, cfg.project_dim))
    proj.eval()
    sd = {f"encode_proj.{k}": v for k, v in proj.state_dict().items()}
    # minimal tower for map_tower: reuse embeddings etc. not needed here
    from lightningdot_tpu.models.checkpoint_torch import _lin, _ln, normalize_keys
    sd = normalize_keys(sd)
    params = {"fc1": _lin(sd, "encode_proj.0"), "ln": _ln(sd, "encode_proj.2"),
              "fc2": _lin(sd, "encode_proj.3")}

    x = rng.standard_normal((5, h)).astype(np.float32)
    with torch.no_grad():
        ref = proj(torch.from_numpy(x)).numpy()
    ours = enc.projection_head(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)
