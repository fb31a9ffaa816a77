"""Golden parity: CrossEncoder joint forward + pooler + rank head vs torch.

Builds the UNITER joint computation out of HF torch BERT pieces (the same
math as uniter_model/model/model.py:312-387 + itm.py:36-41) and checks our
jax cross-encoder end to end through the checkpoint mapping.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.checkpoint_torch import map_cross_encoder
from lightningdot_tpu.models.cross_encoder import CrossEncoder
from tests.test_encoder_parity import SMALL, TorchUniterImageEmbeddings


@pytest.fixture(scope="module")
def torch_joint():
    from transformers import BertConfig, BertModel

    torch.manual_seed(7)
    bert = BertModel(BertConfig(hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0, **SMALL))
    bert.eval()
    img_emb = TorchUniterImageEmbeddings(SMALL["hidden_size"], img_dim=16)
    img_emb.eval()
    itm_output = torch.nn.Linear(SMALL["hidden_size"], 2)
    rank_output = torch.nn.Linear(SMALL["hidden_size"], 1)
    return bert, img_emb, itm_output, rank_output


def _state_dict(torch_joint):
    bert, img_emb, itm_output, rank_output = torch_joint
    sd = {f"bert.{k}": v for k, v in bert.state_dict().items()}
    for k, v in img_emb.state_dict().items():
        sd[f"bert.img_embeddings.{k}"] = v
    for k, v in itm_output.state_dict().items():
        sd[f"itm_output.{k}"] = v
    for k, v in rank_output.state_dict().items():
        sd[f"rank_output.{k}"] = v
    return sd


def test_cross_encoder_rank_scores_match_torch(torch_joint, rng):
    bert, img_emb, itm_output, rank_output = torch_joint
    cfg = EncoderConfig(**SMALL, img_dim=16, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    model = CrossEncoder(cfg)
    params = map_cross_encoder(_state_dict(torch_joint),
                               num_layers=cfg.num_hidden_layers)

    b, tl, nr = 3, 10, 5
    input_ids = rng.integers(1, SMALL["vocab_size"], (b, tl))
    img_feat = rng.standard_normal((b, nr, 16)).astype(np.float32)
    img_pos = rng.random((b, nr, 7)).astype(np.float32)
    mask = np.ones((b, tl + nr), np.int32)
    mask[1, tl + 3:] = 0  # partially masked regions

    # torch golden: txt emb ++ img emb -> layers -> tanh pooler -> rank head
    with torch.no_grad():
        temb = bert.embeddings(
            input_ids=torch.from_numpy(input_ids).long(),
            position_ids=torch.arange(tl)[None].expand(b, tl),
            token_type_ids=torch.zeros(b, tl, dtype=torch.long))
        type1 = bert.embeddings.token_type_embeddings(
            torch.ones(b, nr, dtype=torch.long))
        iemb = img_emb(torch.from_numpy(img_feat), torch.from_numpy(img_pos),
                       type1)
        hidden = torch.cat([temb, iemb], dim=1)
        ext = (1.0 - torch.from_numpy(mask).float()
               )[:, None, None, :] * -10000.0
        for layer in bert.encoder.layer:
            hidden = layer(hidden, attention_mask=ext)[0]
        pooled = torch.tanh(
            torch.nn.functional.linear(hidden[:, 0],
                                       bert.pooler.dense.weight,
                                       bert.pooler.dense.bias))
        ref_rank = rank_output(pooled).numpy()
        ref_itm = itm_output(pooled).numpy()

    batch = {
        "input_ids": jnp.asarray(input_ids),
        "position_ids": jnp.broadcast_to(jnp.arange(tl, dtype=jnp.int32),
                                         (b, tl)),
        "img_feat": jnp.asarray(img_feat),
        "img_pos_feat": jnp.asarray(img_pos),
        "attn_masks": jnp.asarray(mask),
    }
    ours_rank = model.rank_scores(params, batch)
    np.testing.assert_allclose(np.asarray(ours_rank), ref_rank, atol=3e-4)

    ours_itm, _ = model.itm_scores(params, batch, compute_loss=False)
    np.testing.assert_allclose(np.asarray(ours_itm), ref_itm, atol=3e-4)
