"""Model construction from run args (the BiEncoder.__init__ logic,
dvl/models/bi_encoder.py:199-229, minus torch)."""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from lightningdot_tpu.config import (BERT_BASE_CASED, BERT_BASE_UNCASED,
                                     EncoderConfig)
from lightningdot_tpu.models import checkpoint_torch as ckpt_torch
from lightningdot_tpu.models.bi_encoder import BiEncoder

_NAMED_CONFIGS = {
    "bert-base-cased": BERT_BASE_CASED,
    "bert-base-uncased": BERT_BASE_UNCASED,
    "bert-base": BERT_BASE_CASED,
}


def resolve_encoder_config(name_or_path: str, *, project_dim: int = 0,
                           dropout: Optional[float] = None) -> EncoderConfig:
    """HF-style name or a config JSON path -> EncoderConfig."""
    if name_or_path in _NAMED_CONFIGS:
        cfg = _NAMED_CONFIGS[name_or_path]
        d = cfg.to_dict()
    elif os.path.exists(name_or_path):
        d = EncoderConfig.from_json_file(name_or_path).to_dict()
    else:
        raise ValueError(f"unknown model config: {name_or_path!r}")
    d["project_dim"] = project_dim
    if dropout is not None:
        # init_encoder overrides both dropouts (bi_encoder.py:96-99)
        d["hidden_dropout_prob"] = dropout
        d["attention_probs_dropout_prob"] = dropout
    return EncoderConfig.from_dict(d)


def load_cross_encoder(checkpoint: str, *, model_config: Optional[str] = None,
                       margin: float = 0.2, compute_dtype=None
                       ) -> Tuple[Any, Any]:
    """Load a CrossEncoder from a teacher dir or a .pt file.

    Accepts: a directory holding config.json + (model.pt | model.npz), or a
    direct .pt/native checkpoint path (then ``model_config`` is required).
    Seeds the rank head from the itm head when absent (itm.py:23-26).
    """
    import jax.numpy as jnp

    from lightningdot_tpu.models import checkpoint_torch as ckpt_torch
    from lightningdot_tpu.models.cross_encoder import CrossEncoder

    if os.path.isdir(checkpoint):
        cfg_path = os.path.join(checkpoint, "config.json")
        if not os.path.exists(cfg_path):
            cfg_path = model_config
        pt = os.path.join(checkpoint, "model.pt")
        ckpt_path = pt if os.path.exists(pt) else os.path.join(checkpoint,
                                                               "model")
    else:
        cfg_path = model_config
        ckpt_path = checkpoint
    if cfg_path is None:
        raise ValueError("cross-encoder config not found; pass model_config")

    cfg = resolve_encoder_config(cfg_path)
    model = CrossEncoder(cfg, margin=margin,
                         compute_dtype=compute_dtype or jnp.float32)
    if ckpt_path.endswith(".pt"):
        sd = ckpt_torch.load_torch_state_dict(ckpt_path)
        params = ckpt_torch.map_cross_encoder(
            sd, num_layers=cfg.num_hidden_layers)
        init = model.init(jax.random.PRNGKey(0))
        init.update(params)
        params = init
        # map_cross_encoder already seeds rank_output from the itm head
        # when the checkpoint lacks one (itm.py:23-26); re-seeding here
        # would clobber a FINE-TUNED rank head (the old guard tested the
        # bare key 'rank_output', which never appears in torch state
        # dicts, so it re-seeded unconditionally)
    else:
        from lightningdot_tpu.training.checkpoints import load_checkpoint
        params, _, _ = load_checkpoint(
            ckpt_path, model_template=model.init(jax.random.PRNGKey(0)))
    return model, jax.tree.map(jnp.asarray, params)


def build_biencoder(args, *, seed: int = 0) -> Tuple[BiEncoder, Any]:
    """Construct the model + params; load checkpoints per args.

    Mirrors BiEncoder.__init__ (bi_encoder.py:203-229) +
    load_biencoder_checkpoint (bi_encoder.py:737-752).
    """
    if args.img_model_type != "uniter-base":
        raise ValueError(
            f"image encoder does not support {args.img_model_type}")
    if args.txt_model_type not in ("bert-base", "uniter-base"):
        raise ValueError(f"txt encoder does not support {args.txt_model_type}")

    project_dim = getattr(args, "project_dim", 0)
    txt_cfg = resolve_encoder_config(args.txt_model_config,
                                     project_dim=project_dim)
    img_cfg = resolve_encoder_config(args.img_model_config,
                                     project_dim=project_dim)

    dtype = (jnp.bfloat16 if getattr(args, "compute_dtype", "bf16") == "bf16"
             else jnp.float32)
    model = BiEncoder(
        txt_cfg, img_cfg,
        fix_txt_encoder=getattr(args, "fix_txt_encoder", False),
        fix_img_encoder=getattr(args, "fix_img_encoder", False),
        compute_dtype=dtype)
    params = model.init(jax.random.PRNGKey(seed))

    def _maybe(path):
        return path if path and str(path).lower() != "none" else None

    def _merge_tower(init_tower, loaded_tower):
        """Overlay loaded weights, KEEPING initialized subtrees the
        checkpoint lacks (e.g. a fresh projection head when loading
        bert-base/uniter-base into a project_dim model — the reference
        leaves encode_proj randomly initialized in that case)."""
        merged = dict(init_tower)
        merged.update(loaded_tower)
        return merged

    txt_ckpt = _maybe(getattr(args, "txt_checkpoint", None))
    if txt_ckpt:
        sd = ckpt_torch.load_torch_state_dict(txt_ckpt)
        params["txt_model"] = _merge_tower(
            params["txt_model"],
            ckpt_torch.map_tower(sd, with_img=False,
                                 num_layers=txt_cfg.num_hidden_layers))
    img_ckpt = _maybe(getattr(args, "img_checkpoint", None))
    if img_ckpt:
        sd = ckpt_torch.load_torch_state_dict(img_ckpt)
        params["img_model"] = _merge_tower(
            params["img_model"],
            ckpt_torch.map_tower(sd, with_img=True,
                                 num_layers=img_cfg.num_hidden_layers))

    bi_ckpt = _maybe(getattr(args, "biencoder_checkpoint", None))
    if bi_ckpt:
        if bi_ckpt.endswith(".pt"):
            params = ckpt_torch.load_biencoder_checkpoint(
                bi_ckpt, num_layers=txt_cfg.num_hidden_layers)
        else:
            from lightningdot_tpu.training.checkpoints import load_checkpoint
            params, _, _ = load_checkpoint(bi_ckpt, model_template=params)
    params = jax.tree.map(jnp.asarray, params)
    return model, params
