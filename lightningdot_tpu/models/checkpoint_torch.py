"""PyTorch checkpoint -> JAX pytree key mapping.

Loads the reference's released artifacts (LightningDot.pt, uniter-base.pt,
bert-base-cased.pt, coco-ft.pt, flickr-ft.pt — README.md:89-97,
bash/download_data.sh:12-18) into our parameter trees.

Handled formats (load_biencoder_checkpoint, dvl/models/bi_encoder.py:737-752
and eval_itm.py:97-107):
  * fine-tune ``CheckpointState`` dicts — weights under ``model_dict`` with
    ``txt_model.* / img_model.*`` prefixes;
  * pre-train state dicts — every key prefixed ``bert.`` (the BiEncoder inside
    BiEncoderForPretraining), stripped before mapping;
  * raw tower state dicts (HF bert / UNITER) with optional ``bert.`` prefix
    and historical ``gamma``/``beta`` LayerNorm names
    (uniter_model/model/model.py:165-177).

Linear weights are transposed torch [out,in] -> jax [in,out].

No-silently-dropped-keys property (VERDICT r3 item 5): every mapper
accounts for every source key — consumed, or matched by an explicit skip
list (logged), or the load RAISES. The reference drops unexpected keys
with a log line (uniter_model/model/model.py:178-195 ``load`` /
HF ``from_pretrained``); on artifact day a silently-ignored tensor is a
recall-parity bug, so strictness is the default (``strict=False`` opts
back into reference behavior).
"""
from __future__ import annotations

import logging
import pickle
from typing import Any, Dict, Iterable, Mapping

import numpy as np

logger = logging.getLogger(__name__)

# Keys the reference architectures TIE to other tensors — they appear in
# torch state dicts as duplicate references and are never loaded separately:
# the MLM decoder shares the word-embedding table
# (uniter_model/model/layer.py:212-215) and RegionFeatureRegression shares
# img_linear's weight (uniter_model/model/model.py:390-397).
_TIED_DUPLICATE_KEYS = frozenset({
    "cls.predictions.decoder.weight",
    "feat_regress.weight",
})
# Registered buffers HF BertModel serializes but no implementation loads.
_BUFFER_SUFFIXES = (".position_ids", ".token_type_ids")
# Head families that legitimately ride along when a *tower* is loaded from
# a bigger checkpoint: BERT's MLM/NSP heads (HF from_pretrained drops them
# the same way) and UNITER's pre-training / retrieval heads
# (uniter_model/model/model.py:419-432, itm.py:17-19).
_HEAD_FAMILY_PREFIXES = (
    "cls.", "feat_regress.", "region_classifier.", "itm_output.",
    "rank_output.",
    # mrm-nce heads (dvl/models/bi_encoder.py:310-313) — present in DVL
    # pre-train checkpoints (LightningDot.pt layout); the task itself is the
    # reference's dead branch (mirrored as a NotImplementedError here)
    "nce_output.", "nce_norm.",
)


class _Tracked(dict):
    """Dict that records which keys were read (``in`` checks don't count)."""

    def __init__(self, d: Mapping[str, Any]):
        super().__init__(d)
        self.consumed: set = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def _account_keys(sd: "_Tracked", *, context: str, strict: bool,
                  skip_prefixes: Iterable[str] = (),
                  skip_exact: Iterable[str] = frozenset()) -> None:
    """Enforce the no-silently-dropped-keys property for one mapper."""
    skip_prefixes = tuple(skip_prefixes)
    skip_exact = frozenset(skip_exact)
    skipped, leftovers = [], []
    for k in sd:
        if k in sd.consumed:
            continue
        if (k in skip_exact or k.endswith(_BUFFER_SUFFIXES)
                or (skip_prefixes and k.startswith(skip_prefixes))):
            skipped.append(k)
        else:
            leftovers.append(k)
    if skipped:
        logger.info("%s: explicitly skipping %d non-model keys: %s", context,
                    len(skipped), sorted(skipped))
    if leftovers and strict:
        raise ValueError(
            f"{context}: {len(leftovers)} checkpoint keys were neither "
            f"mapped nor on the explicit skip list: {sorted(leftovers)[:12]}"
            f"{'...' if len(leftovers) > 12 else ''} — refusing to drop "
            f"tensors silently (pass strict=False for reference-style "
            f"drop-with-a-log behavior)")
    if leftovers:
        logger.warning("%s: dropping %d unmapped keys (strict=False): %s",
                       context, len(leftovers), sorted(leftovers)[:12])


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pt file into a flat {key: np.ndarray} dict."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # older artifacts pickle argparse Namespaces etc. alongside the
        # tensors; fall back to full unpickling KNOWINGLY (runs pickle
        # code — only for files you trust). Any other failure (truncated
        # file, bad zip) propagates instead of being masked by a
        # confusing second-attempt error.
        logger.warning("%s is not loadable with weights_only=True; "
                       "falling back to full unpickling", path)
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model_dict" in sd:
        sd = sd["model_dict"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.float().numpy()
    return out


def normalize_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip wrapper prefixes and remap gamma/beta -> weight/bias."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        k = k.replace(".gamma", ".weight").replace(".beta", ".bias")
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def _lin(sd, prefix):
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def map_tower(sd: Mapping[str, np.ndarray], *, with_img: bool,
              num_layers: int = 12, strict: bool = True) -> Dict[str, Any]:
    """Map one tower's torch keys ('bert.*' + optional 'encode_proj.*').

    Accepts the tower state dict of BertEncoder / UniterEncoder
    (dvl/models/bi_encoder.py:76-196): the transformer under ``bert.`` and the
    optional projection Sequential under ``encode_proj.{0,2,3}``. Head
    families riding along in bigger dumps (``cls.*`` etc.) are explicitly
    skipped with a log line; any OTHER unconsumed key raises under
    ``strict`` (module docstring).
    """
    sd = normalize_keys(sd)
    # Tolerate a missing 'bert.' prefix (raw BertModel/UniterModel dumps).
    if not any(k.startswith("bert.") for k in sd):
        sd = {f"bert.{k}": v for k, v in sd.items()}
    sd = _Tracked(sd)

    emb = "bert.embeddings"
    tower: Dict[str, Any] = {
        "embeddings": {
            "word": sd[f"{emb}.word_embeddings.weight"],
            "position": sd[f"{emb}.position_embeddings.weight"],
            "token_type": sd[f"{emb}.token_type_embeddings.weight"],
            "ln": _ln(sd, f"{emb}.LayerNorm"),
        },
    }

    layers = []
    for i in range(num_layers):
        p = f"bert.encoder.layer.{i}"
        layers.append({
            "attn": {
                "query": _lin(sd, f"{p}.attention.self.query"),
                "key": _lin(sd, f"{p}.attention.self.key"),
                "value": _lin(sd, f"{p}.attention.self.value"),
                "output": _lin(sd, f"{p}.attention.output.dense"),
                "ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            },
            "mlp": {
                "intermediate": _lin(sd, f"{p}.intermediate.dense"),
                "output": _lin(sd, f"{p}.output.dense"),
                "ln": _ln(sd, f"{p}.output.LayerNorm"),
            },
        })
    # stack along layer axis for lax.scan
    tower["layers"] = _stack_trees(layers)

    if f"bert.pooler.dense.weight" in sd:
        tower["pooler"] = _lin(sd, "bert.pooler.dense")

    if with_img:
        ie = "bert.img_embeddings"
        tower["img_embeddings"] = {
            "img_linear": _lin(sd, f"{ie}.img_linear"),
            "img_ln": _ln(sd, f"{ie}.img_layer_norm"),
            "pos_linear": _lin(sd, f"{ie}.pos_linear"),
            "pos_ln": _ln(sd, f"{ie}.pos_layer_norm"),
            "mask_embedding": sd[f"{ie}.mask_embedding.weight"],
            "ln": _ln(sd, f"{ie}.LayerNorm"),
        }

    if "encode_proj.0.weight" in sd:
        tower["proj"] = {
            "fc1": _lin(sd, "encode_proj.0"),
            "ln": _ln(sd, "encode_proj.2"),
            "fc2": _lin(sd, "encode_proj.3"),
        }
    # heads may appear bare (dump already had 'bert.' keys) or prefixed
    # (the tolerant prefix-add above touched every key)
    head_skips = (_HEAD_FAMILY_PREFIXES
                  + tuple(f"bert.{p}" for p in _HEAD_FAMILY_PREFIXES))
    _account_keys(sd, context=f"map_tower(with_img={with_img})",
                  strict=strict, skip_prefixes=head_skips,
                  skip_exact=_TIED_DUPLICATE_KEYS
                  | {f"bert.{k}" for k in _TIED_DUPLICATE_KEYS})
    return tower


def _stack_trees(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def split_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    pl = prefix + "."
    return {k[len(pl):]: v for k, v in sd.items() if k.startswith(pl)}


def map_bi_encoder(sd: Mapping[str, np.ndarray], *, num_layers: int = 12,
                   strict: bool = True) -> Dict[str, Any]:
    """Map a full BiEncoder state dict -> {'txt_model','img_model'} tree.

    Handles both fine-tune ('txt_model.*'/'img_model.*') and pre-train
    ('bert.txt_model.*') layouts (bi_encoder.py:737-752).
    """
    sd = normalize_keys(sd)
    if not any(k.startswith(("txt_model.", "img_model.")) for k in sd):
        # pre-train checkpoint: towers under 'bert.'; everything else is a
        # pre-training head (BiEncoderForPretraining, bi_encoder.py:293-330)
        # — an explicit, logged skip. Unknown families still raise below.
        rest = _Tracked({k: v for k, v in sd.items()
                         if not k.startswith("bert.")})
        _account_keys(rest, context="map_bi_encoder(pretrain layout)",
                      strict=strict, skip_prefixes=_HEAD_FAMILY_PREFIXES,
                      skip_exact=_TIED_DUPLICATE_KEYS)
        sd = {k[len("bert."):]: v for k, v in sd.items()
              if k.startswith("bert.")}
    else:
        rest = _Tracked({k: v for k, v in sd.items()
                         if not k.startswith(("txt_model.", "img_model."))})
        _account_keys(rest, context="map_bi_encoder(fine-tune layout)",
                      strict=strict)
    return {
        "txt_model": map_tower(split_prefix(sd, "txt_model"), with_img=False,
                               num_layers=num_layers, strict=strict),
        "img_model": map_tower(split_prefix(sd, "img_model"), with_img=True,
                               num_layers=num_layers, strict=strict),
    }


def map_pretrain_model(sd: Mapping[str, np.ndarray], *, num_layers: int = 12,
                       strict: bool = True) -> Dict[str, Any]:
    """Map a BiEncoderForPretraining state dict -> {'bert', 'heads'}.

    Head-only state dicts (no 'bert.' keys) yield {'bert': None, 'heads'}.
    """
    sd = normalize_keys(sd)
    bert = {k[len("bert."):]: v for k, v in sd.items() if k.startswith("bert.")}
    sd = _Tracked(sd)
    heads: Dict[str, Any] = {}
    if "cls.predictions.transform.dense.weight" in sd:
        heads["mlm"] = {
            "transform": {
                "dense": _lin(sd, "cls.predictions.transform.dense"),
                "ln": _ln(sd, "cls.predictions.transform.LayerNorm"),
            },
            "bias": sd["cls.predictions.bias"],
        }
    if "feat_regress.net.0.weight" in sd:
        heads["feat_regress"] = {
            "dense": _lin(sd, "feat_regress.net.0"),
            "ln": _ln(sd, "feat_regress.net.2"),
            "bias": sd["feat_regress.bias"],
        }
    if "region_classifier.net.0.weight" in sd:
        heads["region_classifier"] = {
            "dense": _lin(sd, "region_classifier.net.0"),
            "ln": _ln(sd, "region_classifier.net.2"),
            "out": _lin(sd, "region_classifier.net.3"),
        }
    if "itm_output.weight" in sd:
        heads["itm_output"] = _lin(sd, "itm_output")
    # the towers are accounted inside map_bi_encoder; heads here. NSP is a
    # BERT-only head no UNITER/DVL architecture consumes
    # (cls.seq_relationship, present in stock BertForPreTraining dumps);
    # mrm-nce heads (nce_output/nce_norm) are the reference's dead branch
    # and are skipped like everywhere else (_HEAD_FAMILY_PREFIXES).
    _account_keys(sd, context="map_pretrain_model(heads)", strict=strict,
                  skip_prefixes=("bert.", "cls.seq_relationship.",
                                 "nce_output.", "nce_norm."),
                  skip_exact=_TIED_DUPLICATE_KEYS)
    return {"bert": (map_bi_encoder(bert, num_layers=num_layers,
                                    strict=strict)
                     if bert else None),
            "heads": heads}


def _rank_head(tree: Dict[str, Any], sd) -> None:
    """rank_output, seeded from the itm head when absent (itm.py:23-26)."""
    if "itm_output.weight" in sd:
        tree["itm_output"] = _lin(sd, "itm_output")
    if "rank_output.weight" in sd:
        tree["rank_output"] = _lin(sd, "rank_output")
    elif "itm_output.weight" in sd:
        tree["rank_output"] = {
            "kernel": tree["itm_output"]["kernel"][:, 1:2],
            "bias": tree["itm_output"]["bias"][1:2],
        }


def map_cross_encoder(sd: Mapping[str, np.ndarray], *, num_layers: int = 12,
                      strict: bool = True) -> Dict[str, Any]:
    """Map UniterForImageTextRetrieval (uniter_model/model/itm.py:12-27)."""
    sd = normalize_keys(sd)
    # map_tower accounts for everything except the retrieval heads (its
    # skip list); the heads are consumed right here, so strictness holds
    tree = {"uniter": map_tower(sd, with_img=True, num_layers=num_layers,
                                strict=strict)}
    _rank_head(tree, sd)
    return tree


def map_cross_encoder_fast(sd: Mapping[str, np.ndarray], *,
                           num_layers: int = 12, num_layers_img: int = 1,
                           strict: bool = True) -> Dict[str, Any]:
    """Map UniterForImageTextRetrievalFast (uniter_model/model/itm.py:140-163):
    full-depth ``bert`` text stream + ``img_bert`` image stream + heads."""
    sd = normalize_keys(sd)
    img_sd = {f"bert.{k}": v
              for k, v in split_prefix(sd, "img_bert").items()}
    main_sd = {k: v for k, v in sd.items() if not k.startswith("img_bert.")}
    tree = {
        "bert": map_tower(main_sd, with_img=True, num_layers=num_layers,
                          strict=strict),
        "img_bert": map_tower(img_sd, with_img=True,
                              num_layers=num_layers_img, strict=strict),
    }
    _rank_head(tree, sd)
    return tree


def load_biencoder_checkpoint(path: str, *, num_layers: int = 12,
                              strict: bool = True) -> Dict[str, Any]:
    """File -> BiEncoder params tree (any supported layout)."""
    sd = load_torch_state_dict(path)
    logger.info("loaded %d tensors from %s", len(sd), path)
    return map_bi_encoder(sd, num_layers=num_layers, strict=strict)


# ---------------------------------------------------------------------------
# Export (JAX pytree -> torch-layout state dict) — migration/round-trip aid
# ---------------------------------------------------------------------------

def _export_lin(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _export_ln(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def export_tower(tower: Mapping[str, Any], *, with_img: bool
                 ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`map_tower` (keys in the reference torch layout)."""
    sd: Dict[str, np.ndarray] = {}
    emb = tower["embeddings"]
    sd["bert.embeddings.word_embeddings.weight"] = np.asarray(emb["word"])
    sd["bert.embeddings.position_embeddings.weight"] = np.asarray(
        emb["position"])
    sd["bert.embeddings.token_type_embeddings.weight"] = np.asarray(
        emb["token_type"])
    _export_ln(sd, "bert.embeddings.LayerNorm", emb["ln"])

    import jax

    num_layers = jax.tree.leaves(tower["layers"])[0].shape[0]
    for i in range(num_layers):
        lp = jax.tree.map(lambda x: np.asarray(x)[i], tower["layers"])
        p = f"bert.encoder.layer.{i}"
        _export_lin(sd, f"{p}.attention.self.query", lp["attn"]["query"])
        _export_lin(sd, f"{p}.attention.self.key", lp["attn"]["key"])
        _export_lin(sd, f"{p}.attention.self.value", lp["attn"]["value"])
        _export_lin(sd, f"{p}.attention.output.dense", lp["attn"]["output"])
        _export_ln(sd, f"{p}.attention.output.LayerNorm", lp["attn"]["ln"])
        _export_lin(sd, f"{p}.intermediate.dense", lp["mlp"]["intermediate"])
        _export_lin(sd, f"{p}.output.dense", lp["mlp"]["output"])
        _export_ln(sd, f"{p}.output.LayerNorm", lp["mlp"]["ln"])

    if "pooler" in tower:
        _export_lin(sd, "bert.pooler.dense", tower["pooler"])
    if with_img and "img_embeddings" in tower:
        ie = tower["img_embeddings"]
        _export_lin(sd, "bert.img_embeddings.img_linear", ie["img_linear"])
        _export_ln(sd, "bert.img_embeddings.img_layer_norm", ie["img_ln"])
        _export_lin(sd, "bert.img_embeddings.pos_linear", ie["pos_linear"])
        _export_ln(sd, "bert.img_embeddings.pos_layer_norm", ie["pos_ln"])
        sd["bert.img_embeddings.mask_embedding.weight"] = np.asarray(
            ie["mask_embedding"])
        _export_ln(sd, "bert.img_embeddings.LayerNorm", ie["ln"])
    if "proj" in tower:
        _export_lin(sd, "encode_proj.0", tower["proj"]["fc1"])
        _export_ln(sd, "encode_proj.2", tower["proj"]["ln"])
        _export_lin(sd, "encode_proj.3", tower["proj"]["fc2"])
    return sd


def export_bi_encoder(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """BiEncoder params -> fine-tune-layout state dict
    ('txt_model.*'/'img_model.*')."""
    sd = {}
    for k, v in export_tower(params["txt_model"], with_img=False).items():
        sd[f"txt_model.{k}"] = v
    for k, v in export_tower(params["img_model"], with_img=True).items():
        sd[f"img_model.{k}"] = v
    return sd


def save_biencoder_pt(path: str, params: Mapping[str, Any]) -> None:
    """Write a torch-loadable CheckpointState file (trainer.py:44-63)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_bi_encoder(params).items()}
    torch.save({"model_dict": sd, "optimizer_dict": None,
                "scheduler_dict": None, "offset": 0, "epoch": 0,
                "encoder_params": None}, path)


def export_cross_encoder(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """CrossEncoder params -> UniterForImageTextRetrieval-layout state dict
    (inverse of :func:`map_cross_encoder`; uniter_model/model/itm.py:12-27).
    """
    sd = dict(export_tower(params["uniter"], with_img=True))
    for head in ("itm_output", "rank_output"):
        if head in params:
            _export_lin(sd, head, params[head])
    return sd


def save_cross_encoder_pt(path: str, params: Mapping[str, Any]) -> None:
    """Write a torch-loadable teacher checkpoint (bare state dict, the
    released uniter-base.pt shape)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_cross_encoder(params).items()}
    torch.save(sd, path)
