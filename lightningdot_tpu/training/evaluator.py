"""Corpus encoding + retrieval evaluation.

Parity: ``eval_model_on_dataloader`` (dvl/trainer.py:113-190) — encode every
batch with the bi-encoder, build img & txt indexes, kNN search both
directions, recall@{1,5,10}; and ``get_indexer`` (trainer.py:93-110).

TPU notes: the jitted encode step is cached per padded-shape bucket;
embeddings stay on device until the end (single device->host pull — host
round-trips through the interconnect relay are expensive).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.index import DenseFlatIndex, DenseShardedIndex
from lightningdot_tpu.models.bi_encoder import BiEncoder, BiEncoderNllLoss
from lightningdot_tpu.utils import metrics as M


def _shape_sig(batch) -> Tuple:
    def sig(x):
        return (x.shape, str(x.dtype)) if hasattr(x, "shape") else None
    return tuple(jax.tree.leaves(jax.tree.map(sig, {
        "t": batch["txts"], "i": batch["imgs"], "c": batch["caps"]})))


class BatchEncoder:
    """Jit-cached dual-tower encoder over host batches.

    The jit cache rides on the model instance (params are jit ARGUMENTS),
    so per-epoch evaluations (train_itm.py calls eval_model_on_dataloader
    every epoch) reuse the traced/lowered programs instead of re-tracing,
    and the cache is collected with the model.
    """

    def __init__(self, model: BiEncoder, params, f32_output: bool = True):
        self.model = model
        self.params = params
        self.f32 = f32_output
        caches = getattr(model, "_encoder_fns", None)
        if caches is None:
            caches = {}
            object.__setattr__(model, "_encoder_fns", caches)  # frozen dc
        self._fns = caches.setdefault(f32_output, {})

    def _model_batch(self, batch):
        mb = {"txts": batch["txts"], "imgs": batch["imgs"],
              "caps": batch["caps"]}
        return mb

    def __call__(self, batch):
        sig = _shape_sig(batch)
        fn = self._fns.get(sig)
        if fn is None:
            def encode(params, mb):
                txt, img, cap = self.model.apply(params, mb,
                                                 deterministic=True)
                if self.f32:
                    txt = txt.astype(jnp.float32) if txt is not None else None
                    img = img.astype(jnp.float32) if img is not None else None
                    cap = cap.astype(jnp.float32) if cap is not None else None
                return txt, img, cap

            fn = jax.jit(encode)
            self._fns[sig] = fn
        return fn(self.params, self._model_batch(batch))


@dataclasses.dataclass
class EvalResult:
    loss: float
    correct_ratio: float
    indexers: Tuple[Any, Any]                      # (img, txt)
    recall: Tuple[Optional[dict], Optional[dict]]  # (txt->img, img->txt)
    rank_results: Tuple[Optional[dict], Optional[dict]]
    embeddings: Dict[str, Dict[str, np.ndarray]]


def build_index(vector_size: int, *, mesh=None, hnsw: bool = False):
    """Index factory (trainer.py:97-100,122-127: args.hnsw_index switch)."""
    if hnsw:
        from lightningdot_tpu.index.hnsw import DenseHNSWFlatIndexer

        return DenseHNSWFlatIndexer(vector_size)
    if mesh is not None:
        return DenseShardedIndex(vector_size, mesh)
    return DenseFlatIndex(vector_size)


def eval_model_on_dataloader(model: BiEncoder, params, dataloader, *,
                             img2txt: Optional[dict] = None,
                             num_tops: int = 100, no_eval: bool = False,
                             vector_size: int = 768,
                             caption_score_weight: float = 0.0,
                             mesh=None, hnsw: bool = False) -> EvalResult:
    """trainer.py:113-190 semantics."""
    if not no_eval and img2txt is None:
        raise ValueError("img2txt is required unless no_eval=True (the "
                         "img->txt recall needs the ground-truth mapping)")
    encoder = BatchEncoder(model, params)
    batches, total_samples = 0, 0
    loss_chunks: List[Any] = []          # device scalars — pulled once at
    correct_chunks: List[Any] = []       # the end (relay RTTs are ~ms each)
    txt_vec_chunks: List[Any] = []
    img_vec_chunks: List[Any] = []
    txt_ids: List[Any] = []
    img_fnames: List[Any] = []

    for batch in dataloader:
        txt, img, cap = encoder(batch)
        n_valid = batch["n_valid"]

        # in-batch diagnostic loss over the REAL rows only (padded rows are
        # duplicates and would bias the metric)
        loss, correct, _ = BiEncoderNllLoss.calc(
            txt[:n_valid], img[:n_valid],
            cap[:n_valid] if cap is not None else None,
            jnp.arange(n_valid), None, caption_score_weight)
        loss_chunks.append(loss)
        correct_chunks.append(correct)
        batches += 1
        total_samples += n_valid

        txt_vec_chunks.append(txt[:n_valid])
        img_vec_chunks.append(img[:n_valid])
        txt_ids.extend(batch["txt_index"][:n_valid])
        img_fnames.extend(batch["img_fname"][:n_valid])

    # single device->host pull for the whole corpus (and the metrics)
    txt_np = np.asarray(jnp.concatenate(txt_vec_chunks, axis=0))
    img_np = np.asarray(jnp.concatenate(img_vec_chunks, axis=0))
    total_loss = float(np.asarray(jnp.stack(loss_chunks)).sum())
    total_correct = int(np.asarray(jnp.stack(correct_chunks)).sum())

    # dict semantics of the reference: later duplicates overwrite
    # (trainer.py:151-152), and queries keep insertion order
    txt_embedding = {i: v for i, v in zip(txt_ids, txt_np)}
    img_embedding = {f: v for f, v in zip(img_fnames, img_np)}

    indexer_img = build_index(vector_size, mesh=mesh, hnsw=hnsw)
    indexer_img.index_data(list(img_embedding.items()))
    indexer_txt = build_index(vector_size, mesh=mesh, hnsw=hnsw)
    indexer_txt.index_data(list(txt_embedding.items()))

    avg_loss = total_loss / max(batches, 1)
    correct_ratio = total_correct / max(float(total_samples), 1.0)

    if no_eval:
        return EvalResult(avg_loss, correct_ratio,
                          (indexer_img, indexer_txt), (None, None),
                          (None, None),
                          {"txt": txt_embedding, "img": img_embedding})

    # text -> image retrieval (trainer.py:167-168)
    query_txt = np.stack([txt_embedding[i] for i in txt_ids])
    res_txt = indexer_img.search_knn(query_txt, num_tops)
    rank_txt_res = {q: r[0] for q, r in zip(txt_ids, res_txt)}

    # image -> text retrieval (trainer.py:170-171)
    query_img = np.stack([img_embedding[f] for f in img_fnames])
    res_img = indexer_txt.search_knn(query_img, num_tops)
    rank_img_res = {q: r[0] for q, r in zip(img_fnames, res_img)}

    gt_img_of_txt = {t: f for t, f in zip(txt_ids, img_fnames)}
    recall_txt = M.recall_from_ranked_ids(txt_ids, rank_txt_res, gt_img_of_txt)
    recall_img = M.recall_any_from_ranked_ids(img_fnames, rank_img_res,
                                              img2txt)

    return EvalResult(avg_loss, correct_ratio, (indexer_img, indexer_txt),
                      (recall_txt, recall_img), (rank_txt_res, rank_img_res),
                      {"txt": txt_embedding, "img": img_embedding})


def get_indexer(model: BiEncoder, params, dataloader, *, vector_size=768,
                img_retrieval=True, mesh=None, hnsw: bool = False):
    """trainer.py:93-110: encode one side and build its index."""
    encoder = BatchEncoder(model, params)
    embedding = {}
    for batch in dataloader:
        txt, img, _ = encoder(batch)
        n_valid = batch["n_valid"]
        if img_retrieval:
            vecs = np.asarray(img[:n_valid])
            keys = batch["img_fname"][:n_valid]
        else:
            vecs = np.asarray(txt[:n_valid])
            keys = batch["txt_index"][:n_valid]
        embedding.update({k: v for k, v in zip(keys, vecs)})
    index = build_index(vector_size, mesh=mesh, hnsw=hnsw)
    index.index_data(list(embedding.items()))
    return index
