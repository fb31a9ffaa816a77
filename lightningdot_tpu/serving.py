"""Interactive query serving (the demo path).

Parity: dvl/utils.py:191-233 + demo/utils.py — encode a corpus once, build a
dense index, then serve text queries in real time: tokenize -> one text-tower
forward -> ``search_knn`` (retrieve_query, dvl/utils.py:204-211).

TPU-native: the query path is one fused jitted program (token ids -> 768-d
vec -> MXU matmul vs the in-HBM corpus -> top-k) — the configuration measured
by bench.py.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.training.evaluator import BatchEncoder

QUERY_LEN_BUCKETS = (16, 32, 64)


class Retriever:
    """Serve text->image retrieval against a pre-encoded corpus."""

    def __init__(self, model: BiEncoder, params, tokenizer,
                 query_buckets: Sequence[int] = QUERY_LEN_BUCKETS,
                 mesh=None, quantization: Optional[str] = None):
        """``quantization='int8'`` stores the corpus as per-vector symmetric
        int8 (halves HBM traffic and memory vs bf16; scores accumulate in
        int32 on the MXU's 8-bit path, then rescale)."""
        if quantization not in (None, "int8"):
            raise ValueError(f"unknown quantization {quantization!r}")
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.query_buckets = query_buckets
        self.mesh = mesh               # shard the corpus over a dp mesh
        self.quantization = quantization
        self._corpus = None            # [N_pad, D] device array
        self._scales = None            # [N_pad] per-vector scales (int8)
        self._ids: List[Any] = []
        self._fns: Dict[int, Any] = {}

    # -- corpus --------------------------------------------------------------
    def set_corpus(self, ids: Sequence[Any], vectors: np.ndarray) -> None:
        n = vectors.shape[0]
        align = 128 * (self.mesh.devices.size if self.mesh is not None else 1)
        n_pad = -(-n // align) * align
        mat = np.zeros((n_pad, vectors.shape[1]), np.float32)
        mat[:n] = vectors
        bias = np.zeros((n_pad,), np.float32)
        bias[n:] = -1e30
        if self.quantization == "int8":
            scales = np.abs(mat).max(axis=1) / 127.0
            scales = np.maximum(scales, 1e-12)
            q = np.clip(np.rint(mat / scales[:, None]), -127, 127
                        ).astype(np.int8)
            self._corpus = jnp.asarray(q)
            self._scales = jnp.asarray(scales.astype(np.float32))
            self._bias = jnp.asarray(bias)
            self._ids = list(ids)
            self._fns.clear()
            return
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from lightningdot_tpu.parallel.mesh import DP_AXIS

            self._corpus = jax.device_put(
                mat, NamedSharding(self.mesh, P(DP_AXIS, None)))
            self._bias = jax.device_put(
                bias, NamedSharding(self.mesh, P(DP_AXIS)))
        else:
            self._corpus = jnp.asarray(mat)
            self._bias = jnp.asarray(bias)
        self._ids = list(ids)
        self._fns.clear()

    def save_corpus(self, path: str) -> None:
        arrays = {"vecs": np.asarray(self._corpus),
                  "bias": np.asarray(self._bias)}
        if self._scales is not None:
            arrays["scales"] = np.asarray(self._scales)
        np.savez(path + ".corpus.npz", **arrays)
        with open(path + ".ids.pkl", "wb") as f:
            pickle.dump((self._ids, self.quantization), f)

    def load_corpus(self, path: str) -> None:
        data = np.load(path + ".corpus.npz")
        with open(path + ".ids.pkl", "rb") as f:
            self._ids, quant = pickle.load(f)
        if quant != self.quantization:
            raise ValueError(
                f"corpus saved with quantization={quant!r}, retriever has "
                f"{self.quantization!r}")
        self._corpus = jnp.asarray(data["vecs"])
        self._bias = jnp.asarray(data["bias"])
        self._scales = (jnp.asarray(data["scales"])
                        if "scales" in data.files else None)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from lightningdot_tpu.parallel.mesh import DP_AXIS

            self._corpus = jax.device_put(
                self._corpus, NamedSharding(self.mesh, P(DP_AXIS, None)))
            self._bias = jax.device_put(
                self._bias, NamedSharding(self.mesh, P(DP_AXIS)))
        self._fns.clear()

    def warmup(self, tops: Sequence[int] = (100,)) -> None:
        """Precompile the fused query program for every (bucket, k) pair so
        first real queries hit the compiled path (cold compiles cost
        seconds; p50 latency claims assume warm programs)."""
        for L in self.query_buckets:
            ids = jnp.zeros((1, L), jnp.int32)
            mask = jnp.ones((1, L), jnp.int32)
            scales = (self._scales if self._scales is not None
                      else jnp.zeros((0,), jnp.float32))
            for top in tops:
                k = min(top, len(self._ids))
                self._query_fn(L, k)(self.params, ids, mask, self._corpus,
                                     self._bias, scales)

    # -- query ---------------------------------------------------------------
    def _query_fn(self, length: int, k: int):
        key = (length, k)
        fn = self._fns.get(key)
        if fn is None:
            model = self.model
            int8 = self.quantization == "int8"

            def run(params, ids, mask, corpus, bias, scales):
                sb = {"input_ids": ids, "attention_mask": mask,
                      "position_ids": jnp.broadcast_to(
                          jnp.arange(length, dtype=jnp.int32),
                          ids.shape)}
                vec = model.encode_txt(params, sb, deterministic=True)
                if int8:
                    # symmetric per-query int8: MXU 8-bit path, int32 accum
                    q_scale = jnp.maximum(
                        jnp.abs(vec).max(axis=-1, keepdims=True), 1e-12
                    ).astype(jnp.float32) / 127.0
                    q = jnp.clip(jnp.round(vec.astype(jnp.float32) / q_scale),
                                 -127, 127).astype(jnp.int8)
                    acc = jnp.dot(q, corpus.T,
                                  preferred_element_type=jnp.int32)
                    scores = (acc.astype(jnp.float32) * q_scale
                              * scales[None, :])
                else:
                    scores = jnp.dot(vec.astype(jnp.float32), corpus.T,
                                     preferred_element_type=jnp.float32)
                return jax.lax.top_k(scores + bias[None, :], k)

            fn = jax.jit(run)
            self._fns[key] = fn
        return fn

    def retrieve_query(self, query: str, top: int = 100
                       ) -> List[Tuple[Any, float]]:
        """dvl/utils.py:204-211 semantics -> [(db_id, score)] ranked."""
        return self.retrieve_batch([query], top=top)[0]

    def retrieve_batch(self, queries: Sequence[str], top: int = 100
                       ) -> List[List[Tuple[Any, float]]]:
        """Batched query path (one fused program per shape bucket)."""
        from lightningdot_tpu.data.padding import bucket_len

        token_lists = [self.tokenizer.encode(q) for q in queries]
        L = bucket_len(max(len(t) for t in token_lists), self.query_buckets)
        n = len(queries)
        ids = np.zeros((n, L), np.int32)
        mask = np.zeros((n, L), np.int32)
        for i, t in enumerate(token_lists):
            ids[i, :len(t)] = t[:L]
            mask[i, :len(t)] = 1
        k = min(top, len(self._ids))
        scales = (self._scales if self._scales is not None
                  else jnp.zeros((0,), jnp.float32))
        scores, idx = self._query_fn(L, k)(
            self.params, jnp.asarray(ids), jnp.asarray(mask), self._corpus,
            self._bias, scales)
        scores, idx = np.asarray(scores), np.asarray(idx)
        return [[(self._ids[i], float(s)) for i, s in zip(row_i, row_s)]
                for row_i, row_s in zip(idx, scores)]


def get_model_encoded_vecs(model: BiEncoder, params, dataloader
                           ) -> Dict[str, Any]:
    """Encode a whole dataloader (dvl/utils.py:214-233)."""
    encoder = BatchEncoder(model, params)
    img_embedding, caption_embedding, query_embedding = {}, {}, {}
    labels_img_name: List[Any] = []
    for batch in dataloader:
        txt, img, cap = encoder(batch)
        n_valid = batch["n_valid"]
        fnames = batch["img_fname"][:n_valid]
        tids = batch["txt_index"][:n_valid]
        img_embedding.update(
            {f: np.asarray(v) for f, v in zip(fnames, img[:n_valid])})
        if cap is not None:
            caption_embedding.update(
                {f: np.asarray(v) for f, v in zip(fnames, cap[:n_valid])})
        query_embedding.update(
            {t: np.asarray(v) for t, v in zip(tids, txt[:n_valid])})
        labels_img_name.extend(fnames)
    return {"img_embed": img_embedding, "caption_embed": caption_embedding,
            "txt_embed": query_embedding, "img_name": labels_img_name}


def display_img(img_meta: dict, name: str, img_only: bool = False) -> None:
    """dvl/utils.py:191-202 (requires matplotlib + image files on disk)."""
    import matplotlib.image as mpimg
    import matplotlib.pyplot as plt

    img = mpimg.imread(img_meta[name]["img_file"])
    plt.imshow(img)
    plt.show()
    if not img_only:
        print("annotation")
        print("\t" + "\n\t".join(img_meta[name]["annotation"]))
        print("caption")
        print("\t" + img_meta[name]["caption"][0])
