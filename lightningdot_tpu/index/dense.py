"""On-device dense indexes: exact inner-product top-k on the MXU.

Replaces FAISS ``IndexFlatIP`` (dvl/indexer/faiss_indexers.py:63-87). The
entire candidate corpus lives in device HBM as a [N_pad, D] matrix; a query
block is one matmul against it plus ``lax.top_k`` — the design called out in
SURVEY.md §3.1 ("full score matrix = one MXU matmul + lax.top_k").

``DenseShardedIndex`` shards the corpus across a dp mesh: each device scores
its shard, takes a local top-k, and the k*n_dev candidates are merged with an
all-gather over ICI — corpus capacity and QPS scale linearly with devices.

Serialization keeps the reference's two-file layout
(faiss_indexers.py:35-57): vectors + the index->db-id mapping.
"""
from __future__ import annotations

import functools
import pickle
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightningdot_tpu.parallel.mesh import DP_AXIS

NEG_INF = np.float32(-1e30)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnums=(3,))
def _topk_scores(queries: jnp.ndarray, corpus: jnp.ndarray,
                 pad_bias: jnp.ndarray, k: int):
    """[Q, D] x [N, D] -> (scores [Q, k], idx [Q, k]); padded rows bias -inf."""
    scores = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jax.lax.top_k(scores + pad_bias[None, :], k)


def _chunked_topk_impl(queries, corpus, pad_bias, k: int, chunk: int):
    """Streaming top-k body: scores computed per corpus chunk with a
    running merge, so the full [Q, N] matrix never hits HBM (N x Q can
    reach gigabytes during mining/eval over large corpora). Plain
    traceable function — jitted standalone below and reused inside the
    sharded index's shard_map."""
    q_n = queries.shape[0]
    n_chunks = corpus.shape[0] // chunk

    def body(c, carry):
        best_s, best_i = carry
        rows = jax.lax.dynamic_slice_in_dim(corpus, c * chunk, chunk)
        bias = jax.lax.dynamic_slice_in_dim(pad_bias, c * chunk, chunk)
        scores = jnp.dot(queries, rows.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) + bias[None, :]
        s, i = jax.lax.top_k(scores, k)
        i = i + c * chunk
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, i], axis=1)
        best_s, sel = jax.lax.top_k(cat_s, k)
        best_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return best_s, best_i

    init = (jnp.full((q_n, k), NEG_INF, jnp.float32),
            jnp.zeros((q_n, k), jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _topk_scores_chunked(queries: jnp.ndarray, corpus: jnp.ndarray,
                         pad_bias: jnp.ndarray, k: int, chunk: int):
    return _chunked_topk_impl(queries, corpus, pad_bias, k, chunk)


class DenseFlatIndex:
    """Exact inner-product index on a single device (or host CPU).

    API parity: DenseFlatIndexer (faiss_indexers.py:63-87).
    """

    def __init__(self, vector_sz: int, buffer_size: int = 50000,
                 device: Optional[Any] = None):
        self.vector_sz = vector_sz
        self.buffer_size = buffer_size
        self.index_id_to_db_id: List[Any] = []
        self._chunks: List[np.ndarray] = []
        self._corpus = None  # device array, built lazily
        self._pad_bias = None
        self._device = device

    # -- building ------------------------------------------------------------
    def index_data(self, data: Sequence[Tuple[Any, np.ndarray]]) -> None:
        """Add [(db_id, vector)] (faiss_indexers.py:69-80)."""
        if not len(data):
            return
        ids = [t[0] for t in data]
        vecs = np.ascontiguousarray(
            np.stack([np.asarray(t[1], np.float32).reshape(-1)
                      for t in data]))
        if vecs.shape[1] != self.vector_sz:
            raise ValueError(
                f"vector size {vecs.shape[1]} != index size {self.vector_sz}")
        self.index_id_to_db_id.extend(ids)
        self._chunks.append(vecs)
        self._corpus = None

    @property
    def ntotal(self) -> int:
        return len(self.index_id_to_db_id)

    def _padded_matrix(self, multiple: int) -> np.ndarray:
        if not self._chunks:
            raise ValueError("index is empty")
        mat = np.concatenate(self._chunks, axis=0)
        self._chunks = [mat]
        self._n_real = mat.shape[0]
        n_pad = _round_up(mat.shape[0], multiple)
        if n_pad != mat.shape[0]:
            mat = np.concatenate(
                [mat, np.zeros((n_pad - mat.shape[0], self.vector_sz),
                               np.float32)], axis=0)
        bias = np.zeros((n_pad,), np.float32)
        bias[self._n_real:] = NEG_INF
        return mat, bias

    def _build(self):
        if self._corpus is None:
            n = sum(c.shape[0] for c in self._chunks)
            # align to the streaming chunk whenever an 8192-query block
            # over this corpus would exceed SCORE_BUDGET, so the chunked
            # top-k kernel is always applicable when it is needed
            # (<=50 MB padding waste, only on corpora >32k rows)
            multiple = (self.CORPUS_CHUNK
                        if n * 8192 > self.SCORE_BUDGET else 128)
            mat, bias = self._padded_matrix(multiple)
            self._corpus = jnp.asarray(mat)
            self._pad_bias = jnp.asarray(bias)
            if self._device is not None:
                self._corpus = jax.device_put(self._corpus, self._device)
                self._pad_bias = jax.device_put(self._pad_bias, self._device)
        return self._corpus

    # cap on the transient [Q, N] score matrix before switching to the
    # streaming chunked kernel (elements; 256M f32 = 1 GB)
    SCORE_BUDGET = 256 * 1024 * 1024
    CORPUS_CHUNK = 16384

    # -- searching -----------------------------------------------------------
    def _search_block(self, qb: jnp.ndarray, k: int):
        n = self._corpus.shape[0]
        if (qb.shape[0] * n > self.SCORE_BUDGET
                and n % self.CORPUS_CHUNK == 0 and k <= self.CORPUS_CHUNK):
            return _topk_scores_chunked(qb, self._corpus, self._pad_bias, k,
                                        self.CORPUS_CHUNK)
        return _topk_scores(qb, self._corpus, self._pad_bias, k)

    def search_knn(self, query_vectors: np.ndarray, top_docs: int,
                   block: int = 8192
                   ) -> List[Tuple[List[Any], np.ndarray]]:
        """[(db_ids, scores)] per query (faiss_indexers.py:82-87)."""
        self._build()
        k = min(top_docs, self._n_real)
        q = np.asarray(query_vectors, np.float32)
        if q.ndim == 1:
            q = q[None]
        n = int(self._corpus.shape[0])
        if k > self.CORPUS_CHUNK or n % self.CORPUS_CHUNK != 0:
            # the chunked kernel can't apply: keep the transient [Q, N]
            # score matrix under SCORE_BUDGET by shrinking the query block
            block = min(block, max(128, self.SCORE_BUDGET // n // 128 * 128))
        # pad the (single or ragged-last) block up to a static shape: each
        # distinct block shape is a fresh 30s-2min remote compile
        block = min(block, _round_up(q.shape[0], 128))
        results = []
        for start in range(0, q.shape[0], block):
            qb = q[start:start + block]
            n_valid = qb.shape[0]
            if n_valid < block:
                qb = np.concatenate(
                    [qb, np.zeros((block - n_valid, qb.shape[1]),
                                  np.float32)], axis=0)
            scores, idx = self._search_block(jnp.asarray(qb), k)
            idx_np = np.asarray(idx)[:n_valid]
            scores_np = np.asarray(scores)[:n_valid]
            for row_idx, row_sc in zip(idx_np, scores_np):
                results.append(
                    ([self.index_id_to_db_id[i] for i in row_idx], row_sc))
        return results

    # -- persistence (faiss_indexers.py:35-57 layout) ------------------------
    def serialize(self, file: str) -> None:
        mat = np.concatenate(self._chunks, axis=0)
        np.save(file + ".index.npy", mat)
        with open(file + ".index_meta.dpr", "wb") as f:
            pickle.dump(self.index_id_to_db_id, f)

    def deserialize_from(self, file: str) -> None:
        mat = np.load(file + ".index.npy")
        with open(file + ".index_meta.dpr", "rb") as f:
            self.index_id_to_db_id = pickle.load(f)
        assert mat.shape[0] == len(self.index_id_to_db_id)
        self._chunks = [mat]
        self._corpus = None


# Alias matching the reference class name (drop-in for imports).
DenseFlatIndexer = DenseFlatIndex


class DenseShardedIndex(DenseFlatIndex):
    """Corpus sharded over a dp mesh; per-shard top-k + ICI all-gather merge.

    TPU-native replacement for scaling FAISS beyond one device: each device
    holds [N/n_dev, D]; search = local MXU matmul + local top_k(k), then the
    n_dev*k candidates are all-gathered and reduced to a global top-k.
    """

    def __init__(self, vector_sz: int, mesh: Mesh, buffer_size: int = 50000):
        super().__init__(vector_sz, buffer_size)
        self.mesh = mesh
        self._search_fn = None
        self._search_fn_k = None

    def _build(self):
        if self._corpus is None:
            n = sum(c.shape[0] for c in self._chunks)
            n_dev = self.mesh.devices.size
            # same budget rule as the flat index, per shard
            multiple = ((self.CORPUS_CHUNK
                         if n * 8192 > self.SCORE_BUDGET * n_dev else 128)
                        * n_dev)
            mat, bias = self._padded_matrix(multiple)
            self._corpus = jax.device_put(
                mat, NamedSharding(self.mesh, P(DP_AXIS, None)))
            self._pad_bias = jax.device_put(
                bias, NamedSharding(self.mesh, P(DP_AXIS)))
            self._search_fn = None
        return self._corpus

    def _searcher(self, k: int):
        if self._search_fn is not None and self._search_fn_k == k:
            return self._search_fn
        mesh = self.mesh
        n_dev = mesh.devices.size

        def shard_fn(q, shard, bias):
            n_local = shard.shape[0]
            # a small corpus on a wide mesh can have shards narrower than
            # k (hard-negative mining asks for pools up to 1000,
            # training/hn.py) — clamp the LOCAL k; the merged candidate
            # set (n_dev * k_local >= k, since k <= n_real <= N_pad) still
            # carries the global top-k
            k_local = min(k, n_local)
            if (q.shape[0] * n_local > self.SCORE_BUDGET
                    and n_local % self.CORPUS_CHUNK == 0
                    and k_local <= self.CORPUS_CHUNK):
                # streaming local top-k: the [Q, n_local] score matrix
                # never materializes (the flat index's budget protection,
                # applied per shard)
                s, i = _chunked_topk_impl(q, shard, bias, k_local,
                                          self.CORPUS_CHUNK)
            else:
                scores = jnp.dot(q, shard.T,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                s, i = jax.lax.top_k(scores + bias[None, :], k_local)
            i = i + jax.lax.axis_index(DP_AXIS) * n_local
            # merge candidates from all shards:
            # [n_dev, Q, k_local] -> [Q, n_dev*k_local]
            s_all = jax.lax.all_gather(s, DP_AXIS)
            i_all = jax.lax.all_gather(i, DP_AXIS)
            q_n = s.shape[0]
            s_cat = jnp.moveaxis(s_all, 0, 1).reshape(q_n, n_dev * k_local)
            i_cat = jnp.moveaxis(i_all, 0, 1).reshape(q_n, n_dev * k_local)
            s_top, sel = jax.lax.top_k(s_cat, k)
            i_top = jnp.take_along_axis(i_cat, sel, axis=1)
            return s_top, i_top

        shard_map = getattr(jax, "shard_map", None)
        specs = dict(mesh=mesh, in_specs=(P(), P(DP_AXIS, None), P(DP_AXIS)),
                     out_specs=(P(), P()))
        if shard_map is not None:
            fn = shard_map(shard_fn, check_vma=False, **specs)
        else:  # jax < 0.6: experimental API, check_rep kwarg
            from jax.experimental.shard_map import shard_map as legacy

            fn = legacy(shard_fn, check_rep=False, **specs)
        self._search_fn = jax.jit(fn)
        self._search_fn_k = k
        return self._search_fn

    def _search_block(self, qb: jnp.ndarray, k: int):
        search = self._searcher(k)
        qb = jax.device_put(qb, NamedSharding(self.mesh, P()))
        return search(qb, self._corpus, self._pad_bias)
