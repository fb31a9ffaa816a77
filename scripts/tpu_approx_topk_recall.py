"""Measured recall of the approx-top-k Retriever vs exact, on hardware.

approx_max_k is exact on CPU, so this has to run on the TPU. Reports
recall@{10,100} of `topk='approx'` (recall_target 0.95) against exact
lax.top_k over the full-COCO-scale corpus, on both random Gaussian and
correlated low-rank ("encoder-like") embeddings.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_approx_topk_recall.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.utils.runtime import setup_runtime

N, D, Q, K = 123_287, 768, 64, 100


def recall(corpus: np.ndarray, queries: np.ndarray) -> dict:
    c = jnp.asarray(corpus, jnp.bfloat16)
    q = jnp.asarray(queries, jnp.bfloat16)

    @jax.jit
    def exact(q, c):
        s = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)[1]

    @jax.jit
    def approx(q, c):
        s = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, K, recall_target=0.95)[1]

    ie = np.asarray(exact(q, c))
    ia = np.asarray(approx(q, c))
    out = {}
    for k in (10, 100):
        hits = sum(len(set(ie[r, :k]) & set(ia[r, :K])) for r in range(Q))
        out[k] = hits / (Q * k)
    return out


def main():
    setup_runtime()
    rng = np.random.default_rng(0)
    gauss_c = rng.standard_normal((N, D)).astype(np.float32)
    gauss_q = rng.standard_normal((Q, D)).astype(np.float32)
    print("gaussian:", recall(gauss_c, gauss_q), flush=True)

    # correlated low-rank embeddings (encoder-output-like: ~32 dominant
    # directions + noise, matching the int8-overlap test's regime)
    basis = rng.standard_normal((32, D)).astype(np.float32)
    cc = rng.standard_normal((N, 32)).astype(np.float32) @ basis
    cc += 0.1 * rng.standard_normal((N, D)).astype(np.float32)
    qq = rng.standard_normal((Q, 32)).astype(np.float32) @ basis
    qq += 0.1 * rng.standard_normal((Q, D)).astype(np.float32)
    print("encoder-like:", recall(cc, qq), flush=True)


if __name__ == "__main__":
    main()
