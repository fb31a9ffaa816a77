"""Optimal-transport (IPOT) auxiliary ITM distance.

Parity: uniter_model/model/ot.py:8-83 — masked cosine cost matrix, IPOT
iterations (data-independent trip count -> ``lax.fori_loop``), trace of
C @ T as the transport distance. Gradients flow only through the cost
matrix (T is computed under stop_gradient, matching ``@torch.no_grad``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cost_matrix_cosine(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-5
                       ) -> jnp.ndarray:
    """Batched pairwise cosine distance [B,Lx,D],[B,Ly,D] -> [B,Lx,Ly]
    (ot.py:8-18)."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return 1.0 - jnp.einsum("bld,bmd->blm", xn, yn)


def ipot(C, x_len, x_pad, y_len, y_pad, joint_pad, beta: float,
         iteration: int, k: int):
    """ot.py:32-63. C [B,M,N]; pads are bool (True = padded)."""
    b, m, n = C.shape
    sigma = jnp.where(x_pad, 0.0, 1.0 / x_len[:, None])          # [B, M]
    T = jnp.where(jnp.swapaxes(joint_pad, 1, 2), 0.0,
                  jnp.ones((b, n, m), C.dtype))                  # [B, N, M]
    A = jnp.where(jnp.swapaxes(joint_pad, 1, 2), 0.0,
                  jnp.exp(-jnp.swapaxes(C, 1, 2) / beta))

    x_len_b = x_len[:, None, None]
    y_len_b = y_len[:, None, None]
    x_mask = (x_pad.astype(C.dtype) * 1e4)[:, None, :]           # [B,1,M]
    y_mask = (y_pad.astype(C.dtype) * 1e4)[:, None, :]           # [B,1,N]

    def outer(_, carry):
        T, sigma = carry
        Q = A * T                                                # [B,N,M]

        def inner(_, carry):
            sigma, _ = carry
            delta = 1.0 / (y_len_b * jnp.einsum("bnm,bm->bn", Q, sigma
                                                )[:, None, :] + y_mask)
            sigma_new = 1.0 / (x_len_b * jnp.einsum("bon,bnm->bom", delta, Q)
                               + x_mask)
            return sigma_new.reshape(b, m), delta

        sigma, delta = jax.lax.fori_loop(
            0, k, inner, (sigma, jnp.zeros((b, 1, n), C.dtype)))
        # T uses the delta from the final inner iteration (ot.py:59-61)
        T = delta.reshape(b, n, 1) * Q * sigma[:, None, :]
        return T, sigma

    T, _ = jax.lax.fori_loop(0, iteration, outer, (T, sigma))
    return jnp.where(jnp.swapaxes(joint_pad, 1, 2), 0.0, T)


def optimal_transport_dist(txt_emb, img_emb, txt_pad, img_pad,
                           beta: float = 0.5, iteration: int = 50,
                           k: int = 1) -> jnp.ndarray:
    """ot.py:66-83: per-example transport distance [B]."""
    cost = cost_matrix_cosine(txt_emb, img_emb)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)
    txt_len = (txt_pad.shape[1] - txt_pad.sum(axis=1)).astype(cost.dtype)
    img_len = (img_pad.shape[1] - img_pad.sum(axis=1)).astype(cost.dtype)
    T = ipot(jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
             joint_pad, beta, iteration, k)
    # trace(C @ T): einsum over matching diag
    distance = jnp.einsum("bmn,bnm->b", cost, jax.lax.stop_gradient(T))
    return distance
