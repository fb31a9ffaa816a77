"""Activation functions.

The reference uses the exact (erf-form) GELU everywhere
(uniter_model/model/layer.py:31-37); HF's default bert also uses erf GELU.
We keep the erf form for checkpoint / numerical parity — XLA fuses it into
the surrounding matmul epilogue on TPU, so no separate kernel is needed.
"""
import jax.numpy as jnp
from jax import lax


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact GELU: x * 0.5 * (1 + erf(x / sqrt(2)))."""
    return x * 0.5 * (1.0 + lax.erf(x * (2 ** -0.5)))
