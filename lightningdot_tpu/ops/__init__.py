"""Fused TPU ops (Pallas) with XLA reference fallbacks.

The reference got its fused kernels from NVIDIA apex (FusedLayerNorm in every
BertLayer, uniter_model/model/layer.py:25; amp half-precision einsums). Here
the equivalents are Pallas TPU kernels, selected per-process by
:func:`backend`:

  * ``pallas`` — fused kernels (TPU only);
  * ``xla``    — pure jnp implementations (identical math; used on CPU in
    tests and as autodiff reference).
"""

from lightningdot_tpu.ops.backend import backend, set_backend  # noqa: F401
from lightningdot_tpu.ops.activations import gelu  # noqa: F401
from lightningdot_tpu.ops.layernorm import layer_norm  # noqa: F401
from lightningdot_tpu.ops.attention import multi_head_attention  # noqa: F401
from lightningdot_tpu.ops.fused import dropout_add_ln  # noqa: F401
from lightningdot_tpu.ops.ffn import ffn_gelu  # noqa: F401
