"""Measured-loser kernels, kept OFF the default import path.

Policy (VERDICT r3 item 7): a new kernel ships enabled, or it lands here
with its losing number recorded in PERF.md "Negative results" — the single
source of truth. Nothing in this package imports at trace time unless its
env gate is set; parity tests cover each kernel in interpret mode so the
code stays correct while parked.

Re-measure recipes (one line each, run on the attached TPU with
``PYTHONPATH=/root/.axon_site:/root/repo``; baseline numbers in PERF.md):

* ``attention_fused`` — fully fused Pallas attention (77.2 vs 63.5 ms/step):
  ``LDOT_ATTN_KERNEL=1 python scripts/perf_train_device_loop.py`` and
  ``python scripts/tpu_attn_kernel_check.py`` for correctness.
* ``adamw_pallas`` — fused AdamW sweep (72.9 vs 63.5 ms/step):
  ``LDOT_ADAMW_KERNEL=1 python scripts/perf_train_device_loop.py``.
* ``ffn_int8_pallas`` — fused int8 serving FFN (3.085 vs 3.064 ms/call):
  ``LDOT_INT8_FFN=1 LDOT_SERVE_TOPK=approx python
  scripts/perf_serving_quant.py 1 64``.
* ``ffn_dh1`` — fused FFN-backward dh1 (64.5 vs 63.5 ms/step):
  ``LDOT_FFN_DH1=1 python scripts/perf_train_device_loop.py``.

``python scripts/perf_train_device_loop.py sweep`` re-measures the training
kernels in one go (verify-skill step 6, once per round).
"""
