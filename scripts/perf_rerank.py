"""Stage-2 re-ranking throughput: cross-encoder pair scoring on the TPU.

The two-stage pipeline (rerank.py) re-scores the dual encoder's top-K with
the joint UNITER cross-encoder (reference semantics rerank.py:256-290,
score files from uniter_model/inf_itm.py). This measures the scoring
program CrossScorer jits — full-size tower (12L/768/28996), joint sequence
= txt bucket + region bucket — with the slope method (serially-dependent
while_loop closed by a host pull; see bench.py for why).

    python scripts/perf_rerank.py [pair_block ...]   (default: 128 256)

Reading the result: re-ranking one query's top-K costs K/(pairs/s);
stage-1 retrieval is ~0.5 ms (PERF.md serving), so e.g. top-20 re-ranked
end-to-end = 0.5 ms + 20/pairs_per_sec.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.cross_encoder import CrossEncoder
from lightningdot_tpu.utils.runtime import setup_runtime

TXT_LEN, N_REGIONS = 32, 64  # joint seq 96 (reference caps at 512)


def measure(model, params, pair_block: int, n_iters: int = 24) -> float:
    """ms per scoring call at [pair_block, TXT_LEN + N_REGIONS]."""
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(106, 28996, (pair_block, TXT_LEN)), jnp.int32),
        "position_ids": jnp.broadcast_to(
            jnp.arange(TXT_LEN, dtype=jnp.int32), (pair_block, TXT_LEN)),
        "img_feat": jnp.asarray(
            rng.standard_normal((pair_block, N_REGIONS, 2048)), jnp.float32),
        "img_pos_feat": jnp.asarray(
            rng.random((pair_block, N_REGIONS, 7)), jnp.float32),
        "attn_masks": jnp.ones((pair_block, TXT_LEN + N_REGIONS), jnp.int32),
    }

    def score(params, batch):
        return model.rank_scores(params, batch)[:, 0]

    @jax.jit
    def chained(params, batch, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, ids, acc = c
            b = dict(batch, input_ids=ids)
            s = score(params, b)
            ids = (ids + s[0].astype(jnp.int32)) % 28000 + 106
            return i + 1, ids, acc + s[0]

        return jax.lax.while_loop(
            cond, body, (jnp.int32(0), batch["input_ids"], jnp.float32(0)))

    float(chained(params, batch, jnp.int32(1))[2])  # compile + sync

    def total(n):
        t0 = time.perf_counter()
        float(chained(params, batch, jnp.int32(n))[2])
        return time.perf_counter() - t0

    slopes = sorted((total(2 + n_iters) - total(2)) / n_iters
                    for _ in range(5))
    return slopes[2] * 1000.0


def main():
    blocks = [int(a) for a in sys.argv[1:]] or [128, 256]
    setup_runtime()
    cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
    model = CrossEncoder(cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    for b in blocks:
        ms = measure(model, params, b)
        pps = b / ms * 1000.0
        print(f"pair_block {b:4d}: {ms:7.2f} ms/call -> {pps:8,.0f} pairs/s"
              f" | rerank top-20 adds {20 / pps * 1000:5.2f} ms/query,"
              f" top-100 adds {100 / pps * 1000:5.2f} ms/query", flush=True)


if __name__ == "__main__":
    main()
