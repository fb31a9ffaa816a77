"""Per-op microbenchmarks at the exact train-step shapes (B=96).

Times each op with the serial-dependency while_loop slope method (the only
honest timing through the axon relay). Reports achieved TF/s or GB/s so the
train-step time budget can be reconciled op by op.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.utils.runtime import setup_runtime


def slope_time(make_step, n_iters=60):
    """make_step() -> (init_carry, body_fn); returns sec/iter."""
    carry0, body = make_step()

    @jax.jit
    def chained(carry, n):
        def cond(c):
            return c[0] < n

        def b(c):
            i, carry = c
            return i + 1, body(carry)

        return jax.lax.while_loop(cond, b, (jnp.int32(0), carry))

    def pull(out):
        leaf = jax.tree.leaves(out[1])[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    pull(chained(carry0, jnp.int32(1)))  # compile
    def total(n):
        t0 = time.perf_counter()
        pull(chained(carry0, jnp.int32(n)))
        return time.perf_counter() - t0

    base = min(total(2) for _ in range(3))
    long = min(total(2 + n_iters) for _ in range(3))
    return (long - base) / n_iters


def bench_matmul(m, k, n, dtype=jnp.bfloat16):
    w = jnp.asarray(np.random.randn(k, n) * 0.02, dtype)

    def make():
        x = jnp.asarray(np.random.randn(m, k) * 0.1, dtype)

        def body(x):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return y[:, :k].astype(dtype) if n >= k else jnp.pad(
                y, ((0, 0), (0, k - n))).astype(dtype)

        return x, body

    dt = slope_time(make)
    tf = 2 * m * k * n / dt / 1e12
    print(f"matmul [{m},{k}]x[{k},{n}] {jnp.dtype(dtype).name}: "
          f"{dt*1e6:.0f} us -> {tf:.1f} TF/s", flush=True)


def bench_matmul_f32w(m, k, n):
    """bf16 matmul but weights stored f32 and cast at use (our _dense)."""
    w = jnp.asarray(np.random.randn(k, n) * 0.02, jnp.float32)

    def make():
        x = jnp.asarray(np.random.randn(m, k) * 0.1, jnp.bfloat16)

        def body(x):
            y = jnp.dot(x, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return y[:, :k].astype(jnp.bfloat16)

        return x, body

    dt = slope_time(make)
    tf = 2 * m * k * n / dt / 1e12
    print(f"matmul f32-weights [{m},{k}]x[{k},{n}]: "
          f"{dt*1e6:.0f} us -> {tf:.1f} TF/s", flush=True)


def bench_attention(b, h, s, d, train=True):
    from lightningdot_tpu.ops import multi_head_attention

    rng = jax.random.key(0, impl="rbg")
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)

    def make():
        # projection-native [B, S, h, d] layout (ops/attention.py)
        q = jnp.asarray(np.random.randn(b, s, h, d) * 0.1, jnp.bfloat16)

        def body(q):
            out = multi_head_attention(
                q, q, q, bias, dropout_rate=0.1 if train else 0.0,
                dropout_rng=rng if train else None,
                deterministic=not train)
            return out

        return q, body

    dt = slope_time(make)
    flops = 4 * b * h * s * s * d
    print(f"attention[train={train}] [{b},{h},{s},{d}]: {dt*1e6:.0f} us "
          f"-> {flops/dt/1e12:.2f} TF/s", flush=True)


def bench_layernorm(rows, hdim):
    from lightningdot_tpu.ops import layer_norm

    scale = jnp.ones((hdim,), jnp.float32)
    bias = jnp.zeros((hdim,), jnp.float32)

    def make():
        x = jnp.asarray(np.random.randn(rows, hdim) * 0.1, jnp.bfloat16)

        def body(x):
            return layer_norm(x, scale, bias, 1e-12).astype(jnp.bfloat16)

        return x, body

    dt = slope_time(make)
    gb = 2 * rows * hdim * 2 / dt / 1e9
    print(f"layernorm [{rows},{hdim}]: {dt*1e6:.0f} us -> {gb:.0f} GB/s",
          flush=True)


def bench_full_layer(b, s, hdim=768, train=True):
    """One _bert_layer at the train shape."""
    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models import encoder as enc

    cfg = EncoderConfig(vocab_size=28996)
    lp = jax.tree.map(lambda x: x[0],
                      enc.init_layer_stack(jax.random.PRNGKey(0), cfg))
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)
    rng = jax.random.key(0, impl="rbg")

    def make():
        x = jnp.asarray(np.random.randn(b, s, hdim) * 0.1, jnp.bfloat16)

        def body(x):
            return enc._bert_layer(lp, cfg, x, bias,
                                   deterministic=not train,
                                   rng=rng if train else None,
                                   dtype=jnp.bfloat16)

        return x, body

    dt = slope_time(make)
    flops = 2 * b * s * (4 * hdim * hdim + 2 * hdim * 3072)
    print(f"bert_layer[train={train}] [{b},{s},{hdim}]: {dt*1e6:.0f} us "
          f"-> {flops/dt/1e12:.1f} TF/s", flush=True)


def main():
    setup_runtime()
    # dense shapes on the ITM train path
    bench_matmul(6240, 768, 768)
    bench_matmul(6240, 768, 3072)
    bench_matmul(6240, 3072, 768)
    bench_matmul_f32w(6240, 768, 768)
    bench_matmul(3072, 768, 768)
    # attention at img-tower/txt-tower shapes
    bench_attention(96, 12, 65, 64, train=True)
    bench_attention(96, 12, 65, 64, train=False)
    bench_attention(96, 12, 32, 64, train=True)
    # layernorm
    bench_layernorm(6240, 768)
    # one full layer fwd
    bench_full_layer(96, 65, train=True)
    bench_full_layer(96, 65, train=False)


if __name__ == "__main__":
    main()
