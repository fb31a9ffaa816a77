"""Attention layout experiments at the train shapes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.utils.runtime import setup_runtime
from scripts.perf_micro import slope_time  # noqa: F401  (same method)


def slope(make_step, n_iters=60):
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
        return float(jnp.sum(jax.tree.leaves(out[1])[0]
                             .astype(jnp.float32)))

    pull(chained(carry0, jnp.int32(1)))

    def total(n):
        t0 = time.perf_counter()
        pull(chained(carry0, jnp.int32(n)))
        return time.perf_counter() - t0

    base = min(total(2) for _ in range(3))
    long = min(total(2 + n_iters) for _ in range(3))
    return (long - base) / n_iters


def bench_attn_bshd(b, h, s, d, train=True):
    """einsum attention in [B,S,h,d] layout — no explicit transposes."""
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)
    rng = jax.random.key(0, impl="rbg")

    def make():
        q = jnp.asarray(np.random.randn(b, s, h, d) * 0.1, jnp.bfloat16)

        def body(q):
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, q,
                                preferred_element_type=jnp.float32) * 0.125
            scores = scores + bias
            probs = jax.nn.softmax(scores, axis=-1)
            if train:
                keep = jax.random.bernoulli(rng, 0.9, probs.shape)
                probs = jnp.where(keep, probs / 0.9, 0.0)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), q,
                             preferred_element_type=jnp.float32)
            return out.astype(q.dtype)

        return q, body

    dt = slope(make)
    flops = 4 * b * h * s * s * d
    print(f"attn-bshd[train={train}] [{b},{s},{h},{d}]: {dt*1e6:.0f} us "
          f"-> {flops/dt/1e12:.2f} TF/s", flush=True)


def bench_layer_bshd(b, s, hdim=768, nh=12, train=True):
    """Full layer with bshd attention (projections produce [B,S,h,d]
    directly — reshape only, no transpose)."""
    d = hdim // nh
    rng0 = np.random.default_rng(0)
    W = {k: jnp.asarray(rng0.standard_normal((hdim, hdim)) * 0.02,
                        jnp.float32) for k in "qkvo"}
    Wi = jnp.asarray(rng0.standard_normal((hdim, 4 * hdim)) * 0.02,
                     jnp.float32)
    Wo = jnp.asarray(rng0.standard_normal((4 * hdim, hdim)) * 0.02,
                     jnp.float32)
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)
    rng = jax.random.key(0, impl="rbg")

    def ln(x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-12)

    def make():
        x = jnp.asarray(np.random.randn(b, s, hdim) * 0.1, jnp.bfloat16)

        def body(x):
            def dense(x, w):
                return jnp.dot(x, w.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)

            q = dense(x, W["q"]).reshape(b, s, nh, d)
            k = dense(x, W["k"]).reshape(b, s, nh, d)
            v = dense(x, W["v"]).reshape(b, s, nh, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * 0.125
            probs = jax.nn.softmax(scores + bias, axis=-1)
            if train:
                keep = jax.random.bernoulli(rng, 0.9, probs.shape)
                probs = jnp.where(keep, probs / 0.9, 0.0)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(jnp.bfloat16),
                             v, preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16).reshape(b, s, hdim)
            h1 = ln(dense(ctx, W["o"]) + x)
            inter = jax.nn.gelu(dense(h1, Wi), approximate=False)
            return ln(dense(inter, Wo) + h1).astype(jnp.bfloat16)

        return x, body

    dt = slope(make)
    flops = 2 * b * s * (4 * hdim * hdim + 2 * hdim * 4 * hdim)
    print(f"layer-bshd[train={train}] [{b},{s}]: {dt*1e6:.0f} us "
          f"-> {flops/dt/1e12:.1f} TF/s", flush=True)


def main():
    setup_runtime()
    bench_attn_bshd(96, 12, 65, 64, train=True)
    bench_attn_bshd(96, 12, 65, 64, train=False)
    bench_layer_bshd(96, 65, train=True)
    bench_layer_bshd(96, 65, train=False)


if __name__ == "__main__":
    main()


def bench_layer_ablate(b, s, hdim=768, nh=12, *, attn_drop=True,
                       hid_drop=True, use_gelu=True, tag=""):
    d = hdim // nh
    rng0 = np.random.default_rng(0)
    W = {k: jnp.asarray(rng0.standard_normal((hdim, hdim)) * 0.02,
                        jnp.float32) for k in "qkvo"}
    Wi = jnp.asarray(rng0.standard_normal((hdim, 4 * hdim)) * 0.02,
                     jnp.float32)
    Wo = jnp.asarray(rng0.standard_normal((4 * hdim, hdim)) * 0.02,
                     jnp.float32)
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)
    rng = jax.random.key(0, impl="rbg")

    def ln(x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-12)

    def drop(x, on):
        if not on:
            return x
        keep = jax.random.bernoulli(rng, 0.9, x.shape)
        return jnp.where(keep, x / jnp.asarray(0.9, x.dtype), 0)

    def make():
        x = jnp.asarray(np.random.randn(b, s, hdim) * 0.1, jnp.bfloat16)

        def body(x):
            def dense(x, w):
                return jnp.dot(x, w.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)

            q = dense(x, W["q"]).reshape(b, s, nh, d)
            k = dense(x, W["k"]).reshape(b, s, nh, d)
            v = dense(x, W["v"]).reshape(b, s, nh, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * 0.125
            probs = jax.nn.softmax(scores + bias, axis=-1
                                   ).astype(jnp.bfloat16)
            probs = drop(probs, attn_drop)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16).reshape(b, s, hdim)
            h1 = ln(drop(dense(ctx, W["o"]), hid_drop) + x)
            inter = dense(h1, Wi)
            if use_gelu:
                inter = jax.nn.gelu(inter, approximate=False)
            return ln(drop(dense(inter, Wo), hid_drop) + h1
                      ).astype(jnp.bfloat16)

        return x, body

    dt = slope(make)
    print(f"layer-ablate[{tag}] [{b},{s}]: {dt*1e6:.0f} us", flush=True)


def ablate_main():
    setup_runtime()
    bench_layer_ablate(96, 65, tag="all-on")
    bench_layer_ablate(96, 65, attn_drop=False, tag="no-attn-drop")
    bench_layer_ablate(96, 65, hid_drop=False, tag="no-hid-drop")
    bench_layer_ablate(96, 65, use_gelu=False, tag="no-gelu")
    bench_layer_ablate(96, 65, attn_drop=False, hid_drop=False,
                       use_gelu=False, tag="all-off")


def bench_layer_bitsdrop(b, s, hdim=768, nh=12, bits_dtype="uint8", tag=""):
    """Dropout via raw random bits + threshold-multiply (no bernoulli)."""
    d = hdim // nh
    rng0 = np.random.default_rng(0)
    W = {k: jnp.asarray(rng0.standard_normal((hdim, hdim)) * 0.02,
                        jnp.float32) for k in "qkvo"}
    Wi = jnp.asarray(rng0.standard_normal((hdim, 4 * hdim)) * 0.02,
                     jnp.float32)
    Wo = jnp.asarray(rng0.standard_normal((4 * hdim, hdim)) * 0.02,
                     jnp.float32)
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)
    rng = jax.random.key(0, impl="rbg")
    bd = jnp.dtype(bits_dtype)
    thresh = bd.type(int(0.9 * (1 << (8 * bd.itemsize))) - 1)

    def ln(x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-12)

    def drop(x):
        bits = jax.random.bits(rng, x.shape, bd)
        keep = (bits <= thresh).astype(x.dtype)
        return x * keep * jnp.asarray(1 / 0.9, x.dtype)

    def make():
        x = jnp.asarray(np.random.randn(b, s, hdim) * 0.1, jnp.bfloat16)

        def body(x):
            def dense(x, w):
                return jnp.dot(x, w.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)

            q = dense(x, W["q"]).reshape(b, s, nh, d)
            k = dense(x, W["k"]).reshape(b, s, nh, d)
            v = dense(x, W["v"]).reshape(b, s, nh, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * 0.125
            probs = drop(jax.nn.softmax(scores + bias, axis=-1
                                        ).astype(jnp.bfloat16))
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16).reshape(b, s, hdim)
            h1 = ln(drop(dense(ctx, W["o"])) + x)
            inter = jax.nn.gelu(dense(h1, Wi), approximate=False)
            return ln(drop(dense(inter, Wo)) + h1).astype(jnp.bfloat16)

        return x, body

    dt = slope(make)
    print(f"layer-bitsdrop[{bits_dtype}{tag}] [{b},{s}]: {dt*1e6:.0f} us",
          flush=True)


def bits_main():
    setup_runtime()
    bench_layer_bitsdrop(96, 65, bits_dtype="uint8")
    bench_layer_bitsdrop(96, 65, bits_dtype="uint16")


def bench_mlp_chain_honest(b_rows=6240, hdim=768, n_layers=12):
    """12-layer MLP with weights passed as JIT ARGUMENTS (honest: nothing
    can be constant-folded/prepacked at trace time)."""
    rng0 = np.random.default_rng(0)
    Wi = jnp.asarray(rng0.standard_normal((n_layers, hdim, 4 * hdim)) * 0.02,
                     jnp.float32)
    Wo = jnp.asarray(rng0.standard_normal((n_layers, 4 * hdim, hdim)) * 0.02,
                     jnp.float32)

    @jax.jit
    def chained(x, Wi, Wo, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, x = c
            for j in range(n_layers):
                h = jnp.dot(x, Wi[j].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
                x = jnp.dot(h, Wo[j].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            return i + 1, x

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))

    import time

    x0 = jnp.asarray(np.random.randn(b_rows, hdim) * 0.1, jnp.bfloat16)

    def pull(out):
        return float(jnp.sum(out[1].astype(jnp.float32)))

    pull(chained(x0, Wi, Wo, jnp.int32(1)))

    def total(n):
        t0 = time.perf_counter()
        pull(chained(x0, Wi, Wo, jnp.int32(n)))
        return time.perf_counter() - t0

    n_iters = 30
    base = min(total(2) for _ in range(3))
    long = min(total(2 + n_iters) for _ in range(3))
    dt = (long - base) / n_iters
    flops = 2 * b_rows * hdim * 4 * hdim * 2 * n_layers
    print(f"mlp-chain-honest [{b_rows},{hdim}]x{n_layers}L: "
          f"{dt*1e3:.2f} ms -> {flops/dt/1e12:.1f} TF/s", flush=True)


def honest_main():
    setup_runtime()
    bench_mlp_chain_honest()


def bench_layer_chain_honest(b=96, s=65, train=True):
    """12 REAL _bert_layer passes with stacked weights + rng as jit args."""
    import time

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models import encoder as enc

    cfg = EncoderConfig(vocab_size=28996)
    layers = enc.init_layer_stack(jax.random.PRNGKey(0), cfg)
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)
    key0 = jax.random.key(0, impl="rbg")

    @jax.jit
    def chained(x, layers, rng, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, x, rng = c
            rng, sub = jax.random.split(rng)
            x = enc.encoder_stack(layers, cfg, x, bias,
                                  deterministic=not train,
                                  rng=sub if train else None,
                                  dtype=jnp.bfloat16)
            return i + 1, x, rng

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x, rng))

    x0 = jnp.asarray(np.random.randn(b, s, 768) * 0.1, jnp.bfloat16)

    def pull(out):
        return float(jnp.sum(out[1].astype(jnp.float32)))

    pull(chained(x0, layers, key0, jnp.int32(1)))

    def total(n):
        t0 = time.perf_counter()
        pull(chained(x0, layers, key0, jnp.int32(n)))
        return time.perf_counter() - t0

    n_iters = 30
    base = min(total(2) for _ in range(3))
    long = min(total(2 + n_iters) for _ in range(3))
    dt = (long - base) / n_iters
    print(f"layer-chain-honest[train={train}] [{b},{s}] 12L: "
          f"{dt*1e3:.2f} ms ({dt/12*1e6:.0f} us/layer)", flush=True)


def honest_main2():
    setup_runtime()
    bench_layer_chain_honest(train=True)
    bench_layer_chain_honest(train=False)
