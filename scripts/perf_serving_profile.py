"""xprof trace of the batched serving call — where do 11.8 ms at batch 64
go? (Roofline says ~2.2 ms: tower ~1.8 ms FLOPs + 0.23 ms corpus scan.)

Usage: python scripts/perf_serving_profile.py [batch] [outdir] [config]
where config is a comma-set of {int8corpus,int8weights,approx} — e.g.
``64 /tmp/t int8corpus,int8weights,approx`` traces the 19.8k-QPS
headline configuration (PERF.md approx-top-k table).
"""
import glob
import sys

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.serving import Retriever
from lightningdot_tpu.utils.runtime import setup_runtime

N_CORPUS, TOP_K = 123_287, 100
import os
QUERY_LEN = int(os.environ.get("LDOT_SERVE_QLEN", "32"))


class Tok:
    def encode(self, text):
        return [101] + [106 + (hash(w) % 28000) for w in text.split()] + [102]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/serve_trace"
    conf = set((sys.argv[3] if len(sys.argv) > 3 else "").split(","))
    setup_runtime()
    rng = np.random.default_rng(0)
    cfg = EncoderConfig(vocab_size=28996, project_dim=0)
    tower = enc.init_encoder_tower(jax.random.PRNGKey(0), cfg,
                                   with_img=False)
    tower = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), tower)
    model = BiEncoder(cfg, cfg, compute_dtype=jnp.bfloat16)
    r = Retriever(model, {"txt_model": tower, "img_model": {}}, Tok(),
                  query_buckets=(QUERY_LEN,),
                  quantization="int8" if "int8corpus" in conf else None,
                  weight_quantization=("int8" if "int8weights" in conf
                                       else None),
                  topk="approx" if "approx" in conf else "exact")
    r.set_corpus([f"i{i}" for i in range(N_CORPUS)],
                 rng.standard_normal((N_CORPUS, 768)).astype(np.float32))
    query_fn = r._query_fn(QUERY_LEN, TOP_K)
    enc_params = r._enc_params()
    scales = (r._scales if r._scales is not None
              else jnp.zeros((0,), jnp.float32))
    mask = jnp.ones((batch, QUERY_LEN), jnp.int32)
    ids = jnp.asarray(rng.integers(106, 28996, (batch, QUERY_LEN)),
                      jnp.int32)

    fn = jax.jit(lambda i: query_fn(enc_params, i, mask, r._corpus,
                                    r._bias, scales))
    float(fn(ids)[0][0, 0])  # compile + warm

    jax.profiler.start_trace(outdir)
    for _ in range(8):
        s, _ = fn(ids)
    float(s[0, 0])
    jax.profiler.stop_trace()

    # convert to per-op stats (PERF.md xprof recipe)
    import os
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    xplanes = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    print("xplanes:", xplanes)
    if xplanes:
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data([xplanes[-1]], "hlo_stats", {})
        import json as _json
        rows = _json.loads(data) if isinstance(data, (str, bytes)) else data
        print(type(rows))
        out = f"{outdir}/hlo_stats.json"
        with open(out, "w") as f:
            f.write(data if isinstance(data, str)
                    else data.decode() if isinstance(data, bytes)
                    else _json.dumps(rows))
        print("wrote", out)


if __name__ == "__main__":
    main()
