"""Reproduce the reference's published recall tables (BASELINE.md).

Requires the released LightningDOT artifacts and prepro'd data (not
available in the build environment — zero egress). With them on disk this
script runs the three README configurations and compares against the
published numbers within the 0.5-pt tolerance.

Expected layout (bash/download_data.sh of the reference):
  data/model/LightningDot.pt      zero-shot dual encoder
  data/model/flickr-ft.pt         flickr fine-tuned
  data/model/coco-ft.pt           coco fine-tuned
  data/db/itm_flickr30k_test_base-cased.db/   (converted via
      `python -m lightningdot_tpu.cli.prepro txt ...` or read from the
      original LMDBs after conversion)
  data/img/flickr30k/, data/img/coco_val2014/ (converted via
      `python -m lightningdot_tpu.cli.prepro img ...`)
"""
import argparse
import json
import sys

# Published numbers (reference README.md:108-134; BASELINE.md)
EXPECTED = {
    "zero-shot-flickr": {
        "ckpt": "data/model/LightningDot.pt",
        "txt_db": "data/db/itm_flickr30k_test_base-cased.db",
        "img_db": "data/img/flickr30k/",
        "recall_txt": {1: 0.5332, 5: 0.8058, 10: 0.8804},  # image retrieval
        "recall_img": {1: 0.682, 5: 0.891, 10: 0.94},      # text retrieval
    },
    "flickr-ft": {
        "ckpt": "data/model/flickr-ft.pt",
        "txt_db": "data/db/itm_flickr30k_test_base-cased.db",
        "img_db": "data/img/flickr30k/",
        "recall_txt": {1: 0.699, 5: 0.911, 10: 0.9518},
        "recall_img": {1: 0.839, 5: 0.972, 10: 0.986},
    },
    "coco-ft": {
        "ckpt": "data/model/coco-ft.pt",
        "txt_db": "data/db/itm_coco_test_base-cased.db",
        "img_db": "data/img/coco_val2014/",
        "recall_txt": {1: 0.4577, 5: 0.7453, 10: 0.8379},
        "recall_img": {1: 0.6004, 5: 0.8516, 10: 0.9172},
    },
}
TOLERANCE = 0.005  # 0.5 pt (BASELINE.md rebuild target)


def _build_selftest_artifacts(root: str) -> dict:
    """Stand-in released artifacts: random-init FULL-SIZE checkpoints in
    the released torch layouts + synthetic flickr/coco-layout DBs, so the
    complete one-command flow (checkpoint mapping -> eval -> teacher
    rerank -> README-format report) runs end to end without the
    zero-egress-unavailable downloads. Recall values are meaningless
    (random weights) — the selftest validates MECHANICS loudly, so
    artifact day is download-and-run."""
    import os

    import jax
    import jax.numpy as jnp

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.data.synth import make_synth_dataset
    from lightningdot_tpu.models import checkpoint_torch as ct
    from lightningdot_tpu.models.bi_encoder import BiEncoder
    from lightningdot_tpu.models.cross_encoder import CrossEncoder

    os.makedirs(f"{root}/data/model", exist_ok=True)
    txt_cfg = EncoderConfig(vocab_size=28996, project_dim=768)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048, project_dim=768)
    bi = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.float32)
    params = bi.init(jax.random.PRNGKey(0))
    ckpt = f"{root}/data/model/selftest-biencoder.pt"
    ct.save_biencoder_pt(ckpt, params)
    teacher = CrossEncoder(EncoderConfig(vocab_size=28996, img_dim=2048))
    t_params = teacher.init(jax.random.PRNGKey(1))
    t_ckpt = f"{root}/data/model/selftest-teacher.pt"
    ct.save_cross_encoder_pt(t_ckpt, t_params)

    dbs = {}
    # small on purpose: the selftest validates mechanics; at BERT-base size
    # a single CPU core runs ~2 cross-encoder pairs/s, so the pair counts
    # (rerank + teacher full-matrix) set the selftest wall-clock
    for seed, (corpus, n) in enumerate((("flickr30k", 12), ("coco", 12))):
        # bb/conf params must match the drivers' defaults (conf_th 0.2,
        # max_bb 100, min_bb 10) — the feature-db filename embeds them
        txt_dir, img_dir = make_synth_dataset(
            f"{root}/{corpus}", n_imgs=n, txts_per_img=5, img_dim=2048,
            min_bb=10, max_bb=100, max_txt_len=40, seed=31 + seed)
        dbs[corpus] = (txt_dir, img_dir)
    spec = {}
    for name, corpus in (("zero-shot-flickr", "flickr30k"),
                         ("flickr-ft", "flickr30k"), ("coco-ft", "coco")):
        spec[name] = dict(EXPECTED[name])
        spec[name]["ckpt"] = "data/model/selftest-biencoder.pt"
        spec[name]["txt_db"], spec[name]["img_db"] = dbs[corpus]
    return {"expected": spec, "teacher": t_ckpt}


def _selftest_optional_paths(name, spec, _p, compute_dtype, flat_recall):
    """Dress-rehearsal legs for the OPTIONAL operator surfaces: stage-1
    retrieval through the native HNSW index (``--hnsw_index``, the
    reference's `trainer.py:97-100,122-127` switch) and the production
    query path through the C++ serving frontend (`native/ldserve.cc`).
    Routed through ONE configuration so the one-command selftest touches
    every surface a parity-day operator might, loud on any failure."""
    import numpy as np

    from lightningdot_tpu.cli.eval_itm import main as eval_main

    failures = []

    # -- leg 1: eval with the HNSW stage-1 index ---------------------------
    print(f"=== {name} via --hnsw_index (stage-1 native HNSW) ===")
    results = eval_main([
        "--txt_model_config", "bert-base-cased",
        "--img_model_config", "./configs/img_base.json",
        "--project_dim", "768",
        "--biencoder_checkpoint", _p(spec["ckpt"]),
        "--test_txt_db", _p(spec["txt_db"]),
        "--test_img_db", _p(spec["img_db"]),
        "--max_txt_len", "60",
        "--valid_batch_size", "80", "--inf_minibatch_size", "400",
        "--compute_dtype", compute_dtype,
        "--hnsw_index",
    ])
    got = results["test"]
    # ef_search (128) far exceeds the selftest corpus, so the HNSW search
    # is effectively exhaustive: recalls must match the flat index
    for direction in ("recall_txt", "recall_img"):
        for k, flat_v in flat_recall[direction].items():
            have = got[direction][k]
            if abs(have - flat_v) > 1e-9:
                failures.append(("hnsw", direction, k, have, flat_v))
                print(f"  FAIL hnsw {direction}@{k}: {have:.4f} "
                      f"(flat index gave {flat_v:.4f})")
    print(f"  hnsw-vs-flat recall identity: "
          f"{'OK' if not failures else 'FAIL'}")

    # -- leg 2: the native C++ serving frontend -----------------------------
    # Headline serving config (PERF.md): int8 text-tower weights + int8
    # corpus; concurrent HTTP queries must coalesce into device batches and
    # every response must equal the direct retrieve_batch() ranking.
    print("=== native serving frontend (ldserve) ===")
    import json as _json
    import threading
    import urllib.request
    from urllib.parse import quote

    import jax.numpy as jnp

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models import checkpoint_torch as ct
    from lightningdot_tpu.models.bi_encoder import BiEncoder
    from lightningdot_tpu.serving import Retriever, ranking_equivalent
    from lightningdot_tpu.serving_native import serve_retriever

    txt_cfg = EncoderConfig(vocab_size=28996, project_dim=768)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048, project_dim=768)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.float32)
    params = ct.load_biencoder_checkpoint(_p(spec["ckpt"]))

    class _Tok:
        def encode(self, text):
            return ([101] + [106 + (hash(w) % 20000) for w in text.split()]
                    + [102])

    # one batch bucket: the 12 selftest queries coalesce to <=16 rows, so
    # the warmup ladder stays at two cold f32 compiles instead of seven
    retriever = Retriever(model, params, _Tok(), quantization="int8",
                          weight_quantization="int8", batch_buckets=(16,))
    rng = np.random.default_rng(7)
    n = 256
    retriever.set_corpus([f"img_{i:05d}" for i in range(n)],
                         rng.standard_normal((n, 768)).astype(np.float32))
    words = ("river bridge dog fountain market castle harbor tram "
             "garden museum beach forest").split()
    queries = [f"a photo of the {words[i]} at {'dawn dusk noon'.split()[i % 3]}"
               f"{' with people' * (i % 2)}" for i in range(12)]
    direct = retriever.retrieve_batch(queries, top=10)
    out = [None] * len(queries)
    with serve_retriever(retriever, max_top=10, warmup=True) as srv:
        def fetch(i):
            url = f"{srv.address}/search?q={quote(queries[i])}&top=10"
            with urllib.request.urlopen(url, timeout=60) as r:
                out[i] = _json.load(r)

        threads = [threading.Thread(target=fetch, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = srv.stats()
    for i, resp in enumerate(out):
        if resp is None:
            failures.append(("ldserve", i, "no response", None, None))
            continue
        # tie-aware: served batches coalesce differently than the direct
        # call, so near-tied scores may legitimately swap (see
        # serving.ranking_equivalent); any real divergence still fails
        ok, why = ranking_equivalent(resp["results"], direct[i])
        if not ok:
            failures.append(("ldserve", i, why,
                             resp["results"][:3], direct[i][:3]))
    print(f"  ldserve: {stats['requests']} requests in {stats['batches']} "
          f"device batches, {stats['errors']} errors; ranking-vs-direct: "
          f"{'OK' if not any(f[0] == 'ldserve' for f in failures) else 'FAIL'}")
    if stats["errors"]:
        failures.append(("ldserve", "stats", "errors", stats["errors"], 0))
    if failures:
        print(json.dumps({"selftest_optional_path_failures": failures},
                         default=str))
        sys.exit(1)


def main():
    parser = argparse.ArgumentParser("reproduce_baseline")
    parser.add_argument("--data_root", default=".")
    parser.add_argument("--configs", nargs="+", default=list(EXPECTED),
                        choices=list(EXPECTED))
    parser.add_argument("--compute_dtype", default="f32",
                        help="f32 recommended for rank-stable parity")
    parser.add_argument("--teacher_ckpt", default=None,
                        help="joint cross-encoder checkpoint (e.g. "
                             "data/model/uniter-base.pt); when given, each "
                             "config also runs the two-stage rerank sweep "
                             "(reference rerank.py:256-292) and prints its "
                             "recall dicts — the reference publishes no "
                             "rerank numbers (README.md:145-148), so this "
                             "part is report-only")
    parser.add_argument("--selftest", action="store_true",
                        help="run the complete flow against generated "
                             "full-size random-init artifacts (mechanics "
                             "check; recall comparison is informational)")
    args = parser.parse_args()

    expected = EXPECTED
    if args.selftest:
        import tempfile

        args.data_root = tempfile.mkdtemp(prefix="repro_selftest_")
        print(f"selftest artifacts under {args.data_root}")
        built = _build_selftest_artifacts(args.data_root)
        expected = built["expected"]
        args.teacher_ckpt = built["teacher"]

    from lightningdot_tpu.cli.eval_itm import main as eval_main

    def _p(path):
        import os

        return path if os.path.isabs(path) else f"{args.data_root}/{path}"

    failures = []
    first_flat = None
    for name in args.configs:
        spec = expected[name]
        print(f"=== {name} ===")
        results = eval_main([
            "--txt_model_config", "bert-base-cased",
            "--img_model_config", "./configs/img_base.json",
            "--project_dim", "768",
            "--biencoder_checkpoint", _p(spec["ckpt"]),
            "--test_txt_db", _p(spec["txt_db"]),
            "--test_img_db", _p(spec["img_db"]),
            "--max_txt_len", "60",
            "--valid_batch_size", "80", "--inf_minibatch_size", "400",
            "--compute_dtype", args.compute_dtype,
        ])
        got = results["test"]
        if first_flat is None:
            first_flat = got
        # README.md:111-135 output format
        print(f"image retrieval recall = "
              f"{json.dumps(got['recall_txt'], default=float)}")
        print(f"txt retrieval recall = "
              f"{json.dumps(got['recall_img'], default=float)}")
        for direction in ("recall_txt", "recall_img"):
            for k, want in spec[direction].items():
                have = got[direction][k]
                ok = abs(have - want) <= TOLERANCE
                status = "OK " if ok else "FAIL"
                print(f"  {status} {direction}@{k}: {have:.4f} "
                      f"(published {want:.4f})")
                if not ok:
                    failures.append((name, direction, k, have, want))

        if args.teacher_ckpt:
            from lightningdot_tpu.cli.rerank import main as rerank_main

            print(f"--- {name} + cross-encoder rerank ---")
            rr = rerank_main([
                "--txt_model_config", "bert-base-cased",
                "--img_model_config", "./configs/img_base.json",
                "--project_dim", "768",
                "--biencoder_checkpoint", _p(spec["ckpt"]),
                "--teacher_checkpoint", _p(args.teacher_ckpt),
                "--test_txt_db", _p(spec["txt_db"]),
                "--test_img_db", _p(spec["img_db"]),
                "--max_txt_len", "60",
                "--valid_batch_size", "80", "--inf_minibatch_size", "400",
                "--compute_dtype", args.compute_dtype,
            ] + (["--num_tops", "10"] if args.selftest else []))
            for key, rec in sorted(rr.items()):
                print(f"  {key}: {json.dumps(rec, default=float)}")

    if args.teacher_ckpt:
        # teacher's own retrieval eval (reference inf_itm.py: full txt x img
        # score matrix + recall + results.bin for offline rerank)
        import tempfile

        from lightningdot_tpu.cli.inf_itm import main as inf_main

        first = expected[args.configs[0]]
        print("=== teacher standalone eval (inf_itm) ===")
        eval_log, results_bin = inf_main([
            "--txt_db", _p(first["txt_db"]),
            "--img_db", _p(first["img_db"]),
            "--checkpoint", _p(args.teacher_ckpt),
            "--model_config", "./configs/img_base.json",
            "--output_dir", tempfile.mkdtemp(prefix="inf_itm_"),
            "--compute_dtype", args.compute_dtype,
        ])
        print(f"  teacher recall: {json.dumps(eval_log, default=float)}")
        print(f"  results.bin: {results_bin}")

    if args.selftest:
        first = args.configs[0]
        _selftest_optional_paths(first, expected[first], _p,
                                 args.compute_dtype, first_flat)
        # random weights: recall deltas are expected; mechanics passing is
        # the selftest's contract
        print(f"selftest complete: {len(args.configs)} eval configs + "
              f"rerank + teacher eval + hnsw stage-1 + native serving "
              f"ran end to end ({len(failures)} informational recall "
              "deltas, as expected for random-init weights)")
        return
    if failures:
        print(json.dumps({"failures": failures}, default=float))
        sys.exit(1)
    print("all published recalls reproduced within 0.5 pt"
          + ("; rerank recalls reported above" if args.teacher_ckpt else ""))


if __name__ == "__main__":
    main()
