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
        # random weights: recall deltas are expected; mechanics passing is
        # the selftest's contract
        print(f"selftest complete: {len(args.configs)} eval configs + "
              f"rerank + teacher eval ran end to end "
              f"({len(failures)} informational recall deltas, as expected "
              "for random-init weights)")
        return
    if failures:
        print(json.dumps({"failures": failures}, default=float))
        sys.exit(1)
    print("all published recalls reproduced within 0.5 pt"
          + ("; rerank recalls reported above" if args.teacher_ckpt else ""))


if __name__ == "__main__":
    main()
