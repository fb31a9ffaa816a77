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
    args = parser.parse_args()

    from lightningdot_tpu.cli.eval_itm import main as eval_main

    failures = []
    for name in args.configs:
        spec = EXPECTED[name]
        print(f"=== {name} ===")
        results = eval_main([
            "--txt_model_config", "bert-base-cased",
            "--img_model_config", "./configs/img_base.json",
            "--project_dim", "768",
            "--biencoder_checkpoint", f"{args.data_root}/{spec['ckpt']}",
            "--test_txt_db", f"{args.data_root}/{spec['txt_db']}",
            "--test_img_db", f"{args.data_root}/{spec['img_db']}",
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
                "--biencoder_checkpoint",
                f"{args.data_root}/{spec['ckpt']}",
                "--teacher_checkpoint",
                f"{args.data_root}/{args.teacher_ckpt}",
                "--test_txt_db", f"{args.data_root}/{spec['txt_db']}",
                "--test_img_db", f"{args.data_root}/{spec['img_db']}",
                "--max_txt_len", "60",
                "--valid_batch_size", "80", "--inf_minibatch_size", "400",
                "--compute_dtype", args.compute_dtype,
            ])
            for key, rec in sorted(rr.items()):
                print(f"  {key}: {json.dumps(rec, default=float)}")

    if failures:
        print(json.dumps({"failures": failures}, default=float))
        sys.exit(1)
    print("all published recalls reproduced within 0.5 pt"
          + ("; rerank recalls reported above" if args.teacher_ckpt else ""))


if __name__ == "__main__":
    main()
