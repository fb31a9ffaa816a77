"""Full-scale eval wall-clock (VERDICT r3 item 6).

The reference prints "time cost" for its complete eval_itm sweep
(eval_itm.py:146-148). This script produces the equivalent single
end-to-end figures on the chip, through the SHIPPED evaluator
(training/evaluator.eval_model_on_dataloader -> BatchEncoder ->
DenseFlatIndex -> both-direction recall):

  part 1  coco-test scale: 25,000 texts x 5,000 images (5 captions/img),
          the exact shape of the reference's published eval — encode every
          pair batch, build both indexes, kNN both directions, recall@K.
  part 2  full-COCO corpus scale: encode 123,287 images into the dense
          index, then run all 25,000 test texts as queries against the
          123k corpus (txt->img recall) — ties the imgs/s encode rate and
          the search numbers into one number.

Features are synthesized on the fly (fresh values per image so search is
non-degenerate) with a one-batch-ahead generator thread; wall-clock is
closed by host pulls of the results, so the async relay cannot
overlap-report. The axon relay's ~50 MB/s batch upload dominates part 2
end-to-end — reported separately as a harness artifact (PCIe on a
production host moves the same bytes ~200x faster).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_full_eval.py
       [n_corpus] [n_test_imgs] [part]
       part: "1", "2" or "both" (default both — through this relay part 1
       runs ~10 min and part 2 ~30-50 min; run them separately to bound
       each job)
"""
from __future__ import annotations

import sys
import threading
import time
from queue import Queue

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from lightningdot_tpu.config import EncoderConfig  # noqa: E402
from lightningdot_tpu.models.bi_encoder import BiEncoder  # noqa: E402
from lightningdot_tpu.utils.runtime import setup_runtime  # noqa: E402

BS = 400          # inf_minibatch_size of the shipped eval configs
TXT_LEN = 32
N_REG = 45        # COCO mean nbb ~ 45 (conf_th 0.2)
IMG_DIM = 2048
VOCAB = 28996


def make_model():
    import jax.numpy as jnp

    txt_cfg = EncoderConfig(vocab_size=VOCAB, project_dim=768)
    img_cfg = EncoderConfig(vocab_size=VOCAB, img_dim=IMG_DIM,
                            project_dim=768)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def pair_batch(rng, txt_ids, img_names, feats):
    """Eval batch in the evaluator's contract (txts+imgs+ids)."""
    n = len(txt_ids)
    return {
        "txts": {
            "input_ids": rng.integers(106, VOCAB, (n, TXT_LEN)
                                      ).astype(np.int32),
            "attention_mask": np.ones((n, TXT_LEN), np.int32),
            "position_ids": np.tile(np.arange(TXT_LEN, dtype=np.int32),
                                    (n, 1)),
        },
        "imgs": {
            "input_ids": np.full((n, 1), 101, np.int32),
            "attention_mask": np.ones((n, 1 + N_REG), np.int32),
            "img_feat": feats,
            "img_pos_feat": rng.random((n, N_REG, 7)).astype(np.float32),
        },
        "caps": None,
        "n_valid": n,
        "txt_index": txt_ids,
        "img_fname": img_names,
    }


def batch_stream(specs):
    """One-batch-ahead generator thread (overlaps numpy synthesis with the
    relay upload, like the shipped DevicePrefetcher overlaps collate)."""
    q: Queue = Queue(maxsize=2)

    def work():
        for i, (txt_ids, img_names) in enumerate(specs):
            rng = np.random.default_rng(1000 + i)
            feats = rng.standard_normal(
                (len(txt_ids), N_REG, IMG_DIM)).astype(np.float16)
            q.put(pair_batch(rng, txt_ids, img_names, feats))
        q.put(None)

    threading.Thread(target=work, daemon=True).start()
    while True:
        b = q.get()
        if b is None:
            return
        yield b


def part1_coco_test(model, params, n_imgs=5000, caps_per_img=5):
    from lightningdot_tpu.training.evaluator import eval_model_on_dataloader

    n_txt = n_imgs * caps_per_img
    img2txt = {f"img{i:06d}.npz": [f"t{i * caps_per_img + c}"
                                   for c in range(caps_per_img)]
               for i in range(n_imgs)}
    specs = []
    for st in range(0, n_txt, BS):
        tids = [f"t{j}" for j in range(st, min(st + BS, n_txt))]
        inames = [f"img{j // caps_per_img:06d}.npz"
                  for j in range(st, min(st + BS, n_txt))]
        specs.append((tids, inames))
    upload_gb = n_txt * N_REG * IMG_DIM * 2 / 1e9
    print(f"part 1: coco-test scale ({n_txt} texts, {n_imgs} images, "
          f"{len(specs)} batches, {upload_gb:.1f} GB of features)")
    t0 = time.perf_counter()
    res = eval_model_on_dataloader(model, params, batch_stream(specs),
                                   img2txt=img2txt, vector_size=768)
    dt = time.perf_counter() - t0
    print(f"  eval_itm sweep time cost: {dt:.1f} s "
          f"(recall keys {sorted(res.recall[0] or {})}; loss "
          f"{res.loss:.3f}; upload ~{upload_gb:.1f} GB => relay ~"
          f"{upload_gb * 1e3 / max(dt, 1e-9):.0f} MB/s lower bound)")
    return dt


def part2_full_corpus(model, params, n_corpus=123_287, n_queries=25_000):
    from lightningdot_tpu.index import DenseFlatIndex
    from lightningdot_tpu.training.evaluator import BatchEncoder

    encoder = BatchEncoder(model, params)
    # ---- encode the 123k-image corpus --------------------------------------
    specs = []
    for st in range(0, n_corpus, BS):
        names = [f"c{j:06d}.npz" for j in range(st, min(st + BS, n_corpus))]
        specs.append(([f"dummy{j}" for j in range(len(names))], names))
    upload_gb = n_corpus * N_REG * IMG_DIM * 2 / 1e9
    print(f"part 2: corpus encode ({n_corpus} images, {len(specs)} batches, "
          f"{upload_gb:.1f} GB of features)")
    vecs = np.empty((n_corpus, 768), np.float32)
    row = 0
    t0 = time.perf_counter()
    last_img = None
    for batch in batch_stream(specs):
        _, img, _ = encoder(batch)
        n = batch["n_valid"]
        vecs[row:row + n] = np.asarray(img[:n])   # host pull closes the step
        row += n
        last_img = img
    del last_img
    dt_enc = time.perf_counter() - t0
    print(f"  encode: {dt_enc:.1f} s ({n_corpus / dt_enc:.0f} imgs/s "
          f"end-to-end incl. relay upload; device ceiling 9,014 imgs/s "
          f"— PERF.md)")

    # ---- index + query sweep ------------------------------------------------
    t1 = time.perf_counter()
    index = DenseFlatIndex(768)
    index.index_data([(f"c{j:06d}.npz", v) for j, v in enumerate(vecs)])
    q_rng = np.random.default_rng(5)
    ranks_found = 0
    for st in range(0, n_queries, BS):
        n = min(BS, n_queries - st)
        q = q_rng.standard_normal((n, 768)).astype(np.float32)
        got = index.search_knn(q, 10)
        ranks_found += sum(1 for ids, _ in got if ids)
    dt_q = time.perf_counter() - t1
    print(f"  index + {n_queries} queries over {n_corpus}: {dt_q:.1f} s "
          f"({n_queries / dt_q:.0f} queries/s; {ranks_found} answered)")
    print(f"  FULL-COCO end-to-end (encode {n_corpus} imgs + index + "
          f"{n_queries} queries): {dt_enc + dt_q:.1f} s")
    return dt_enc + dt_q


def main():
    setup_runtime()
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 123_287
    n_test_imgs = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    part = sys.argv[3] if len(sys.argv) > 3 else "both"
    print(f"devices: {jax.devices()}")
    model, params = make_model()
    t_total = time.perf_counter()
    dt1 = dt2 = 0.0
    if part in ("1", "both"):
        dt1 = part1_coco_test(model, params, n_imgs=n_test_imgs)
    if part in ("2", "both"):
        dt2 = part2_full_corpus(model, params, n_corpus=n_corpus,
                                n_queries=n_test_imgs * 5)
    print(f"TOTAL wall-clock: {time.perf_counter() - t_total:.1f} s "
          f"(part1 {dt1:.1f} + part2 {dt2:.1f} + compile)")


if __name__ == "__main__":
    main()
