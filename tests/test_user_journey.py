"""Full user journey on raw inputs: annotations + npz features -> prepro ->
fine-tune -> eval driver -> real-time serving (frontend + native tokenizer).

This is the reference's complete workflow (README.md: prepro -> train_itm ->
eval_itm -> demo) chained through every shipped surface in one test —
the integration seams the per-driver e2e tests don't cross.
"""
import json
import os

import numpy as np
import pytest

WORDS = ["dog", "cat", "car", "tree", "boat", "bird", "fish", "horse"]
VOCAB = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "!", "a", "photo",
          "of", "the", "small", "big"] + WORDS)


@pytest.fixture(scope="module")
def journey(tmp_path_factory):
    """Raw inputs: karpathy-style annotation json + an npz feature dir."""
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("journey")

    vocab_file = root / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB))

    images = []
    npz_dir = root / "flickr30k"
    os.makedirs(npz_dir)
    for i, w in enumerate(WORDS):
        images.append({
            "filename": f"{1000 + i}.jpg",
            "sentences": [
                {"sentid": 2 * i, "raw": f"a photo of the {w} {w}"},
                {"sentid": 2 * i + 1, "raw": f"the {w} ! {w} {w}"},
            ],
        })
        nbb = 6 + (i % 3)
        np.savez(npz_dir / f"flickr30k_{1000 + i:012}.npz",
                 features=rng.standard_normal((nbb, 32)).astype(np.float32),
                 norm_bb=rng.random((nbb, 6)).astype(np.float32),
                 conf=np.linspace(1, 0.5, nbb).astype(np.float32))
    ann = root / "ann.json"
    ann.write_text(json.dumps({"images": images}))

    model_cfg = root / "model.json"
    # vocab_size must cover the image tower's hardcoded [CLS]=101
    # (dvl/data/itm.py:74) — ids 0..101 gather NaN otherwise
    model_cfg.write_text(json.dumps(
        {"vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 2,
         "num_attention_heads": 4, "intermediate_size": 64,
         "max_position_embeddings": 64, "img_dim": 32,
         "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0}))
    return root, str(ann), str(npz_dir), str(vocab_file), str(model_cfg)


def test_full_journey(journey, tmp_path_factory):
    root, ann, npz_dir, vocab_file, model_cfg = journey

    # 1. prepro: annotations -> text DB; npz dir -> feature DB
    from lightningdot_tpu.cli.prepro import main as prepro_main

    txt_db = str(root / "itm_flickr_train.db")
    prepro_main(["txt", "--annotation", ann, "--output", txt_db,
                 "--format", "itm", "--dataset", "flickr",
                 "--vocab", vocab_file])
    img_out = str(root / "img")
    prepro_main(["img", "--img_dir", npz_dir, "--output", img_out,
                 "--conf_th", "0.2", "--max_bb", "8", "--min_bb", "4"])
    img_db = os.path.join(img_out, "flickr30k")

    # 2. fine-tune on the prepro'd DBs (tiny overfit)
    from lightningdot_tpu.cli.train_itm import main as train_main

    out_dir = str(tmp_path_factory.mktemp("journey_out"))
    common = [
        "--txt_model_config", model_cfg, "--img_model_config", model_cfg,
        "--train_txt_dbs", txt_db, "--train_img_dbs", img_db,
        "--val_txt_db", txt_db, "--val_img_db", img_db,
        "--train_batch_size", "16", "--valid_batch_size", "16",
        "--max_bb", "8", "--min_bb", "4", "--num_bb", "8",
        "--max_txt_len", "16", "--compute_dtype", "f32",
        "--inf_minibatch_size", "16",
    ]
    results, state = train_main(common + [
        "--num_train_epochs", "30", "--learning_rate", "5e-3",
        "--output_dir", out_dir])
    assert results["best_val_recall_mean"] > 0.9, results
    ckpt = os.path.join(out_dir, "biencoder.best")
    assert os.path.exists(ckpt + ".npz")

    # 3. eval driver reloads the checkpoint and reproduces the recall
    from lightningdot_tpu.cli.eval_itm import main as eval_main

    eval_res = eval_main(common + [
        "--test_txt_db", txt_db, "--test_img_db", img_db,
        "--biencoder_checkpoint", ckpt, "--output_dir", out_dir])
    assert eval_res["test"]["recall_txt"][1] > 0.8, eval_res

    # 4. serving: encode the corpus with the trained weights, serve a
    # training caption through tokenizer -> frontend -> retriever
    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.data.feat_db import DetectFeatDb
    from lightningdot_tpu.data.itm import CollateConfig, ItmFastDataset, \
        itm_fast_collate
    from lightningdot_tpu.data.loader import DataLoader
    from lightningdot_tpu.data.tokenizer import WordPieceTokenizer
    from lightningdot_tpu.data.txt_db import TxtTokDb
    from lightningdot_tpu.models.bi_encoder import BiEncoder
    from lightningdot_tpu.serving import Retriever, get_model_encoded_vecs
    from lightningdot_tpu.serving_frontend import BatchingFrontend

    with open(model_cfg) as f:
        cfg = EncoderConfig(**json.load(f))
    import jax.numpy as jnp

    model = BiEncoder(cfg, EncoderConfig(**{**cfg.__dict__}),
                      compute_dtype=jnp.float32)

    dataset = ItmFastDataset(TxtTokDb(txt_db, -1),
                             DetectFeatDb(img_db, 0.2, 8, 4, 8))
    dataset.new_epoch()
    loader = DataLoader(
        dataset, batch_size=16, shuffle=False,
        collate_fn=lambda items: itm_fast_collate(
            items, CollateConfig(fixed_batch=16)))
    vecs = get_model_encoded_vecs(model, state.params, loader)

    tok = WordPieceTokenizer(vocab_file)
    retriever = Retriever(model, state.params, tok)
    items = sorted(vecs["img_embed"].items())
    retriever.set_corpus([k for k, _ in items],
                         np.stack([v for _, v in items]))
    with BatchingFrontend(retriever, max_batch=4, max_wait_ms=5.0) as fe:
        hits = fe.retrieve_many(
            [f"a photo of the {w} {w}" for w in WORDS], top=3)
    top1 = sum(hits[i][0][0] == f"flickr30k_{1000 + i:012}.npz"
               for i in range(len(WORDS)))
    top3 = sum(any(r[0] == f"flickr30k_{1000 + i:012}.npz"
                   for r in hits[i]) for i in range(len(WORDS)))
    assert top1 >= 6 and top3 == len(WORDS), (
        top1, top3, [[r[0] for r in h] for h in hits])

    # 5. migration journey: re-encode the same data as reference-layout
    # LMDBs (lz4-framed msgpack txt values, npz img values), ingest via
    # `prepro from-lmdb`, and the eval driver must reproduce the recall
    # dict EXACTLY on the converted DBs — the reference user's
    # switch-over path (MIGRATION.md "Data").
    import io

    import msgpack

    from tests.lmdb_fixture import write_lmdb
    from tests.test_lmdb_ingest import _stored_frame

    src_txt = TxtTokDb(txt_db, -1)
    lmdb_txt = str(root / "ref_txt.db")
    write_lmdb(lmdb_txt, {
        i.encode(): _stored_frame(msgpack.dumps(src_txt[i],
                                                use_bin_type=True))
        for i in src_txt.id2len})
    for side in ("id2len.json", "meta.json", "txt2img.json",
                 "img2txts.json"):
        with open(os.path.join(txt_db, side)) as f:
            (root / "ref_txt.db" / side).write_text(f.read())

    src_img = DetectFeatDb(img_db, 0.2, 8, 4, 8)
    lmdb_items = {}
    for fname in sorted(src_img.name2nbb):
        arrays = src_img.load_arrays(fname)
        buf = io.BytesIO()
        np.savez(buf, **{k: np.asarray(v) for k, v in arrays.items()})
        lmdb_items[fname.encode()] = buf.getvalue()
    lmdb_items[b"__keys__"] = json.dumps(
        sorted(src_img.name2nbb)).encode()
    lmdb_img = str(root / "feat_th0.2_max8_min4_compressed")
    write_lmdb(lmdb_img, lmdb_items)

    conv_txt = str(root / "conv_txt.db")
    conv_img = str(root / "conv_img")
    prepro_main(["from-lmdb", "--kind", "txt", "--src", lmdb_txt,
                 "--output", conv_txt])
    prepro_main(["from-lmdb", "--kind", "img", "--src", lmdb_img,
                 "--output", conv_img])
    # converted txt records must be byte-identical after the lz4 round
    conv_db = TxtTokDb(conv_txt, -1)
    assert sorted(conv_db.ids) == sorted(src_txt.ids)
    for i in src_txt.ids:
        assert conv_db[i] == src_txt[i]

    eval_conv = eval_main(common + [
        "--test_txt_db", conv_txt, "--test_img_db", conv_img,
        "--biencoder_checkpoint", ckpt, "--output_dir", out_dir])
    assert eval_conv["test"]["recall_txt"] == eval_res["test"]["recall_txt"]
    assert eval_conv["test"]["recall_img"] == eval_res["test"]["recall_img"]
