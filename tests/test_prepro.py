"""Prepro pipeline: annotations -> text DB, npz dir -> feat DB, caption meta."""
import json
import os

import numpy as np
import pytest

from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.txt_db import TxtTokDb

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "!", "a", "dog",
         "cat", "runs", "on", "the", "beach", "##s", "##ing", "photo",
         "two", "play"]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    return str(p)


def test_txt_prepro_itm(vocab_file, tmp_path_factory):
    ann = {
        "images": [
            {"filename": "1000092795.jpg",
             "sentences": [{"sentid": 0, "raw": "a dog runs"},
                           {"sentid": 1, "raw": "two dogs play"}]},
            {"filename": "10002456.jpg",
             "sentences": [{"sentid": 2, "raw": "a cat on the beach"}]},
        ]
    }
    ann_path = tmp_path_factory.mktemp("ann") / "flickr.json"
    ann_path.write_text(json.dumps(ann))
    out = str(tmp_path_factory.mktemp("db") / "itm_flickr_test.db")

    from lightningdot_tpu.cli.prepro import main
    main(["txt", "--annotation", str(ann_path), "--output", out,
          "--format", "itm", "--dataset", "flickr", "--vocab", vocab_file])

    db = TxtTokDb(out, max_txt_len=-1)
    assert sorted(db.ids) == ["0", "1", "2"]
    # flickr fname convention: flickr30k_{id:012}.npz (prepro.py:127-129)
    assert db["0"]["img_fname"] == "flickr30k_001000092795.npz"
    assert db["2"]["img_fname"] == "flickr30k_000010002456.npz"
    # wordpiece ids reconstruct: "a dog runs" -> [a, dog, runs]
    assert db["0"]["input_ids"] == [6, 7, 9]
    # "two dogs play" -> dog ##s
    assert db["1"]["input_ids"] == [16, 7, 13, 17]
    assert db.txt2img["0"] == "flickr30k_001000092795.npz"
    assert sorted(db.img2txts["flickr30k_001000092795.npz"]) == ["0", "1"]
    assert db.cls_ == 2 and db.sep == 3 and db.mask == 4


def test_img_prepro_roundtrip(tmp_path_factory, rng):
    src = tmp_path_factory.mktemp("npz") / "flickr30k"
    os.makedirs(src)
    for i in range(3):
        nbb = 8 + i
        np.savez(src / f"flickr30k_{i:012}.npz",
                 features=rng.standard_normal((nbb, 16)).astype(np.float32),
                 norm_bb=rng.random((nbb, 6)).astype(np.float32),
                 conf=np.linspace(1, 0.01, nbb).astype(np.float32))
    out = str(tmp_path_factory.mktemp("imgout"))

    from lightningdot_tpu.cli.prepro import main
    main(["img", "--img_dir", str(src), "--output", out,
          "--conf_th", "0.2", "--max_bb", "10", "--min_bb", "4"])

    db = DetectFeatDb(os.path.join(out, "flickr30k"), conf_th=0.2,
                      max_bb=10, min_bb=4)
    feat, bb = db["flickr30k_000000000000.npz"]
    # conf > 0.2 determines nbb (7 of 8 linspace(1,0.01) values > 0.2)
    n_expected = int((np.linspace(1, 0.01, 8) > 0.2).sum())
    assert feat.shape == (n_expected, 16)
    # stored dtype is preserved on read (f32 conversion happens once,
    # at batch assembly -- feat_db._load)
    assert feat.dtype in (np.float16, np.float32)


def test_caption_meta(tmp_path_factory):
    ann = tmp_path_factory.mktemp("cap") / "ann.txt"
    ann.write_text("123.jpg\ta dog runs\n123.jpg\ttwo dogs\n456.jpg\ta cat\n")
    out = str(tmp_path_factory.mktemp("capout") / "meta.json")

    from lightningdot_tpu.cli.prepro import main
    main(["caption_meta", "--annotation", str(ann), "--output", out,
          "--format", "flickr"])
    meta = json.load(open(out))
    assert meta["flickr30k_000000000123.npz"] == ["a dog runs", "two dogs"]
    assert meta["flickr30k_000000000456.npz"] == ["a cat"]


def test_txt_prepro_conceptual(vocab_file, tmp_path_factory):
    """CC tsv rows: id \t url \t caption \t status (prepro.py:331-355)."""
    tsv = "\n".join([
        "0\thttp://x/a.jpg\ta dog runs\tsuccess",
        "1\thttp://x/b.jpg\tbroken row caption\tfail",
        "2\thttp://x/c.jpg\ta cat on the beach\tsuccess",
    ])
    ann_path = tmp_path_factory.mktemp("cc") / "cc.tsv"
    ann_path.write_text(tsv)
    out = str(tmp_path_factory.mktemp("ccdb") / "conceptual_train.db")

    from lightningdot_tpu.cli.prepro import main
    main(["txt", "--annotation", str(ann_path), "--output", out,
          "--format", "conceptual", "--split", "train",
          "--vocab", vocab_file])

    db = TxtTokDb(out, max_txt_len=-1)
    assert sorted(db.ids) == ["0", "2"]  # the 'fail' row is dropped
    assert db["0"]["img_fname"] == "gcc_train_000000000000.npz"
    assert db["2"]["img_fname"] == "gcc_train_000000000002.npz"
    assert db["0"]["input_ids"] == [6, 7, 9]
    assert db.txt2img["2"] == "gcc_train_000000000002.npz"


def test_txt_prepro_conceptual_img_filter(vocab_file, tmp_path_factory, rng):
    """--img_db filters CC texts to images whose features exist."""
    from lightningdot_tpu.data.feat_db import write_feat_db

    img_dir = str(tmp_path_factory.mktemp("ccimg") / "gcc_train")
    rec = {"features": rng.standard_normal((6, 8)).astype(np.float32),
           "norm_bb": rng.random((6, 7)).astype(np.float32),
           "conf": np.linspace(1, 0.5, 6).astype(np.float32)}
    write_feat_db(img_dir, {"gcc_train_000000000002.npz": rec},
                  conf_th=0.2, max_bb=6, min_bb=2, num_bb=4)

    tsv = "\n".join([
        "0\thttp://x/a.jpg\ta dog runs\tsuccess",
        "2\thttp://x/c.jpg\ta cat on the beach\tsuccess",
    ])
    ann_path = tmp_path_factory.mktemp("cc2") / "cc.tsv"
    ann_path.write_text(tsv)
    out = str(tmp_path_factory.mktemp("ccdb2") / "conceptual_train.db")

    from lightningdot_tpu.cli.prepro import main
    main(["txt", "--annotation", str(ann_path), "--output", out,
          "--format", "conceptual", "--split", "train",
          "--vocab", vocab_file, "--img_db", img_dir])

    db = TxtTokDb(out, max_txt_len=-1)
    assert db.ids == ["2"]  # id 0 has no downloaded features


def test_txt_prepro_sbu(vocab_file, tmp_path_factory):
    """SBU entries: {'iid','sent','file_path'} (prepro.py:358-381)."""
    data = [
        {"iid": "00042", "sent": "a dog runs", "file_path": "0001/1.jpg"},
        {"iid": "bad7", "sent": "a cat on the beach",
         "file_path": "0001/2.jpg"},
        {"iid": "99", "sent": "two dogs play", "file_path": "0347/565.jpg"},
    ]
    ann_path = tmp_path_factory.mktemp("sbu") / "sbu.json"
    ann_path.write_text(json.dumps(data))
    out = str(tmp_path_factory.mktemp("sbudb") / "sbu.db")

    from lightningdot_tpu.cli.prepro import main
    main(["txt", "--annotation", str(ann_path), "--output", out,
          "--format", "sbu", "--vocab", vocab_file])

    db = TxtTokDb(out, max_txt_len=-1)
    # corrupted 0347/565.jpg skipped; numeric iid canonicalized via int()
    assert sorted(db.ids) == ["42", "bad7"]
    assert db["42"]["img_fname"] == "sbu_42.npz"
    assert db["bad7"]["img_fname"] == "sbu_bad7.npz"
