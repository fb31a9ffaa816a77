"""Data preprocessing: annotations -> text DBs, npz feature dirs -> feat DBs.

Parity targets:
  * ``process_image_text_retrieval`` (uniter_model/prepro.py:384-413):
    karpathy-split annotation JSON -> per-sentence records with
    input_ids/img_fname + id2len/txt2img/img2txts side files; coco/flickr
    fname conventions (prepro.py:109-130);
  * ``process_caption`` (prepro.py:313-330): COCO-style caption annotations;
  * ``scripts/convert_imgdir.py``: a directory of per-image .npz region
    features -> feature DB with nbb json (fp32 downcast to fp16, arrays
    truncated to nbb);
  * ``scripts/extract_generated_caption.py:46-74`` ``annotation2json``:
    caption meta JSON for the caption-blending path.

Tokenization: a local vocab file (``--vocab``) builds a BertTokenizer
offline (the environment cannot download); records store
``input_ids`` exactly like the reference (reconstructable word-piece
tokenization, prepro.py:25-43).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
from collections import defaultdict
from os.path import basename
from typing import Dict, List

import numpy as np

from lightningdot_tpu.data.feat_db import compute_num_bb, write_feat_db
from lightningdot_tpu.data.txt_db import write_txt_db
from lightningdot_tpu.utils.logging import LOGGER

IN_WORD = "@@"


def get_tokenizer(bert_name: str, vocab_file: str | None):
    if vocab_file:
        # this framework's tokenizer — golden-identical to BertTokenizer
        # (tests/test_tokenizer.py) with a ~19x-faster C++ path on cased
        # vocabs; corpus prepro is tokenization-bound
        from lightningdot_tpu.data.tokenizer import WordPieceTokenizer

        return WordPieceTokenizer(vocab_file,
                                  do_lower_case="uncased" in bert_name)
    from transformers import BertTokenizer

    return BertTokenizer.from_pretrained(bert_name)


def bert_tokenize(tokenizer, text: str):
    """Reconstructable per-word tokenization (prepro.py:25-43)."""
    if hasattr(tokenizer, "encode_words"):
        # one native call per caption instead of a Python loop per word
        # (scripts/perf_prepro_tokenize.py has the throughput ladder)
        ids, starts = tokenizer.encode_words(text)
        toks = tokenizer.convert_ids_to_tokens(ids)
        words = [t if s else f"{IN_WORD}{t}"
                 for t, s in zip(toks, starts)]
        return ids, words
    ids: List[int] = []
    words: List[str] = []
    for word in text.strip().split():
        ws = tokenizer.tokenize(word)
        if not ws:
            continue
        words.append(ws[0])
        for w in ws[1:]:
            words.append(f"{IN_WORD}{w}")
        ids.extend(tokenizer.convert_tokens_to_ids(ws))
    return ids, words


def get_coco_fname(id_: int, split: str) -> str:
    """prepro.py:109-111."""
    return f"coco_{split}_{id_:012}.npz"


def get_flickr_fname(id_: int) -> str:
    """prepro.py:127-129."""
    return f"flickr30k_{id_:012}.npz"


def meta_for(tokenizer) -> Dict:
    return {
        "CLS": tokenizer.cls_token_id,
        "SEP": tokenizer.sep_token_id,
        "MASK": tokenizer.mask_token_id,
        "UNK": tokenizer.unk_token_id,
        "v_range": [tokenizer.convert_tokens_to_ids("!"),
                    tokenizer.vocab_size],
        "vocab": tokenizer.vocab_size,
    }


def process_image_text_retrieval(data, tokenizer, dataset: str, split: str):
    """prepro.py:384-413 -> (examples, txt2img, img2txts)."""
    examples, txt2img = {}, {}
    img2txts = defaultdict(list)
    for q in data:
        filename = q["filename"].split(".jpg")[0]
        image_id = (int(filename.split("_")[-1])
                    if re.search("[a-zA-Z]", filename) else int(filename))
        if dataset == "coco":
            img_fname = get_coco_fname(image_id, split)
        elif dataset == "flickr":
            img_fname = get_flickr_fname(image_id)
        else:
            raise ValueError("unrecognized data")
        for s in q["sentences"]:
            id_ = str(s["sentid"])
            input_ids, toked = bert_tokenize(tokenizer, s["raw"])
            examples[id_] = {
                "sentid": s["sentid"], "raw": s["raw"],
                "toked_caption": toked, "input_ids": input_ids,
                "img_fname": img_fname, "image_id": image_id,
            }
            txt2img[id_] = img_fname
            img2txts[img_fname].append(id_)
    return examples, txt2img, dict(img2txts)


def process_caption(data, tokenizer, split: str):
    """prepro.py:313-330 (COCO caption annotations)."""
    examples, txt2img = {}, {}
    img2txts = defaultdict(list)
    for q in data["annotations"]:
        id_ = str(q["id"])
        input_ids, toked = bert_tokenize(tokenizer, q["caption"])
        img_fname = get_coco_fname(q["image_id"], split)
        examples[id_] = {
            "id": q["id"], "caption": q["caption"],
            "toked_caption": toked, "input_ids": input_ids,
            "img_fname": img_fname, "image_id": q["image_id"],
        }
        txt2img[id_] = img_fname
        img2txts[img_fname].append(id_)
    return examples, txt2img, dict(img2txts)


def process_conceptual_caption(tsv_lines, imgs, tokenizer, split: str):
    """Conceptual Captions tsv -> records (prepro.py:331-355).

    Row format: ``id \\t url \\t caption \\t success|fail``; only successful
    downloads whose feature file exists in ``imgs`` are kept. ``imgs`` may be
    None to skip the existence filter (features converted later).
    """
    examples, txt2img = {}, {}
    img2txts = defaultdict(list)
    for line in tsv_lines:
        line = line.strip()
        if not line:
            continue
        fields = line.split("\t")
        assert len(fields) == 4, f"bad CC row: {line!r}"
        id_, _, caption, success = fields
        if success == "fail":
            continue
        assert success == "success", f"bad CC status: {success!r}"
        input_ids, toked = bert_tokenize(tokenizer, caption)
        assert input_ids  # safeguard for empty text (prepro.py:342)
        img_fname = f"gcc_{split}_{int(id_):012}.npz"
        if imgs is not None and img_fname not in imgs:
            continue
        examples[id_] = {
            "id": id_, "toked_caption": toked, "input_ids": input_ids,
            "img_fname": img_fname,
        }
        txt2img[id_] = img_fname
        img2txts[img_fname].append(id_)
    return examples, txt2img, dict(img2txts)


def process_sbu_caption(data, tokenizer):
    """SBU caption json -> records (prepro.py:358-381).

    ``data``: list of {'iid', 'sent', 'file_path'} entries; the known
    corrupted image 0347/565.jpg is skipped, and numeric iids are
    canonicalized through int() (the reference's feature-extraction quirk).
    """
    examples, txt2img = {}, {}
    img2txts = defaultdict(list)
    for ex in data:
        if ex["file_path"] == "0347/565.jpg":
            # special case for corrupted image (prepro.py:362-364)
            continue
        id_ = ex["iid"]
        input_ids, toked = bert_tokenize(tokenizer, ex["sent"])
        assert input_ids  # safeguard for empty text
        try:
            id_ = str(int(id_))  # sbu feature extraction quirk
        except ValueError:
            pass
        img_fname = f"sbu_{id_}.npz"
        examples[id_] = {
            "id": id_, "toked_caption": toked, "input_ids": input_ids,
            "img_fname": img_fname,
        }
        txt2img[id_] = img_fname
        img2txts[img_fname].append(id_)
    return examples, txt2img, dict(img2txts)


def convert_imgdir(img_dir: str, output: str, conf_th: float = 0.2,
                   max_bb: int = 100, min_bb: int = 10, num_bb: int = 36,
                   keep_all: bool = False) -> str:
    """scripts/convert_imgdir.py semantics on the ldkv store."""
    split = basename(img_dir.rstrip("/"))
    out_dir = os.path.join(output, split)
    files = sorted(glob.glob(f"{img_dir}/*.npz"))
    records = {}
    for fname in files:
        try:
            dump = dict(np.load(fname, allow_pickle=True))
        except Exception as e:  # corrupted file (convert_imgdir.py:46-50)
            LOGGER.warning("corrupted file %s: %s", fname, e)
            continue
        nbb = None
        if not keep_all:
            nbb = compute_num_bb(dump["conf"], conf_th, min_bb, max_bb)
        rec = {}
        for key, arr in dump.items():
            if arr.dtype == np.float32:
                arr = arr.astype(np.float16)
            rec[key] = arr[:nbb] if arr.ndim in (1, 2) else arr
        records[basename(fname)] = rec
    write_feat_db(out_dir, records, conf_th=-1 if keep_all else conf_th,
                  max_bb=max_bb, min_bb=min_bb, num_bb=num_bb)
    LOGGER.info("wrote %d image records to %s", len(records), out_dir)
    return out_dir


def annotation2json(annotation_file: str, format: str = "flickr",
                    prefix: str = "coco_val2014_", max_len: int = 12
                    ) -> Dict[str, List[str]]:
    """extract_generated_caption.py:46-74 (caption meta)."""
    res = defaultdict(list)
    if format in ("flickr", "flicker"):
        with open(annotation_file) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                k, v = line.split("\t")
                k = k.split(".")[0]
                k = "flickr30k_" + "0" * (max_len - len(k)) + k + ".npz"
                res[k].append(v)
    elif format == "coco":
        with open(annotation_file) as f:
            labels = json.load(f)["annotations"]
        for l in labels:
            name = str(l["image_id"])
            name = prefix + "0" * (max_len - len(name)) + name + ".npz"
            res[name].append(l["caption"])
    else:
        raise NotImplementedError(format)
    return dict(res)


def parse_rt_log(log_file: str, n_captions: int = 5, max_len: int = 12
                 ) -> Dict[str, List[str]]:
    """Parse generated-caption logs (extract_generated_caption.py:72-88):
    blocks of n_captions lines preceding each 'image <name>.jpg:' marker."""
    with open(log_file) as f:
        lines = [l.strip() for l in f.readlines()]
    idx = [i for i, l in enumerate(lines) if "image " in l and ".jpg:" in l]
    res = {}
    for i in idx:
        captions = lines[max(i - n_captions - 1, 0):i - 1]
        name = (lines[i].split()[1]).split(".")[0]
        name = "flickr30k_" + "0" * (max_len - len(name)) + name + ".npz"
        res[name] = captions
    return res


def main(cmds=None):
    parser = argparse.ArgumentParser("prepro", allow_abbrev=False)
    sub = parser.add_subparsers(dest="task", required=True)

    p_txt = sub.add_parser("txt", help="annotations -> text DB")
    p_txt.add_argument("--annotation", required=True)
    p_txt.add_argument("--output", required=True)
    p_txt.add_argument("--format", default="itm",
                       choices=["itm", "caption", "conceptual", "sbu"])
    p_txt.add_argument("--dataset", default="flickr",
                       choices=["flickr", "coco"])
    p_txt.add_argument("--split", default="val2014")
    p_txt.add_argument("--bert", default="bert-base-cased")
    p_txt.add_argument("--vocab", default=None)
    p_txt.add_argument("--img_db", default=None,
                       help="conceptual: existing feature DB dir used to "
                            "filter texts to downloaded images")

    p_img = sub.add_parser("img", help="npz dir -> feature DB")
    p_img.add_argument("--img_dir", required=True)
    p_img.add_argument("--output", required=True)
    p_img.add_argument("--conf_th", type=float, default=0.2)
    p_img.add_argument("--max_bb", type=int, default=100)
    p_img.add_argument("--min_bb", type=int, default=10)
    p_img.add_argument("--num_bb", type=int, default=36)
    p_img.add_argument("--keep_all", action="store_true")

    p_meta = sub.add_parser("caption_meta",
                            help="annotations -> img meta json")
    p_meta.add_argument("--annotation", required=True)
    p_meta.add_argument("--output", required=True)
    p_meta.add_argument("--format", default="flickr",
                        choices=["flickr", "coco"])
    p_meta.add_argument("--prefix", default="coco_val2014_")

    args = parser.parse_args(cmds)
    if args.task == "txt":
        tokenizer = get_tokenizer(args.bert, args.vocab)
        if args.format == "conceptual":
            imgs = None
            if args.img_db:
                nbb_files = glob.glob(os.path.join(args.img_db, "nbb*.json"))
                assert nbb_files, f"no nbb json under {args.img_db}"
                with open(nbb_files[0]) as f:
                    imgs = set(json.load(f).keys())
            with open(args.annotation) as f:
                examples, txt2img, img2txts = process_conceptual_caption(
                    f, imgs, tokenizer, args.split)
        elif args.format == "sbu":
            with open(args.annotation) as f:
                data = json.load(f)
            examples, txt2img, img2txts = process_sbu_caption(data,
                                                              tokenizer)
        elif args.format == "itm":
            with open(args.annotation) as f:
                data = json.load(f)
            images = data["images"] if isinstance(data, dict) else data
            examples, txt2img, img2txts = process_image_text_retrieval(
                images, tokenizer, args.dataset, args.split)
        else:
            with open(args.annotation) as f:
                data = json.load(f)
            examples, txt2img, img2txts = process_caption(
                data, tokenizer, args.split)
        write_txt_db(args.output, examples, meta_for(tokenizer), txt2img,
                     img2txts)
        LOGGER.info("wrote %d text records to %s", len(examples),
                    args.output)
    elif args.task == "img":
        convert_imgdir(args.img_dir, args.output, args.conf_th, args.max_bb,
                       args.min_bb, args.num_bb, args.keep_all)
    elif args.task == "caption_meta":
        res = annotation2json(args.annotation, args.format, args.prefix)
        with open(args.output, "w") as f:
            json.dump(res, f)
        LOGGER.info("wrote caption meta for %d images to %s", len(res),
                    args.output)


if __name__ == "__main__":
    main()
