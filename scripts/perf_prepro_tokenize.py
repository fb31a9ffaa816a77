"""Corpus prepro tokenization throughput: HF BertTokenizer vs the native
WordPiece tokenizer (both through cli/prepro's bert_tokenize word loop —
the reference's reconstructable per-word protocol, prepro.py:25-43).

Corpus prepro is tokenization-bound: the rest of the text pipeline is
msgpack dumps of small dicts. Pre-train scale is ~10M captions
(COCO+VG+CC+SBU), so captions/s here is minutes-vs-hours of wall clock.

    PYTHONPATH=. python scripts/perf_prepro_tokenize.py [n_captions]
"""
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, ".")

from lightningdot_tpu.cli.prepro import bert_tokenize  # noqa: E402
from lightningdot_tpu.data.synth import synth_wordpiece_vocab  # noqa: E402
from lightningdot_tpu.data.tokenizer import WordPieceTokenizer  # noqa: E402


def synth_captions(n: int, roots, conts, seed: int = 1):
    rng = random.Random(seed)
    caps = []
    for _ in range(n):
        words = []
        for _ in range(rng.randint(8, 14)):
            w = rng.choice(roots)
            for _ in range(rng.randint(0, 2)):
                w += rng.choice(conts)
            if rng.random() < 0.2:
                w += rng.choice(".,!?")
            words.append(w)
        caps.append(" ".join(words))
    return caps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    with tempfile.TemporaryDirectory() as d:
        vocab_path = os.path.join(d, "vocab.txt")
        roots, conts = synth_wordpiece_vocab(vocab_path)
        caps = synth_captions(n, roots, conts)

        from transformers import BertTokenizer

        for tag, tok in (
                ("hf-slow (reference)", BertTokenizer(
                    vocab_file=vocab_path, do_lower_case=False)),
                ("native ldtok", WordPieceTokenizer(vocab_path)),
                ("python fallback", WordPieceTokenizer(
                    vocab_path, use_native=False))):
            for c in caps[:200]:
                bert_tokenize(tok, c)      # warm caches
            t0 = time.perf_counter()
            n_ids = 0
            for c in caps:
                ids, _ = bert_tokenize(tok, c)
                n_ids += len(ids)
            dt = time.perf_counter() - t0
            print(f"{tag:22s}: {n / dt:10,.0f} captions/s "
                  f"({n_ids / dt / 1e6:5.2f} M ids/s; {dt:6.1f} s for {n:,})")


if __name__ == "__main__":
    main()
