"""WordPieceTokenizer (native C++ + pure-Python) vs transformers golden.

The reference tokenizes queries and corpora with transformers.BertTokenizer
(dvl/utils.py:205-208, uniter_model/prepro.py:25-43); our tokenizer must be
character-for-character identical on both the cased and uncased paths.
"""
import random

import pytest

from lightningdot_tpu.data.tokenizer import WordPieceTokenizer

TRICKY = [
    "Hello world, this is a test!",
    "naïve café — “smart quotes” and … ellipsis",
    "中国 text with CJK and mixed 中Hello国",
    "punct...everywhere!!!don't@stop",
    "  multiple   spaces\tand\nnewlines ",
    "",
    " ",
    "x" * 150,                     # > max_input_chars_per_word -> [UNK]
    "[CLS] special [SEP] tokens [MASK] pass unsplit",
    "control\x00chars\x7fand�replacement",
    "ascii $ymbols <like> ^these` |and~ =more+",
    " nbsp thin space　ideographic",
    "Ødd létters überall",
]


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    rng = random.Random(0)
    letters = "abcdefghijklmnopqrstuvwxyz"
    pieces = {"".join(rng.choice(letters) for _ in range(rng.randint(2, 7)))
              for _ in range(6000)}
    subs = {"##" + "".join(rng.choice(letters)
                           for _ in range(rng.randint(1, 5)))
            for _ in range(9000)}
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + sorted(pieces)[:4000] + sorted(subs)[:8000]
             + list("!\"#$%&'()*,-.:;?@[]`{}~|")
             + ["Hello", "##world", "naïve", "café", "中", "国"])
    path = tmp_path_factory.mktemp("tok") / "vocab.txt"
    path.write_text("\n".join(vocab), encoding="utf-8")
    return str(path)


def _cases(vocab_path):
    rng = random.Random(1)
    with open(vocab_path, encoding="utf-8") as f:
        toks = [t.rstrip("\n") for t in f]
    roots = [t for t in toks if t.isalpha() and t.islower()]
    conts = [t[2:] for t in toks if t.startswith("##")]
    cases = list(TRICKY)
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 15)):
            w = rng.choice(roots)
            for _ in range(rng.randint(0, 3)):
                w += rng.choice(conts)
            if rng.random() < 0.3:
                w += rng.choice(".,!?;:")
            words.append(w)
        cases.append(" ".join(words))
    return cases


@pytest.mark.parametrize("lower", [False, True])
def test_matches_transformers_golden(vocab_path, lower):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=vocab_path, do_lower_case=lower)
    ours = WordPieceTokenizer(vocab_path, do_lower_case=lower)
    ours_py = WordPieceTokenizer(vocab_path, do_lower_case=lower,
                                 use_native=False)
    assert not ours_py.native
    for text in _cases(vocab_path):
        want = hf.encode(text)
        assert ours.encode(text) == want, repr(text)
        assert ours_py.encode(text) == want, repr(text)
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)


def test_native_path_is_active(vocab_path):
    """The C++ library builds and loads in this environment (cased only)."""
    assert WordPieceTokenizer(vocab_path).native
    assert not WordPieceTokenizer(vocab_path, do_lower_case=True).native


def test_special_token_ids(vocab_path):
    t = WordPieceTokenizer(vocab_path)
    assert (t.pad_token_id, t.unk_token_id, t.cls_token_id,
            t.sep_token_id, t.mask_token_id) == (0, 1, 2, 3, 4)
    assert t.convert_tokens_to_ids("[MASK]") == 4
    assert t.convert_tokens_to_ids(["[CLS]", "[SEP]"]) == [2, 3]
    assert t.convert_ids_to_tokens(2) == "[CLS]"
    assert len(t) > 9000


def test_long_text_buffer_growth(vocab_path):
    """Native result buffer regrows when a text produces >512 ids."""
    t = WordPieceTokenizer(vocab_path)
    text = " ".join(["Hello"] * 700)
    ids = t.encode(text)
    assert len(ids) == 702
    assert ids[1:-1] == [t.vocab["Hello"]] * 700


def test_add_special_tokens_flag(vocab_path):
    t = WordPieceTokenizer(vocab_path)
    full = t.encode("Hello")
    bare = t.encode("Hello", add_special_tokens=False)
    assert full == [t.cls_token_id] + bare + [t.sep_token_id]


def test_lone_surrogates_dropped_like_reference(vocab_path):
    """Unpaired surrogates (category Cs -> control) are dropped by the
    reference; the native path must not raise UnicodeEncodeError."""
    nat = WordPieceTokenizer(vocab_path)
    py = WordPieceTokenizer(vocab_path, use_native=False)
    text = "Hello \udcff\ud800 naïve"
    want = py.encode(text)
    assert nat.encode(text) == want
    assert want == py.encode("Hello  naïve")


def test_duplicate_vocab_line_maps_to_last_id(tmp_path):
    """HF load_vocab overwrites on duplicates — both paths must match."""
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "dup", "other",
         "dup"]), encoding="utf-8")
    for use_native in (True, False):
        t = WordPieceTokenizer(str(path), use_native=use_native)
        assert t.encode("dup", add_special_tokens=False) == [7], use_native


def test_concurrent_encodes_thread_safe(vocab_path):
    """The native result buffer is shared; concurrent encodes must not
    interleave (ctypes releases the GIL during the C call)."""
    from concurrent.futures import ThreadPoolExecutor

    t = WordPieceTokenizer(vocab_path)
    texts = [f"Hello {'x' * (i % 7)} world" for i in range(200)]
    want = [t.encode(s) for s in texts]
    with ThreadPoolExecutor(8) as pool:
        got = list(pool.map(t.encode, texts))
    assert got == want


def test_fuzz_random_unicode_matches_hf(vocab_path):
    """Seeded random-unicode fuzz vs the genuine HF tokenizer (this battery
    found the missing NFC normalization — U+037E -> ';' etc.)."""
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=vocab_path, do_lower_case=False)
    nat = WordPieceTokenizer(vocab_path)
    py = WordPieceTokenizer(vocab_path, use_native=False)
    rng = random.Random(1234)

    def rand_char():
        r = rng.random()
        if r < 0.5:
            return chr(rng.randint(32, 126))
        if r < 0.7:
            return chr(rng.randint(0xA0, 0x2FFF))
        if r < 0.85:
            return chr(rng.randint(0x3000, 0xFFFD))
        return chr(rng.randint(0x10000, 0x10FFFF))

    for _ in range(600):
        s = "".join(rand_char() for _ in range(rng.randint(0, 40)))
        s = "".join(c for c in s if not 0xD800 <= ord(c) <= 0xDFFF)
        want = hf.encode(s)
        assert nat.encode(s) == want, repr(s)
        assert py.encode(s) == want, repr(s)


def test_nfc_normalization_cases(vocab_path):
    """NFC singletons and decomposed sequences (HF normalizes pre-split)."""
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=vocab_path, do_lower_case=False)
    nat = WordPieceTokenizer(vocab_path)
    py = WordPieceTokenizer(vocab_path, use_native=False)
    cases = [
        ";",                 # GREEK QUESTION MARK -> ';'
        "naïve query",      # decomposed umlaut -> composed
        "café café",   # e + combining acute == é
        "Å vs Å",       # ANGSTROM SIGN -> Å
        "中́ mark after CJK",
    ]
    for s in cases:
        want = hf.encode(s)
        assert nat.encode(s) == want, repr(s)
        assert py.encode(s) == want, repr(s)


def test_encode_words_matches_per_word_protocol(vocab_path):
    """encode_words == bert_tokenize's per-word HF loop (ids AND the
    word-start structure), native and fallback, incl. CJK-inside-word and
    control-char splits."""
    from transformers import BertTokenizer

    from lightningdot_tpu.cli.prepro import IN_WORD, bert_tokenize

    hf = BertTokenizer(vocab_file=vocab_path, do_lower_case=False)

    def ref(text):
        ids, words = [], []
        for word in text.strip().split():
            ws = hf.tokenize(word)
            if not ws:
                continue
            words.append(ws[0])
            words.extend(f"{IN_WORD}{w}" for w in ws[1:])
            ids.extend(hf.convert_tokens_to_ids(ws))
        return ids, words

    nat = WordPieceTokenizer(vocab_path)
    py = WordPieceTokenizer(vocab_path, use_native=False)
    cases = TRICKY + ["中Hello国 mixed", "a\x1cb c", "[MASK] word",
                      "naïve don't@stop ..."]
    for s in cases:
        want = ref(s)
        assert bert_tokenize(nat, s) == want, repr(s)
        assert bert_tokenize(py, s) == want, repr(s)
