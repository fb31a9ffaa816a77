"""Reference-format ingestion: lz4-frame decode, pure LMDB reader, and the
``prepro from-lmdb`` converter (VERDICT r4 item 2).

Coverage strategy:
  * lz4 decode is checked against COMMITTED golden frames produced by the
    real liblz4 (tests/fixtures/lz4_frames.json) plus hand-built
    spec-vector frames, with the native (C++) and pure-python decoders
    cross-checked on every input;
  * the pure LMDB reader is checked against tests/lmdb_fixture.py's
    spec-written files AND — on environments that have it — against files
    written by the real ``lmdb`` package (skipped here: not in the image);
  * the converter runs end-to-end on reference-layout LMDBs and the
    result is read back through TxtTokDb / DetectFeatDb.
"""
import base64
import io
import json
import os

import msgpack
import numpy as np
import pytest

from lightningdot_tpu.data import lz4frame as lzf
from lightningdot_tpu.data.lmdb_reader import (LmdbFormatError,
                                               PureLmdbReader, open_lmdb)
from tests.lmdb_fixture import write_lmdb

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

try:
    import lmdb as lmdb_pkg
except ImportError:
    lmdb_pkg = None


# ---------------------------------------------------------------------------
# lz4 frame decode
# ---------------------------------------------------------------------------

def _decoders():
    out = [("pure", lambda d: lzf._py_decompress(d))]
    if lzf._native() is not None:
        out.append(("native", lambda d: lzf.decompress(d)))
    return out


def test_xxh32_public_vectors():
    # spec test vectors (xxHash README)
    for impl in (lzf._py_xxh32, lzf.xxh32):
        assert impl(b"") == 0x02CC5D05
        assert impl(b"abc") == 0x32D153FF
    assert lzf._py_xxh32(b"", 1) == lzf.xxh32(b"", 1)
    blob = bytes(range(256)) * 33  # >16B loop + tails
    assert lzf._py_xxh32(blob) == lzf.xxh32(blob)


def test_golden_frames_from_liblz4():
    """Committed frames produced by the real liblz4: every decoder must
    reproduce the original bytes (incl. linked blocks, checksums, stored
    blocks, missing content size)."""
    with open(os.path.join(FIXTURES, "lz4_frames.json")) as f:
        cases = json.load(f)
    assert len(cases) >= 6
    for case in cases:
        want = base64.b64decode(case["input_b64"])
        frame = base64.b64decode(case["frame_b64"])
        for name, dec in _decoders():
            assert dec(frame) == want, (case["desc"], name)


def _stored_frame(data: bytes, *, content_size: bool = True) -> bytes:
    """Hand-built spec frame using only UNCOMPRESSED blocks."""
    flg = 0x60 | (0x08 if content_size else 0)  # v01 + B.Indep (+C.Size)
    desc = bytes([flg, 0x40])  # BD: 64KB max block
    if content_size:
        desc += len(data).to_bytes(8, "little")
    hc = (lzf._py_xxh32(desc) >> 8) & 0xFF
    out = (0x184D2204).to_bytes(4, "little") + desc + bytes([hc])
    for i in range(0, max(len(data), 1), 65536):
        block = data[i:i + 65536]
        if block:
            out += (len(block) | 0x80000000).to_bytes(4, "little") + block
    return out + b"\x00\x00\x00\x00"


def test_hand_built_spec_frames():
    for data in (b"", b"x", b"hello " * 999, os.urandom(70000)):
        frame = _stored_frame(data)
        for name, dec in _decoders():
            assert dec(frame) == data, name
    # block-format spec vector: literals then an overlapping match.
    # token 0x54: 5 literals, match len 4+4=8; offset 1 -> run of last byte
    block = bytes([0x54]) + b"abcde" + (1).to_bytes(2, "little")
    assert lzf.block_decompress(block) == b"abcde" + b"e" * 8
    # match reaching into history (linked blocks): token 0x00 = 0
    # literals + minimum match (4), offset 3 wraps the 3-byte history
    block2 = bytes([0x00]) + (3).to_bytes(2, "little")
    assert lzf.block_decompress(block2, hist=b"xyz") == b"xyzx"


def test_lz4_error_paths():
    with pytest.raises(lzf.Lz4Error):
        lzf._py_decompress(b"\x00\x00\x00\x00garbage")  # bad magic
    frame = _stored_frame(b"hello world")
    with pytest.raises(lzf.Lz4Error):
        lzf._py_decompress(frame[:-6])  # truncated
    bad = bytearray(frame)
    bad[4 + 2 + 8] ^= 0xFF  # corrupt the header checksum byte
    with pytest.raises(lzf.Lz4Error):
        lzf._py_decompress(bytes(bad))
    if lzf._native() is not None:
        with pytest.raises(lzf.Lz4Error):
            lzf.decompress(bytes(bad))
    # declared content size disagrees with the decoded length
    lie = _stored_frame(b"hello world")
    lied = lie[:6] + (99).to_bytes(8, "little") + lie[14:]
    hc = (lzf._py_xxh32(lied[4:14]) >> 8) & 0xFF
    lied = lied[:14] + bytes([hc]) + lied[15:]
    with pytest.raises(lzf.Lz4Error):
        lzf._py_decompress(lied)


def test_skippable_frames_and_concatenation():
    skip = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") \
        + b"\xde\xad\xbe\xef"
    frame = skip + _stored_frame(b"one") + _stored_frame(b"two")
    for name, dec in _decoders():
        assert dec(frame) == b"onetwo", name


def _liblz4():
    import ctypes

    try:
        lib = ctypes.CDLL("liblz4.so.1")
    except OSError:
        return None
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t,
                                            ctypes.c_void_p]
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p]
    lib.LZ4F_isError.restype = ctypes.c_uint
    lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
    return lib


@pytest.mark.skipif(_liblz4() is None, reason="no system liblz4")
def test_fuzz_decoders_vs_system_liblz4():
    """Property fuzz: real-liblz4-compressed random payloads (mixed
    compressibility) must decode identically through the native and pure
    decoders."""
    import ctypes

    lib = _liblz4()

    def compress(data):
        bound = lib.LZ4F_compressFrameBound(len(data), None)
        dst = ctypes.create_string_buffer(bound)
        got = lib.LZ4F_compressFrame(dst, bound, data, len(data), None)
        assert not lib.LZ4F_isError(got)
        return dst.raw[:got]

    rng = np.random.default_rng(123)
    for trial in range(60):
        kind = trial % 3
        size = int(rng.integers(0, 150000))
        if kind == 0:  # highly compressible
            data = bytes(rng.integers(0, 4, size, dtype=np.uint8))
        elif kind == 1:  # msgpack-record-like structure
            data = msgpack.dumps(
                {"input_ids": rng.integers(0, 30000, size % 500).tolist(),
                 "img_fname": "x" * (size % 64)}, use_bin_type=True)
        else:  # incompressible
            data = rng.bytes(size)
        frame = compress(data)
        for name, dec in _decoders():
            assert dec(frame) == data, (trial, name, size)


# ---------------------------------------------------------------------------
# pure LMDB reader
# ---------------------------------------------------------------------------

def _mixed_items(n=400, seed=3):
    rng = np.random.default_rng(seed)
    items = {}
    for i in range(n):
        size = int(rng.choice([8, 120, 400, 2500, 9000],
                              p=[.3, .3, .3, .05, .05]))
        items[f"rec_{i:06d}".encode()] = rng.bytes(size)
    return items


def test_pure_reader_roundtrip(tmp_path):
    items = _mixed_items()
    write_lmdb(str(tmp_path / "db"), items)
    with PureLmdbReader(str(tmp_path / "db")) as r:
        assert len(r) == len(items)
        got = dict(r.items())
        assert got == items
        assert list(got) == sorted(items)  # B-tree key order
        keys = sorted(items)
        for k in keys[::29] + [keys[0], keys[-1]]:
            assert r.get(k) == items[k]
        assert r.get(b"absent") is None
        assert r.get(keys[0] + b"x") is None


def test_pure_reader_deep_tree_and_edge_cases(tmp_path):
    # long keys force multiple branch levels; empty db; single leaf
    deep = {(b"k%05d" % i) * 40: (b"v%d" % i) * 30 for i in range(1500)}
    write_lmdb(str(tmp_path / "deep"), deep)
    with PureLmdbReader(str(tmp_path / "deep")) as r:
        assert r.main.depth >= 3
        assert dict(r.items()) == deep
        ks = sorted(deep)
        for k in ks[::171]:
            assert r.get(k) == deep[k]
    write_lmdb(str(tmp_path / "empty"), {})
    with PureLmdbReader(str(tmp_path / "empty")) as r:
        assert len(r) == 0 and list(r.items()) == [] \
            and r.get(b"x") is None
    write_lmdb(str(tmp_path / "one"), {b"a": b"1"})
    with PureLmdbReader(str(tmp_path / "one")) as r:
        assert dict(r.items()) == {b"a": b"1"}


def test_meta_layout_invariants(tmp_path):
    """Independent re-derivation of the documented struct offsets: magic
    u32 at 16, version u32 at 20, psize at dbs[0].pad (40), main root u64
    at 128, txnid u64 at 144 — guards reader and writer against agreeing
    on a WRONG layout."""
    write_lmdb(str(tmp_path / "db"), {b"k": b"v"})
    raw = open(tmp_path / "db" / "data.mdb", "rb").read()
    for off in (0, 4096):
        assert int.from_bytes(raw[off + 16:off + 20], "little") == 0xBEEFC0DE
        assert int.from_bytes(raw[off + 20:off + 24], "little") == 1
        assert int.from_bytes(raw[off + 40:off + 44], "little") == 4096
        flags = int.from_bytes(raw[off + 10:off + 12], "little")
        assert flags & 0x08  # P_META
    live = raw[4096:]  # meta 1 carries txnid 1
    assert int.from_bytes(live[144:152], "little") == 1
    root = int.from_bytes(live[128:136], "little")
    page = raw[root * 4096:(root + 1) * 4096]
    assert int.from_bytes(page[10:12], "little") & 0x02  # P_LEAF


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "data.mdb").write_bytes(b"\x00" * 16384)
    with pytest.raises(LmdbFormatError):
        PureLmdbReader(str(p))


@pytest.mark.skipif(lmdb_pkg is None,
                    reason="lmdb package not in this image — this is the "
                           "artifact-day cross-check of the pure reader "
                           "against real lmdb-written files")
def test_pure_reader_vs_real_lmdb(tmp_path):
    items = _mixed_items(n=3000, seed=7)
    env = lmdb_pkg.open(str(tmp_path / "real"), map_size=1 << 30)
    with env.begin(write=True) as txn:
        for k, v in items.items():
            txn.put(k, v)
    env.close()
    with PureLmdbReader(str(tmp_path / "real")) as r:
        assert dict(r.items()) == items
        for k in sorted(items)[::97]:
            assert r.get(k) == items[k]


def test_open_lmdb_backend_selection(tmp_path):
    write_lmdb(str(tmp_path / "db"), {b"a": b"1"})
    r = open_lmdb(str(tmp_path / "db"), backend="pure")
    assert isinstance(r, PureLmdbReader)
    r.close()
    if lmdb_pkg is None:
        assert isinstance(open_lmdb(str(tmp_path / "db")), PureLmdbReader)
        with pytest.raises(ImportError):
            open_lmdb(str(tmp_path / "db"), backend="package")


# ---------------------------------------------------------------------------
# from-lmdb converter, end to end
# ---------------------------------------------------------------------------

def _ref_txt_lmdb(path, n_imgs=5, txts_per_img=3):
    """Reference-layout text DB: data.mdb with lz4(msgpack(record)) values
    + the four side jsons (uniter_model/data/data.py:137-224)."""
    rng = np.random.default_rng(11)
    raw_items, id2len, txt2img = {}, {}, {}
    for i in range(n_imgs):
        fname = f"flickr30k_{i:012d}.npz"
        for j in range(txts_per_img):
            tid = f"{i * 10 + j}"
            ids = rng.integers(106, 28996,
                               int(rng.integers(4, 30))).tolist()
            rec = {"input_ids": ids, "img_fname": fname}
            raw_items[tid.encode()] = _stored_frame(
                msgpack.dumps(rec, use_bin_type=True))
            id2len[tid] = len(ids)
            txt2img[tid] = fname
    write_lmdb(path, raw_items)
    img2txts = {}
    for t, im in txt2img.items():
        img2txts.setdefault(im, []).append(t)
    for name, obj in (("id2len.json", id2len), ("txt2img.json", txt2img),
                      ("img2txts.json", img2txts),
                      ("meta.json", {"CLS": 101, "SEP": 102, "MASK": 103,
                                     "v_range": [106, 28996]})):
        with open(os.path.join(path, name), "w") as f:
            json.dump(obj, f)
    return id2len, txt2img


def test_convert_txt_lmdb_end_to_end(tmp_path):
    from lightningdot_tpu.cli.prepro import main as prepro_main
    from lightningdot_tpu.data.txt_db import TxtTokDb

    src = str(tmp_path / "ref.db")
    id2len, txt2img = _ref_txt_lmdb(src)
    out = str(tmp_path / "out.db")
    prepro_main(["from-lmdb", "--kind", "txt", "--src", src,
                 "--output", out])
    db = TxtTokDb(out, max_txt_len=60)
    assert db.id2len == id2len
    assert db.txt2img == txt2img
    assert db.cls_ == 101 and db.sep == 102 and db.mask == 103
    with PureLmdbReader(src) as r:
        for key, value in r.items():
            rec = msgpack.loads(lzf.decompress(bytes(value)), raw=False)
            assert db[key.decode()] == rec
    # combine_inputs still matches the reference contract on converted data
    first = db[db.ids[0]]
    combined = db.combine_inputs(first["input_ids"])
    assert combined[0] == 101 and combined[-1] == 102


def test_convert_txt_rejects_wrong_kind(tmp_path):
    from lightningdot_tpu.cli.prepro import convert_lmdb_txt

    src = str(tmp_path / "ref_img.db")
    write_lmdb(src, {b"a.npz": _stored_frame(
        msgpack.dumps([1, 2, 3]))})
    with pytest.raises(ValueError, match="wrong --kind"):
        convert_lmdb_txt(src, str(tmp_path / "o"))


def _npz_value(rng, nbb, dim=32):
    buf = io.BytesIO()
    np.savez(buf,
             features=rng.standard_normal((nbb, dim)).astype(np.float16),
             norm_bb=rng.random((nbb, 6)).astype(np.float16),
             conf=rng.random(nbb).astype(np.float32))
    return buf.getvalue()


def test_convert_img_lmdb_end_to_end(tmp_path):
    from lightningdot_tpu.cli.prepro import main as prepro_main
    from lightningdot_tpu.data.feat_db import DetectFeatDb

    rng = np.random.default_rng(5)
    fnames = [f"coco_val2014_{i:012d}.npz" for i in range(6)]
    items = {f.encode(): _npz_value(rng, int(rng.integers(12, 40)))
             for f in fnames}
    items[b"__keys__"] = json.dumps(fnames).encode()
    src = str(tmp_path / "feat_th0.2_max100_min10_compressed")
    write_lmdb(src, items)
    out = str(tmp_path / "img_out")
    prepro_main(["from-lmdb", "--kind", "img", "--src", src,
                 "--output", out])
    db = DetectFeatDb(out, conf_th=0.2, max_bb=100, min_bb=10)
    for f in fnames:
        src_arrays = dict(np.load(io.BytesIO(items[f.encode()])))
        nbb = db.name2nbb[f]
        want_nbb = min(100, max(10, int((src_arrays["conf"] > 0.2).sum())))
        assert nbb == want_nbb
        feat, bb = db[f]
        np.testing.assert_array_equal(
            np.asarray(feat), src_arrays["features"][:nbb].astype(
                np.float32))
    assert f"__keys__" not in db.name2nbb


def test_convert_img_msgpack_numpy_records(tmp_path):
    """compress=False reference DBs store msgpack_numpy records
    (data.py:85-125); the converter must decode them without the
    msgpack_numpy package."""
    from lightningdot_tpu.cli.prepro import convert_lmdb_img
    from lightningdot_tpu.data.feat_db import DetectFeatDb

    rng = np.random.default_rng(9)
    feats = rng.standard_normal((20, 16)).astype(np.float16)
    bb = rng.random((20, 6)).astype(np.float16)
    conf = rng.random(20).astype(np.float32)

    def mn(arr):
        return {b"nd": True, b"type": arr.dtype.str.encode(),
                b"kind": b"", b"shape": list(arr.shape),
                b"data": arr.tobytes()}

    rec = msgpack.dumps({b"features": mn(feats), b"norm_bb": mn(bb),
                         b"conf": mn(conf)})
    src = str(tmp_path / "feat_th0.2_max100_min10")
    write_lmdb(src, {b"img_0.npz": rec})
    out = str(tmp_path / "img_out")
    convert_lmdb_img(src, out)
    db = DetectFeatDb(out, conf_th=0.2, max_bb=100, min_bb=10)
    feat, _ = db["img_0.npz"]
    nbb = db.name2nbb["img_0.npz"]
    np.testing.assert_array_equal(np.asarray(feat),
                                  feats[:nbb].astype(np.float32))


def test_convert_img_param_parsing(tmp_path):
    from lightningdot_tpu.cli.prepro import convert_lmdb_img

    rng = np.random.default_rng(2)
    src = str(tmp_path / "feat_th0.5_max36_min4_compressed")
    write_lmdb(src, {b"x.npz": _npz_value(rng, 30)})
    out = str(tmp_path / "o")
    convert_lmdb_img(src, out)  # params parsed from the dir name
    assert os.path.exists(
        os.path.join(out, "nbb_th0.5_max36_min4.json"))
