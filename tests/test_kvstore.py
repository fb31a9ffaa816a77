"""ldkv store + DB layers."""
import os
import struct

import numpy as np
import pytest

from lightningdot_tpu.data.kvstore import KVReader, KVWriter, native_lib
from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.txt_db import TxtTokDb, get_ids_and_lens
from lightningdot_tpu.data.synth import make_synth_dataset


def test_kv_roundtrip(tmp_path):
    path = str(tmp_path / "test.ldkv")
    items = {f"key_{i}": bytes([i % 256]) * (i + 1) for i in range(100)}
    KVWriter.write_dict(path, items.items())

    for prefer_native in (True, False):
        r = KVReader(path, prefer_native=prefer_native)
        assert len(r) == 100
        for k, v in items.items():
            assert bytes(r[k]) == v
        assert r.get("missing") is None
        assert "key_5" in r and "nope" not in r
        assert sorted(r.keys()) == sorted(items)
        r.close()


def test_native_lib_builds():
    lib = native_lib()
    assert lib is not None, "native ldkv library should build (g++ available)"


def test_native_and_python_agree(tmp_path):
    path = str(tmp_path / "agree.ldkv")
    rng = np.random.default_rng(0)
    items = [(f"k{i}", rng.bytes(rng.integers(1, 2000)))
             for i in range(500)]
    KVWriter.write_dict(path, items)
    rn = KVReader(path, prefer_native=True)
    rp = KVReader(path, prefer_native=False)
    assert rn.native
    for k, v in items:
        assert bytes(rn[k]) == bytes(rp[k]) == v


def test_synth_dataset_contracts(tmp_path):
    txt_dir, img_dir = make_synth_dataset(str(tmp_path), n_imgs=4,
                                          txts_per_img=2, img_dim=64,
                                          min_bb=5, max_bb=12)
    feat_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=12, min_bb=5)
    fname = "synth_000000.npz"
    feat, bb = feat_db[fname]
    nbb = feat_db.name2nbb[fname]
    # features/bb keep their STORED dtype (f16 records stay f16; the f32
    # conversion happens exactly once, during batch assembly — feat_db._load)
    assert feat.shape == (nbb, 64) and feat.dtype in (np.float16, np.float32)
    assert bb.shape == (nbb, 6)
    f, pos, n = feat_db.get_img_feat(fname)
    assert pos.shape == (nbb, 7) and pos.dtype == np.float32
    np.testing.assert_allclose(
        pos[:, 6], bb[:, 4].astype(np.float32) * bb[:, 5].astype(np.float32),
        rtol=1e-5)
    batch = np.zeros((1, nbb, 64), np.float32)
    batch[0] = feat  # assignment converts exactly
    np.testing.assert_array_equal(batch[0], feat.astype(np.float32))

    txt_db = TxtTokDb(txt_dir, max_txt_len=60)
    lens, ids = get_ids_and_lens(txt_db)
    assert len(ids) == 8
    ex = txt_db[ids[0]]
    assert ex["img_fname"].startswith("synth_")
    combined = txt_db.combine_inputs(ex["input_ids"])
    assert combined[0] == 101 and combined[-1] == 102
    assert txt_db.txt2img[ids[0]] == ex["img_fname"]
    assert ids[0] in txt_db.img2txts[ex["img_fname"]]


def test_txt_db_rank_sharding(tmp_path):
    txt_dir, _ = make_synth_dataset(str(tmp_path), n_imgs=4, txts_per_img=4,
                                    img_dim=8, min_bb=5, max_bb=8)
    full = TxtTokDb(txt_dir, max_txt_len=-1)
    shards = [TxtTokDb(txt_dir, max_txt_len=-1, rank=r, world_size=4).ids
              for r in range(4)]
    # strided, disjoint, covering (data.py:185-187)
    assert sorted(sum(shards, [])) == sorted(full.ids)
    assert shards[0] == full.ids[0::4]


def test_distributed_sampler_partition():
    from lightningdot_tpu.data.loader import DistributedSampler

    n, world = 10, 4
    all_idx = []
    for rank in range(world):
        s = DistributedSampler(n, world, rank, shuffle=False)
        idx = [i for batch in s for i in batch]
        assert len(idx) == len(s) == 3
        all_idx.extend(idx)
    # covers every index (with wrap-around padding), disjoint per rank
    assert set(all_idx) == set(range(n))

    # epoch-seeded full-list shuffle: a rank sees DIFFERENT examples each
    # epoch, but across ranks each epoch still covers the whole dataset
    def epoch_indices(epoch):
        per_rank = []
        for rank in range(2):
            s = DistributedSampler(100, 2, rank, batch_size=8, shuffle=True)
            s.set_epoch(epoch)
            per_rank.append([i for b in s for i in b])
        return per_rank

    e1 = epoch_indices(1)
    e2 = epoch_indices(2)
    assert sorted(e1[0] + e1[1]) == list(range(100))
    assert sorted(e2[0] + e2[1]) == list(range(100))
    assert set(e1[0]) != set(e2[0])  # examples redistribute across epochs

    # severe-imbalance case: more replicas than examples still gives every
    # rank num_samples indices (wrap-around padding loops)
    for rank in range(24):
        s = DistributedSampler(10, 24, rank, shuffle=False)
        assert len([i for b in s for i in b]) == 1


def test_save_training_meta(tmp_path):
    import argparse
    import json as _json

    from lightningdot_tpu.training.checkpoints import save_training_meta

    args = argparse.Namespace(learning_rate=1e-4, seed=42, name="x",
                              fn=print)  # non-serializable field dropped
    save_training_meta(str(tmp_path), args)
    hps = _json.load(open(tmp_path / "log" / "hps.json"))
    assert hps["learning_rate"] == 1e-4 and "fn" not in hps
    assert (tmp_path / "ckpt").is_dir()


def test_device_prefetcher_order_and_lookahead():
    from lightningdot_tpu.data.loader import DevicePrefetcher

    calls = []

    def put(x):
        calls.append(x)
        return x * 10

    out = list(DevicePrefetcher([1, 2, 3], put=put))
    assert out == [10, 20, 30]
    assert calls == [1, 2, 3]
    assert list(DevicePrefetcher([], put=put)) == []
    assert list(DevicePrefetcher([5], put=put)) == [50]


def test_kv_many_keys_stress(tmp_path):
    """10k keys: exercises the hash-sorted index (incl. any colliding-hash
    linear scans) through both readers."""
    path = str(tmp_path / "many.ldkv")
    items = [(f"key-{i:06d}", str(i * 31).encode()) for i in range(10_000)]
    KVWriter.write_dict(path, items)
    for native in (True, False):
        r = KVReader(path, prefer_native=native)
        assert len(r) == 10_000
        rng = np.random.default_rng(0)
        for i in rng.integers(0, 10_000, 300):
            assert bytes(r[f"key-{i:06d}"]) == str(i * 31).encode()
        assert r.get("key-999999") is None
        r.close()


def test_meta_loader_seeded_task_sequence():
    """Same seed -> same task order (replaces the any_broadcast sync)."""
    from lightningdot_tpu.data.loader import MetaLoader

    def make():
        return MetaLoader({"a": [1, 2], "b": ([10, 20], 2)},
                          accum_steps=2, seed=5)

    seq1 = [t for (t, _), _ in zip(iter(make()), range(20))]
    seq2 = [t for (t, _), _ in zip(iter(make()), range(20))]
    assert seq1 == seq2
    assert set(seq1) == {"a", "b"}
    # task is constant within each accumulation window
    for i in range(0, 20, 2):
        assert seq1[i] == seq1[i + 1]
    # mix ratio 1:2 shows up in the draw frequency over a longer run
    seq3 = [t for (t, _), _ in zip(iter(make()), range(300))]
    assert seq3.count("b") > seq3.count("a")


def test_writer_exit_on_exception_preserves_existing_store(tmp_path):
    """A raising with-body must NOT install a truncated store over a good
    one (KVWriter.__exit__ aborts instead of finalizing)."""
    path = str(tmp_path / "store.ldkv")
    KVWriter.write_dict(path, [("a", b"good")])

    with pytest.raises(RuntimeError):
        with KVWriter(path) as w:
            w.put("a", b"partial")
            raise RuntimeError("boom")

    r = KVReader(path)
    assert bytes(r.get("a")) == b"good"
    assert not os.path.exists(path + ".tmp")


def test_duplicate_keys_last_wins_on_both_backends(tmp_path):
    """Native (sorted-scan) and python (dict) readers must agree: the last
    put() for a key wins."""
    path = str(tmp_path / "dup.ldkv")
    with KVWriter(path) as w:
        w.put("k", b"v1")
        w.put("other", b"x")
        w.put("k", b"v2")
    for prefer_native in (True, False):
        r = KVReader(path, prefer_native=prefer_native)
        assert bytes(r.get("k")) == b"v2", f"native={r.native}"
        assert len(r) == 2


def test_views_survive_reader_close(tmp_path):
    """Zero-copy views stay valid after close() (the mapping is torn down
    at GC); close() only blocks further reads."""
    path = str(tmp_path / "view.ldkv")
    KVWriter.write_dict(path, [("a", b"payload")])
    for prefer_native in (True, False):
        r = KVReader(path, prefer_native=prefer_native)
        v = r.get("a")
        r.close()
        assert bytes(v) == b"payload"  # no dangling pointer / BufferError


def test_truncated_file_rejected(tmp_path):
    """ldkv_open must fail cleanly on a truncated store, not hand out
    out-of-bounds index pointers."""
    path = str(tmp_path / "trunc.ldkv")
    KVWriter.write_dict(path, [(f"k{i}", b"x" * 64) for i in range(32)])
    data = open(path, "rb").read()
    open(path, "wb").write(data[:len(data) // 2])  # keep magic, cut index
    with pytest.raises((OSError, ValueError, struct.error)):
        KVReader(path)


def test_non_utf8_keys_enumerable(tmp_path):
    path = str(tmp_path / "rawkeys.ldkv")
    raw = b"\xff\xfebinary"
    KVWriter.write_dict(path, [(raw, b"v")])
    r = KVReader(path)
    ks = r.keys()
    assert len(ks) == 1
    assert ks[0].encode("utf-8", "surrogateescape") == raw
