"""Order-preserving multi-worker DataLoader (data/loader.py::_iter_multi)."""
import time

import numpy as np
import pytest

from lightningdot_tpu.data.loader import DataLoader


class SlowSquares:
    """Deterministic dataset with artificial per-item latency."""

    def __init__(self, n, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return i * i


def collate(items):
    return np.asarray(items)


@pytest.mark.parametrize("num_workers", [2, 4])
def test_multi_worker_matches_single_worker_order(num_workers):
    ds = SlowSquares(37)
    kw = dict(batch_size=5, shuffle=True, collate_fn=collate, seed=7)
    ref = [b.tolist() for b in DataLoader(ds, num_workers=1, **kw)]
    got = [b.tolist() for b in DataLoader(ds, num_workers=num_workers, **kw)]
    assert got == ref
    assert sum(len(b) for b in got) == 37


def test_multi_worker_overlaps_collate():
    """4 workers on a sleep-bound dataset must beat the serial time.

    Generous bound (60% of the 1.28 s serial sleep time) so scheduler
    jitter on a loaded CI host cannot flake the test; ideal is ~25%."""
    ds = SlowSquares(64, delay=0.02)  # 1.28 s serial item sleep time
    kw = dict(batch_size=8, collate_fn=collate)
    t0 = time.perf_counter()
    n = sum(1 for _ in DataLoader(ds, num_workers=4, **kw))
    dt = time.perf_counter() - t0
    assert n == 8
    assert dt < 0.77, f"no overlap: {dt:.3f}s for 1.28s of item sleeps"


def test_multi_worker_propagates_exceptions():
    class Boom(SlowSquares):
        def __getitem__(self, i):
            if i == 11:
                raise RuntimeError("boom")
            return i

    loader = DataLoader(Boom(20), batch_size=4, collate_fn=collate,
                        num_workers=3)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_multi_worker_early_break_releases():
    ds = SlowSquares(100, delay=0.001)
    loader = DataLoader(ds, batch_size=5, collate_fn=collate, num_workers=3)
    for i, _ in enumerate(loader):
        if i == 2:
            break  # generator GC must stop the worker threads cleanly


def test_pretrain_item_rng_order_independent(tmp_path):
    """Mask datasets draw from per-item (seed, epoch, index) rngs: items
    are identical regardless of fetch order or repetition, and change
    when the epoch advances."""
    from lightningdot_tpu.data.feat_db import DetectFeatDb
    from lightningdot_tpu.data.pretrain import MlmDataset, MrfrDataset
    from lightningdot_tpu.data.synth import make_synth_dataset
    from lightningdot_tpu.data.txt_db import TxtTokDb

    txt_dir, img_dir = make_synth_dataset(
        str(tmp_path), n_imgs=6, txts_per_img=2, img_dim=16, min_bb=5,
        max_bb=8, max_txt_len=16, seed=3)
    txt_db = TxtTokDb(txt_dir, max_txt_len=-1)
    img_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=8, min_bb=5)

    ds = MlmDataset(txt_db, img_db, seed=7)
    a = [ds[i]["input_ids"] for i in range(len(ds))]
    # reversed fetch order and refetch: identical draws
    b = {i: ds[i]["input_ids"] for i in reversed(range(len(ds)))}
    assert all(a[i] == b[i] for i in range(len(ds)))
    # a fresh dataset with the same seed reproduces the same masks
    ds2 = MlmDataset(txt_db, img_db, seed=7)
    assert [ds2[i]["input_ids"] for i in range(len(ds2))] == a
    # epoch advance re-draws
    ds.advance_epoch()
    c = [ds[i]["input_ids"] for i in range(len(ds))]
    assert c != a

    mr = MrfrDataset(0.3, txt_db, img_db, seed=7)
    m1 = mr[0]["img_mask"].tolist()
    _ = mr[3]  # interleave another item
    assert mr[0]["img_mask"].tolist() == m1


def test_loader_on_epoch_advances_mask_rng(tmp_path):
    """Wiring check: a DataLoader whose on_epoch hook advances the mask
    dataset's epoch salt yields different masks on the second iteration
    (the cli/pretrain loaders are built this way)."""
    from lightningdot_tpu.data.feat_db import DetectFeatDb
    from lightningdot_tpu.data.pretrain import MlmDataset
    from lightningdot_tpu.data.synth import make_synth_dataset
    from lightningdot_tpu.data.txt_db import TxtTokDb

    txt_dir, img_dir = make_synth_dataset(
        str(tmp_path), n_imgs=5, txts_per_img=2, img_dim=16, min_bb=5,
        max_bb=8, max_txt_len=16, seed=4)
    ds = MlmDataset(TxtTokDb(txt_dir, max_txt_len=-1),
                    DetectFeatDb(img_dir, conf_th=0.2, max_bb=8, min_bb=5),
                    seed=9)
    loader = DataLoader(ds, batch_size=4,
                        collate_fn=lambda it: [x["input_ids"] for x in it],
                        on_epoch=ds.advance_epoch, num_workers=2)
    epoch1 = [ids for b in loader for ids in b]
    epoch2 = [ids for b in loader for ids in b]
    assert epoch1 != epoch2  # fresh masks each epoch
    # same dataset order though (no shuffle): examples align positionally
    assert len(epoch1) == len(epoch2) == len(ds)


def test_recycler_disabled_on_cpu():
    """On the CPU backend jax may alias numpy buffers zero-copy, so the
    Recycler must NOT return batch arrays to the padding pool
    (data/padding.py pool notes)."""
    import numpy as np

    from lightningdot_tpu.data import padding

    with padding._POOL_LOCK:
        padding._POOL.clear()
    rec = padding.Recycler()  # backend is cpu under the test harness
    assert not rec.enabled
    for _ in range(4):
        rec.push({"img_feat": np.zeros((64, 64, 512), np.float16)})
    rec.flush()
    with padding._POOL_LOCK:
        assert not any(padding._POOL.values())


def test_recycler_ready_gating():
    """Recycler pools a batch only past the slack window AND once its
    step-output ref reports is_ready(); never-ready batches are dropped
    un-pooled after max_pending pushes."""
    import numpy as np

    from lightningdot_tpu.data import padding

    class Ref:
        def __init__(self):
            self.ready = False

        def is_ready(self):
            return self.ready

    def big():
        return np.zeros((64, 64, 512), np.float16)  # 4 MB, poolable

    with padding._POOL_LOCK:
        padding._POOL.clear()

    rec = padding.Recycler(slack=1, max_pending=2, enabled=True)
    refs = [Ref() for _ in range(6)]
    rec.push({"a": big()}, ready=refs[0])
    # within slack: nothing pooled even though nothing is ready yet
    with padding._POOL_LOCK:
        assert sum(len(v) for v in padding._POOL.values()) == 0
    rec.push({"a": big()}, ready=refs[1])
    # past slack but refs[0] not ready -> still nothing pooled
    with padding._POOL_LOCK:
        assert sum(len(v) for v in padding._POOL.values()) == 0
    refs[0].ready = True
    rec.push({"a": big()}, ready=refs[2])
    # refs[0] became ready -> its batch pooled
    with padding._POOL_LOCK:
        assert sum(len(v) for v in padding._POOL.values()) == 1
    # refs[1] never becomes ready: after max_pending more pushes it is
    # dropped (plain free), not pooled
    rec.push({"a": big()}, ready=refs[3])
    rec.push({"a": big()}, ready=refs[4])
    rec.push({"a": big()}, ready=refs[5])
    with padding._POOL_LOCK:
        assert sum(len(v) for v in padding._POOL.values()) == 1
    # flush pools everything whose ref is (now) ready
    for r in refs:
        r.ready = True
    rec.flush()
    with padding._POOL_LOCK:
        assert sum(len(v) for v in padding._POOL.values()) >= 4
    assert not rec._q


def test_padding_pool_recycle_and_reuse():
    """recycle() pools only large base arrays, dedupes shared references,
    and _pool_get returns a pooled buffer of the exact shape/dtype."""
    import numpy as np

    from lightningdot_tpu.data import padding

    with padding._POOL_LOCK:
        padding._POOL.clear()
    big = np.ones((64, 64, 512), np.float16)   # 4 MB
    small = np.ones((8, 8), np.float32)
    view = big[:32]                            # has .base -> not pooled
    batch = {"a": big, "b": small, "nested": {"alias": big, "v": view}}
    padding.recycle(batch)
    with padding._POOL_LOCK:
        pooled = sum(len(v) for v in padding._POOL.values())
    assert pooled == 1  # big once (alias deduped), small/view excluded
    got = padding._pool_get(big.shape, np.float16)
    assert got is big
    # pool drained now
    got2 = padding._pool_get(big.shape, np.float16)
    assert got2 is not big


def test_metaloader_fast_forward_continues_stream():
    """fast_forward(n) reproduces the task sequence an uninterrupted run
    would have produced from step n (auto-resume task-mix continuity)."""
    from lightningdot_tpu.data.loader import MetaLoader

    def counter(tag):
        def gen():
            i = 0
            while True:
                yield f"{tag}{i}"
                i += 1
        return gen()

    def make():
        return MetaLoader({"a": (counter("a"), 2), "b": (counter("b"), 1)},
                          accum_steps=2, seed=11)

    full = make()
    it = iter(full)
    seq = [next(it)[0] for _ in range(20)]

    resumed = make()
    resumed.fast_forward(12)
    it2 = iter(resumed)
    tail = [next(it2)[0] for _ in range(8)]
    assert tail == seq[12:]
