"""Host data-pipeline throughput: ITM dataset + collate, 1 vs N workers.

The device train step is ~62 ms at B=96; a single-threaded collate
(~76 ms/batch at the real 2048-d feature width) caps production training.

Usage: python scripts/perf_pipeline.py [n_imgs] (CPU only)
"""
import sys
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")

from lightningdot_tpu.data.feat_db import ImageDbGroup  # noqa: E402
from lightningdot_tpu.data.itm import (CollateConfig,  # noqa: E402
                                       ItmFastDataset, itm_fast_collate)
from lightningdot_tpu.data.loader import DataLoader  # noqa: E402
from lightningdot_tpu.data.synth import make_synth_dataset  # noqa: E402
from lightningdot_tpu.data.txt_db import TxtTokDb  # noqa: E402

B = 96


def main():
    n_imgs = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    root = tempfile.mkdtemp(prefix="pipe_")
    txt_dir, img_dir = make_synth_dataset(
        root, n_imgs=n_imgs, txts_per_img=2, img_dim=2048,
        min_bb=40, max_bb=64, max_txt_len=32, seed=0)
    img_db = ImageDbGroup(conf_th=0.2, max_bb=64, min_bb=40, num_bb=36)[
        img_dir]
    txt_db = TxtTokDb(txt_dir, 32)
    ds = ItmFastDataset(txt_db, img_db, num_hard_negatives=0)
    ds.new_epoch()
    cc = CollateConfig(fixed_batch=B)

    def collate(items):
        return itm_fast_collate(items, cc)

    def sweep(tag, dataset, collate_fn):
        # the consumer recycles each spent batch exactly like the
        # production loops do via padding.Recycler (buffer pool — without
        # it, rotating multi-MB batches through the loader thread
        # page-faults every batch). Host-only harness: there is no device
        # step output, so pushes carry no ready ref (recycled at slack).
        from lightningdot_tpu.data.padding import Recycler

        for workers in (1, 2, 4, 8):
            loader = DataLoader(dataset, batch_size=B, shuffle=False,
                                collate_fn=collate_fn, num_workers=workers)
            # epoch 1 warms the buffer pool (on this VM, FIRST-touch guest
            # pages fault at ~20 MB/s through the hypervisor — a cold 40 MB
            # batch costs seconds; steady-state training reuses pooled
            # pages), epoch 2 is the measured steady state
            for measured in (False, True):
                n = 0
                it = iter(loader)
                next(it)
                rec = Recycler(enabled=True)
                t0 = time.perf_counter()
                for b in it:
                    n += 1
                    rec.push(b)
                rec.flush()
                dt = (time.perf_counter() - t0) / max(n, 1)
                if measured:
                    print(f"{tag} workers={workers}: {dt*1e3:.1f} ms/batch "
                          f"({B/dt:.0f} items/s)", flush=True)

    sweep("itm", ds, collate)

    # pre-train pipelines (per-item mask rngs -> multi-worker safe)
    from lightningdot_tpu.data.pretrain import (ItmPreDataset, MlmDataset,
                                                MrcDataset, MrfrDataset,
                                                PretrainCollateConfig,
                                                itm_pre_collate, mlm_collate,
                                                mrc_collate, mrfr_collate)

    pcfg = PretrainCollateConfig(txt_buckets=(32,), img_buckets=(65,),
                                 batch_pad=B, img_label_dim=1601)
    sweep("mlm", MlmDataset(txt_db, img_db, seed=0),
          lambda items: mlm_collate(items, pcfg))
    sweep("mrfr", MrfrDataset(0.15, txt_db, img_db, seed=0),
          lambda items: mrfr_collate(items, pcfg))
    sweep("itm_pre", ItmPreDataset(txt_db, img_db, 0.5, seed=0),
          lambda items: itm_pre_collate(items, pcfg))
    # MRC needs soft labels in the feature DB — a separate (small) synth
    mrc_root = tempfile.mkdtemp(prefix="pipe_mrc_")
    mrc_txt, mrc_img = make_synth_dataset(
        mrc_root, n_imgs=min(n_imgs, 400), txts_per_img=2, img_dim=2048,
        min_bb=40, max_bb=64, max_txt_len=32, seed=0, with_soft_labels=True)
    mrc_db = ImageDbGroup(conf_th=0.2, max_bb=64, min_bb=40, num_bb=36)[
        mrc_img]
    sweep("mrc", MrcDataset(0.15, TxtTokDb(mrc_txt, 32), mrc_db, seed=0),
          lambda items: mrc_collate(items, pcfg))


if __name__ == "__main__":
    main()
