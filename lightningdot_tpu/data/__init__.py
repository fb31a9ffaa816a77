"""Data layer: native KV store, feature/text DBs, datasets, collates,
samplers, loaders.

Replaces the reference's LMDB + lz4 + msgpack stack (uniter_model/data/) with
a native mmap store (native/ldkv.cc) and static-shape TPU collates.
"""

from lightningdot_tpu.data.kvstore import KVReader, KVWriter  # noqa: F401
from lightningdot_tpu.data.feat_db import DetectFeatDb, ImageDbGroup  # noqa: F401
from lightningdot_tpu.data.txt_db import TxtTokDb  # noqa: F401
from lightningdot_tpu.data.padding import Recycler  # noqa: F401
from lightningdot_tpu.data.vqa import (VqaDataset, VqaEvalDataset,  # noqa: F401
                                       vqa_collate, vqa_eval_collate)
