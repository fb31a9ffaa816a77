"""Configuration system.

Two layers, mirroring the reference:

  * :class:`EncoderConfig` — the transformer architecture config, accepting the
    same JSON schema as the reference's ``config/img_base.json`` /
    ``config/bert_base.json`` and HF bert configs
    (uniter_model/model/model.py:23-115 ``UniterConfig``).
  * argparse param groups + JSON overlay where CLI flags win — semantics of
    ``parse_with_config`` (dvl/options.py:96-109) and the grouped registrars
    ``default_params`` / ``add_itm_params`` / ``add_logging_params`` /
    ``add_kd_params`` (dvl/options.py:15-93).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import Any, Optional, Sequence


@dataclasses.dataclass
class EncoderConfig:
    """Transformer architecture hyper-parameters (UniterConfig-compatible)."""

    vocab_size: int = 28996
    hidden_size: int = 768
    num_hidden_layers: int = 12
    # image-stream depth for the two-stream 'Fast' cross-encoder
    # (UniterConfig num_hidden_layers_img, uniter_model/model/model.py:30)
    num_hidden_layers_img: int = 1
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    # image-region front-end (only used by the image tower)
    img_dim: int = 2048
    pos_dim: int = 7
    # projection head output dim; 0 disables the head
    # (dvl/models/bi_encoder.py:82-90 Sequential projection)
    project_dim: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "EncoderConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        return cls(**kwargs)

    @classmethod
    def from_json_file(cls, path: str) -> "EncoderConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @property
    def head_dim(self) -> int:
        if self.hidden_size % self.num_attention_heads:
            raise ValueError(
                f"hidden size ({self.hidden_size}) is not a multiple of "
                f"attention heads ({self.num_attention_heads})")
        return self.hidden_size // self.num_attention_heads

    @property
    def out_size(self) -> int:
        """Embedding dim produced by a tower (bi_encoder.py:125-128,193-196)."""
        return self.project_dim if self.project_dim > 0 else self.hidden_size


BERT_BASE_UNCASED = EncoderConfig(vocab_size=30522)
BERT_BASE_CASED = EncoderConfig(vocab_size=28996)


# ---------------------------------------------------------------------------
# Run options: argparse groups + JSON overlay (dvl/options.py parity)
# ---------------------------------------------------------------------------

def default_params(parser: argparse.ArgumentParser) -> None:
    """Core flags shared by all drivers (dvl/options.py:15-47)."""
    parser.add_argument("--txt_model_type", default="bert-base", type=str)
    parser.add_argument("--txt_model_config", default="bert-base-cased", type=str)
    parser.add_argument("--txt_checkpoint", default=None, type=str)
    parser.add_argument("--img_model_type", default="uniter-base", type=str)
    parser.add_argument("--img_model_config", default="./configs/img_base.json", type=str)
    parser.add_argument("--img_checkpoint", default=None, type=str)
    parser.add_argument("--biencoder_checkpoint", default=None, type=str)
    parser.add_argument("--seperate_caption_encoder", action="store_true")

    parser.add_argument("--train_batch_size", default=80, type=int)
    parser.add_argument("--valid_batch_size", default=80, type=int)
    parser.add_argument("--gradient_accumulation_steps", default=1, type=int)
    parser.add_argument("--learning_rate", default=1e-5, type=float)
    parser.add_argument("--max_grad_norm", default=2.0, type=float)
    parser.add_argument("--loader_workers", default=4, type=int,
                        help="parallel whole-batch collate threads for the "
                        "training loaders (order-preserving; safe for both "
                        "the ITM datasets — deterministic __getitem__ — "
                        "and the pre-train mask datasets, whose masks come "
                        "from per-item (seed, epoch, index) rngs)")
    parser.add_argument("--optim_state_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="AdamW FIRST-moment storage dtype (via the "
                        "single-pass FusedAdamW; update math stays f32 and "
                        "the second moment always stays f32 — bf16 v would "
                        "freeze below ulp). float32 matches the reference "
                        "torch AdamW exactly")
    parser.add_argument("--warmup_steps", default=500, type=int)
    parser.add_argument("--valid_steps", default=500, type=int)
    parser.add_argument("--num_train_steps", default=5000, type=int)
    parser.add_argument("--num_train_epochs", default=0, type=int)

    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--output_dir", default="./", type=str)
    parser.add_argument("--max_txt_len", default=64, type=int)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--itm_global_file", default=None, type=str)
    parser.add_argument("--n_workers", type=int, default=2)
    parser.add_argument("--hnsw_index", action="store_true")
    parser.add_argument("--img_meta", type=str, default=None)

    # TPU-native knobs (replace fp16/apex flags; bf16 is the TPU fast path)
    parser.add_argument("--fp16", action="store_true",
                        help="accepted for reference-config compatibility; "
                             "maps to bf16 compute on TPU")
    parser.add_argument("--compute_dtype", default="bf16",
                        choices=["bf16", "f32"])
    parser.add_argument("--kernel_backend", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--dp_size", default=0, type=int,
                        help="data-parallel mesh size; 0 = all devices")


def add_itm_params(parser: argparse.ArgumentParser) -> None:
    """ITM / retrieval flags (dvl/options.py:50-81)."""
    parser.add_argument("--conf_th", default=0.2, type=float)
    parser.add_argument("--caption_score_weight", default=0.0, type=float)
    parser.add_argument("--negative_size", default=10, type=int)
    parser.add_argument("--num_hard_negatives", default=0, type=int)
    parser.add_argument("--sample_init_hard_negatives", action="store_true")
    parser.add_argument("--hard_negatives_sampling", default="none", type=str,
                        choices=["none", "random", "top", "top-random",
                                 "10-20", "20-30"])
    parser.add_argument("--max_bb", default=100, type=int)
    parser.add_argument("--min_bb", default=10, type=int)
    parser.add_argument("--num_bb", default=36, type=int)
    parser.add_argument("--train_txt_dbs", default=None, type=str)
    parser.add_argument("--train_img_dbs", default=None, type=str)
    parser.add_argument("--txt_db_mapping", default=None, type=str)
    parser.add_argument("--img_db_mapping", default=None, type=str)
    parser.add_argument("--pretrain_mapping", default=None, type=str)
    parser.add_argument("--val_txt_db", default=None, type=str)
    parser.add_argument("--val_img_db", default=None, type=str)
    parser.add_argument("--test_txt_db", default=None, type=str)
    parser.add_argument("--test_img_db", default=None, type=str)
    parser.add_argument("--steps_per_hard_neg", default=-1, type=int)
    parser.add_argument("--inf_minibatch_size", default=400, type=int)
    parser.add_argument("--project_dim", default=0, type=int)
    parser.add_argument("--cls_concat", default="", type=str)
    parser.add_argument("--fix_txt_encoder", action="store_true")
    parser.add_argument("--fix_img_encoder", action="store_true")
    parser.add_argument("--compressed_db", action="store_true")
    parser.add_argument("--retrieval_mode", default="both",
                        choices=["img_only", "txt_only", "both"], type=str)


def add_logging_params(parser: argparse.ArgumentParser) -> None:
    """Logging flags (dvl/options.py:83-88)."""
    parser.add_argument("--log_result_step", default=4, type=int)
    parser.add_argument("--project_name", default="itm", type=str)
    parser.add_argument("--expr_name_prefix", default="", type=str)
    parser.add_argument("--save_all_epochs", action="store_true")
    parser.add_argument("--sim_preempt_step", type=int, default=None,
                        help="fault injection: act as if SIGTERM arrived "
                             "at this global step (preemption-path tests)")
    parser.add_argument("--preempt_check_steps", type=int, default=25,
                        help="multi-host cadence of the preemption "
                        "OR-reduce (rounded up to a multiple of the "
                        "accumulation window); ~1.5 s of steps at ITM "
                        "fine-tune speed, small vs a 30 s grace window. "
                        "Single-host runs never pay a collective")


def add_kd_params(parser: argparse.ArgumentParser) -> None:
    """Knowledge-distillation flags (dvl/options.py:90-93)."""
    parser.add_argument("--teacher_checkpoint", default=None, type=str)
    parser.add_argument("--T", default=1.0, type=float)
    parser.add_argument("--kd_loss_weight", default=1.0, type=float)


def parse_with_config(parser: argparse.ArgumentParser,
                      cmds: Optional[Sequence[str]] = None) -> argparse.Namespace:
    """Parse CLI args, overlay a JSON config; CLI flags win.

    Semantics of dvl/options.py:96-109: any key present in the JSON config is
    applied unless the same flag was explicitly given on the command line.
    """
    argv = list(sys.argv[1:]) if cmds is None else list(cmds)
    args = parser.parse_args(argv)
    if args.config is not None:
        with open(args.config) as f:
            config_args = json.load(f)
        override_keys = {arg[2:].split("=")[0] for arg in argv
                         if arg.startswith("--")}
        for k, v in config_args.items():
            if k not in override_keys:
                setattr(args, k, v)
    return args


def map_db_dirs(args: argparse.Namespace) -> None:
    """Container path remapping (dvl/options.py:112-132): rewrite
    /pretrain, /db and /img prefixes via the *_mapping flags."""
    for k, v in list(vars(args).items()):
        if not isinstance(v, str):
            continue
        if v.startswith("/pretrain") and getattr(args, "pretrain_mapping",
                                                 None):
            setattr(args, k, v.replace("/pretrain", args.pretrain_mapping, 1))
        if v.startswith("/db") and getattr(args, "txt_db_mapping", None):
            setattr(args, k, v.replace("/db", args.txt_db_mapping, 1))
        if v.startswith("/img") and getattr(args, "img_db_mapping", None):
            setattr(args, k, v.replace("/img", args.img_db_mapping, 1))
    if getattr(args, "img_db_mapping", None) and \
            isinstance(getattr(args, "train_img_dbs", None), list):
        args.train_img_dbs = [
            p.replace("/img", args.img_db_mapping, 1)
            if p.startswith("/img") else p for p in args.train_img_dbs]
    if getattr(args, "txt_db_mapping", None) and \
            isinstance(getattr(args, "train_txt_dbs", None), list):
        args.train_txt_dbs = [
            p.replace("/db", args.txt_db_mapping, 1)
            if p.startswith("/db") else p for p in args.train_txt_dbs]


def print_args(args: Any, log=print) -> None:
    """Configuration banner (dvl/options.py:137-142)."""
    log(" **************** CONFIGURATION **************** ")
    for key, val in sorted(vars(args).items()):
        log(f"{key:<30} -->   {val}")
    log(" **************** END CONFIGURATION **************** ")
