"""Model zoo: dual-encoder towers, pre-training heads, cross-encoder."""

from lightningdot_tpu.models.encoder import (  # noqa: F401
    init_encoder_tower, encode_text, encode_image, encode_joint,
)
from lightningdot_tpu.models.bi_encoder import (  # noqa: F401
    BiEncoder, BiEncoderNllLoss, dot_product_scores,
)
