"""Global constants.

Reference: /root/reference/GLOBAL_VARIABLES.py:1-6, /root/reference/dvl/const.py:1-3.
"""

# Faster-RCNN region feature dimension.
IMG_DIM = 2048
# Number of detection classes (soft-label dim) for MRC.
IMG_LABEL_DIM = 1601
# Number of query examples scored against the teacher per KD batch
# (GLOBAL_VARIABLES.py:6).
N_EXAMPLES_TEACHER = 10
# TokenBucketSampler bucket size (GLOBAL_VARIABLES.py:4).
BUCKET_SIZE = 8192
# BERT [CLS] id used as the image tower's single text token
# (dvl/data/itm.py:74: `img_input_ids = torch.Tensor([101])`).
IMG_CLS_TOKEN_ID = 101

# Static-shape padding ladders (TPU-specific: bound XLA recompilation while
# reproducing the reference's dynamic per-batch padding semantics).
TXT_LEN_BUCKETS = (16, 32, 48, 64, 80, 128)
IMG_LEN_BUCKETS = (32, 64, 104)  # num_bb <= 100, +1 CLS token, +3 align
CAP_LEN_BUCKETS = (64, 128, 192, 256)
