"""Interactive retrieval demo (the demo/image_retriever.ipynb equivalent).

End-to-end on synthetic data so it runs anywhere:
  1. build a synthetic image/caption corpus (or point at your real DBs),
  2. encode the image corpus once with the bi-encoder,
  3. serve free-text queries from the in-HBM index in real time.

With real data, swap `make_synth_dataset` for your prepro'd DBs and
`SimpleTokenizer` for `BertTokenizer.from_pretrained("bert-base-cased")`,
and load released weights with
``models.checkpoint_torch.load_biencoder_checkpoint("LightningDot.pt")``.
"""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.itm import CollateConfig, ItmFastDataset, itm_fast_collate
from lightningdot_tpu.data.loader import DataLoader
from lightningdot_tpu.data.synth import make_synth_dataset
from lightningdot_tpu.data.txt_db import TxtTokDb
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.serving import Retriever, get_model_encoded_vecs


class SimpleTokenizer:
    """Stand-in tokenizer for the synthetic vocab."""

    def encode(self, text):
        return [101] + [106 + (hash(w) % 20000) for w in text.split()] + [102]


def main():
    from lightningdot_tpu.utils.runtime import setup_runtime

    setup_runtime()  # persistent compile cache
    print("devices:", jax.devices())

    # 1. data
    root = tempfile.mkdtemp()
    txt_dir, img_dir = make_synth_dataset(root, n_imgs=64, txts_per_img=2,
                                          img_dim=2048)
    txt_db = TxtTokDb(txt_dir, -1)
    img_db = DetectFeatDb(img_dir)

    # 2. model (random init here; load a checkpoint for real use)
    cfg = EncoderConfig(vocab_size=28996)
    model = BiEncoder(cfg, EncoderConfig(vocab_size=28996, img_dim=2048),
                      compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    # 3. encode the corpus once
    ds = ItmFastDataset(txt_db, img_db)
    ds.new_epoch()
    loader = DataLoader(ds, batch_size=32, collate_fn=lambda x:
                        itm_fast_collate(x, CollateConfig(fixed_batch=32)))
    vecs = get_model_encoded_vecs(model, params, loader)
    img_ids = list(vecs["img_embed"].keys())
    corpus = np.stack([vecs["img_embed"][i] for i in img_ids])
    print(f"encoded corpus: {corpus.shape}")

    # 4. serve queries
    retriever = Retriever(model, params, SimpleTokenizer())
    retriever.set_corpus(img_ids, corpus)
    for query in ["a dog running on the beach",
                  "two people talking at a cafe"]:
        results = retriever.retrieve_query(query, top=5)
        print(f"\nquery: {query!r}")
        for rank, (img, score) in enumerate(results, 1):
            print(f"  {rank}. {img}  (score {score:.3f})")


if __name__ == "__main__":
    main()
