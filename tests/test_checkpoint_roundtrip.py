"""Checkpoint round trips: JAX -> torch .pt -> JAX, and native format."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.models.checkpoint_torch import (load_biencoder_checkpoint,
                                                      map_bi_encoder,
                                                      export_bi_encoder,
                                                      save_biencoder_pt)
from lightningdot_tpu.training.checkpoints import (load_checkpoint,
                                                   save_checkpoint)
from lightningdot_tpu.utils.misc import compare_models


def tiny_model(project_dim=0):
    cfg = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=64,
               max_position_embeddings=48, project_dim=project_dim)
    return BiEncoder(EncoderConfig(**cfg), EncoderConfig(**cfg, img_dim=16))


@pytest.mark.parametrize("project_dim", [0, 24])
def test_torch_pt_roundtrip(tmp_path, project_dim):
    model = tiny_model(project_dim)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "biencoder.last.pt")
    save_biencoder_pt(path, params)

    # load through the same path eval_itm uses for released checkpoints
    loaded = load_biencoder_checkpoint(path, num_layers=2)
    # pooler isn't part of the dual-encoder state the reference saves/loads
    # for the towers, but ours roundtrips too; compare whole trees
    assert compare_models(
        jax.tree.map(np.asarray, params),
        jax.tree.map(np.asarray, loaded), verbose=False) == 0


def test_pretrain_prefix_layout(tmp_path):
    """'bert.'-prefixed pre-train checkpoints load via the fallback path
    (bi_encoder.py:744-750)."""
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(1))
    sd = {f"bert.{k}": v for k, v in export_bi_encoder(params).items()}
    sd["cls.predictions.bias"] = np.zeros(128, np.float32)  # dropped head key
    loaded = map_bi_encoder(sd, num_layers=2)
    assert compare_models(jax.tree.map(np.asarray, params),
                          jax.tree.map(np.asarray, loaded),
                          verbose=False) == 0


def test_native_checkpoint_roundtrip(tmp_path):
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(2))
    path = str(tmp_path / "ck")
    save_checkpoint(path, model=params, step=7, epoch=3)
    loaded, _, meta = load_checkpoint(path, model_template=params)
    assert meta["step"] == 7 and meta["epoch"] == 3
    assert compare_models(jax.tree.map(np.asarray, params),
                          jax.tree.map(np.asarray, loaded),
                          verbose=False) == 0


def test_async_model_saver_snapshots_before_mutation(tmp_path):
    """Async save must capture values AT save time: the on-device snapshot
    protects against the train loop donating/overwriting the buffers while
    the background thread is still pulling them to the host."""
    import jax
    import jax.numpy as jnp

    from lightningdot_tpu.training.checkpoints import (ModelSaver,
                                                       latest_step_checkpoint,
                                                       load_checkpoint)

    params = {"w": jnp.arange(8, dtype=jnp.float32),
              "b": jnp.zeros((4,), jnp.float32)}
    saver = ModelSaver(str(tmp_path), async_save=True)
    saver.save(params, step=3)
    # immediately clobber the "live" params (simulates donation reuse)
    params["w"] = params["w"] * 0 - 1.0
    saver.wait()

    found = latest_step_checkpoint(str(tmp_path))
    assert found is not None and found[1] == 3
    loaded, _, meta = load_checkpoint(
        found[0], model_template={"w": jnp.zeros(8), "b": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(loaded["w"]),
                                  np.arange(8, dtype=np.float32))
    assert meta["step"] == 3

    # a second async save supersedes and both files exist
    saver.save({"w": jnp.ones(8), "b": jnp.ones(4)}, step=7)
    saver.wait()
    assert latest_step_checkpoint(str(tmp_path))[1] == 7


def test_interrupted_save_never_selected(tmp_path):
    """Auto-resume discovery keys off the .json written LAST: a save
    killed mid-.npz-write (or between the two renames) must fall back to
    the previous complete checkpoint, and re-saves never truncate an
    existing good file (writes go to temp names + os.replace)."""
    import numpy as np

    from lightningdot_tpu.training.checkpoints import (
        latest_step_checkpoint, load_checkpoint, save_checkpoint)

    d = str(tmp_path / "ckpt")
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_checkpoint(f"{d}/model_step_5", model=params, step=5)

    # crash simulation 1: truncated .npz, no .json yet
    with open(f"{d}/model_step_9.npz", "wb") as f:
        f.write(b"PK\x03\x04 half a zip")
    best = latest_step_checkpoint(d)
    assert best is not None and best[1] == 5

    # crash simulation 2: temp files left behind are ignored
    with open(f"{d}/model_step_7.npz.tmp", "wb") as f:
        f.write(b"partial")
    assert latest_step_checkpoint(d)[1] == 5

    loaded, _, meta = load_checkpoint(f"{d}/model_step_5",
                                      model_template=params)
    np.testing.assert_array_equal(loaded["w"], params["w"])
    assert meta["step"] == 5


def test_strict_load_rejects_shape_and_extra_keys(tmp_path):
    """A mis-shaped leaf (e.g. wrong-vocab embedding table) or extra
    checkpoint parameters must fail loudly, not load silently."""
    import numpy as np
    import pytest

    from lightningdot_tpu.training.checkpoints import (load_checkpoint,
                                                       save_checkpoint)

    path = str(tmp_path / "m")
    save_checkpoint(path, model={"w": np.zeros((4, 3), np.float32)})
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, model_template={"w": np.zeros((2, 3))})
    with pytest.raises(KeyError, match="parameters the model does not"):
        load_checkpoint(path, model_template={})


def test_cross_encoder_torch_pt_roundtrip(tmp_path):
    """Teacher export -> released-layout .pt -> map_cross_encoder is the
    identity (used by scripts/reproduce_baseline.py --selftest)."""
    from lightningdot_tpu.models.checkpoint_torch import (
        map_cross_encoder, save_cross_encoder_pt)
    from lightningdot_tpu.models.cross_encoder import CrossEncoder

    cfg = EncoderConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=48, img_dim=16)
    model = CrossEncoder(cfg)
    params = model.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "teacher.pt")
    save_cross_encoder_pt(path, params)

    from lightningdot_tpu.models.checkpoint_torch import load_torch_state_dict

    loaded = map_cross_encoder(load_torch_state_dict(path), num_layers=2)
    assert compare_models(jax.tree.map(np.asarray, params),
                          jax.tree.map(np.asarray, loaded),
                          verbose=False) == 0
