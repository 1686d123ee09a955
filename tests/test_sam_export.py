"""SAM decoder export (the reference's ONNX-export analogue,
segment_anything/utils/onnx.py → sam/export.py StableHLO artifact)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

import jax
import jax.numpy as jnp

from followyourclick_tpu.sam.export import build_decoder_fn, export_decoder
from followyourclick_tpu.sam.sam import Sam, sam_model_registry


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = sam_model_registry["vit_t"]
    model = Sam(cfg)
    g = cfg.image_embedding_size
    # init through the decoder path WITH a mask input so the prompt
    # encoder's mask-downscaling params exist (image encoder not needed)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, g[0], g[1], cfg.prompt_embed_dim)),
        jnp.zeros((1, 1, 2)), jnp.zeros((1, 1)),
        mask_input=jnp.zeros((1, 4 * g[0], 4 * g[1], 1)),
        method=model.predict_from_embedding)
    return model, variables, cfg, g


def test_decoder_fn_matches_predict(tiny_sam):
    """Single-mask export path selects the multimask best for 1 click and
    matches predict_from_embedding's token set."""
    model, variables, cfg, g = tiny_sam
    rs = np.random.RandomState(0)
    emb = jnp.asarray(rs.randn(1, g[0], g[1],
                               cfg.prompt_embed_dim).astype(np.float32))
    # one real click + the (0,0)/-1 padding point (onnx.py convention)
    coords = jnp.asarray([[[40.0, 60.0], [0.0, 0.0]]])
    labels = jnp.asarray([[1.0, -1.0]])
    mask_in = jnp.zeros((1, 4 * g[0], 4 * g[1], 1))
    has_mask = jnp.zeros((1, 1, 1, 1))

    fn = build_decoder_fn(model, variables, orig_im_size=(96, 128))
    up, scores, low = jax.jit(fn)(emb, coords, labels, mask_in, has_mask)
    assert up.shape == (1, 1, 96, 128)
    assert low.shape == (1, 1, 4 * g[0], 4 * g[1])
    assert np.isfinite(np.asarray(up)).all()

    # predict_from_embedding auto-pads the (0,0)/-1 point, so hand it only
    # the real click — both paths then see identical sparse embeddings
    ref_masks, ref_iou = model.apply(
        variables, emb, coords[:, :1], labels[:, :1], multimask_output=True,
        method=model.predict_from_embedding)
    # 2 points → multimask argmax selection
    best = int(np.argmax(np.asarray(ref_iou)[0]))
    np.testing.assert_allclose(np.asarray(low)[0, 0],
                               np.asarray(ref_masks)[0, best], atol=1e-5)


def test_export_serialize_roundtrip(tiny_sam):
    model, variables, cfg, g = tiny_sam
    blob = export_decoder(model, variables, orig_im_size=(64, 64),
                          num_points=2)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    from jax import export as jax_export

    reloaded = jax_export.deserialize(bytearray(blob))
    rs = np.random.RandomState(1)
    out = reloaded.call(
        rs.randn(1, g[0], g[1], cfg.prompt_embed_dim).astype(np.float32),
        np.asarray([[[10.0, 10.0], [0.0, 0.0]]], np.float32),
        np.asarray([[1.0, -1.0]], np.float32),
        np.zeros((1, 4 * g[0], 4 * g[1], 1), np.float32),
        np.zeros((1, 1, 1, 1), np.float32))
    assert out[0].shape == (1, 1, 64, 64)
    assert np.isfinite(np.asarray(out[0])).all()
