"""Fused whole-motion-block kernel (ops/motion_block.py) vs the modular
TemporalTransformerBlock path (interpret mode off-TPU).

Reference semantics: animatediff/models/motion_module.py:211-283."""

import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.config import MotionModuleConfig
from followyourclick_tpu.models.motion_module import (
    MotionModule,
    TemporalTransformerBlock,
)
from followyourclick_tpu.ops.motion_block import _ref_fp32, fused_motion_block


def _mk_params(rng, c, inner):
    ks = jax.random.split(rng, 12)

    def mk(i, shape, s=0.08):
        return jax.random.normal(ks[i], shape) * s

    return (
        1.0 + mk(0, (c,), 0.05), mk(1, (c,), 0.05),
        mk(2, (c, c)), mk(3, (c, c)), mk(4, (c, c)), mk(5, (c, c)),
        mk(6, (c,), 0.02),
        1.0 + mk(7, (c,), 0.05), mk(1, (c,), 0.03),
        mk(8, (c, c)), mk(9, (c, c)), mk(2, (c, c)), mk(3, (c, c)),
        mk(6, (c,), 0.02),
        1.0 + mk(0, (c,), 0.02), mk(7, (c,), 0.02),
        mk(10, (c, 2 * inner)), mk(6, (2 * inner,), 0.02),
        mk(11, (inner, c)), mk(1, (c,), 0.02),
    )


def test_kernel_matches_fp32_reference(rng):
    b, f, c, heads = 12, 5, 32, 4
    params = _mk_params(jax.random.PRNGKey(1), c, 4 * c)
    x = jax.random.normal(rng, (b, f, c))
    pe = jax.random.normal(jax.random.PRNGKey(2), (f, c)) * 0.1
    scale = (c // heads) ** -0.5
    got = fused_motion_block(x, pe, params, scale, heads, block_b=8,
                             interpret=True)
    ref = _ref_fp32(x, pe, params, scale, heads, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_kernel_pads_ragged_batch(rng):
    b, f, c, heads = 7, 4, 16, 2  # not a multiple of block_b
    params = _mk_params(jax.random.PRNGKey(3), c, 4 * c)
    x = jax.random.normal(rng, (b, f, c))
    pe = jnp.zeros((f, c))
    scale = (c // heads) ** -0.5
    got = fused_motion_block(x, pe, params, scale, heads, block_b=4,
                             interpret=True)
    ref = _ref_fp32(x, pe, params, scale, heads, 1e-5)
    assert got.shape == (b, f, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gradients_match_reference(rng):
    b, f, c, heads = 6, 4, 16, 2
    params = _mk_params(jax.random.PRNGKey(4), c, 4 * c)
    x = jax.random.normal(rng, (b, f, c))
    pe = jax.random.normal(jax.random.PRNGKey(5), (f, c)) * 0.1
    scale = (c // heads) ** -0.5

    def loss_fused(x, params):
        return jnp.sum(jnp.sin(fused_motion_block(
            x, pe, params, scale, heads, block_b=2, interpret=True)))

    def loss_ref(x, params):
        return jnp.sum(jnp.sin(_ref_fp32(x, pe, params, scale, heads, 1e-5)))

    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    rx, rp = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-3)
    for g, r in zip(gp, rp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)


def test_integrated_block_matches_modular(rng, monkeypatch):
    """The fused wiring in TemporalTransformerBlock produces the same params
    tree AND the same output as the modular path (forced via env off-TPU;
    fused_motion_block runs in interpret mode)."""
    c, heads, f, bhw = 32, 4, 5, 9
    block = TemporalTransformerBlock(
        dim=c, num_attention_heads=heads, attention_head_dim=c // heads,
        temporal_position_encoding=True,
        temporal_position_encoding_max_len=8)
    x = jax.random.normal(rng, (bhw, f, c))

    params = block.init(jax.random.PRNGKey(0), x, video_length=f)
    out_mod = block.apply(params, x, video_length=f)

    monkeypatch.setenv("FYC_FORCE_FUSED_MOTION", "1")
    params_f = block.init(jax.random.PRNGKey(0), x, video_length=f)
    assert jax.tree_util.tree_structure(params) \
        == jax.tree_util.tree_structure(params_f)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_f)):
        assert a.shape == b.shape
    out_fused = block.apply(params, x, video_length=f)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_mod),
                               rtol=5e-4, atol=5e-4)


def test_integrated_module_matches_modular(rng, monkeypatch):
    """End-to-end MotionModule parity (GN + proj_in + fused block + proj_out)
    between modular and fused block paths."""
    cfg = MotionModuleConfig(num_attention_heads=4,
                             temporal_position_encoding_max_len=8,
                             zero_initialize=False)
    c = 32
    mm = MotionModule(in_channels=c, config=cfg)
    x = jax.random.normal(rng, (2, 4, 6, 6, c))
    params = mm.init(jax.random.PRNGKey(0), x)
    out_mod = mm.apply(params, x)
    monkeypatch.setenv("FYC_FORCE_FUSED_MOTION", "1")
    out_fused = mm.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_mod),
                               rtol=5e-4, atol=5e-4)


def test_pab_temporal_keeps_modular_path(rng, monkeypatch):
    """With TEMPORAL PAB caching active the block must keep the modular
    (per-site cached) path — the fused kernel has no cache sites."""
    from followyourclick_tpu.models.pab import PabMode

    monkeypatch.setenv("FYC_FORCE_FUSED_MOTION", "1")
    c, heads, f, bhw = 16, 2, 3, 4
    block = TemporalTransformerBlock(
        dim=c, num_attention_heads=heads, attention_head_dim=c // heads,
        pab=PabMode(record_temporal=True))
    x = jax.random.normal(rng, (bhw, f, c))
    variables = block.init(jax.random.PRNGKey(0), x, video_length=f)
    assert "pab" in variables  # cache sites exist => modular path taken


def test_non_temporal_pab_mode_uses_fused_path(rng, monkeypatch):
    """A PabMode that never caches temporal sites (pure cfg-uncond-cache
    schedule, spatial-only PAB) must still get the fused kernel — and match
    the modular output, with no temporal cache variables created."""
    from followyourclick_tpu.models.pab import PabMode

    c, heads, f, bhw = 32, 4, 5, 9
    mode = PabMode(record_spatial=True)  # no temporal flags
    block = TemporalTransformerBlock(
        dim=c, num_attention_heads=heads, attention_head_dim=c // heads,
        temporal_position_encoding_max_len=8, pab=mode)
    x = jax.random.normal(rng, (bhw, f, c))
    variables = block.init(jax.random.PRNGKey(0), x, video_length=f)
    out_mod = block.apply(variables, x, video_length=f)

    monkeypatch.setenv("FYC_FORCE_FUSED_MOTION", "1")
    variables_f = block.init(jax.random.PRNGKey(0), x, video_length=f)
    assert "pab" not in variables_f  # fused path: no temporal cache sites
    out_fused = block.apply(variables, x, video_length=f)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_mod),
                               rtol=5e-4, atol=5e-4)
