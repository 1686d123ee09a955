"""Golden numerical parity: our UNet3D vs the reference PyTorch
UNet3DConditionModel, with weights transferred through the converter.

This validates both the model math and the checkpoint converter in one shot:
any layout/mapping mistake shows up as output mismatch.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.config import MotionModuleConfig, UNet3DConfig
from followyourclick_tpu.models.unet3d import UNet3DConditionModel, UNetConditioning
from followyourclick_tpu.utils.convert import audit_params, convert_unet3d_state_dict

from tests._oracle import setup_reference_path, tiny_unet3d_kwargs


def _build_reference_unet():
    setup_reference_path()
    import torch

    from animatediff.models.unet import UNet3DConditionModel as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(**tiny_unet3d_kwargs())
    ref.eval()
    return ref


def _jax_config() -> UNet3DConfig:
    k = tiny_unet3d_kwargs()
    return UNet3DConfig(
        sample_size=k["sample_size"],
        cross_attention_dim=k["cross_attention_dim"],
        attention_head_dim=k["attention_head_dim"],
        block_out_channels=k["block_out_channels"],
        layers_per_block=k["layers_per_block"],
        norm_num_groups=k["norm_num_groups"],
        use_motion_module=True,
        motion_module=MotionModuleConfig(
            num_attention_heads=4, num_transformer_block=1,
            temporal_position_encoding=True,
            temporal_position_encoding_max_len=24),
        use_fps_condition=True,
        use_first_frame_mask_condition_concat=True,
    )


@pytest.fixture(scope="module")
def ref_and_params():
    import jax
    import jax.numpy as jnp

    ref = _build_reference_unet()
    cfg = _jax_config()
    model = UNet3DConditionModel(cfg)

    converted = convert_unet3d_state_dict(
        {k: v for k, v in ref.state_dict().items()})

    # structure check against a fresh init
    sample = jnp.zeros((1, 4, 32, 32, 9))
    cond = UNetConditioning(context=jnp.zeros((1, 77, 768)),
                            fps=jnp.array([8.0]),
                            motion_score=jnp.array([20.0]))
    init_params = model.init(jax.random.PRNGKey(0), sample,
                             jnp.array([500]), cond)["params"]
    missing, unexpected, mismatched = audit_params(converted, init_params)
    assert not missing, f"missing params: {missing[:10]}"
    assert not unexpected, f"unexpected params: {unexpected[:10]}"
    assert not mismatched, f"shape mismatches: {mismatched[:10]}"
    return ref, model, {"params": converted}


def test_full_forward_parity(ref_and_params):
    import jax.numpy as jnp
    import torch

    ref, model, params = ref_and_params
    rs = np.random.RandomState(0)
    b, f, h, w = 1, 4, 32, 32
    sample = rs.randn(b, 9, f, h, w).astype(np.float32)
    text = rs.randn(b, 77, 768).astype(np.float32)
    t = np.array([321], dtype=np.int64)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(sample), torch.from_numpy(t),
            torch.from_numpy(text),
            use_fps_condition=True,
            fps_tensor=torch.tensor([8]),
            flow_control=torch.tensor([20]),
        ).sample.numpy()

    cond = UNetConditioning(context=jnp.asarray(text),
                            fps=jnp.array([8.0]),
                            motion_score=jnp.array([20.0]))
    got = model.apply(params,
                      jnp.asarray(sample.transpose(0, 2, 3, 4, 1)),
                      jnp.asarray(t), cond)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)

    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-4)


def test_forward_batch2_different_timesteps(ref_and_params):
    """CFG batching: two batch rows with distinct timesteps must match."""
    import jax.numpy as jnp
    import torch

    ref, model, params = ref_and_params
    rs = np.random.RandomState(3)
    sample = rs.randn(2, 9, 4, 32, 32).astype(np.float32)
    text = rs.randn(2, 77, 768).astype(np.float32)
    t = np.array([10, 900], dtype=np.int64)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(sample), torch.from_numpy(t),
            torch.from_numpy(text),
            use_fps_condition=True,
            fps_tensor=torch.tensor([8]),
            flow_control=torch.tensor([20]),
        ).sample.numpy()

    cond = UNetConditioning(context=jnp.asarray(text),
                            fps=jnp.array([8.0]),
                            motion_score=jnp.array([20.0]))
    got = model.apply(params, jnp.asarray(sample.transpose(0, 2, 3, 4, 1)),
                      jnp.asarray(t), cond)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-4)
