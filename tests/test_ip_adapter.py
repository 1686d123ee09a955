"""IP-Adapter parity tests: Resampler and ImageProjModel vs the reference
torch modules (ip_adapter/resampler.py, ip_adapter/my_ip_adapter.py),
CLIP-vision tower vs transformers, and the positional ip-weight graft."""


import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests._oracle import setup_reference_path  # noqa: E402

setup_reference_path()

from followyourclick_tpu.models.ip_adapter import (
    CLIPVisionConfig,
    CLIPVisionModel,
    ImageProjModel,
    Resampler,
)
from followyourclick_tpu.utils.convert import (
    convert_clip_vision_state_dict,
    convert_image_proj_state_dict,
    convert_resampler_state_dict,
    graft_ip_cross_attention,
)


def test_resampler_parity():
    from ip_adapter.resampler import Resampler as TorchResampler

    torch.manual_seed(0)
    ref = TorchResampler(dim=64, depth=2, dim_head=16, heads=4,
                         num_queries=8, embedding_dim=48, output_dim=32,
                         ff_mult=2).eval()
    x = np.random.RandomState(0).randn(2, 10, 48).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    model = Resampler(dim=64, depth=2, dim_head=16, heads=4, num_queries=8,
                      embedding_dim=48, output_dim=32, ff_mult=2)
    params = convert_resampler_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)


def test_image_proj_parity():
    from ip_adapter.my_ip_adapter import ImageProjModel as TorchProj

    torch.manual_seed(1)
    ref = TorchProj(cross_attention_dim=32, clip_embeddings_dim=48,
                    clip_extra_context_tokens=4).eval()
    x = np.random.RandomState(1).randn(3, 48).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    model = ImageProjModel(cross_attention_dim=32, num_tokens=4)
    params = convert_image_proj_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)


def test_clip_vision_parity():
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=24,
    )
    ref = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    x = np.random.RandomState(2).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(x), output_hidden_states=True)
        embeds_ref = out.image_embeds.numpy()
        penult_ref = out.hidden_states[-2].numpy()

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=28, patch_size=14, projection_dim=24)
    model = CLIPVisionModel(cfg)
    params = convert_clip_vision_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    embeds, penult = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(embeds), embeds_ref, atol=3e-5)
    np.testing.assert_allclose(np.asarray(penult), penult_ref, atol=3e-5)


def test_graft_ip_cross_attention():
    import dataclasses

    from followyourclick_tpu.config import UNet3DConfig
    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )

    cfg = UNet3DConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        norm_num_groups=8, use_motion_module=False,
        use_first_frame_mask_condition_concat=False, use_fps_condition=False,
        use_ip_cross_attention=True, ip_num_tokens=4)
    model = UNet3DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    cond = UNetConditioning(context=jnp.zeros((2, 81, 768)))
    params = model.init(rng, jnp.zeros((2, 1, 8, 8, 4)), jnp.zeros((2,)),
                        cond)["params"]

    # count ip projections in the tree, fabricate a ckpt of the right sizes
    shapes = []

    def collect(tree, path):
        for k in sorted(tree):
            if isinstance(tree[k], dict):
                if k in ("to_k_ip", "to_v_ip"):
                    shapes.append((path + (k,), tree[k]["kernel"].shape))
                else:
                    collect(tree[k], path + (k,))

    collect(params, ())
    assert shapes, "ip projections must exist with use_ip_cross_attention"
    rs = np.random.RandomState(0)
    ckpt = {}
    for i, (path, shape) in enumerate(shapes):
        ckpt[f"{i}.{path[-1]}.weight"] = rs.randn(shape[1], shape[0]).astype(
            np.float32
        )
    new_params = graft_ip_cross_attention(params, ckpt)
    for i, (path, shape) in enumerate(shapes):
        node = new_params
        for p in path:
            node = node[p]
        np.testing.assert_array_equal(
            node["kernel"], ckpt[f"{i}.{path[-1]}.weight"].T
        )
    # non-ip weights untouched
    np.testing.assert_array_equal(
        np.asarray(new_params["conv_in"]["conv"]["kernel"]),
        np.asarray(params["conv_in"]["conv"]["kernel"]),
    )

    with pytest.raises(ValueError):
        graft_ip_cross_attention(params, {"0.to_k_ip.weight": ckpt["0.to_k_ip.weight"]})
