"""Full-shape (true SD-1.5) checkpoint conversion coverage — catches the
key-mapping errors tiny configs can't (4-level channel layout, DDP
prefixes, LDM dialect at scale, LoRA target resolution): VERDICT r1 #10.

Weights are zeros (meta-device torch models supply the authoritative key
set and shapes); assertions are key/shape audits plus cross-validation of
our LDM converter against the reference ``convert_ldm_unet_checkpoint``.
"""

import numpy as np
import pytest

from tests._oracle import setup_reference_path, tiny_unet3d_kwargs

pytestmark = pytest.mark.slow


def full_unet3d_kwargs():
    kw = tiny_unet3d_kwargs()
    kw.update(block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
              norm_num_groups=32)
    kw["motion_module_kwargs"]["num_attention_heads"] = 8
    return kw


def _np_zeros_state(ref_module):
    return {k: np.zeros(tuple(v.shape), np.float32)
            for k, v in ref_module.state_dict().items()}


@pytest.fixture(scope="module")
def full_ref_unet3d():
    setup_reference_path()
    import torch

    from animatediff.models.unet import UNet3DConditionModel as RefUNet

    with torch.device("meta"):
        return RefUNet(**full_unet3d_kwargs())


def test_unet3d_fullshape_hf_dialect(full_ref_unet3d):
    """Reference full-size UNet3D state dict (HF names, DDP prefixes) →
    flax tree: zero missing / unexpected / mismatched vs model init."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.config import UNet3DConfig
    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )
    from followyourclick_tpu.utils.convert import (
        audit_params,
        convert_unet3d_state_dict,
    )

    state = _np_zeros_state(full_ref_unet3d)
    # DDP-prefixed dialect (reference scripts/inference.py:175)
    state = {"module." + k: v for k, v in state.items()}
    converted = convert_unet3d_state_dict(state)

    cfg = UNet3DConfig()  # full SD-1.5 defaults, mask-concat 9ch conv_in
    model = UNet3DConditionModel(cfg)
    cond = UNetConditioning(
        context=jnp.zeros((1, 77, 768)), fps=jnp.zeros((1,)),
        motion_score=jnp.zeros((1,)))
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 32, 32, 9)), jnp.zeros((1,), jnp.int32), cond)
    missing, unexpected, mismatched = audit_params(converted,
                                                   shapes["params"])
    assert not unexpected, unexpected[:10]
    assert not mismatched, mismatched[:10]
    # zero-init aux embeddings may be absent from a 2D/mm ckpt; nothing else
    allowed_missing = ("fps_embedding", "motion_embedding",
                       "camera_motion_embedding")
    bad = [m for m in missing if m[0] not in allowed_missing]
    assert not bad, bad[:10]


def test_unet3d_fullshape_conv_in_inflation(full_ref_unet3d):
    """4-channel 2D SD weights inflate into the widened 9-channel conv_in
    (reference unet.py:709-717): first 4 input channels copied, rest zero."""
    setup_reference_path()
    import torch

    from diffusers.models.unet_2d_condition import UNet2DConditionModel

    from followyourclick_tpu.utils.convert import convert_unet3d_state_dict
    from followyourclick_tpu.utils.loaders import inflate_conv_in

    with torch.device("meta"):
        ref2d = UNet2DConditionModel()  # full SD-1.5 defaults
    state2d = _np_zeros_state(ref2d)
    state2d["conv_in.weight"] = np.random.RandomState(0).randn(
        320, 4, 3, 3).astype(np.float32)
    tree = convert_unet3d_state_dict(state2d)
    tree = inflate_conv_in(tree, 9)
    kernel = tree["conv_in"]["conv"]["kernel"]
    assert kernel.shape == (3, 3, 9, 320)
    np.testing.assert_array_equal(
        kernel[:, :, :4], state2d["conv_in.weight"].transpose(2, 3, 1, 0))
    assert (kernel[:, :, 4:] == 0).all()


def test_vae_clip_fullshape():
    import jax
    import jax.numpy as jnp

    setup_reference_path()
    import torch
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel

    from diffusers.models.vae import AutoencoderKL as RefVAE

    from followyourclick_tpu.config import CLIPTextConfig, VAEConfig
    from followyourclick_tpu.models.clip_text import CLIPTextModel
    from followyourclick_tpu.models.vae import AutoencoderKL
    from followyourclick_tpu.utils.convert import (
        audit_params,
        convert_clip_text_state_dict,
        convert_vae_state_dict,
    )

    with torch.device("meta"):
        ref_vae = RefVAE(  # full SD-1.5 VAE (the vendored defaults are tiny)
            in_channels=3, out_channels=3, latent_channels=4,
            down_block_types=("DownEncoderBlock2D",) * 4,
            up_block_types=("UpDecoderBlock2D",) * 4,
            block_out_channels=(128, 256, 512, 512), layers_per_block=2,
            norm_num_groups=32, sample_size=512)
        ref_text = HFTextModel(HFTextConfig(  # CLIP ViT-L/14 text tower
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77, hidden_act="quick_gelu"))

    vae = AutoencoderKL(VAEConfig())
    rng = jax.random.PRNGKey(0)
    vshapes = jax.eval_shape(vae.init, rng, jnp.zeros((1, 64, 64, 3)), rng)
    m, u, mm = audit_params(convert_vae_state_dict(_np_zeros_state(ref_vae)),
                            vshapes["params"])
    assert not m and not u and not mm, (m[:5], u[:5], mm[:5])

    text = CLIPTextModel(CLIPTextConfig())
    tshapes = jax.eval_shape(text.init, rng, jnp.zeros((1, 77), jnp.int32))
    m, u, mm = audit_params(
        convert_clip_text_state_dict(_np_zeros_state(ref_text)),
        tshapes["params"])
    assert not m and not u and not mm, (m[:5], u[:5], mm[:5])


# ------------------------------------------------------------- LDM -----


class _NS(dict):
    """Attribute-style nested dict standing in for OmegaConf configs."""

    __getattr__ = dict.__getitem__


_INV_RES = {"norm1": "in_layers.0", "conv1": "in_layers.2",
            "time_emb_proj": "emb_layers.1", "norm2": "out_layers.0",
            "conv2": "out_layers.3", "conv_shortcut": "skip_connection"}


def _hf_to_ldm_unet(hf_state):
    """Inverse of the LDM→HF mapping for SD-1.x UNet key layout (the test's
    LDM-checkpoint synthesizer; validated below by feeding the result to the
    REFERENCE convert_ldm_unet_checkpoint)."""
    out = {}
    for key, v in hf_state.items():
        parts = key.split(".")
        leaf = parts[-1]

        def inv_res(rest_parts):
            head = rest_parts[0]
            return _INV_RES[head] + "." + ".".join(rest_parts[1:])

        if key.startswith("time_embedding.linear_1."):
            new = f"time_embed.0.{leaf}"
        elif key.startswith("time_embedding.linear_2."):
            new = f"time_embed.2.{leaf}"
        elif key.startswith("conv_in."):
            new = f"input_blocks.0.0.{leaf}"
        elif key.startswith("conv_norm_out."):
            new = f"out.0.{leaf}"
        elif key.startswith("conv_out."):
            new = f"out.2.{leaf}"
        elif parts[0] == "down_blocks":
            b, kind, l = int(parts[1]), parts[2], int(parts[3])
            if kind == "resnets":
                new = (f"input_blocks.{3 * b + l + 1}.0."
                       + inv_res(parts[4:]))
            elif kind == "attentions":
                new = (f"input_blocks.{3 * b + l + 1}.1."
                       + ".".join(parts[4:]))
            else:  # downsamplers.0.conv
                new = f"input_blocks.{3 * b + 3}.0.op.{leaf}"
        elif parts[0] == "mid_block":
            kind, l = parts[1], int(parts[2])
            op = {("resnets", 0): 0, ("attentions", 0): 1,
                  ("resnets", 1): 2}[(kind, l)]
            rest = (inv_res(parts[3:]) if kind == "resnets"
                    else ".".join(parts[3:]))
            new = f"middle_block.{op}.{rest}"
        elif parts[0] == "up_blocks":
            b, kind = int(parts[1]), parts[2]
            if kind == "resnets":
                l = int(parts[3])
                new = f"output_blocks.{3 * b + l}.0." + inv_res(parts[4:])
            elif kind == "attentions":
                l = int(parts[3])
                new = (f"output_blocks.{3 * b + l}.1."
                       + ".".join(parts[4:]))
            else:  # upsamplers.0.conv — op 1 on no-attn blocks, else 2
                op = 1 if b == 0 else 2
                new = f"output_blocks.{3 * b + 2}.{op}.conv.{leaf}"
        else:
            continue  # motion modules etc. — not part of LDM ckpts
        out["model.diffusion_model." + new] = v
    return out


def test_ldm_unet_fullshape_vs_reference_converter():
    """Synthesize a full-shape LDM UNet checkpoint, convert it with BOTH the
    reference converter and ours, and require identical key→shape maps
    (reference convert_from_ckpt.py:328)."""
    setup_reference_path()
    import torch

    from animatediff.utils.convert_from_ckpt import (
        convert_ldm_unet_checkpoint,
        create_unet_diffusers_config,
    )
    from diffusers.models.unet_2d_condition import UNet2DConditionModel

    from followyourclick_tpu.utils import ldm as ldm_mod

    with torch.device("meta"):
        ref2d = UNet2DConditionModel(cross_attention_dim=768)
    hf_state = _np_zeros_state(ref2d)
    ldm_state = {k: torch.zeros(v.shape)
                 for k, v in _hf_to_ldm_unet(hf_state).items()}
    assert len(ldm_state) == len(hf_state)

    # the SD v1-inference.yaml surface the reference converter reads
    cfg = _NS(model=_NS(params=_NS(
        unet_config=_NS(params=_NS(
            image_size=32, in_channels=4, out_channels=4,
            model_channels=320, attention_resolutions=[4, 2, 1],
            num_res_blocks=2, channel_mult=[1, 2, 4, 4], num_heads=8,
            use_spatial_transformer=True, transformer_depth=1,
            context_dim=768)),
        first_stage_config=_NS(params=_NS(ddconfig=_NS(
            double_z=True, z_channels=4, resolution=256, in_channels=3,
            out_ch=3, ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
            attn_resolutions=[], dropout=0.0))))))
    ref_cfg = create_unet_diffusers_config(cfg, image_size=512)
    ref_out = convert_ldm_unet_checkpoint(dict(ldm_state), ref_cfg)
    ref_shapes = {k: tuple(v.shape) for k, v in ref_out.items()}

    mine = ldm_mod.convert_ldm_unet({k: v.numpy()
                                     for k, v in ldm_state.items()})
    my_shapes = {k: tuple(np.asarray(v).shape) for k, v in mine.items()}
    assert my_shapes == ref_shapes


def test_lora_fullshape_merge():
    """Full-shape kohya LoRA over every UNet cross-attention projection
    merges into the converted tree and changes exactly those kernels."""
    import jax

    from followyourclick_tpu.utils.lora import merge_sd_lora

    setup_reference_path()
    import torch

    from diffusers.models.unet_2d_condition import UNet2DConditionModel

    from followyourclick_tpu.utils.convert import convert_unet3d_state_dict

    with torch.device("meta"):
        ref2d = UNet2DConditionModel(cross_attention_dim=768)
    tree = convert_unet3d_state_dict(_np_zeros_state(ref2d))

    rs = np.random.RandomState(0)
    rank = 4
    lora = {}
    n_targets = 0
    for key, v in _np_zeros_state(ref2d).items():
        if not key.endswith(".weight"):
            continue
        if ".attn2.to_q" not in key and ".attn2.to_k" not in key:
            continue
        flat = "lora_unet_" + key[: -len(".weight")].replace(".", "_")
        out_f, in_f = v.shape
        lora[f"{flat}.lora_down.weight"] = rs.randn(rank, in_f).astype(
            np.float32)
        lora[f"{flat}.lora_up.weight"] = rs.randn(out_f, rank).astype(
            np.float32)
        n_targets += 1
    assert n_targets == 32  # 16 attn2 sites × (to_q, to_k)

    merged, _ = merge_sd_lora(tree, None, lora, alpha=0.5)
    changed = 0
    flat_old = jax.tree_util.tree_leaves_with_path(tree)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(merged))
    for path, old in flat_old:
        new = flat_new[path]
        if np.asarray(old).shape == np.asarray(new).shape and \
                not np.array_equal(np.asarray(old), np.asarray(new)):
            changed += 1
    assert changed == n_targets
