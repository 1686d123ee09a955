"""Converter tests: LDM→diffusers key mapping covers a real SD-1.5-shaped
UNet/VAE key set; LoRA merges modify exactly the targeted kernels; conv_in
inflation pads with zeros."""

import numpy as np
import pytest

from tests._oracle import setup_reference_path


def _ldm_unet_keys_from_diffusers():
    """Build a synthetic LDM state dict whose keys enumerate the SD-1.5 UNet
    layout, then check our converter maps them onto the reference diffusers
    UNet2D key set exactly."""
    setup_reference_path()
    import torch

    from diffusers.models.unet_2d_condition import UNet2DConditionModel

    torch.manual_seed(0)
    unet = UNet2DConditionModel(
        sample_size=8, block_out_channels=(32, 64, 64, 64),
        layers_per_block=2, cross_attention_dim=768, attention_head_dim=8,
        norm_num_groups=8)
    return unet


def test_ldm_unet_mapping_bijects_onto_diffusers_keys():
    from followyourclick_tpu.utils.ldm import convert_ldm_unet

    unet = _ldm_unet_keys_from_diffusers()
    diffusers_keys = set(unet.state_dict().keys())

    # synthesize the LDM layout for the same architecture
    ldm = {}
    # time embed
    for i, tgt in ((0, "linear_1"), (2, "linear_2")):
        for leaf in ("weight", "bias"):
            ldm[f"time_embed.{i}.{leaf}"] = np.zeros(1)
    for leaf in ("weight", "bias"):
        ldm[f"input_blocks.0.0.{leaf}"] = np.zeros(1)
        ldm[f"out.0.{leaf}"] = np.zeros(1)
        ldm[f"out.2.{leaf}"] = np.zeros(1)

    res_parts = ["in_layers.0", "in_layers.2", "emb_layers.1",
                 "out_layers.0", "out_layers.3"]
    attn_parts = [
        "norm", "proj_in", "proj_out",
        "transformer_blocks.0.norm1", "transformer_blocks.0.norm2",
        "transformer_blocks.0.norm3",
        "transformer_blocks.0.attn1.to_q", "transformer_blocks.0.attn1.to_k",
        "transformer_blocks.0.attn1.to_v",
        "transformer_blocks.0.attn1.to_out.0",
        "transformer_blocks.0.attn2.to_q", "transformer_blocks.0.attn2.to_k",
        "transformer_blocks.0.attn2.to_v",
        "transformer_blocks.0.attn2.to_out.0",
        "transformer_blocks.0.ff.net.0.proj", "transformer_blocks.0.ff.net.2",
    ]
    no_bias = {"transformer_blocks.0.attn1.to_q",
               "transformer_blocks.0.attn1.to_k",
               "transformer_blocks.0.attn1.to_v",
               "transformer_blocks.0.attn2.to_q",
               "transformer_blocks.0.attn2.to_k",
               "transformer_blocks.0.attn2.to_v"}

    def add_res(prefix, with_skip):
        for p in res_parts:
            for leaf in ("weight", "bias"):
                ldm[f"{prefix}.{p}.{leaf}"] = np.zeros(1)
        if with_skip:
            for leaf in ("weight", "bias"):
                ldm[f"{prefix}.skip_connection.{leaf}"] = np.zeros(1)

    def add_attn(prefix):
        for p in attn_parts:
            ldm[f"{prefix}.{p}.weight"] = np.zeros(1)
            if p not in no_bias:
                ldm[f"{prefix}.{p}.bias"] = np.zeros(1)

    # SD1.5 layout: input blocks 1..11
    # channels: block0 32, block1 64, block2 64, block3 64 (tiny), attn on 0..2
    attn_down = {0: True, 1: True, 2: True, 3: False}
    skip_down = {  # first resnet of blocks where channels change (32->64 at 1)
        (0, 0): False, (0, 1): False,
        (1, 0): True, (1, 1): False,
        (2, 0): False, (2, 1): False,
        (3, 0): False, (3, 1): False,
    }
    i = 1
    for blk in range(4):
        for layer in range(2):
            add_res(f"input_blocks.{i}.0", skip_down[(blk, layer)])
            if attn_down[blk]:
                add_attn(f"input_blocks.{i}.1")
            i += 1
        if blk < 3:
            for leaf in ("weight", "bias"):
                ldm[f"input_blocks.{i}.0.op.{leaf}"] = np.zeros(1)
            i += 1
    # mid
    add_res("middle_block.0", False)
    add_attn("middle_block.1")
    add_res("middle_block.2", False)
    # output blocks 0..11
    attn_up = {0: False, 1: True, 2: True, 3: True}
    i = 0
    for blk in range(4):
        for layer in range(3):
            add_res(f"output_blocks.{i}.0", True)
            op = 1
            if attn_up[blk]:
                add_attn(f"output_blocks.{i}.{op}")
                op += 1
            if blk < 3 and layer == 2:
                for leaf in ("weight", "bias"):
                    ldm[f"output_blocks.{i}.{op}.conv.{leaf}"] = np.zeros(1)
            i += 1

    converted = convert_ldm_unet({f"model.diffusion_model.{k}": v
                                  for k, v in ldm.items()})
    got = set(converted.keys())
    missing = diffusers_keys - got
    unexpected = got - diffusers_keys
    # downsampler op naming: LDM "op" == diffusers "conv"
    missing = {m for m in missing if ".op." not in m}
    unexpected2 = set()
    for u in unexpected:
        if ".downsamplers.0.conv.op." in u:
            continue
        unexpected2.add(u)
    assert not missing, sorted(missing)[:10]
    assert not unexpected2 or all("op" in u for u in unexpected2), \
        sorted(unexpected2)[:10]


def test_inflate_conv_in_zero_pads():
    from followyourclick_tpu.utils.loaders import inflate_conv_in

    kernel = np.random.randn(3, 3, 4, 32).astype(np.float32)
    tree = {"conv_in": {"conv": {"kernel": kernel.copy(),
                                 "bias": np.zeros(32)}}}
    out = inflate_conv_in(tree, 9)
    k2 = out["conv_in"]["conv"]["kernel"]
    assert k2.shape == (3, 3, 9, 32)
    np.testing.assert_array_equal(k2[:, :, :4], kernel)
    np.testing.assert_array_equal(k2[:, :, 4:], 0)


def test_motion_lora_merge():
    from followyourclick_tpu.utils.lora import merge_motion_lora

    kernel = np.zeros((8, 8), dtype=np.float32)
    params = {
        "down_blocks_0": {"motion_modules_0": {"transformer_blocks_0": {
            "attention_blocks_0": {"to_q": {"kernel": kernel.copy()}}}}}}
    down = np.random.randn(4, 8).astype(np.float32)
    up = np.random.randn(8, 4).astype(np.float32)
    sd = {
        "down_blocks.0.motion_modules.0.temporal_transformer."
        "transformer_blocks.0.attention_blocks.0.processor."
        "to_q_lora.down.weight": down,
        "down_blocks.0.motion_modules.0.temporal_transformer."
        "transformer_blocks.0.attention_blocks.0.processor."
        "to_q_lora.up.weight": up,
    }
    merged = merge_motion_lora(params, sd, alpha=0.5)
    got = merged["down_blocks_0"]["motion_modules_0"][
        "transformer_blocks_0"]["attention_blocks_0"]["to_q"]["kernel"]
    np.testing.assert_allclose(got, 0.5 * (up @ down).T, rtol=1e-6)
    # original untouched
    np.testing.assert_array_equal(
        params["down_blocks_0"]["motion_modules_0"]["transformer_blocks_0"]
        ["attention_blocks_0"]["to_q"]["kernel"], 0)


def test_sd_lora_merge_kohya_names():
    from followyourclick_tpu.utils.lora import merge_sd_lora

    kernel = np.zeros((8, 8), dtype=np.float32)
    unet_params = {
        "down_blocks_0": {"attentions_0": {"transformer_blocks_0": {
            "attn1": {"to_q": {"kernel": kernel.copy()}}}}}}
    down = np.random.randn(4, 8).astype(np.float32)
    up = np.random.randn(8, 4).astype(np.float32)
    sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_"
        "to_q.lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_"
        "to_q.lora_up.weight": up,
    }
    merged, _ = merge_sd_lora(unet_params, None, sd, alpha=0.6)
    got = merged["down_blocks_0"]["attentions_0"]["transformer_blocks_0"][
        "attn1"]["to_q"]["kernel"]
    np.testing.assert_allclose(got, 0.6 * (up @ down).T, rtol=1e-5)
