"""Checkpoint loading & pipeline assembly (the reference's model-assembly
surface, ``scripts/inference.py:152-247``).

Covers all four dialects (SURVEY.md §5.4):
- HF ``from_pretrained`` directories (``diffusion_pytorch_model.bin`` /
  ``model.safetensors`` per subfolder);
- DDP-prefixed motion-module ``.ckpt`` pickles (``module.`` stripped,
  ``state_dict``-wrapped, loaded non-strict);
- LDM ``.safetensors``/``.ckpt`` full SD checkpoints (via ``utils/ldm.py``);
- LoRA (``utils/lora.py``).

Also implements ``from_pretrained_2d`` inflation semantics
(reference ``unet.py:674-726``): 2D SD weights load into the 3D model with the
widened conv_in zero-padded beyond the first 4 input channels, motion modules
left at their zero-initialized state.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def load_torch_file(path: str) -> Dict:
    """Load a ``.ckpt``/``.bin``/``.pt`` pickle or ``.safetensors`` file into
    a flat numpy state dict (``module.`` prefixes stripped,
    ``{'state_dict': ...}`` unwrapped — reference scripts/inference.py:170-181)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                out[key] = f.get_tensor(key)
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        out = {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
               for k, v in raw.items()}
    return {k.removeprefix("module."): v for k, v in out.items()}


def load_hf_subfolder(model_dir: str, subfolder: str) -> Dict:
    """Load the state dict of one HF model subfolder (vae/unet/text_encoder)."""
    sub = os.path.join(model_dir, subfolder)
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin",
                 "model.safetensors", "pytorch_model.bin"):
        path = os.path.join(sub, name)
        if os.path.exists(path):
            return load_torch_file(path)
    raise FileNotFoundError(f"no weights found under {sub}")


def inflate_conv_in(unet_tree: Dict, target_in_channels: int) -> Dict:
    """Zero-pad the conv_in kernel's input-channel axis (2D→3D inflation,
    reference unet.py:709-717: first 4 channels copied, rest zero)."""
    node = unet_tree["conv_in"]["conv"]
    kernel = np.asarray(node["kernel"])  # (kh, kw, in, out)
    cur = kernel.shape[2]
    if cur == target_in_channels:
        return unet_tree
    assert cur < target_in_channels, (cur, target_in_channels)
    pad = np.zeros(kernel.shape[:2] + (target_in_channels - cur,)
                   + kernel.shape[3:], dtype=kernel.dtype)
    node["kernel"] = np.concatenate([kernel, pad], axis=2)
    return unet_tree


def load_unet3d_params(
    model,                      # UNet3DConditionModel (for init structure)
    sd_unet_state: Dict,        # 2D SD UNet state dict (diffusers names)
    motion_module_state: Optional[Dict] = None,  # 3D additions (.ckpt)
    rng=None,
    example_inputs=None,
    verbose: bool = True,
) -> Dict:
    """from_pretrained_2d + motion-module load: init the 3D model, overlay
    converted 2D weights (conv_in inflated), overlay motion weights."""
    import jax

    from followyourclick_tpu.utils.convert import (
        audit_params,
        convert_unet3d_state_dict,
        merge_params,
    )

    if rng is None:
        rng = jax.random.PRNGKey(0)
    assert example_inputs is not None, "need example inputs for init"
    init_params = model.init(rng, *example_inputs)["params"]

    converted = convert_unet3d_state_dict(sd_unet_state)
    converted = inflate_conv_in(
        converted, model.config.conv_in_channels)
    params = merge_params(jax.tree_util.tree_map(np.asarray, init_params),
                          converted)

    if motion_module_state is not None:
        mm = convert_unet3d_state_dict(motion_module_state)
        params = merge_params(params, mm)

    missing, unexpected, mismatched = audit_params(params, init_params)
    if verbose:
        print(f"[load_unet3d] missing={len(missing)} "
              f"unexpected={len(unexpected)} mismatched={len(mismatched)}")
    assert not mismatched, mismatched[:5]
    return params


def assemble_pipeline_from_pretrained(
    pretrained_model_path: str,
    inference_config,
    motion_module_path: Optional[str] = None,
    personalized_ckpt_path: Optional[str] = None,
    lora_path: Optional[str] = None,
    lora_alpha: float = 0.6,
    motion_lora_path: Optional[str] = None,
    motion_lora_alpha: float = 1.0,
    dtype=None,
    ip_mode: str = "",                      # "" | "raw"/"vanilla" | "plus"
    image_encoder_path: Optional[str] = None,  # HF CLIP-vision dir
    ip_ckpt_path: Optional[str] = None,     # released ip ckpt (optional —
    # the reference's ip weights normally ride inside the motion-module ckpt,
    # loaded non-strict after init_proj; scripts/inference.py:160-181)
    t5_path: Optional[str] = None,          # HF T5 encoder dir
):
    """The full reference assembly flow (scripts/inference.py:152-247):
    SD-1.5 dir → UNet3D inflation → motion module ckpt → optional
    personalized LDM ckpt → optional LoRA merges → optional IP-Adapter
    (vanilla 4 tokens / plus 16 tokens, inference.py:160-167) → optional T5
    second text tower → AnimationPipeline."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )
    from followyourclick_tpu.pipelines.animation import AnimationPipeline
    from followyourclick_tpu.utils import ldm as ldm_mod
    from followyourclick_tpu.utils.convert import (
        convert_clip_text_state_dict,
        convert_unet3d_state_dict,
        convert_vae_state_dict,
        merge_params,
    )
    from followyourclick_tpu.utils.lora import merge_motion_lora, merge_sd_lora

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32

    if ip_mode:
        # vanilla → 4 tokens via ImageProjModel; plus → 16 via Resampler
        # (reference scripts/inference.py:162-165)
        num_tokens = 16 if ip_mode == "plus" else 4
        inference_config = dataclasses.replace(
            inference_config,
            unet=dataclasses.replace(inference_config.unet,
                                     use_ip_cross_attention=True,
                                     ip_num_tokens=num_tokens))

    ucfg = inference_config.unet
    unet = UNet3DConditionModel(ucfg, dtype=dtype)

    sd_unet = load_hf_subfolder(pretrained_model_path, "unet")
    sd_vae = load_hf_subfolder(pretrained_model_path, "vae")
    sd_text = load_hf_subfolder(pretrained_model_path, "text_encoder")

    if personalized_ckpt_path:
        # personalized full-SD checkpoint overrides base weights
        raw = load_torch_file(personalized_ckpt_path)
        sd_unet = ldm_mod.convert_ldm_unet(raw) or sd_unet
        vae_part = ldm_mod.convert_ldm_vae(raw)
        if vae_part:
            sd_vae = vae_part
        clip_part = ldm_mod.convert_ldm_clip(raw)
        if clip_part:
            sd_text = clip_part

    b, f = 1, 4
    h = w = (ucfg.sample_size or 32)
    ctx_len = 77 + (ucfg.ip_num_tokens if ucfg.use_ip_cross_attention else 0)
    example = (
        jnp.zeros((b, f, h, w, ucfg.conv_in_channels), dtype),
        jnp.zeros((b,), jnp.int32),
        UNetConditioning(
            context=jnp.zeros((b, ctx_len, ucfg.cross_attention_dim), dtype),
            fps=jnp.zeros((b,)) if ucfg.use_fps_condition else None,
            motion_score=jnp.zeros((b,)) if ucfg.use_fps_condition else None,
            context_t5=(jnp.zeros((b, 77, ucfg.text_encoder_2_dim), dtype)
                        if ucfg.use_text_encoder_2 else None)),
    )
    mm_state = load_torch_file(motion_module_path) if motion_module_path \
        else None
    mm_image_proj = None
    if mm_state is not None:
        # the reference's ip weights ride in the motion-module ckpt (loaded
        # non-strict after unet.image_proj_model = init_proj()); peel the
        # projection model off — the pipeline owns it here
        mm_image_proj = {
            k[len("image_proj_model."):]: v for k, v in mm_state.items()
            if k.startswith("image_proj_model.")}
        if mm_image_proj:
            mm_state = {k: v for k, v in mm_state.items()
                        if not k.startswith("image_proj_model.")}
    unet_params = load_unet3d_params(unet, sd_unet, mm_state,
                                     example_inputs=example)
    vae_params = convert_vae_state_dict(sd_vae)
    text_params = convert_clip_text_state_dict(sd_text)

    if lora_path:
        unet_params, text_params = merge_sd_lora(
            unet_params, text_params, load_torch_file(lora_path), lora_alpha)
    if motion_lora_path:
        unet_params = merge_motion_lora(
            unet_params, load_torch_file(motion_lora_path), motion_lora_alpha)

    ip_adapter_params = None
    if ip_mode:
        ip_adapter_params, unet_params = assemble_ip_adapter_params(
            inference_config, ip_mode, unet_params,
            image_encoder_path=image_encoder_path,
            ip_ckpt_path=ip_ckpt_path, mm_image_proj=mm_image_proj,
            dtype=dtype)

    t5_params = tokenizer_2 = None
    if t5_path:
        from followyourclick_tpu.models.t5_text import convert_t5_state_dict

        t5_params = convert_t5_state_dict(load_hf_subfolder(t5_path, ""))
        try:
            from transformers import AutoTokenizer

            tokenizer_2 = AutoTokenizer.from_pretrained(t5_path)
        except Exception:
            pass

    tokenizer = None
    try:
        from transformers import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(
            pretrained_model_path, subfolder="tokenizer")
    except Exception:
        pass

    if dtype != jnp.float32:
        # reference parity: inference runs on half-precision weights
        # (fp16 checkpoints in scripts/inference.py); fp32 masters would
        # double the weight-read bandwidth of every step on TPU
        from followyourclick_tpu.utils.precision import cast_floating

        unet_params, vae_params, text_params, ip_adapter_params, t5_params = (
            cast_floating((unet_params, vae_params, text_params,
                           ip_adapter_params, t5_params), dtype))

    return AnimationPipeline(
        inference_config, unet_params, vae_params, text_params,
        tokenizer=tokenizer, dtype=dtype,
        ip_adapter_params=ip_adapter_params, ip_plus=(ip_mode == "plus"),
        t5_params=t5_params, tokenizer_2=tokenizer_2)


def assemble_ip_adapter_params(
    inference_config,
    ip_mode: str,
    unet_params: Dict,
    image_encoder_path: Optional[str] = None,
    ip_ckpt_path: Optional[str] = None,
    mm_image_proj: Optional[Dict] = None,
    dtype=None,
):
    """Build IPAdapter params (CLIP-vision tower + projection) and graft the
    decoupled ip k/v weights onto the UNet, from whichever sources exist:
    a released ip ckpt ({'image_proj','ip_adapter'}), the motion-module
    ckpt's image_proj_model.* keys, or random init (reference
    my_ip_adapter.py:85-125 load order). Returns (ip_params, unet_params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from followyourclick_tpu.models.ip_adapter import (
        CLIPVisionConfig,
        IPAdapter,
    )
    from followyourclick_tpu.utils.convert import (
        convert_clip_vision_state_dict,
        convert_image_proj_state_dict,
        convert_resampler_state_dict,
        graft_ip_cross_attention,
        merge_params,
    )

    vcfg = CLIPVisionConfig()
    module = IPAdapter(
        vision_config=vcfg,
        cross_attention_dim=inference_config.unet.cross_attention_dim,
        num_tokens=inference_config.unet.ip_num_tokens,
        plus=(ip_mode == "plus"), dtype=dtype or jnp.float32)
    dummy = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    params = jax.tree_util.tree_map(
        np.asarray, module.init(jax.random.PRNGKey(0), dummy)["params"])

    if image_encoder_path:
        vision_sd = load_hf_subfolder(image_encoder_path, "")
        params["image_encoder"] = merge_params(
            params["image_encoder"], convert_clip_vision_state_dict(vision_sd))

    proj_sd = None
    if ip_ckpt_path:
        state = load_torch_file_nested(ip_ckpt_path)
        proj_sd = {k: _np(v) for k, v in state["image_proj"].items()}
        unet_params = graft_ip_cross_attention(unet_params,
                                               state["ip_adapter"])
    elif mm_image_proj:
        proj_sd = mm_image_proj
    if proj_sd is not None:
        conv = (convert_resampler_state_dict if ip_mode == "plus"
                else convert_image_proj_state_dict)
        params["image_proj_model"] = merge_params(
            params["image_proj_model"], conv(proj_sd))
    return params, unet_params


def load_torch_file_nested(path: str) -> Dict:
    """Like ``load_torch_file`` but preserves one level of nesting (the
    released ip ckpts are ``{'image_proj': {...}, 'ip_adapter': {...}}``)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    return raw


def load_ip_adapter(ckpt_path_or_dict, unet_params, plus: bool = False):
    """Load a released IP-Adapter checkpoint ({'image_proj': ..,
    'ip_adapter': ..}, reference my_ip_adapter.py:85-125): returns
    (image_proj_params, unet_params with to_k_ip/to_v_ip grafted)."""
    from followyourclick_tpu.utils.convert import (
        convert_image_proj_state_dict,
        convert_resampler_state_dict,
        graft_ip_cross_attention,
    )

    if isinstance(ckpt_path_or_dict, (str, bytes)):
        import torch

        state = torch.load(ckpt_path_or_dict, map_location="cpu")
    else:
        state = ckpt_path_or_dict
    image_proj_sd = {k: _np(v) for k, v in state["image_proj"].items()}
    if plus:
        proj_params = convert_resampler_state_dict(image_proj_sd)
    else:
        proj_params = convert_image_proj_state_dict(image_proj_sd)
    new_unet = graft_ip_cross_attention(unet_params, state["ip_adapter"])
    return proj_params, new_unet


def _np(t):
    import numpy as _numpy

    return t.numpy() if hasattr(t, "numpy") else _numpy.asarray(t)
