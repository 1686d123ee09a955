"""Training step — reconstructed from the released training config (the
reference shipped no training script; SURVEY.md §0).

Spec sources: ``configs/training/training_14M_448x256_part_img_embed_mask_
condition_zero_snr_sd1.5_img_as_vid_for_train_all_parameters.yaml`` —
v-prediction + zero-SNR DDIM regime, first-frame masked-latent conditioning
with corruption rates ``[0, 0.3, 0.5, 0.7]``
(``use_first_frame_mask_condition_concat_image_mask_rate``), trainable-module
name filters (``motion_modules., conv_in, motion_embedding, fps``), lr 1e-5,
and the conv_in/mask concat semantics of ``pipeline_animation.py:690-711``.

TPU-first: one pure jitted ``train_step`` (loss → grads → masked AdamW
update), pjit-able over a (data, model) mesh; gradient checkpointing via
``jax.checkpoint`` policy on the UNet apply.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from followyourclick_tpu.config import InferenceConfig
from followyourclick_tpu.models.unet3d import UNet3DConditionModel, UNetConditioning
from followyourclick_tpu.models.vae import AutoencoderKL
from followyourclick_tpu.models.clip_text import CLIPTextModel
from followyourclick_tpu.schedulers.ddim import (
    DDIMSchedule,
    add_noise,
    get_velocity,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    # reference trainable_modules name-prefix filters
    trainable_modules: Sequence[str] = (
        "motion_modules", "conv_in", "motion_embedding", "fps_embedding")
    # mask-corruption rates for the first-frame conditioning latent
    mask_corruption_rates: Sequence[float] = (0.0, 0.3, 0.5, 0.7)
    gradient_checkpointing: bool = True
    # reference `use_spatial_temporal_separate_lr` ("if true, all parameters
    # train"): ALL params become trainable, with the temporal (motion-module)
    # group on its own learning rate and everything else (spatial) on
    # `spatial_learning_rate` (falls back to `learning_rate`)
    use_spatial_temporal_separate_lr: bool = False
    spatial_learning_rate: Optional[float] = None
    # OPT-IN memory lever: store AdamW's FIRST moment in this dtype
    # (optax mu_dtype). bf16 halves the mu buffer (~0.8 GB on the 421M
    # trainable set) at negligible update error (nu and the master params
    # stay fp32); None = fp32 everywhere, the reference-parity default.
    adam_mu_dtype: Optional[str] = None


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState = flax.struct.field(pytree_node=True)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def trainable_mask(params: dict, prefixes: Sequence[str]) -> dict:
    """Boolean pytree: True where any path segment starts with a prefix
    (reference trainable_modules filter semantics)."""

    def walk(tree, matched):
        if not isinstance(tree, dict):
            return matched
        return {
            k: walk(v, matched or any(k.startswith(p) for p in prefixes))
            for k, v in tree.items()
        }

    return walk(params, False)


def create_train_state(params: dict, cfg: TrainConfig) -> TrainState:
    def adamw(lr):
        return optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                           eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
                           mu_dtype=cfg.adam_mu_dtype)

    if cfg.use_spatial_temporal_separate_lr:
        # all parameters train; motion modules (temporal) get
        # `learning_rate`, the rest (spatial) `spatial_learning_rate`
        temporal = trainable_mask(params, ("motion_modules",))
        labels = jax.tree_util.tree_map(
            lambda m: "temporal" if m else "spatial", temporal)
        spatial_lr = (cfg.spatial_learning_rate
                      if cfg.spatial_learning_rate is not None
                      else cfg.learning_rate)
        groups = {"temporal": adamw(cfg.learning_rate),
                  "spatial": adamw(spatial_lr)}
    else:
        mask = trainable_mask(params, tuple(cfg.trainable_modules))
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", mask)
        groups = {"train": adamw(cfg.learning_rate),
                  "freeze": optax.set_to_zero()}
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(groups, labels),
    )
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)


@flax.struct.dataclass
class TrainBatch:
    """One training batch (video-as-latent path; the dataset layer produces
    pixel videos — VAE encoding happens in ``encode_batch``)."""

    latents: jnp.ndarray        # (B, F, h, w, 4) clean scaled latents
    input_ids: jnp.ndarray      # (B, 77)
    mask: jnp.ndarray           # (B, h, w, 1) motion-area / click mask
    fps: jnp.ndarray            # (B,) dynamic-fps conditioning
    motion_score: jnp.ndarray   # (B,) optical-flow magnitude


def encode_batch(vae: AutoencoderKL, vae_params, video: jnp.ndarray,
                 rng: jax.Array) -> jnp.ndarray:
    """(B, F, H, W, 3) in [-1,1] → scaled latents, frames folded."""
    b, f, h, w, c = video.shape
    mean, logvar = vae.apply({"params": vae_params},
                             video.reshape(b * f, h, w, c),
                             method=vae.encode)
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        rng, mean.shape, dtype=mean.dtype)
    return z.reshape(b, f, h // 8, w // 8, 4) * 0.18215


def _prepare_step_inputs(batch: TrainBatch, rng: jax.Array,
                         sched: DDIMSchedule, cfg: TrainConfig,
                         text_encoder: CLIPTextModel, text_params: dict):
    """Shared forward-input construction: noising, v-target, first-frame
    mask conditioning with random corruption, text context."""
    b, f, h, w, _ = batch.latents.shape
    rng_t, rng_noise, rng_rate, rng_corrupt = jax.random.split(rng, 4)

    timesteps = jax.random.randint(
        rng_t, (b,), 0, sched.cfg.num_train_timesteps)
    noise = jax.random.normal(rng_noise, batch.latents.shape,
                              dtype=batch.latents.dtype)
    noisy = add_noise(sched, batch.latents, noise, timesteps)
    target = get_velocity(sched, batch.latents, noise, timesteps)

    # conditioning: first-frame latent + mask channel, with random corruption
    # (use_frame_conditioning_corruption + image_mask_rate in the config)
    rates = jnp.asarray(cfg.mask_corruption_rates, dtype=jnp.float32)
    rate = rates[jax.random.randint(rng_rate, (b,), 0, len(rates))]
    keep = (jax.random.uniform(rng_corrupt, (b, h, w, 1))
            >= rate[:, None, None, None]).astype(batch.latents.dtype)
    first_latent = batch.latents[:, 0] * keep

    frame_idx = jnp.arange(f)[None, :, None, None, None]
    first_block = jnp.where(frame_idx == 0, first_latent[:, None], 0.0)
    first_block = jnp.broadcast_to(first_block, (b, f, h, w, 4))
    mask_block = jnp.broadcast_to(
        jnp.clip(batch.mask, 0.0, 1.0)[:, None], (b, f, h, w, 1))
    model_in = jnp.concatenate(
        [noisy, mask_block.astype(noisy.dtype),
         first_block.astype(noisy.dtype)], axis=-1)

    context, _ = text_encoder.apply({"params": text_params}, batch.input_ids)
    cond = UNetConditioning(context=context, fps=batch.fps,
                            motion_score=batch.motion_score)
    return model_in, timesteps, cond, target


def _unet_apply(unet: UNet3DConditionModel, cfg: TrainConfig):
    apply = unet.apply
    if cfg.gradient_checkpointing:
        apply = jax.checkpoint(
            unet.apply, policy=jax.checkpoint_policies.nothing_saveable,
            static_argnums=())
    return apply


def train_step(
    state: TrainState,
    batch: TrainBatch,
    rng: jax.Array,
    *,
    unet: UNet3DConditionModel,
    text_encoder: CLIPTextModel,
    text_params: dict,
    sched: DDIMSchedule,
    cfg: TrainConfig,
) -> Tuple[TrainState, dict]:
    """One v-prediction training step with masked-latent conditioning."""
    model_in, timesteps, cond, target = _prepare_step_inputs(
        batch, rng, sched, cfg, text_encoder, text_params)
    apply = _unet_apply(unet, cfg)

    def loss_fn(params):
        pred = apply({"params": params}, model_in, timesteps, cond)
        loss = jnp.mean(
            (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads)
    metrics = {"loss": loss,
               "grad_norm": optax.global_norm(grads)}
    return new_state, metrics


# ── Partitioned training: grads over the trainable subtree only ──────────
#
# The reference recipe freezes everything except motion_modules + conv_in +
# the condition embeds (trainable_modules filter in
# configs/training/training_14M_448x256_...yaml). The full-tree TrainState
# above still pays fp32 grads + AdamW moments for FROZEN params (optax
# multi_transform inits every sub-transform over the full tree), which is
# ~9 GB of pure waste on the 1.28B-param flagship UNet — the reason the
# reference training shape (448×256, 16-24 frames) OOMed on one 16 GB chip
# (docs/PERF.md "Training throughput"). Here: jax.grad is taken over the
# trainable subtree ONLY, frozen params are held in bf16, and optimizer
# state exists only for trainable leaves.

def _is_none(x):
    return x is None


def partition_params(params: dict, mask: dict) -> Tuple[dict, dict]:
    """Split one param tree into (trainable, frozen) trees of identical
    structure with ``None`` at the complementary positions."""
    trainable = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    """Inverse of :func:`partition_params`."""
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t, trainable, frozen,
        is_leaf=_is_none)


@flax.struct.dataclass
class PartitionedTrainState:
    """Train state holding only the trainable subtree in fp32 + optimizer
    state; frozen params ride along in half precision, untouched by
    updates."""

    step: jnp.ndarray
    trainable: dict          # fp32 master copy of trainable leaves
    frozen: dict             # frozen leaves (bf16 by default), never updated
    opt_state: optax.OptState = flax.struct.field(pytree_node=True)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state,
                                          self.trainable)
        return self.replace(
            step=self.step + 1,
            trainable=optax.apply_updates(self.trainable, updates),
            opt_state=new_opt)

    @property
    def params(self) -> dict:
        """Full merged tree (for checkpointing / validation sampling)."""
        return merge_params(self.trainable, self.frozen)


def create_partitioned_train_state(
        params: dict, cfg: TrainConfig,
        frozen_dtype=jnp.bfloat16) -> PartitionedTrainState:
    """Build the memory-lean state for the reference freeze recipe.

    ``frozen_dtype=jnp.float32`` reproduces the full-tree ``TrainState``
    update exactly (pinned by tests/test_training.py); bf16 is the
    production setting (frozen weights are inference-only in the forward).
    """
    if cfg.use_spatial_temporal_separate_lr:
        # "all parameters train" mode — partitioning buys nothing; the
        # trainable tree is the full tree and frozen is empty.
        mask = jax.tree_util.tree_map(lambda _: True, params)
    else:
        mask = trainable_mask(params, tuple(cfg.trainable_modules))
    trainable, frozen = partition_params(params, mask)
    if frozen_dtype is not None:
        frozen = jax.tree_util.tree_map(
            lambda p: p.astype(frozen_dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, frozen)

    def adamw(lr):
        return optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                           eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
                           mu_dtype=cfg.adam_mu_dtype)

    if cfg.use_spatial_temporal_separate_lr:
        temporal = trainable_mask(trainable, ("motion_modules",))
        labels = jax.tree_util.tree_map(
            lambda m: "temporal" if m else "spatial", temporal)
        spatial_lr = (cfg.spatial_learning_rate
                      if cfg.spatial_learning_rate is not None
                      else cfg.learning_rate)
        inner = optax.multi_transform(
            {"temporal": adamw(cfg.learning_rate),
             "spatial": adamw(spatial_lr)}, labels)
    else:
        inner = adamw(cfg.learning_rate)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner)
    return PartitionedTrainState(
        step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
        opt_state=tx.init(trainable), tx=tx)


def train_step_partitioned(
    state: PartitionedTrainState,
    batch: TrainBatch,
    rng: jax.Array,
    *,
    unet: UNet3DConditionModel,
    text_encoder: CLIPTextModel,
    text_params: dict,
    sched: DDIMSchedule,
    cfg: TrainConfig,
) -> Tuple[PartitionedTrainState, dict]:
    """Same math as :func:`train_step`, but jax.grad runs over the trainable
    subtree only — frozen params enter the forward as constants (no grad
    memory, no optimizer state). With bf16 frozen params the forward is
    mixed-precision: trainable leaves are cast to the frozen dtype so the
    whole network computes in one dtype (master fp32 copies keep full
    update precision, the standard mixed-precision recipe)."""
    model_in, timesteps, cond, target = _prepare_step_inputs(
        batch, rng, sched, cfg, text_encoder, text_params)
    apply = _unet_apply(unet, cfg)

    frozen_leaves = [f for f in jax.tree_util.tree_leaves(state.frozen)
                     if jnp.issubdtype(f.dtype, jnp.floating)]
    compute_dtype = frozen_leaves[0].dtype if frozen_leaves else None

    def loss_fn(trainable):
        if compute_dtype is not None and compute_dtype != jnp.float32:
            trainable = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, trainable)
        params = merge_params(trainable, state.frozen)
        pred = apply({"params": params}, model_in, timesteps, cond)
        loss = jnp.mean(
            (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
    new_state = state.apply_gradients(grads)
    metrics = {"loss": loss,
               "grad_norm": optax.global_norm(grads)}
    return new_state, metrics
