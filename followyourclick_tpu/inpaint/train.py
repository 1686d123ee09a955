"""LaMa inpainting GAN training steps.

Behavior spec: reference ``lama/saicinpainting/training/trainers/default.py``
(DefaultInpaintingTrainingModule): generator loss = weighted masked L1 +
adversarial (NonSaturatingWithR1) + discriminator feature matching;
discriminator loss = NSGAN with R1 gradient penalty; alternating Adam
optimizers (the published big-lama config: gen lr 1e-3, discr lr 1e-4,
l1.weight_known 10, adversarial.weight 10, feature_matching.weight 100,
resnet_pl.weight 30). The ResNet-PL perceptual term
(``inpaint/perceptual.py``) activates when converted ade20k
resnet50dilated weights are passed to ``generator_step`` — the weights
themselves are an external download.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from followyourclick_tpu.inpaint.lama import FFCResNetGenerator
from followyourclick_tpu.inpaint.losses import (
    NLayerDiscriminator,
    discriminator_nsgan_r1_loss,
    feature_matching_loss,
    generator_nsgan_loss,
    masked_l1_loss,
)


@dataclasses.dataclass(frozen=True)
class LamaTrainConfig:
    gen_lr: float = 1e-3
    discr_lr: float = 1e-4
    l1_weight_known: float = 10.0
    l1_weight_missing: float = 0.0
    adv_weight: float = 10.0
    fm_weight: float = 100.0
    r1_gp_coef: float = 0.001
    # ResNet-PL perceptual term (big-lama: resnet_pl.weight 30); active when
    # resnet_pl_params (converted ade20k resnet50dilated weights) are passed
    # to generator_step — reference training/losses/perceptual.py:89-115
    resnet_pl_weight: float = 30.0
    resnet_pl_layers: tuple = (3, 4, 6, 3)


def make_optimizers(cfg: LamaTrainConfig):
    return (optax.adam(cfg.gen_lr), optax.adam(cfg.discr_lr))


def _gen_forward(generator, gen_vars, image, mask):
    inp = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)
    pred, mutated = generator.apply(
        gen_vars, inp, train=True, mutable=["batch_stats"]
    )
    inpainted = mask * pred + (1.0 - mask) * image
    return pred, inpainted, mutated["batch_stats"]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def generator_step(
    generator: FFCResNetGenerator,
    discriminator: NLayerDiscriminator,
    cfg: LamaTrainConfig,
    gen_vars: Dict[str, Any],
    discr_vars: Dict[str, Any],
    gen_opt_state,
    batch: Dict[str, jnp.ndarray],
    resnet_pl_params: Dict[str, Any] | None = None,
):
    """One generator update (trainers/default.py generator_loss path).

    ``resnet_pl_params``: frozen dilated-ResNet-50 encoder weights
    (``inpaint.perceptual.convert_ade20k_resnet_state_dict``); when given,
    the ResNet-PL perceptual term joins the loss as in the reference
    big-lama config."""
    image, mask = batch["image"], batch["mask"]
    stats = gen_vars.get("batch_stats", {})

    def loss_fn(params):
        pred, inpainted, new_stats = _gen_forward(
            generator, {"params": params, "batch_stats": stats}, image, mask
        )
        l1 = masked_l1_loss(pred, image, mask, cfg.l1_weight_known,
                            cfg.l1_weight_missing)

        def discr(x):
            return discriminator.apply(discr_vars, x)

        fake_pred, fake_feats = discr(inpainted)
        _, real_feats = discr(image)
        adv = generator_nsgan_loss(fake_pred)
        fm = feature_matching_loss(fake_feats, real_feats)
        loss = l1 + cfg.adv_weight * adv + cfg.fm_weight * fm
        metrics = {"l1": l1, "adv": adv, "fm": fm}
        if resnet_pl_params is not None:
            from followyourclick_tpu.inpaint.perceptual import resnet_pl_loss

            pl = resnet_pl_loss(resnet_pl_params, inpainted, image,
                                weight=cfg.resnet_pl_weight,
                                layers=cfg.resnet_pl_layers)
            loss = loss + pl
            metrics["resnet_pl"] = pl
        return loss, (new_stats, metrics, inpainted)

    (loss, (new_stats, metrics, inpainted)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(gen_vars["params"])
    opt = make_optimizers(cfg)[0]
    updates, gen_opt_state = opt.update(grads, gen_opt_state,
                                        gen_vars["params"])
    params = optax.apply_updates(gen_vars["params"], updates)
    metrics["gen_total"] = loss
    return ({"params": params, "batch_stats": new_stats}, gen_opt_state,
            metrics, inpainted)


@functools.partial(jax.jit, static_argnums=(0, 1))
def discriminator_step(
    discriminator: NLayerDiscriminator,
    cfg: LamaTrainConfig,
    discr_vars: Dict[str, Any],
    discr_opt_state,
    batch: Dict[str, jnp.ndarray],
    inpainted: jnp.ndarray,
):
    """One discriminator update (NSGAN + R1, trainers/default.py)."""
    image, mask = batch["image"], batch["mask"]
    fake = jax.lax.stop_gradient(inpainted)
    stats = discr_vars.get("batch_stats", {})

    def loss_fn(params):
        def discr_fn(p, x):
            return discriminator.apply(
                {"params": p, "batch_stats": stats}, x
            )

        loss, metrics = discriminator_nsgan_r1_loss(
            discr_fn, params, image, fake, mask[..., :1],
            gp_coef=cfg.r1_gp_coef,
        )
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        discr_vars["params"]
    )
    opt = make_optimizers(cfg)[1]
    updates, discr_opt_state = opt.update(grads, discr_opt_state,
                                          discr_vars["params"])
    params = optax.apply_updates(discr_vars["params"], updates)
    metrics = dict(metrics)
    metrics["discr_total"] = loss
    return {"params": params, "batch_stats": stats}, discr_opt_state, metrics


def init_training(
    generator: FFCResNetGenerator,
    discriminator: NLayerDiscriminator,
    cfg: LamaTrainConfig,
    image_size: int = 64,
    seed: int = 0,
) -> Tuple[Dict, Dict, Any, Any]:
    """Initialise generator/discriminator variables and optimizer states."""
    rng = jax.random.PRNGKey(seed)
    gen_vars = dict(generator.init(
        rng, jnp.zeros((1, image_size, image_size,
                        generator.config.input_nc))
    ))
    if "batch_stats" not in gen_vars:
        gen_vars["batch_stats"] = {}
    discr_vars = dict(discriminator.init(
        rng, jnp.zeros((1, image_size, image_size, 3))
    ))
    gen_opt, discr_opt = make_optimizers(cfg)
    return (gen_vars, discr_vars,
            gen_opt.init(gen_vars["params"]),
            discr_opt.init(discr_vars["params"]))
