"""LaMa training losses + evaluation metrics.

Behavior spec: reference ``Inpaint-Anything/third_party/lama/saicinpainting/
training/`` — ``losses/feature_matching.py`` (masked_l1/l2_loss with
known/missing pixel weights, multi-scale feature_matching_loss),
``losses/adversarial.py`` (NonSaturatingWithR1 :81-145: softplus NSGAN
generator/discriminator losses + R1 gradient penalty on real inputs),
``modules/pix2pixhd.py:565-620`` (NLayerDiscriminator: k4/s2 PatchGAN with
intermediate feature taps), and ``evaluation/losses/ssim.py`` (gaussian SSIM).

FID is the standard Frechet distance over feature statistics
(``evaluation/losses/fid/``) — implemented over caller-provided feature sets
(the reference's InceptionV3 weights are a download; any embedding works).
LPIPS requires pretrained perceptual nets and is intentionally not shipped.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- pixel losses


def masked_l1_loss(pred, target, mask, weight_known=10.0, weight_missing=0.0):
    """feature_matching.py masked_l1_loss: per-pixel L1 with different
    weights inside/outside the hole (big-lama: known 10, missing 0)."""
    per_pixel = jnp.abs(pred - target)
    weights = mask * weight_missing + (1 - mask) * weight_known
    return (weights * per_pixel).mean()


def masked_l2_loss(pred, target, mask, weight_known=10.0, weight_missing=0.0):
    per_pixel = (pred - target) ** 2
    weights = mask * weight_missing + (1 - mask) * weight_known
    return (weights * per_pixel).mean()


def feature_matching_loss(
    fake_features: Sequence[jnp.ndarray],
    target_features: Sequence[jnp.ndarray],
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-scale discriminator feature matching (feature_matching.py:20-33):
    MSE per tap; with a mask, errors are weighted by (1 - mask) resized to
    each tap."""
    total = 0.0
    for fake, target in zip(fake_features, target_features):
        if mask is None:
            total = total + ((fake - target) ** 2).mean()
        else:
            m = jax.image.resize(
                mask, mask.shape[:1] + fake.shape[1:3] + mask.shape[3:],
                method="bilinear",
            )
            total = total + (((fake - target) ** 2) * (1 - m)).mean()
    return total / len(list(fake_features))


# -------------------------------------------------------- adversarial (R1)


def generator_nsgan_loss(discr_fake_pred: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating generator loss (adversarial.py:101-115, default
    use_unmasked_for_gen=True): softplus(-D(fake)).mean()."""
    return jax.nn.softplus(-discr_fake_pred).mean()


def discriminator_nsgan_r1_loss(
    discr_fn,
    discr_params,
    real_batch: jnp.ndarray,
    fake_batch: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    gp_coef: float = 0.001,
    mask_as_fake_target: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """NonSaturatingWithR1 discriminator loss (adversarial.py:121-145):
    softplus(-D(real)) + R1 ‖∇_x D(real)‖² + softplus(D(fake)); with
    mask_as_fake_target (the big-lama config) the fake term is confined to
    the hole and the unmasked region of the fake is trained as real."""

    def real_score_sum(x):
        pred, _ = discr_fn(discr_params, x)
        return pred.sum(), pred

    (_, real_pred), grad = jax.value_and_grad(real_score_sum, has_aux=True)(
        real_batch
    )
    # make_r1_gp: mean over batch of sum-of-squares grad per sample
    r1 = (grad.reshape(grad.shape[0], -1) ** 2).sum(axis=1).mean()
    real_loss = jax.nn.softplus(-real_pred)

    fake_pred, _ = discr_fn(discr_params, fake_batch)
    fake_loss = jax.nn.softplus(fake_pred)
    if mask is not None and mask_as_fake_target:
        m = jax.image.resize(
            mask, mask.shape[:1] + fake_pred.shape[1:3] + mask.shape[3:],
            method="nearest",
        )
        fake_loss = fake_loss * m + (1 - m) * jax.nn.softplus(-fake_pred)

    loss = real_loss.mean() + gp_coef * r1 + fake_loss.mean()
    return loss, {
        "discr_real_out": real_pred.mean(),
        "discr_fake_out": fake_pred.mean(),
        "r1": r1,
    }


# ---------------------------------------------------------- discriminator


class NLayerDiscriminator(nn.Module):
    """pix2pixhd.py:565-620 PatchGAN: k4/s2 LeakyReLU(0.2) stack with
    BatchNorm, returning (patch logits, intermediate feature taps) for the
    feature-matching loss."""

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats: List[jnp.ndarray] = []
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=2,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            x = nn.Conv(nf, (4, 4), strides=(2, 2), padding=2,
                        dtype=self.dtype, name=f"conv{n}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{n}")(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        nf = min(nf * 2, 512)
        x = nn.Conv(nf, (4, 4), strides=(1, 1), padding=2, dtype=self.dtype,
                    name=f"conv{self.n_layers}")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name=f"bn{self.n_layers}")(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        logits = nn.Conv(1, (4, 4), strides=(1, 1), padding=2,
                         dtype=self.dtype, name="pred")(x)
        return logits, feats


# ------------------------------------------------------------------ metrics


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(
    img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0,
    kernel_size: int = 11, sigma: float = 1.5,
) -> jnp.ndarray:
    """Gaussian-windowed SSIM over (B, H, W, C) images (the reference's
    evaluation SSIM, saicinpainting/evaluation/losses/ssim.py)."""
    kern = _gaussian_kernel(kernel_size, sigma)
    C = img1.shape[-1]
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, C))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return ssim_map.mean()


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0):
    mse = ((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2).mean()
    return 10.0 * jnp.log10(max_val**2 / mse)


def frechet_distance(
    feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6
) -> float:
    """Frechet (FID) distance between two feature sets (N, D) — the math of
    the reference's FID evaluator over any embedding (the reference feeds
    InceptionV3 pool3 features; those weights are an external download)."""
    import scipy.linalg

    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    cov_a = np.cov(feats_a, rowvar=False)
    cov_b = np.cov(feats_b, rowvar=False)
    diff = mu_a - mu_b
    covmean, _ = scipy.linalg.sqrtm(cov_a @ cov_b, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov_a.shape[0]) * eps
        covmean = scipy.linalg.sqrtm(
            (cov_a + offset) @ (cov_b + offset), disp=False
        )[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov_a + cov_b - 2 * covmean))
