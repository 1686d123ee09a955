"""Parity tests for the LaMa perceptual towers (inpaint/perceptual.py):
the ade20k dilated ResNet-50 ResNet-PL encoder vs the reference
(``models/ade20k/resnet.py`` + ``ResnetDilated`` surgery, base.py:393-436),
and the VGG19 PerceptualLoss / VGG16 LPIPS structure via torch replicas
(torchvision itself is not installed here; the towers match its layout so
released weights convert 1:1)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

torch = pytest.importorskip("torch")

from followyourclick_tpu.inpaint.perceptual import (  # noqa: E402
    _VGG16_CFG,
    _VGG19_CFG,
    LPIPS,
    DilatedResNet50Encoder,
    VGGFeatures,
    convert_ade20k_resnet_state_dict,
    convert_lpips_state_dict,
    convert_vgg_features_state_dict,
    resnet_pl_loss,
    vgg_perceptual_loss,
)


def _load_reference_resnet():
    """Import the reference ade20k resnet.py without its package __init__."""
    pkg = types.ModuleType("ade20k_ref")
    pkg.__path__ = []
    sys.modules.setdefault("ade20k_ref", pkg)
    utils = types.ModuleType("ade20k_ref.utils")
    utils.load_url = lambda *a, **k: {}
    sys.modules["ade20k_ref.utils"] = utils
    spec = importlib.util.spec_from_file_location(
        "ade20k_ref.resnet",
        "/root/reference/Inpaint-Anything/third_party/lama/models/ade20k/"
        "resnet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ade20k_ref.resnet"] = mod
    spec.loader.exec_module(mod)
    return mod


def _dilate(module, dilate):
    """The reference ResnetDilated._nostride_dilate surgery (base.py:423-436)."""
    for m in module.modules():
        if m.__class__.__name__.find("Conv") != -1:
            if m.stride == (2, 2):
                m.stride = (1, 1)
                if m.kernel_size == (3, 3):
                    m.dilation = (dilate // 2, dilate // 2)
                    m.padding = (dilate // 2, dilate // 2)
            elif m.kernel_size == (3, 3):
                m.dilation = (dilate, dilate)
                m.padding = (dilate, dilate)


def test_resnet_pl_encoder_parity():
    ref_mod = _load_reference_resnet()
    torch.manual_seed(0)
    ref = ref_mod.ResNet(ref_mod.Bottleneck, [1, 1, 1, 1]).eval()
    _dilate(ref.layer3, 2)
    _dilate(ref.layer4, 4)
    # randomize BN running stats so the frozen-BN conversion is exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        h = ref.relu1(ref.bn1(ref.conv1(h)))
        h = ref.relu2(ref.bn2(ref.conv2(h)))
        h = ref.relu3(ref.bn3(ref.conv3(h)))
        h = ref.maxpool(h)
        feats = []
        for layer in (ref.layer1, ref.layer2, ref.layer3, ref.layer4):
            h = layer(h)
            feats.append(h.numpy())

    import jax.numpy as jnp

    enc = DilatedResNet50Encoder(layers=(1, 1, 1, 1))
    params = convert_ade20k_resnet_state_dict(ref.state_dict())
    got = enc.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == 4
    for g, f in zip(got, feats):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), f,
                                   rtol=1e-3, atol=1e-4)
    # dilation surgery keeps layer2 resolution for stages 3/4 (stride removed)
    assert got[1].shape[1:3] == got[2].shape[1:3] == got[3].shape[1:3]

    # the loss wrapper: zero for identical inputs, positive otherwise
    img = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3),
                      jnp.float32)
    assert float(resnet_pl_loss(params, img, img,
                                layers=(1, 1, 1, 1))) == 0.0
    img2 = jnp.clip(img + 0.1, 0, 1)
    assert float(resnet_pl_loss(params, img, img2,
                                layers=(1, 1, 1, 1))) > 0.0


def _torch_vgg_features(cfg):
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_ch = v
    return torch.nn.Sequential(*layers)


def test_vgg19_perceptual_parity():
    """Reference PerceptualLoss semantics (perceptual.py:41-76): VGG19[:30],
    MaxPool→AvgPool, masked per-ReLU MSE, summed."""
    torch.manual_seed(1)
    ref_vgg = _torch_vgg_features(_VGG19_CFG).eval()

    mean = torch.tensor([0.485, 0.456, 0.406])[None, :, None, None]
    std = torch.tensor([0.229, 0.224, 0.225])[None, :, None, None]
    rs = np.random.RandomState(2)
    a = rs.rand(2, 3, 32, 32).astype(np.float32)
    b = rs.rand(2, 3, 32, 32).astype(np.float32)
    mask = (rs.rand(2, 1, 32, 32) > 0.5).astype(np.float32)

    with torch.no_grad():
        fa = (torch.from_numpy(a) - mean) / std
        fb = (torch.from_numpy(b) - mean) / std
        losses = []
        for layer in list(ref_vgg)[:30]:
            if isinstance(layer, torch.nn.MaxPool2d):
                layer = torch.nn.AvgPool2d(2, 2)
            fa, fb = layer(fa), layer(fb)
            if isinstance(layer, torch.nn.ReLU):
                err = torch.nn.functional.mse_loss(fa, fb, reduction="none")
                m = torch.nn.functional.interpolate(
                    torch.from_numpy(mask), size=fa.shape[-2:],
                    mode="bilinear", align_corners=False)
                err = err * (1 - m)
                losses.append(err.mean(dim=(1, 2, 3)))
        ref_loss = torch.stack(losses).sum(0).numpy()

    import jax.numpy as jnp

    params = convert_vgg_features_state_dict(ref_vgg.state_dict())
    got = vgg_perceptual_loss(
        params, jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1)),
        mask=jnp.asarray(mask.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref_loss, rtol=2e-3,
                               atol=1e-5)


def test_lpips_structure():
    """LPIPS formula vs a torch replica: VGG16 pre-pool taps, channel unit
    norm, 1×1 lins, spatial mean, sum (lpips PNetLin semantics)."""
    torch.manual_seed(3)
    ref_vgg = _torch_vgg_features(_VGG16_CFG).eval()
    tap_ch = [64, 128, 256, 512, 512]
    lins = [torch.nn.Conv2d(c, 1, 1, bias=False) for c in tap_ch]

    shift = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    scale = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    rs = np.random.RandomState(4)
    a = rs.rand(1, 3, 64, 64).astype(np.float32)
    b = rs.rand(1, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        def taps(x):
            x = (2 * torch.from_numpy(x) - 1 - shift) / scale
            out = []
            for layer in ref_vgg:
                if isinstance(layer, torch.nn.MaxPool2d):
                    out.append(x)
                x = layer(x)
            out.append(x)
            return out[:5]

        total = 0.0
        for lin, fa, fb in zip(lins, taps(a), taps(b)):
            ua = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            ub = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            total = total + lin((ua - ub) ** 2).mean(dim=(1, 2, 3))
        ref_val = total.numpy()

    import jax.numpy as jnp

    lins_sd = {f"lin{i}.model.1.weight": lin.weight.detach()
               for i, lin in enumerate(lins)}
    params = convert_lpips_state_dict(ref_vgg.state_dict(), lins_sd)
    model = LPIPS()
    got = model.apply({"params": params},
                      jnp.asarray(a.transpose(0, 2, 3, 1)),
                      jnp.asarray(b.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref_val, rtol=2e-3,
                               atol=1e-5)
