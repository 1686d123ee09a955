"""LaMa FFC generator parity vs the reference torch implementation
(tiny config, converted weights, fp32 tolerance)."""

import sys
import types
import importlib.machinery

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')
import jax.numpy as jnp

torch = pytest.importorskip("torch")

LAMA_PATH = "/root/reference/Inpaint-Anything/third_party/lama"
if LAMA_PATH not in sys.path:
    sys.path.insert(0, LAMA_PATH)

# stub kornia / pytorch_lightning pulled in by the saicinpainting import graph
for _name in ("kornia", "kornia.geometry", "kornia.geometry.transform",
              "pytorch_lightning"):
    if _name not in sys.modules:
        _m = types.ModuleType(_name)
        _m.__spec__ = importlib.machinery.ModuleSpec(_name, loader=None)
        _m.__path__ = []
        sys.modules[_name] = _m
sys.modules["kornia.geometry.transform"].rotate = lambda *a, **k: None
sys.modules["pytorch_lightning"].seed_everything = lambda *a, **k: None

from saicinpainting.training.modules.ffc import (  # noqa: E402
    FFCResNetGenerator as TorchGenerator,
    FourierUnit as TorchFourierUnit,
)

from followyourclick_tpu.inpaint import FFCResNetGenerator, LamaConfig
from followyourclick_tpu.inpaint.convert import convert_lama_state_dict
from followyourclick_tpu.inpaint.lama import FourierUnit

CFG = LamaConfig(
    input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=2,
    resnet_ratio=0.5, enable_lfu=False,
)


def _torch_generator(enable_lfu=False):
    torch.manual_seed(0)
    gen = TorchGenerator(
        input_nc=CFG.input_nc, output_nc=CFG.output_nc, ngf=CFG.ngf,
        n_downsampling=CFG.n_downsampling, n_blocks=CFG.n_blocks,
        init_conv_kwargs={"ratio_gin": 0, "ratio_gout": 0,
                          "enable_lfu": enable_lfu},
        downsample_conv_kwargs={"ratio_gin": 0, "ratio_gout": 0,
                                "enable_lfu": enable_lfu},
        resnet_conv_kwargs={"ratio_gin": CFG.resnet_ratio,
                            "ratio_gout": CFG.resnet_ratio,
                            "enable_lfu": enable_lfu},
        add_out_act="sigmoid",
    ).eval()
    # randomise BN running stats so the stats conversion is actually tested
    with torch.no_grad():
        for m in gen.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.75
                )
    return gen


def test_fourier_unit_parity():
    torch.manual_seed(1)
    tfu = TorchFourierUnit(6, 6).eval()
    x = np.random.RandomState(0).randn(2, 6, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tfu(torch.from_numpy(x)).numpy()
    sd = {f"fu.{k}": v.numpy() for k, v in tfu.state_dict().items()}

    from followyourclick_tpu.inpaint.convert import _Tree

    tree = _Tree()
    tree.conv(sd, "fu.conv_layer", "conv")
    tree.bn(sd, "fu.bn", "bn")
    out = FourierUnit(6).apply(
        {"params": tree.params, "batch_stats": tree.stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4
    )


def test_generator_parity():
    gen_t = _torch_generator()
    x = np.random.RandomState(1).rand(1, 4, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = gen_t(torch.from_numpy(x)).numpy()
    sd = {f"model.{k[len('model.'):]}" if k.startswith("model.") else k: v.numpy()
          for k, v in gen_t.state_dict().items()}
    variables = convert_lama_state_dict(sd, CFG)
    model = FFCResNetGenerator(CFG)
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-4
    )


def test_generator_parity_with_lfu():
    cfg = LamaConfig(
        input_nc=4, output_nc=3, ngf=8, n_downsampling=2, n_blocks=2,
        resnet_ratio=0.5, enable_lfu=True,
    )
    gen_t = _torch_generator(enable_lfu=True)
    x = np.random.RandomState(2).rand(1, 4, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = gen_t(torch.from_numpy(x)).numpy()
    sd = {k: v.numpy() for k, v in gen_t.state_dict().items()}
    variables = convert_lama_state_dict(sd, cfg)
    out = FFCResNetGenerator(cfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-4
    )


def test_inpainter_end_to_end():
    from followyourclick_tpu.inpaint import LamaInpainter

    inp = LamaInpainter.init_random(CFG)
    img = (np.random.RandomState(3).rand(50, 70, 3) * 255).astype(np.uint8)
    mask = np.zeros((50, 70), np.uint8)
    mask[10:30, 20:40] = 255
    out = inp(img, mask)
    assert out.shape == img.shape and out.dtype == np.uint8
    # unmasked pixels are preserved exactly
    np.testing.assert_array_equal(out[mask == 0], img[mask == 0])
