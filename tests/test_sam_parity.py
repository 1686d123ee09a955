"""SAM parity tests: tiny randomly-initialised torch modules from the
reference segment-anything tree are the numerical oracle; weights are
converted with ``sam.convert`` and outputs compared module-by-module and
end-to-end (fp32 tolerance)."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')
import jax.numpy as jnp

torch = pytest.importorskip("torch")

SAM_PATH = (
    "/root/reference/Inpaint-Anything/third_party/segment-anything"
)
if SAM_PATH not in sys.path:
    sys.path.insert(0, SAM_PATH)

# the reference package __init__ pulls in torchvision (absent here) through
# its predictor; stub just enough for the import graph
import importlib.machinery  # noqa: E402
import types  # noqa: E402

for _name in ("torchvision", "torchvision.transforms",
              "torchvision.transforms.functional",
              "torchvision.ops", "torchvision.ops.boxes"):
    if _name not in sys.modules:
        _m = types.ModuleType(_name)
        _m.__spec__ = importlib.machinery.ModuleSpec(_name, loader=None)
        _m.__path__ = []
        sys.modules[_name] = _m
_f = sys.modules["torchvision.transforms.functional"]
_f.resize = lambda *a, **k: None
_f.to_pil_image = lambda *a, **k: None
_b = sys.modules["torchvision.ops.boxes"]
_b.batched_nms = lambda *a, **k: None
_b.box_area = lambda *a, **k: None

from segment_anything.modeling.image_encoder import (  # noqa: E402
    ImageEncoderViT as TorchImageEncoder,
)
from segment_anything.modeling.mask_decoder import (  # noqa: E402
    MaskDecoder as TorchMaskDecoder,
)
from segment_anything.modeling.prompt_encoder import (  # noqa: E402
    PromptEncoder as TorchPromptEncoder,
)
from segment_anything.modeling.transformer import (  # noqa: E402
    TwoWayTransformer as TorchTwoWayTransformer,
)

from followyourclick_tpu.sam.convert import convert_sam_state_dict
from followyourclick_tpu.sam.image_encoder import ImageEncoderViT
from followyourclick_tpu.sam.mask_decoder import MaskDecoder
from followyourclick_tpu.sam.prompt_encoder import PromptEncoder

# tiny-but-structural configuration
EMBED, DEPTH, HEADS = 32, 3, 2
GLOBAL = (1,)
IMG, PATCH = 64, 16          # 4x4 token grid
PROMPT_DIM = 16
WINDOW = 2
MASK_CHANS = 4
import functools  # noqa: E402


def _prefix(sd, p):
    return {f"{p}.{k}": v for k, v in sd.items()}


@pytest.fixture(scope="module")
def torch_modules():
    torch.manual_seed(0)
    enc = TorchImageEncoder(
        depth=DEPTH, embed_dim=EMBED, img_size=IMG, patch_size=PATCH,
        mlp_ratio=4, num_heads=HEADS, qkv_bias=True, use_rel_pos=True,
        global_attn_indexes=GLOBAL, window_size=WINDOW,
        out_chans=PROMPT_DIM,
        norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    pe = TorchPromptEncoder(
        embed_dim=PROMPT_DIM, image_embedding_size=(4, 4),
        input_image_size=(IMG, IMG), mask_in_chans=MASK_CHANS,
    ).eval()
    dec = TorchMaskDecoder(
        num_multimask_outputs=3,
        transformer=TorchTwoWayTransformer(
            depth=2, embedding_dim=PROMPT_DIM, mlp_dim=32, num_heads=2
        ),
        transformer_dim=PROMPT_DIM, iou_head_depth=3,
        iou_head_hidden_dim=16,
    ).eval()
    # randomise embeddings/rel-pos that init to zero/constant
    with torch.no_grad():
        for m in (enc, pe, dec):
            for name, p in m.named_parameters():
                if p.std() < 1e-8:
                    p.copy_(torch.randn_like(p) * 0.02)
    return enc, pe, dec


@pytest.fixture(scope="module")
def variables(torch_modules):
    enc, pe, dec = torch_modules
    sd = {}
    sd.update(_prefix(enc.state_dict(), "image_encoder"))
    sd.update(_prefix(pe.state_dict(), "prompt_encoder"))
    sd.update(_prefix(dec.state_dict(), "mask_decoder"))
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    return convert_sam_state_dict(sd, depth=DEPTH)


def test_image_encoder_parity(torch_modules, variables):
    enc_t = torch_modules[0]
    x = np.random.RandomState(0).randn(1, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        ref = enc_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    model = ImageEncoderViT(
        img_size=IMG, patch_size=PATCH, embed_dim=EMBED, depth=DEPTH,
        num_heads=HEADS, out_chans=PROMPT_DIM, window_size=WINDOW,
        global_attn_indexes=GLOBAL,
    )
    out = model.apply(
        {"params": variables["params"]["image_encoder"]}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.detach().numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


def test_prompt_encoder_parity_points(torch_modules, variables):
    pe_t = torch_modules[1]
    coords = np.array([[[10.0, 20.0], [40.0, 7.0], [0.0, 0.0]]], np.float32)
    labels = np.array([[1, 0, -1]], np.int32)
    with torch.no_grad():
        sp_ref, dn_ref = pe_t(
            points=(torch.from_numpy(coords), torch.from_numpy(labels)),
            boxes=None, masks=None,
        )
    model = PromptEncoder(
        embed_dim=PROMPT_DIM, image_embedding_size=(4, 4),
        input_image_size=(IMG, IMG), mask_in_chans=MASK_CHANS,
    )
    params = {"params": variables["params"]["prompt_encoder"]}
    sp, dn = model.apply(
        params, points=(jnp.asarray(coords), jnp.asarray(labels))
    )
    np.testing.assert_allclose(np.asarray(sp), sp_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dn), dn_ref.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_prompt_encoder_parity_boxes_and_masks(torch_modules, variables):
    pe_t = torch_modules[1]
    boxes = np.array([[5.0, 6.0, 30.0, 40.0]], np.float32)
    mask_in = np.random.RandomState(1).randn(1, 1, 16, 16).astype(np.float32)
    with torch.no_grad():
        sp_ref, dn_ref = pe_t(
            points=None, boxes=torch.from_numpy(boxes),
            masks=torch.from_numpy(mask_in),
        )
    model = PromptEncoder(
        embed_dim=PROMPT_DIM, image_embedding_size=(4, 4),
        input_image_size=(IMG, IMG), mask_in_chans=MASK_CHANS,
    )
    params = {"params": variables["params"]["prompt_encoder"]}
    sp, dn = model.apply(
        params, boxes=jnp.asarray(boxes),
        masks=jnp.asarray(mask_in.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(sp), sp_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dn), dn_ref.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_dense_pe_parity(torch_modules, variables):
    pe_t = torch_modules[1]
    with torch.no_grad():
        ref = pe_t.get_dense_pe()
    model = PromptEncoder(
        embed_dim=PROMPT_DIM, image_embedding_size=(4, 4),
        input_image_size=(IMG, IMG), mask_in_chans=MASK_CHANS,
    )
    out = model.apply(
        {"params": variables["params"]["prompt_encoder"]},
        method=PromptEncoder.get_dense_pe,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


@pytest.mark.parametrize("multimask", [True, False])
def test_mask_decoder_parity(torch_modules, variables, multimask):
    dec_t = torch_modules[2]
    rs = np.random.RandomState(2)
    img_emb = rs.randn(1, PROMPT_DIM, 4, 4).astype(np.float32)
    img_pe = rs.randn(1, PROMPT_DIM, 4, 4).astype(np.float32)
    sparse = rs.randn(1, 3, PROMPT_DIM).astype(np.float32)
    dense = rs.randn(1, PROMPT_DIM, 4, 4).astype(np.float32)
    with torch.no_grad():
        masks_ref, iou_ref = dec_t(
            image_embeddings=torch.from_numpy(img_emb),
            image_pe=torch.from_numpy(img_pe),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense),
            multimask_output=multimask,
        )
    model = MaskDecoder(
        transformer_dim=PROMPT_DIM, num_heads=2, mlp_dim=32,
        iou_head_hidden_dim=16,
    )
    masks, iou = model.apply(
        {"params": variables["params"]["mask_decoder"]},
        jnp.asarray(img_emb.transpose(0, 2, 3, 1)),
        jnp.asarray(img_pe.transpose(0, 2, 3, 1)),
        jnp.asarray(sparse),
        jnp.asarray(dense.transpose(0, 2, 3, 1)),
        multimask,
    )
    np.testing.assert_allclose(np.asarray(masks), masks_ref.detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(iou), iou_ref.detach().numpy(), atol=2e-4)


def test_window_partition_padding_path(variables):
    """grid 4 with window 3 exercises the pad+unpad path; output must keep
    shape and stay finite."""
    model = ImageEncoderViT(
        img_size=IMG, patch_size=PATCH, embed_dim=EMBED, depth=DEPTH,
        num_heads=HEADS, out_chans=PROMPT_DIM, window_size=3,
        global_attn_indexes=GLOBAL,
    )
    import jax

    x = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 4, PROMPT_DIM)
    assert bool(jnp.isfinite(out).all())
