"""Golden parity: CLIPTextModel vs HF transformers CLIPTextModel (the
reference's text tower, scripts/inference.py:153)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.config import CLIPTextConfig
from followyourclick_tpu.models.clip_text import CLIPTextModel
from followyourclick_tpu.utils.convert import audit_params, convert_clip_text_state_dict

TINY = CLIPTextConfig(vocab_size=1000, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=77)


@pytest.fixture(scope="module")
def models():
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        max_position_embeddings=TINY.max_position_embeddings,
        hidden_act="quick_gelu",
    )
    ref = HFModel(hf_cfg)
    ref.eval()

    model = CLIPTextModel(TINY)
    converted = convert_clip_text_state_dict(ref.state_dict())
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 77), dtype=jnp.int32))["params"]
    missing, unexpected, mismatched = audit_params(converted, init)
    assert not missing, missing[:10]
    assert not unexpected, unexpected[:10]
    assert not mismatched, mismatched[:10]
    return ref, model, {"params": converted}


def test_hidden_state_parity(models):
    import jax.numpy as jnp
    import torch

    ref, model, params = models
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 1000, size=(2, 77)).astype(np.int64)
    # ensure a plausible eot position
    ids[:, -1] = 999

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).last_hidden_state.numpy()

    got, pooled = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=2e-3, atol=1e-4)
    assert pooled.shape == (2, TINY.hidden_size)
