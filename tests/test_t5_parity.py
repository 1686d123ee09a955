"""Golden parity: T5 encoder vs HF T5EncoderModel (the reference's optional
second text tower, pipeline_animation.py:44-123)."""

import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

import numpy as np


def test_t5_encoder_parity():
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel as HFT5

    from followyourclick_tpu.models.t5_text import (
        T5Config,
        T5EncoderModel,
        convert_t5_state_dict,
    )
    from followyourclick_tpu.utils.convert import audit_params

    torch.manual_seed(0)
    hf = HFT5(HFT5Config(vocab_size=200, d_model=32, d_kv=8, d_ff=64,
                         num_layers=2, num_heads=4,
                         feed_forward_proj="gated-gelu",
                         dropout_rate=0.0)).eval()
    cfg = T5Config(vocab_size=200, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4)
    model = T5EncoderModel(cfg)
    params = convert_t5_state_dict(hf.state_dict())

    ids = np.random.RandomState(0).randint(0, 200, (2, 16))
    am = np.ones((2, 16), np.int64)
    am[1, 10:] = 0

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                      jnp.asarray(am))["params"]
    missing, unexpected, mismatched = audit_params(params, init)
    assert not missing and not unexpected and not mismatched, (
        missing[:3], unexpected[:3], mismatched[:3])

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(am)).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(am)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
