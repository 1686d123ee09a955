"""Structure test for the mmflow-RAFT checkpoint converter: a synthetic
state dict with mmflow's exact key names and shapes must convert to a tree
that matches ``RAFT.init`` exactly (no missing/unexpected/mismatched leaves),
with values surviving the layout round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from followyourclick_tpu.flow.convert import convert_mmflow_raft
from followyourclick_tpu.flow.raft import RAFT, RAFTConfig
from followyourclick_tpu.utils.convert import audit_params


def _torch_names_from_tree(variables):
    """Inverse of convert_mmflow_raft's mapping: flax path → mmflow key(s)."""
    rs = np.random.RandomState(0)
    sd = {}

    def put_conv(torch_prefix, leaf_tree):
        k = np.asarray(leaf_tree["kernel"])
        sd[f"{torch_prefix}.weight"] = rs.randn(
            *k.transpose(3, 2, 0, 1).shape).astype(np.float32)
        if "bias" in leaf_tree:
            sd[f"{torch_prefix}.bias"] = rs.randn(
                *leaf_tree["bias"].shape).astype(np.float32)

    def put_norm(torch_prefix, node, kind):
        inner = node.get("GroupNorm_0") or node.get("BatchNorm_0")
        c = np.asarray(inner["scale"]).shape[0]
        sd[f"{torch_prefix}.weight"] = rs.randn(c).astype(np.float32)
        sd[f"{torch_prefix}.bias"] = rs.randn(c).astype(np.float32)
        if kind == "batch":
            sd[f"{torch_prefix}.running_mean"] = rs.randn(c).astype(
                np.float32)
            sd[f"{torch_prefix}.running_var"] = (
                rs.rand(c).astype(np.float32) + 0.5)

    params = variables["params"]
    for enc_name, kind in (("encoder", "instance"), ("context", "batch")):
        enc = params[enc_name]
        put_conv(f"{enc_name}.conv1", enc["conv1"])
        put_conv(f"{enc_name}.conv2", enc["conv2"])
        put_norm(f"{enc_name}.norm1", enc["norm1"], kind)
        for layer in (1, 2, 3):
            for block in (0, 1):
                b = enc[f"layer{layer}_{block}"]
                src = f"{enc_name}.res_layer{layer}.{block}"
                put_conv(f"{src}.conv1", b["conv1"])
                put_conv(f"{src}.conv2", b["conv2"])
                put_norm(f"{src}.bn1", b["norm1"], kind)
                put_norm(f"{src}.bn2", b["norm2"], kind)
                if "downsample_conv" in b:
                    put_conv(f"{src}.downsample.0", b["downsample_conv"])
                    put_norm(f"{src}.downsample.1", b["downsample_norm"],
                             kind)
    dec = params["decoder"]
    put_conv("decoder.encoder.corr_net.0.conv", dec["encoder"]["corr_conv1"])
    put_conv("decoder.encoder.corr_net.1.conv", dec["encoder"]["corr_conv2"])
    put_conv("decoder.encoder.flow_net.0.conv", dec["encoder"]["flow_conv1"])
    put_conv("decoder.encoder.flow_net.1.conv", dec["encoder"]["flow_conv2"])
    put_conv("decoder.encoder.out_net.0.conv", dec["encoder"]["out_conv"])
    for gate in ("z", "r", "q"):
        for i in (0, 1):
            put_conv(f"decoder.gru.conv_{gate}.{i}.conv",
                     dec["gru"][f"conv_{gate}{i}"])
    put_conv("decoder.flow_pred.layers.0.conv", dec["flow_pred"]["conv"])
    put_conv("decoder.flow_pred.predict_layer", dec["flow_pred"]["predict"])
    put_conv("decoder.mask_pred.layers.0.conv", dec["mask_pred"]["conv"])
    put_conv("decoder.mask_pred.predict_layer", dec["mask_pred"]["predict"])
    return sd


def test_convert_mmflow_raft_structure():
    model = RAFT(RAFTConfig(iters=1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, iters=1)

    sd = _torch_names_from_tree(variables)
    converted = convert_mmflow_raft({"state_dict": sd})

    missing, unexpected, mismatched = audit_params(
        converted["params"], dict(variables["params"]))
    assert not missing, missing[:5]
    assert not unexpected, unexpected[:5]
    assert not mismatched, mismatched[:5]

    missing, unexpected, mismatched = audit_params(
        converted["batch_stats"], dict(variables["batch_stats"]))
    assert not missing, missing[:5]
    assert not unexpected, unexpected[:5]
    assert not mismatched, mismatched[:5]

    # layout round-trip: a conv kernel survives (out,in,kh,kw)->(kh,kw,in,out)
    np.testing.assert_array_equal(
        converted["params"]["encoder"]["conv1"]["kernel"],
        sd["encoder.conv1.weight"].transpose(2, 3, 1, 0),
    )

    # converted weights actually run
    out = model.apply(converted, x, x, iters=1)
    assert out.shape == (1, 64, 64, 2)
