"""Parameter partitioning rules for tensor-parallel UNet serving.

Megatron-style sharding of the transformer sublayers over the ``model`` mesh
axis (the scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives):

- attention q/k/v kernels: shard the *output* (head) dim → heads split across
  chips, attention itself is embarrassingly parallel per head;
- attention out-projection: shard the *input* dim → XLA inserts one
  reduce-scatter/all-reduce per attention block;
- GEGLU feed-forward: proj sharded on output, out sharded on input — same
  pattern;
- convolutions, norms, embeddings: replicated (they are bandwidth-cheap
  relative to the matmuls and resist channel sharding across GroupNorm
  boundaries).

Everything else (batch/frames) shards over ``data``.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# projections whose OUTPUT dim shards over 'model'
_COL_PARALLEL = ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip",
                 "q_proj", "k_proj", "v_proj", "mlp_fc1", "query", "key",
                 "value")
# projections whose INPUT dim shards over 'model'
_ROW_PARALLEL = ("to_out", "out_proj", "mlp_fc2", "proj_attn")


def _spec_for(path: Tuple[str, ...], leaf) -> P:
    names = [p for p in path]
    leaf_name = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    grandparent = names[-3] if len(names) >= 3 else ""

    if leaf_name == "kernel" and leaf.ndim == 2:
        if parent in _COL_PARALLEL:
            return P(None, "model")
        if parent in _ROW_PARALLEL:
            return P("model", None)
        if parent == "proj" and grandparent == "ff":
            return P(None, "model")   # GEGLU in-projection
        if parent == "out" and grandparent == "ff":
            return P("model", None)   # GEGLU out-projection
        return P(None, None)
    if leaf_name == "bias" and leaf.ndim == 1:
        if parent in _COL_PARALLEL or (parent == "proj" and grandparent == "ff"):
            return P("model")
        return P(None)
    # convs, norms, embeddings: replicated
    return P(*([None] * leaf.ndim))


def param_sharding_rules(params) -> dict:
    """PartitionSpec pytree matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path)
        specs[keys] = _spec_for(keys, leaf)

    def build(tree, prefix=()):
        if not isinstance(tree, dict):
            return specs[prefix]
        return {k: build(v, prefix + (k,)) for k, v in tree.items()}

    return build(params)


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh under the partitioning rules."""
    specs = param_sharding_rules(params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(
            leaf, NamedSharding(mesh, spec)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for activations/batches."""
    return NamedSharding(mesh, P("data"))
