"""Device mesh construction for GSPMD serving/training.

Replaces the reference's NCCL ``torch.distributed`` data parallelism
(``scripts/inference.py:44-51``, ``mmflow/apis/train.py:121-127``) with a
``jax.sharding.Mesh`` over ICI: the prompt set shards over the ``data`` axis,
and for batched serving the UNet shards attention/FF weights over ``model``
(BASELINE.json config 5). XLA inserts all collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` consumes remaining devices.

    The model axis is placed innermost so tensor-parallel collectives ride the
    fastest ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names)


def initialize_distributed() -> None:
    """Multi-host entry (one process per host, the JAX analogue of the
    reference's env:// NCCL rendezvous). No-op single-host."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def process_shard(num_items: int) -> range:
    """Host-level split of a work list (DistributedSampler semantics,
    reference scripts/inference.py:260)."""
    rank = jax.process_index()
    world = jax.process_count()
    per = (num_items + world - 1) // world
    return range(rank * per, min((rank + 1) * per, num_items))
