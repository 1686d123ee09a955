"""Training loop driver: data → sharded train steps → Orbax checkpoints.

Behavior spec: the reference released only the config (SURVEY.md §0); loop
semantics reconstructed from
``configs/training/training_14M_448x256_...yaml`` (50k steps, checkpoint
every 2k, ``need_resume: true``, validation every N steps, temporal
multi-scale training) and mmflow's ``train_model`` auto-resume pattern
(``mmflow/apis/train.py:228-236``).

TPU-first: one jitted sharded step; Orbax for checkpoint/resume (replacing
torch pickles); host-side data feeding with device prefetch.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class LoopConfig:
    output_dir: str = "outputs/train"
    max_train_steps: int = 50_000
    checkpointing_steps: int = 2_000
    log_every: int = 50
    need_resume: bool = True
    keep_checkpoints: int = 5
    # temporal multi-scale training: randomly subsample frames per step
    # (use_temporal_multi_scale_training in the reference config)
    temporal_multi_scale: bool = True
    min_frames: int = 8
    # validation sampling cadence (reference `validation_steps` +
    # `validation_steps_tuple`: extra one-off validation points early on)
    validation_steps: int = 0  # 0 = no periodic validation
    validation_steps_tuple: tuple = ()


def make_checkpoint_manager(directory: str, keep: int = 5):
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def _state_payload(state) -> dict:
    """Checkpoint payload for either TrainState (full tree) or
    PartitionedTrainState (trainable/frozen split)."""
    if hasattr(state, "trainable"):
        return {"trainable": state.trainable, "frozen": state.frozen,
                "opt_state": state.opt_state, "step": state.step}
    return {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}


def save_checkpoint(manager, step: int, state) -> None:
    import orbax.checkpoint as ocp

    manager.save(step, args=ocp.args.StandardSave(_state_payload(state)))


def restore_checkpoint(manager, state):
    """Resume from the latest checkpoint if one exists (auto-resume)."""
    import orbax.checkpoint as ocp

    latest = manager.latest_step()
    if latest is None:
        return state, 0
    target = _state_payload(state)
    restored = manager.restore(latest,
                               args=ocp.args.StandardRestore(target))
    kwargs = {k: restored[k] for k in target}
    state = state.replace(**kwargs)
    return state, int(latest)


def _subsample_frames(batch, rng: np.random.RandomState, min_frames: int):
    """Temporal multi-scale: random frame-count crop for this step."""
    f = batch.latents.shape[1]
    if f <= min_frames:
        return batch
    nf = int(rng.choice([min_frames, (min_frames + f) // 2, f]))
    if nf == f:
        return batch
    start = rng.randint(0, f - nf + 1)
    return batch.replace(latents=batch.latents[:, start:start + nf])


def train_loop(
    state,
    data_iter: Iterator,
    step_fn: Callable,
    cfg: LoopConfig,
    rng: Optional[jax.Array] = None,
    on_log: Optional[Callable] = None,
    validation_fn: Optional[Callable] = None,
):
    """Run the loop; returns the final state. ``step_fn(state, batch, rng)``
    must be the jitted sharded train step.

    ``validation_fn(step, params)`` (if given) is called at every
    ``cfg.validation_steps`` interval and at each step in
    ``cfg.validation_steps_tuple`` — the reference config's validation
    sampling schedule (its prompts/guidance live with the caller, which
    typically wraps an ``AnimationPipeline`` around the current params)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    manager = make_checkpoint_manager(
        os.path.join(cfg.output_dir, "checkpoints"), cfg.keep_checkpoints)
    start_step = 0
    if cfg.need_resume:
        state, start_step = restore_checkpoint(manager, state)
        if start_step:
            print(f"[train_loop] resumed from step {start_step}")

    host_rng = np.random.RandomState(1234 + start_step)
    t0 = time.time()
    for step in range(start_step, cfg.max_train_steps):
        batch = next(data_iter)
        if cfg.temporal_multi_scale:
            batch = _subsample_frames(batch, host_rng, cfg.min_frames)
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, step_rng)

        if (step + 1) % cfg.log_every == 0:
            loss = float(metrics["loss"])
            dt = (time.time() - t0) / cfg.log_every
            t0 = time.time()
            msg = (f"step {step + 1}/{cfg.max_train_steps} "
                   f"loss={loss:.4f} {dt * 1e3:.0f} ms/step")
            print(msg)
            if on_log is not None:
                on_log(step + 1, metrics)
        if (step + 1) % cfg.checkpointing_steps == 0:
            save_checkpoint(manager, step + 1, state)
        if validation_fn is not None and (
                (cfg.validation_steps and
                 (step + 1) % cfg.validation_steps == 0)
                or (step + 1) in cfg.validation_steps_tuple):
            validation_fn(step + 1, state.params)
    manager.wait_until_finished()
    return state
