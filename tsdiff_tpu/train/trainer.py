"""Training: jitted update step, optimizer factory, checkpoints.

Mirrors the reference training semantics (reference train.py:124-231 +
utils/common.py:58-70): Adam (beta1 0.95 in production), global-norm gradient
clipping at max_grad_norm (3000), per-step loss = mean over real atoms, LR
driven by a host-side plateau controller on the validation loss.

The optimizer is optax ``scale_by_adam`` with the LR applied as a runtime
scalar argument — so LR changes from the host controller never retrace the
jitted step.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tsdiff_tpu.core.graph import ReactionBatch
from tsdiff_tpu.diffusion.objective import diffusion_loss
from tsdiff_tpu.diffusion.schedules import DiffusionSchedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # () int32
    # exponential moving average of params; None when EMA is disabled.
    # (Not in the reference — standard diffusion-training practice, opt-in
    # via config train.ema_decay; sampling prefers EMA params when present.)
    ema_params: Any = None


def make_optimizer(opt_config, max_grad_norm: float) -> optax.GradientTransformation:
    """Adam-only factory (reference utils/common.py:58-70) + global-norm clip
    (reference train.py:144).  LR is applied separately (see train_step)."""
    assert opt_config.type == "adam", f"Optimizer not supported: {opt_config.type}"
    txs = [
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(b1=opt_config.beta1, b2=opt_config.beta2),
    ]
    if opt_config.get("weight_decay", 0.0):
        txs.append(optax.add_decayed_weights(opt_config.weight_decay))
    return optax.chain(*txs)


def init_train_state(model, tx, params, ema_decay: float | None = None) -> TrainState:
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.asarray(0, jnp.int32),
        ema_params=params if ema_decay else None,
    )


def init_model_params(model, key, batch: ReactionBatch):
    """Initialize parameters for any model family from a probe batch."""
    from tsdiff_tpu.models.dualenc import DualEncoderEpsNetwork

    if isinstance(model, DualEncoderEpsNetwork):
        t = jnp.zeros((batch.batch_size,), jnp.int32)
        return model.init(
            key, batch.atom_type, batch.pos, batch.bond_mat, batch.node_mask,
            time_step=t,
        )
    return model.init(
        key,
        batch.atom_type, batch.r_feat, batch.p_feat,
        batch.pos, batch.bond_mat, batch.node_mask,
    )


def get_objective(
    model,
    schedule: DiffusionSchedule | None,
    t0: int = 0,
    t1: int | None = None,
    anneal_power: float = 2.0,
):
    """Loss dispatcher over model families (reference get_loss dispatch,
    condensenc.py:267 / dualenc.py:376-423):

      * CondenseEncoderEpsNetwork -> DDPM diffusion_loss;
      * DualEncoderEpsNetwork     -> dual_diffusion_loss or dual_dsm_loss
                                     by ``model_type``.
    Returns fn(params, batch, key) -> (loss, aux).
    """
    from tsdiff_tpu.models.condensenc import CondenseEncoderEpsNetwork
    from tsdiff_tpu.models.dualenc import DualEncoderEpsNetwork

    if isinstance(model, CondenseEncoderEpsNetwork):
        return lambda p, batch, key: diffusion_loss(
            model, p, schedule, batch, key, t0=t0, t1=t1
        )
    if isinstance(model, DualEncoderEpsNetwork):
        from tsdiff_tpu.diffusion.dual_objective import (
            dual_diffusion_loss,
            dual_dsm_loss,
        )

        # batches built from protein graphs carry is_sidechain (core/graph.py)
        # and train in sidechain mode transparently
        if model.model_type == "diffusion":
            return lambda p, batch, key: dual_diffusion_loss(
                model, p, schedule, batch, key, anneal_power=anneal_power,
                is_sidechain=batch.is_sidechain,
            )
        return lambda p, batch, key: dual_dsm_loss(
            model, p, batch, key, anneal_power=anneal_power,
            is_sidechain=batch.is_sidechain,
        )
    raise NotImplementedError(f"No objective for {type(model).__name__}")


def make_train_step(
    model, tx, schedule: DiffusionSchedule, t0: int = 0, t1: int | None = None,
    anneal_power: float = 2.0, ema_decay: float | None = None,
):
    """Returns jitted (state, batch, key, lr) -> (state, metrics).

    ``ema_decay`` (e.g. 0.999) maintains ``state.ema_params`` with the
    step-warmed decay ``min(decay, (1+step)/(10+step))`` so early EMA is not
    biased toward the random init."""
    objective = get_objective(model, schedule, t0=t0, t1=t1, anneal_power=anneal_power)

    def train_step(state: TrainState, batch: ReactionBatch, key, lr):
        def loss_fn(p):
            return objective(p, batch, key)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        ema = state.ema_params
        if ema_decay is not None and ema is not None:
            d = jnp.minimum(ema_decay, (1.0 + step) / (10.0 + step))
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), ema, params
            )
        metrics = {
            "loss": loss,
            "loss_sum": aux["loss_sum"],
            "n_nodes": aux["n_nodes"],
            "grad_norm": grad_norm,
        }
        return TrainState(params, opt_state, step, ema), metrics

    return jax.jit(train_step)


def make_resident_train_step(train_step, batch_size: int, batch_sharding=None):
    """Wrap a jitted train step for the device-resident input pipeline
    (data/resident.py): assemble the batch ON DEVICE from the resident
    bucket arrays + plan at a device cursor, then run the step.  The
    steady-state loop transfers nothing host->device.

    Returns jitted (state, arrays, plan, cursor, key, lr) ->
    (state, metrics, cursor+1)."""
    from tsdiff_tpu.data.resident import gather_batch

    def step(state, arrays, plan, cursor, key, lr):
        batch = gather_batch(arrays, plan, cursor, batch_size)
        if batch_sharding is not None:
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        state, metrics = train_step(state, batch, key, lr)
        return state, metrics, cursor + 1

    return jax.jit(step)


def make_resident_eval_step(eval_step, batch_size: int, batch_sharding=None):
    """Validation twin of :func:`make_resident_train_step`: gathers batch
    ``cursor`` of the fixed plan and returns (loss_sum, n_nodes)."""
    from tsdiff_tpu.data.resident import gather_batch

    def step(params, arrays, plan, cursor, key):
        batch = gather_batch(arrays, plan, cursor, batch_size)
        if batch_sharding is not None:
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        return eval_step(params, batch, key)

    return jax.jit(step)


def make_eval_step(
    model, schedule: DiffusionSchedule, t0: int = 0, t1: int | None = None,
    anneal_power: float = 2.0,
):
    """Jitted validation step: per-batch (loss_sum, n_nodes) so the caller can
    average over the full set (reference train.py:154-174)."""
    objective = get_objective(model, schedule, t0=t0, t1=t1, anneal_power=anneal_power)

    def eval_step(params, batch: ReactionBatch, key):
        _, aux = objective(params, batch, key)
        return aux["loss_sum"], aux["n_nodes"]

    return jax.jit(eval_step)


# ---------------------------------------------------------------------------
# Checkpointing: self-describing (embedded config), torch-free pickle of
# numpy-ified pytrees (reference train.py:220-231; sampling reconstructs the
# model from the embedded config, reference sampling.py:124-130).
# ---------------------------------------------------------------------------


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    config,
    state: TrainState,
    scheduler_state: dict | None = None,
    iteration: int | None = None,
    avg_val_loss: float | None = None,
):
    payload = {
        "format": "tsdiff_tpu.ckpt.v1",
        "config": config.to_dict() if hasattr(config, "to_dict") else dict(config),
        "params": _to_numpy(state.params),
        "opt_state": _to_numpy(state.opt_state),
        "ema_params": _to_numpy(state.ema_params) if state.ema_params is not None else None,
        "scheduler": scheduler_state,
        "iteration": int(iteration if iteration is not None else state.step),
        "avg_val_loss": avg_val_loss,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def _ordered_leaves(x):
    """Leaves of an orbax-restored container in the ORIGINAL tuple order.

    Orbax restores tuples/NamedTuples as dicts keyed "0", "1", ...; JAX's
    ``tree_leaves`` orders dict keys lexicographically ("10" < "2"), which
    would scramble any chain with more than 10 elements.  Sort integer-string
    keys numerically instead; everything else follows JAX's sorted-key order.
    """
    if isinstance(x, dict):
        keys = list(x.keys())
        if keys and all(isinstance(k, str) and k.isdigit() for k in keys):
            keys.sort(key=int)
        else:
            keys.sort()
        return [leaf for k in keys for leaf in _ordered_leaves(x[k])]
    if isinstance(x, (list, tuple)):
        return [leaf for v in x for leaf in _ordered_leaves(v)]
    return [x]


def restore_opt_state(template, restored):
    """Rebuild an optax opt_state from a checkpoint payload.

    The pickle backend round-trips the optax NamedTuple structure; the orbax
    backend restores nested plain containers (tuples/NamedTuples come back
    as dicts keyed "0","1",...), so reshape the restored LEAVES into the
    template's structure, with integer-string dict keys ordered numerically
    (``_ordered_leaves``) so >10-element optax chains don't scramble.
    """
    tmpl_def = jax.tree_util.tree_structure(template)
    if jax.tree_util.tree_structure(restored) == tmpl_def:
        return jax.tree_util.tree_map(jnp.asarray, restored)
    leaves = _ordered_leaves(restored)
    tmpl_leaves = jax.tree_util.tree_leaves(template)
    if len(leaves) != len(tmpl_leaves):
        raise ValueError(
            f"opt_state leaf count mismatch: checkpoint {len(leaves)} vs "
            f"optimizer {len(tmpl_leaves)} (different optimizer config?)"
        )
    return jax.tree_util.tree_unflatten(
        tmpl_def, [jnp.asarray(x) for x in leaves]
    )


def load_checkpoint(path: str) -> dict:
    """Load any supported checkpoint: tsdiff_tpu pickle (default), orbax
    directory, or a reference torch ``.pt`` file (reference train.py:220-231)
    — the latter is converted in memory via the torch-free reader, so the
    reference README's exact sampling command works against original
    ``best_ckpt.pt`` artifacts with no conversion step."""
    if os.path.isdir(path):
        from tsdiff_tpu.train.orbax_io import load_checkpoint_orbax

        return load_checkpoint_orbax(path)
    import zipfile

    def _is_torch_zip(p: str) -> bool:
        # zipfile.is_zipfile only scans for a trailing EOCD record and can
        # false-positive on a pickle that embeds zip bytes; require the torch
        # container layout (an `<archive>/data.pkl` member) before converting
        if not zipfile.is_zipfile(p):
            return False
        try:
            with zipfile.ZipFile(p) as zf:
                return any(
                    name == "data.pkl" or name.endswith("/data.pkl")
                    for name in zf.namelist()
                )
        except zipfile.BadZipFile:
            return False

    if _is_torch_zip(path):  # torch>=1.6 zip container
        from tsdiff_tpu.data.convert import convert_reference_checkpoint

        return convert_reference_checkpoint(path)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if not (isinstance(payload, dict) and payload.get("format") == "tsdiff_tpu.ckpt.v1"):
        raise ValueError(
            f"unrecognized checkpoint format in {path}: expected a "
            "tsdiff_tpu.ckpt.v1 pickle, an orbax directory, or a torch>=1.6 "
            "zip-container .pt file (legacy tar-format torch<1.6 .pt files "
            "are not supported — re-save them with a modern torch first)"
        )
    return payload


def select_params(ck: dict, use_ema: bool) -> tuple[dict, bool]:
    """EMA-or-raw parameter selection shared by sampling/serving/soup:
    returns ``(params, used_ema)`` — EMA weights when asked for AND present,
    else the raw params (callers warn on the False case as they see fit)."""
    if use_ema and ck.get("ema_params") is not None:
        return ck["ema_params"], True
    return ck["params"], False


def get_checkpoint_path(ckpt_dir: str, it: int | None = None) -> tuple[str, int]:
    """Latest (or specific) '<iteration>.ckpt' file or '<iteration>.orbax'
    directory in a directory (reference utils/misc.py:106-113)."""
    entries = {}
    for f in os.listdir(ckpt_dir):
        stem, _, ext = f.partition(".")
        if ext in ("ckpt", "orbax") and stem.isdigit():
            entries[int(stem)] = f
    if not entries:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    chosen = it if it is not None else max(entries)
    if chosen not in entries:
        raise FileNotFoundError(f"no checkpoint for iteration {chosen} in {ckpt_dir}")
    return os.path.join(ckpt_dir, entries[chosen]), chosen
