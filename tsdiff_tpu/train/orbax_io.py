"""Orbax checkpoint backend (optional, production-grade).

The default checkpoint format is the self-describing pickle
(train/trainer.py:save_checkpoint — torch-free, single file, atomic
os.replace).  This module adds an orbax-backed alternative for production
training (`--ckpt_backend orbax` in the train CLI): asynchronous saves
(checkpoint I/O overlaps the next training steps), per-array files, and
orbax's own atomicity guarantees.  Payload layout matches the pickle format
exactly, so `load_checkpoint` returns the same dict either way and the
sampling/conversion tooling is backend-agnostic.

A checkpoint is a DIRECTORY ``<iter>.orbax/`` containing the orbax tree
(params / opt_state / ema_params) plus ``meta.json`` (config, scheduler
state, iteration, avg_val_loss).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax  # noqa: F401 (tree ops via trainer helper)
import numpy as np  # noqa: F401

from tsdiff_tpu.train.trainer import _to_numpy

_FORMAT = "tsdiff_tpu.ckpt.orbax.v1"
_async_checkpointer = None


def _checkpointer():
    global _async_checkpointer
    if _async_checkpointer is None:
        import orbax.checkpoint as ocp

        _async_checkpointer = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_checkpointer


def save_checkpoint_orbax(
    path: str,
    config,
    state,
    scheduler_state: dict | None = None,
    iteration: int | None = None,
    avg_val_loss: float | None = None,
) -> None:
    """Async save; returns immediately (training overlaps the write).

    ``path`` is the checkpoint directory (conventionally ``<iter>.orbax``).
    Call :func:`wait_for_saves` before process exit.
    """
    tree = {"params": _to_numpy(state.params), "opt_state": _to_numpy(state.opt_state)}
    if state.ema_params is not None:
        tree["ema_params"] = _to_numpy(state.ema_params)
    path = os.path.abspath(path)
    cp = _checkpointer()
    cp.save(path, args=_standard_save_args(tree), force=True)
    meta = {
        "format": _FORMAT,
        "config": config.to_dict() if hasattr(config, "to_dict") else dict(config),
        "scheduler": scheduler_state,
        "iteration": int(iteration if iteration is not None else state.step),
        "avg_val_loss": avg_val_loss,
        "has_ema": state.ema_params is not None,
    }
    # meta is tiny — write it synchronously next to the (async) orbax dir;
    # load waits on the orbax barrier, so a meta without the tree is
    # detected by orbax itself
    tmp = path + ".meta.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path + ".meta.json")


def _standard_save_args(tree):
    import orbax.checkpoint as ocp

    return ocp.args.StandardSave(tree)


def wait_for_saves() -> None:
    """Barrier on all outstanding async checkpoint writes."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def load_checkpoint_orbax(path: str) -> dict[str, Any]:
    """Load an orbax checkpoint dir into the pickle-format payload dict."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    assert meta.get("format") == _FORMAT, f"unknown orbax checkpoint format in {path}"
    wait_for_saves()
    with ocp.StandardCheckpointer() as cp:
        tree = cp.restore(path)
    return {
        "format": "tsdiff_tpu.ckpt.v1",
        "config": meta["config"],
        "params": tree["params"],
        "opt_state": tree.get("opt_state"),
        "ema_params": tree.get("ema_params"),
        "scheduler": meta.get("scheduler"),
        "iteration": meta.get("iteration", 0),
        "avg_val_loss": meta.get("avg_val_loss"),
    }
