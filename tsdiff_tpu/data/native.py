"""ctypes binding for the native batch packer (native/graphbuild.cpp).

Auto-builds ``native/build/libgraphbuild.so`` with make on first use when a
toolchain is available; falls back to the pure-numpy packer otherwise.  The
public entry is :func:`pack_batch_native` with the same output contract as
``tsdiff_tpu.core.graph.from_numpy_graphs`` (verified by tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libgraphbuild.so")
_lib = None
_lib_tried = False


def _load_library():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pack_batch.restype = ctypes.c_int32
    lib.pack_batch.argtypes = [
        i32p, f32p, f32p, f32p, i32p, i32p, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, f32p, f32p, f32p, i32p, u8p,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_batch_native(graphs: list[dict], max_nodes: int):
    """Pack graph dicts into padded numpy buffers via the C++ kernel.

    Returns (atom_type, r_feat, p_feat, pos, bond_mat, node_mask) numpy
    arrays, or None when the native library is unavailable or a graph lacks
    sparse edges (the python path handles dense ``bond_mat`` inputs).
    """
    lib = _load_library()
    if lib is None or any("edge_index" not in g for g in graphs):
        return None

    B, N = len(graphs), max_nodes
    F = int(np.asarray(graphs[0]["r_feat"]).shape[-1])

    node_off = np.zeros(B + 1, np.int64)
    edge_off = np.zeros(B + 1, np.int64)
    for b, g in enumerate(graphs):
        node_off[b + 1] = node_off[b] + np.asarray(g["atom_type"]).shape[0]
        edge_off[b + 1] = edge_off[b] + np.asarray(g["edge_type"]).shape[0]

    def cat(key, dtype, shape_tail=()):
        arrs = [np.ascontiguousarray(np.asarray(g[key], dtype=dtype)) for g in graphs]
        if not arrs:
            return np.zeros((0, *shape_tail), dtype)
        return np.ascontiguousarray(np.concatenate(arrs, axis=0))

    atom_cat = cat("atom_type", np.int32)
    rf_cat = cat("r_feat", np.float32)
    pf_cat = cat("p_feat", np.float32)
    pos_list = [
        np.asarray(g.get("pos"), np.float32)
        if g.get("pos") is not None
        else np.zeros((np.asarray(g["atom_type"]).shape[0], 3), np.float32)
        for g in graphs
    ]
    pos_cat = np.ascontiguousarray(
        np.concatenate(pos_list, axis=0) if pos_list else np.zeros((0, 3), np.float32)
    )
    # edges as (sum_e, 2) row pairs
    ei_cat = np.ascontiguousarray(
        np.concatenate(
            [np.asarray(g["edge_index"], np.int32).T for g in graphs], axis=0
        )
        if edge_off[-1]
        else np.zeros((0, 2), np.int32)
    )
    et_cat = cat("edge_type", np.int32)

    out_atom = np.zeros((B, N), np.int32)
    out_rf = np.zeros((B, N, F), np.float32)
    out_pf = np.zeros((B, N, F), np.float32)
    out_pos = np.zeros((B, N, 3), np.float32)
    out_bond = np.zeros((B, N, N), np.int32)
    out_mask = np.zeros((B, N), np.uint8)

    rc = lib.pack_batch(
        _ptr(atom_cat, ctypes.c_int32),
        _ptr(rf_cat, ctypes.c_float),
        _ptr(pf_cat, ctypes.c_float),
        _ptr(pos_cat, ctypes.c_float),
        _ptr(ei_cat, ctypes.c_int32),
        _ptr(et_cat, ctypes.c_int32),
        _ptr(node_off, ctypes.c_int64),
        _ptr(edge_off, ctypes.c_int64),
        B, N, F,
        _ptr(out_atom, ctypes.c_int32),
        _ptr(out_rf, ctypes.c_float),
        _ptr(out_pf, ctypes.c_float),
        _ptr(out_pos, ctypes.c_float),
        _ptr(out_bond, ctypes.c_int32),
        _ptr(out_mask, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError(f"pack_batch failed (rc={rc}): a graph exceeds max_nodes={N}?")
    return out_atom, out_rf, out_pf, out_pos, out_bond, out_mask.astype(bool)
