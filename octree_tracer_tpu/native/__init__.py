"""ctypes bindings for the native host runtime (libotcore.so).

The library is optional: every entry point has a pure-numpy fallback in the
package, so a missing build degrades gracefully. ``load()`` builds lazily via
``make`` when a compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libotcore.so")
_lib = None
_tried = False


class OtPool(ctypes.Structure):
    _fields_ = [
        ("nodes", ctypes.POINTER(ctypes.c_uint32)),
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("len", ctypes.c_uint64),
        ("cap", ctypes.c_uint64),
        ("holes", ctypes.POINTER(ctypes.c_uint32)),
        ("hole_len", ctypes.c_uint64),
        ("hole_cap", ctypes.c_uint64),
    ]


class OtChunk(ctypes.Structure):
    _fields_ = [
        ("id", ctypes.c_uint32),
        ("n", ctypes.c_uint32),
        ("ptrs", ctypes.POINTER(ctypes.c_uint32)),
        ("vals", ctypes.POINTER(ctypes.c_uint32)),
    ]


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load():
    """Return the loaded library or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.otc_process_subdivision.restype = ctypes.c_int64
    lib.otc_process_unsubdivision.restype = ctypes.c_int64
    lib.otc_build_leaves.restype = ctypes.c_void_p
    lib.otc_stamp_leaves.restype = ctypes.c_void_p
    lib.otc_build_dense.restype = ctypes.c_void_p
    lib.otc_load_rsvo.restype = ctypes.c_void_p
    lib.otc_buf_len.restype = ctypes.c_uint64
    lib.otc_buf_len.argtypes = [ctypes.c_void_p]
    lib.otc_buf_copy.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.otc_buf_free.argtypes = [ctypes.c_void_p]
    lib.otc_mip_tree.restype = ctypes.c_uint32
    lib.otc_patch_refs.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def chunk_views(world) -> tuple:
    """Build OtChunk views over a World's resident chunks. Returns
    (ctypes array, keepalive list)."""
    items = [
        (cid, c) for cid, c in world.chunks.items() if len(c) >= 8
    ]
    arr = (OtChunk * max(1, len(items)))()
    keep = []
    for i, (cid, c) in enumerate(items):
        ptrs = np.ascontiguousarray(c.pointers)
        vals = np.ascontiguousarray(c.values)
        keep.append((ptrs, vals))
        arr[i] = OtChunk(
            np.uint32(cid), np.uint32(len(c)), _u32p(ptrs), _u32p(vals)
        )
    return arr, len(items), keep


def build_leaves(pos: np.ndarray, leaf_ptrs: np.ndarray, leaf_vals: np.ndarray,
                 depth: int):
    """Insertion-order octree build; returns (pointers, values) arrays."""
    lib = load()
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    leaf_ptrs = np.ascontiguousarray(leaf_ptrs, dtype=np.uint32)
    leaf_vals = np.ascontiguousarray(leaf_vals, dtype=np.uint32)
    h = lib.otc_build_leaves(
        _f32p(pos), _u32p(leaf_ptrs), _u32p(leaf_vals),
        ctypes.c_uint64(pos.shape[0]), ctypes.c_uint32(depth),
    )
    n = lib.otc_buf_len(h)
    ptrs = np.empty(n, dtype=np.uint32)
    vals = np.empty(n, dtype=np.uint32)
    lib.otc_buf_copy(h, _u32p(ptrs), _u32p(vals))
    lib.otc_buf_free(h)
    return ptrs, vals


def stamp_leaves(ptrs: np.ndarray, vals: np.ndarray, pos: np.ndarray,
                 leaf_ptrs: np.ndarray, leaf_vals: np.ndarray, depth: int):
    """Stamp leaves into an existing (pointers, values) tree; returns the
    new (pointers, values) — bit-identical to a Python put_in_block loop in
    the same order."""
    lib = load()
    ptrs = np.ascontiguousarray(ptrs, dtype=np.uint32)
    vals = np.ascontiguousarray(vals, dtype=np.uint32)
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    leaf_ptrs = np.ascontiguousarray(leaf_ptrs, dtype=np.uint32)
    leaf_vals = np.ascontiguousarray(leaf_vals, dtype=np.uint32)
    h = lib.otc_stamp_leaves(
        _u32p(ptrs), _u32p(vals), ctypes.c_uint64(ptrs.shape[0]),
        _f32p(pos), _u32p(leaf_ptrs), _u32p(leaf_vals),
        ctypes.c_uint64(pos.shape[0]), ctypes.c_uint32(depth),
    )
    n = lib.otc_buf_len(h)
    out_p = np.empty(n, dtype=np.uint32)
    out_v = np.empty(n, dtype=np.uint32)
    lib.otc_buf_copy(h, _u32p(out_p), _u32p(out_v))
    lib.otc_buf_free(h)
    return out_p, out_v


def build_dense(packed: np.ndarray, depth: int):
    """Dense-grid level-synchronous octree build from a 2-bit-packed S^3
    block-id grid (S = 2^depth, flat C-order cells, 16 per u32, cell i in
    bits [2i, 2i+1]). Bit-identical to io/vox.py build_octree_leaves over the
    grid's occupied cells with (CHUNK_OFFSET + id, 0) leaves. Returns
    (pointers, values)."""
    lib = load()
    packed = np.ascontiguousarray(packed, dtype=np.uint32).reshape(-1)
    expect = (1 << (3 * depth)) // 16
    if packed.shape[0] != expect:
        raise ValueError(f"packed grid has {packed.shape[0]} words, "
                         f"expected {expect} for depth {depth}")
    h = lib.otc_build_dense(_u32p(packed), ctypes.c_uint32(depth))
    n = lib.otc_buf_len(h)
    ptrs = np.empty(n, dtype=np.uint32)
    vals = np.empty(n, dtype=np.uint32)
    lib.otc_buf_copy(h, _u32p(ptrs), _u32p(vals))
    lib.otc_buf_free(h)
    return ptrs, vals


def load_rsvo_masks(masks: np.ndarray, node_end: int):
    """BFS expansion of an .rsvo mask stream; returns (pointers, values)."""
    lib = load()
    masks = np.ascontiguousarray(masks, dtype=np.uint8)
    h = lib.otc_load_rsvo(
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_uint64(masks.shape[0]),
        ctypes.c_uint64(node_end),
    )
    n = lib.otc_buf_len(h)
    ptrs = np.empty(n, dtype=np.uint32)
    vals = np.empty(n, dtype=np.uint32)
    lib.otc_buf_copy(h, _u32p(ptrs), _u32p(vals))
    lib.otc_buf_free(h)
    return ptrs, vals


def patch_refs(pointers: np.ndarray, values: np.ndarray,
               ids: np.ndarray, mips: np.ndarray) -> None:
    """Write each referenced chunk's top-mip colour into the values of the
    nodes referencing it (one linear pass; reference: src/world.rs:246-255)."""
    lib = load()
    assert values.flags["C_CONTIGUOUS"]
    order = np.argsort(ids, kind="stable")
    ids = np.ascontiguousarray(ids[order], dtype=np.uint32)
    mips = np.ascontiguousarray(mips[order], dtype=np.uint32)
    lib.otc_patch_refs(
        _u32p(np.ascontiguousarray(pointers)), _u32p(values),
        ctypes.c_uint64(pointers.shape[0]),
        _u32p(ids), _u32p(mips), ctypes.c_uint32(ids.shape[0]),
    )


def mip_tree(pointers: np.ndarray, values: np.ndarray) -> int:
    """In-place bottom-up mip averaging; returns the top mip colour. Chunk-ref
    values must be pre-patched by the caller."""
    lib = load()
    assert values.flags["C_CONTIGUOUS"]
    return int(
        lib.otc_mip_tree(
            _u32p(np.ascontiguousarray(pointers)), _u32p(values),
            ctypes.c_uint64(pointers.shape[0]),
        )
    )
