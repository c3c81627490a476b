"""Native (C++) host runtime for cuba_tpu.

The reference implements its entire host runtime in C++17 (reference:
src/cuda_bundle_adjustment.cpp, src/sparse_block_matrix.cpp); here the
TPU numeric path is JAX/XLA but the once-per-initialize() symbolic
"problem compiler" has a C++ implementation too, bound via ctypes.  The
library is built on first use with g++ (no pybind11 dependency); if no
toolchain is available the pure-NumPy path in solver/structure.py is used.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "symbolic.cpp")
# the ABI version is part of the FILENAME: dlopen caches loaded objects by
# pathname, so an in-process "rebuild and reload the same path" can never
# replace a stale mapping — versioned names make a stale-ABI .so simply not
# load in the first place (see _ABI_VERSION below)
_LIB_PATH = os.path.join(_HERE, "_libcuba_native.abi2.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

# Required ABI of _libcuba_native.so (must equal symbolic.cpp's
# ba_abi_version).  hasattr() feature probes cannot distinguish a stale
# library whose exported functions have a different signature or buffer
# contract — e.g. an old .so exporting ba_fsp_* but planning at a hardcoded
# chunk size would make ba_fsp_copy overflow the geometry-sized buffers.
_ABI_VERSION = 2


def _lib_abi(lib: ctypes.CDLL) -> int:
    if not hasattr(lib, "ba_abi_version"):
        return 0
    lib.ba_abi_version.restype = ctypes.c_int32
    lib.ba_abi_version.argtypes = []
    return int(lib.ba_abi_version())


def _build() -> bool:
    # compile to a temp path then rename: atomic, and never truncates a
    # still-mapped .so in place (dlopen'd mappings keep the old inode alive)
    tmp = _LIB_PATH + f".tmp.{os.getpid()}"
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        tmp,
        _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ba_symbolic_compile.restype = ctypes.c_void_p
    lib.ba_symbolic_compile.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    for name in ("ba_n_hpl", "ba_n_hsc", "ba_n_mul"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.ba_copy_hpl.argtypes = [ctypes.c_void_p, i32p, i32p, i32p]
    lib.ba_copy_hsc.argtypes = [ctypes.c_void_p, i32p, i32p]
    lib.ba_copy_mul.argtypes = [ctypes.c_void_p, i32p, i32p, i32p]
    lib.ba_symbolic_free.argtypes = [ctypes.c_void_p]
    return lib


def _tune_allocator() -> None:
    """Keep large allocations on the persistent heap.

    glibc serves allocations >128KB via mmap and munmaps them on free, so
    every symbolic pass / constant-packing call re-faults its working set
    from the kernel (~50MB/s on single-core VMs — measured 0.9s of noise
    per bench trial at kitti00 scale, docs/PERF_NOTES.md).  Raising the
    mmap threshold and disabling trim keeps freed pages warm for the next
    NumPy/C++ allocation.  Process-wide, deliberately: the reference's
    answer to the same problem class is its device-memory arena
    (reference: include/device_buffer.h - single resizable allocation)."""
    try:
        libc = ctypes.CDLL(None)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except (OSError, AttributeError):
        pass


_tune_allocator()


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CUBA_TPU_NO_NATIVE"):
            return None
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                _SRC
            ):
                if not _build():
                    return None
            lib = ctypes.CDLL(_LIB_PATH)
            if _lib_abi(lib) != _ABI_VERSION:
                # The ABI-versioned filename makes this near-impossible (a
                # file at this name claiming another ABI is corrupt or
                # malicious); running it risks buffer overflows and an
                # in-process reload cannot work anyway (dlopen caches by
                # pathname), so fall back to the NumPy path for this
                # process — the next process gets a fresh build because we
                # remove the bad file.
                try:
                    os.unlink(_LIB_PATH)
                except OSError:
                    pass
                return None
            _lib = _bind(lib)
        except OSError:
            _lib = None
    return _lib


def _bind_fsp(lib: ctypes.CDLL) -> None:
    i32p = ctypes.POINTER(ctypes.c_int32)
    for name in ("ba_fsp_kwin", "ba_fsp_ok"):
        getattr(lib, name).restype = ctypes.c_int32
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ("ba_fsp_chunks", "ba_fsp_slot_pad", "ba_fsp_hsc_pad"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.ba_fsp_copy.argtypes = [ctypes.c_void_p, i32p, i32p, i32p, i32p, i32p]


def symbolic_compile(e_pi: np.ndarray, e_li: np.ndarray, num_p: int, num_l: int,
                     sc_geom: tuple = (1024, 512, 1024)):
    """Run the C++ symbolic pass.  Returns the same tuple as the NumPy path:
    (hpl_row, hpl_col, edge2hpl, hsc_row, hsc_col, mul_i, mul_j, mul_k,
    schur_plan) — or None when the native library is
    unavailable.  ``schur_plan`` is the fused Schur chunk plan
    ((chunk, slot_block, max_kwin), kwin, ok, C, n_slot_pad, n_hsc_pad,
    sb, li, lj, lk, gid) computed in the same C++ pass at the requested
    geometry ``sc_geom`` (self-describing: segmm.plan_schur consumes it
    only when the session geometry matches), or None on a stale library
    without the fused getters.
    """
    lib = get_lib()
    if lib is None:
        return None
    e_pi = np.ascontiguousarray(e_pi, dtype=np.int32)
    e_li = np.ascontiguousarray(e_li, dtype=np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)

    def ptr(a):
        return a.ctypes.data_as(i32p)

    sp_chunk, sp_sb, sp_mk = (int(v) for v in sc_geom)
    h = lib.ba_symbolic_compile(ptr(e_pi), ptr(e_li), e_pi.size, int(num_p), int(num_l),
                                sp_chunk, sp_sb, sp_mk)
    try:
        n_hpl = lib.ba_n_hpl(h)
        n_hsc = lib.ba_n_hsc(h)
        n_mul = lib.ba_n_mul(h)
        hpl_row = np.empty(n_hpl, np.int32)
        hpl_col = np.empty(n_hpl, np.int32)
        edge2hpl = np.empty(e_pi.size, np.int32)
        lib.ba_copy_hpl(h, ptr(hpl_row), ptr(hpl_col), ptr(edge2hpl))
        hsc_row = np.empty(n_hsc, np.int32)
        hsc_col = np.empty(n_hsc, np.int32)
        lib.ba_copy_hsc(h, ptr(hsc_row), ptr(hsc_col))
        mul_i = np.empty(n_mul, np.int32)
        mul_j = np.empty(n_mul, np.int32)
        mul_k = np.empty(n_mul, np.int32)
        lib.ba_copy_mul(h, ptr(mul_i), ptr(mul_j), ptr(mul_k))
        schur_plan = None
        # get_lib() hard-gates on _ABI_VERSION, so the fused-plan getters
        # are guaranteed present AND to honor the geometry args (an old .so
        # exporting them but planning at a hardcoded chunk would overflow
        # the C*sp_chunk buffers below); the explicit check is belt-and-
        # braces for callers holding a lib handle from elsewhere
        if _lib_abi(lib) >= 2:
            if not getattr(lib, "_fsp_bound", False):
                _bind_fsp(lib)
                lib._fsp_bound = True
            kwin = lib.ba_fsp_kwin(h)
            ok = bool(lib.ba_fsp_ok(h))
            C = lib.ba_fsp_chunks(h)
            n_slot_pad = lib.ba_fsp_slot_pad(h)
            n_hsc_pad = lib.ba_fsp_hsc_pad(h)
            sb = np.empty(C, np.int32)
            li = np.empty(C * sp_chunk, np.int32)
            lj = np.empty(C * sp_chunk, np.int32)
            lk = np.empty(C * sp_chunk, np.int32)
            gid = np.empty(C * kwin, np.int32)
            lib.ba_fsp_copy(h, ptr(sb), ptr(li), ptr(lj), ptr(lk), ptr(gid))
            schur_plan = ((sp_chunk, sp_sb, sp_mk),
                          kwin, ok, int(C), int(n_slot_pad), int(n_hsc_pad),
                          sb, li, lj, lk, gid)
    finally:
        lib.ba_symbolic_free(h)
    return (
        hpl_row,
        hpl_col,
        edge2hpl,
        hsc_row,
        hsc_col,
        mul_i,
        mul_j,
        mul_k,
        schur_plan,
    )


def _bind_tile_minmax(lib: ctypes.CDLL) -> None:
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ba_tile_minmax.restype = None
    lib.ba_tile_minmax.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int64, i64p, i64p,
    ]


def tile_minmax(ids: np.ndarray, bound: int, tile: int, mode: int, num_tiles: int):
    """C++ per-tile min/max scan (see symbolic.cpp::ba_tile_minmax).
    Returns (mn, mx) int64 arrays or None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ba_tile_minmax"):
        return None
    if not getattr(lib, "_tmm_bound", False):
        _bind_tile_minmax(lib)
        lib._tmm_bound = True
    ids = np.ascontiguousarray(ids, np.int32)
    mn = np.empty(num_tiles, np.int64)
    mx = np.empty(num_tiles, np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ba_tile_minmax(
        ids.ctypes.data_as(i32p), ids.size, int(bound), int(tile),
        int(mode), int(num_tiles),
        mn.ctypes.data_as(i64p), mx.ctypes.data_as(i64p),
    )
    return mn, mx


def canonical_ntri(li, lj, sb, chunk: int, slot_block: int, col):
    """C++ canonical-enumeration check for the Schur local-id streams
    (symbolic.cpp::ba_canonical_ntri; twin of mxu._canonical_schur_ntri's
    NumPy verification).  Returns n_tri (or -1 non-canonical), or None
    when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ba_canonical_ntri"):
        return None
    if not getattr(lib, "_cntri_bound", False):
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.ba_canonical_ntri.restype = ctypes.c_int64
        lib.ba_canonical_ntri.argtypes = [
            i32p, i32p, i32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, i32p, ctypes.c_int64,
        ]
        lib._cntri_bound = True
    li = np.ascontiguousarray(li, np.int32)
    lj = np.ascontiguousarray(lj, np.int32)
    sb = np.ascontiguousarray(sb, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    C = sb.size
    if C * chunk != li.size or lj.size != li.size:
        return -1
    i32p = ctypes.POINTER(ctypes.c_int32)
    return int(lib.ba_canonical_ntri(
        li.ctypes.data_as(i32p), lj.ctypes.data_as(i32p),
        sb.ctypes.data_as(i32p), C, int(chunk), int(slot_block),
        col.ctypes.data_as(i32p), col.size,
    ))


def _bind_delta(lib: ctypes.CDLL) -> None:
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.ba_delta_probe.restype = None
    lib.ba_delta_probe.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i64p, i32p]
    lib.ba_delta_fill.restype = None
    lib.ba_delta_fill.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i8p, i16p,
    ]


def delta_encode(x: np.ndarray, chunk: int):
    """C++ twin of the engine wire-packer's delta encoder (engine._try_d8):
    probe + fill in two memcpy-speed passes.  x must be 1-D int32.
    Returns (bases int32, deltas int8|int16, V) or None (not encodable /
    native unavailable)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ba_delta_probe"):
        return None
    if not getattr(lib, "_delta_bound", False):
        _bind_delta(lib)
        lib._delta_bound = True
    x = np.ascontiguousarray(x, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    V = ctypes.c_int64()
    kind = ctypes.c_int32()
    lib.ba_delta_probe(x.ctypes.data_as(i32p), x.size, int(chunk),
                       ctypes.byref(V), ctypes.byref(kind))
    if kind.value == 2:
        return None
    V = V.value
    total = ((V + chunk - 1) // chunk) * chunk
    if kind.value == 0:
        deltas = np.empty(total, np.int8)
        lib.ba_delta_fill(x.ctypes.data_as(i32p), V, int(chunk), total,
                          deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), None)
    else:
        deltas = np.empty(total, np.int16)
        lib.ba_delta_fill(x.ctypes.data_as(i32p), V, int(chunk), total,
                          None, deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    bases = x[:V:chunk].astype(np.int32)
    return bases, deltas, V


def _bind_schur(lib: ctypes.CDLL) -> None:
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ba_schur_plan.restype = ctypes.c_void_p
    lib.ba_schur_plan.argtypes = [
        i32p, i32p, i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p,
    ]
    for name, rt in (("ba_sp_kwin", ctypes.c_int32), ("ba_sp_ok", ctypes.c_int32),
                     ("ba_sp_chunks", ctypes.c_int64), ("ba_sp_slot_pad", ctypes.c_int64),
                     ("ba_sp_hsc_pad", ctypes.c_int64)):
        getattr(lib, name).restype = rt
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.ba_sp_copy.argtypes = [ctypes.c_void_p, i32p, i32p, i32p, i32p, i32p]
    lib.ba_sp_free.argtypes = [ctypes.c_void_p]


def schur_plan(mul_i, mul_j, mul_k, n_hpl, n_hsc, chunk, slot_block, max_kwin,
               col=None):
    """C++ Schur chunk planner.  Returns
    (kwin, ok, num_chunks, n_slot_pad, n_hsc_pad, sb, li, lj, lk, gid) or
    None when the native library is unavailable.  ``col`` (slot -> landmark)
    enables the landmark-granular re-chunk when the dense packing violates
    the slot window (tight slot_block / loop-closure covisibility)."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_schur_bound"):
        _bind_schur(lib)
        lib._schur_bound = True
    i32p = ctypes.POINTER(ctypes.c_int32)

    def ptr(a):
        return a.ctypes.data_as(i32p)

    mi = np.ascontiguousarray(mul_i, np.int32)
    mj = np.ascontiguousarray(mul_j, np.int32)
    mk = np.ascontiguousarray(mul_k, np.int32)
    colp = None
    if col is not None:
        col = np.ascontiguousarray(col, np.int32)
        colp = ptr(col)
    h = lib.ba_schur_plan(ptr(mi), ptr(mj), ptr(mk), mi.size,
                          int(n_hpl), int(n_hsc), int(chunk), int(slot_block), int(max_kwin),
                          colp)
    try:
        kwin = lib.ba_sp_kwin(h)
        ok = bool(lib.ba_sp_ok(h))
        C = lib.ba_sp_chunks(h)
        n_slot_pad = lib.ba_sp_slot_pad(h)
        n_hsc_pad = lib.ba_sp_hsc_pad(h)
        sb = np.empty(C, np.int32)
        li = np.empty(C * chunk, np.int32)
        lj = np.empty(C * chunk, np.int32)
        lk = np.empty(C * chunk, np.int32)
        gid = np.empty(C * kwin, np.int32)
        lib.ba_sp_copy(h, ptr(sb), ptr(li), ptr(lj), ptr(lk), ptr(gid))
    finally:
        lib.ba_sp_free(h)
    return kwin, ok, int(C), int(n_slot_pad), int(n_hsc_pad), sb, li, lj, lk, gid


def _bind_reorder(lib: ctypes.CDLL) -> None:
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.ba_locality_reorder.restype = None
    lib.ba_locality_reorder.argtypes = [
        i32p, i32p, ctypes.c_int64,
        i32p, i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i64p, i64p, i64p, i32p, i32p,
    ]


def locality_reorder(mono_pi, mono_li, stereo_pi, stereo_li, total_p, total_l, num_l):
    """C++ locality reorder (solver/structure.py::_locality_reorder).  Returns
    (rank[num_l] i64, mono_perm i64, stereo_perm i64, mono_new_li i32 sorted,
    stereo_new_li i32 sorted) or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_reorder_bound"):
        try:
            _bind_reorder(lib)
        except AttributeError:  # stale .so without the symbol
            return None
        lib._reorder_bound = True
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    mpi = np.ascontiguousarray(mono_pi, np.int32)
    mli = np.ascontiguousarray(mono_li, np.int32)
    spi = np.ascontiguousarray(stereo_pi, np.int32)
    sli = np.ascontiguousarray(stereo_li, np.int32)
    rank = np.empty(num_l, np.int64)
    mono_perm = np.empty(mpi.size, np.int64)
    stereo_perm = np.empty(spi.size, np.int64)
    mono_new_li = np.empty(mpi.size, np.int32)
    stereo_new_li = np.empty(spi.size, np.int32)
    lib.ba_locality_reorder(
        mpi.ctypes.data_as(i32p), mli.ctypes.data_as(i32p), mpi.size,
        spi.ctypes.data_as(i32p), sli.ctypes.data_as(i32p), spi.size,
        int(total_p), int(total_l), int(num_l),
        rank.ctypes.data_as(i64p),
        mono_perm.ctypes.data_as(i64p), stereo_perm.ctypes.data_as(i64p),
        mono_new_li.ctypes.data_as(i32p), stereo_new_li.ctypes.data_as(i32p),
    )
    return rank, mono_perm, stereo_perm, mono_new_li, stereo_new_li
