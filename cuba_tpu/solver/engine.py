"""Block-solver engine: jitted numeric pipeline + on-device LM driver.

Plays the role of the reference's ``CudaBlockSolver`` + the LM loop in
``CudaBundleAdjustmentImpl::optimize`` (reference:
src/cuda_bundle_adjustment.cpp:73-673, :793-857), re-architected for XLA:

* ``optimize()`` runs the ENTIRE Levenberg-Marquardt loop — damping, solve,
  SE3 updates, chi2, gain ratio, accept/reject — inside one jitted
  ``lax.while_loop``.  The reference pays 4 host synchronisations per inner
  attempt (SURVEY.md §3.1); here there are zero.
* ``push``/``pop`` solution backups (cpp:502-510) vanish: rejected trial
  states are simply not carried forward (functional update).
* Per-phase profiling (the reference's 8-phase TimeProfile, cpp:77-88) is
  served by a phase-split driver that calls the same jitted building blocks
  with ``block_until_ready`` timing fences.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuba_tpu.config import BAConfig
from cuba_tpu.ops import se3, smallmat
from cuba_tpu.solver import assembly, band_cr, dense_cholesky, mxu, pcg, schur, trisolve
from cuba_tpu.solver.assembly import EdgeConsts
from cuba_tpu.solver.schur import SchurConsts
from cuba_tpu.solver.structure import BAStructure

PROFILE_ITEMS = (
    "0: Initialize Optimizer",
    "1: Build Structure",
    "2: Compute Error",
    "3: Build System",
    "4: Schur Complement",
    "5: Symbolic Decomposition",
    "6: Numerical Decomposition",
    "7: Update Solution",
)

# pad the dense Schur system so PB is a multiple of 128: whole MXU lanes
# with whole 6x6 blocks, and the band-transpose kernel's 128-lane tiles
# divide the block grid exactly
_BLOCK_PAD = 128

# largest pose-block count the dense factorization handles: the remote TPU
# compiler fails on the 6PB x 6PB dense image beyond ~P=4096 and the
# crossover data says PCG already wins there anyway (docs/PERF_NOTES.md
# "Large-P solver crossover"); "auto" hands bigger unbanded problems to PCG
_DENSE_MAX_PB = 4096

# Compiled functions cached by static spec (shapes/dtypes/config/kernels),
# NOT by engine instance: re-initializing a same-shaped problem (the
# reference's repeated `initialize(); optimize()` pattern,
# samples/sample_ba_from_file.cpp:155-163) must not retrace.  jax.jit's own
# per-aval cache handles differing array shapes under the same spec.
# LRU-bounded: a long-lived SLAM process whose local-BA window grows across
# padding buckets would otherwise accumulate compiled executables (tens of
# MB each) without limit; eviction only costs a retrace on the next use of
# an evicted spec.  Padding buckets (pose blocks of 128, rounded edge pads)
# keep the working set small, so 64 entries is generous.
from collections import OrderedDict

_JIT_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_JIT_CACHE_MAX = int(os.environ.get("CUBA_TPU_JIT_CACHE_MAX", "64"))


def _jit_cache_put(key, value):
    _JIT_CACHE[key] = value
    _JIT_CACHE.move_to_end(key)
    while len(_JIT_CACHE) > max(_JIT_CACHE_MAX, 1):
        _JIT_CACHE.popitem(last=False)


def _jit_cache_get(key):
    v = _JIT_CACHE.get(key)
    if v is not None:
        _JIT_CACHE.move_to_end(key)
    return v


def _jit_cached(key, make):
    """Get-or-compile: the one idiom every cache site uses.  ``make``
    returns the PYTHON callable to jit (called only on a miss)."""
    fn = _jit_cache_get(key)
    if fn is None:
        fn = jax.jit(make())
        _jit_cache_put(key, fn)
    return fn


class State(NamedTuple):
    qs: jnp.ndarray  # [total_p, 4]
    ts: jnp.ndarray  # [total_p, 3]
    Xws: jnp.ndarray  # [total_l, 3]


class Consts(NamedTuple):
    cams: jnp.ndarray  # [total_p, 5]
    mono: EdgeConsts
    stereo: EdgeConsts
    sc: SchurConsts
    mxu: object = None  # Optional[mxu.MXUConsts] on the MXU fast path


_PHASE_CALIB_CACHE: dict = {}


class LMResult(NamedTuple):
    state: State
    chis: jnp.ndarray  # [niterations] F after each outer iteration
    niters: jnp.ndarray  # number of outer iterations actually run
    final_lambda: jnp.ndarray
    nattempts: jnp.ndarray = np.int32(0)  # total damped solves (inner trials)


def _pad_blocks(num_p: int, pad: int = _BLOCK_PAD) -> int:
    """Dense reduced-system padding in pose blocks (BAConfig.pose_block_pad).

    Must stay a multiple of 128: the MXU dense/band formation maps PB onto
    64x128 lane tiles (mxu.plan_mxu raises otherwise), and 128 blocks = 768
    scalars covers both the lane count and the band solver's 384-wide CR
    tiles (64 blocks)."""
    if pad % 128 != 0 or pad <= 0:
        raise ValueError(
            f"pose_block_pad must be a positive multiple of 128, got {pad}"
        )
    return max(((num_p + pad - 1) // pad) * pad, pad)


class _EarlyRef:
    """Marker leaf: this value already lives on device inside the EARLY
    blob (packed + dispatched right after the structure pass, BEFORE the
    host planning pass, so its tunnel transfer overlaps plan_mxu + the
    residual constant packing).  The traced unpack rebuilds the leaf from
    the early part ``key`` and zero-cost pads it from the guessed shape
    up to the plan's final shape with ``pad_val``."""

    __slots__ = ("key", "src_shape", "dst_shape", "pad_val", "dtype")

    def __init__(self, key, src_shape, dst_shape=None, pad_val=0, dtype=None):
        self.key = key
        self.src_shape = tuple(src_shape)
        self.dst_shape = tuple(dst_shape) if dst_shape is not None else tuple(src_shape)
        self.pad_val = pad_val
        self.dtype = dtype

    def spec(self, i):
        return (i, self.key, self.src_shape, self.dst_shape, self.pad_val,
                str(self.dtype))


_CH = 1024  # delta8 chunk length (int32 bases absorb per-chunk leads)


def _try_d8(arr):
    """Delta-encode: int8 deltas when they fit, int16 otherwise."""
    if arr.ndim != 1 or arr.size < 4096 or arr.dtype not in (np.int32, np.int16):
        return None
    from cuba_tpu import native

    enc = native.delta_encode(arr, _CH)  # two memcpy-speed C++ passes
    if enc is not None:
        bases, deltas, V = enc
        if deltas.dtype == np.int16 and arr.dtype == np.int16:
            return None  # int16 deltas don't beat the int16 wire
        return bases, deltas, V, arr.size, int(arr[-1])
    if native.get_lib() is not None:
        return None  # native probe said not encodable
    # NumPy fallback (CUBA_TPU_NO_NATIVE builds)
    x = arr.astype(np.int64)
    pad_val = int(x[-1])
    nz = np.nonzero(x != pad_val)[0]
    V = int(nz[-1]) + 1 if nz.size else 0  # index after last non-pad value
    if V < 2048:
        return None
    Cv = (V + _CH - 1) // _CH
    dfull = np.zeros(Cv * _CH, np.int64)
    dfull[1:V] = np.diff(x[:V])
    dfull[::_CH] = 0  # chunk leads ride in the int32 bases instead
    dmax, dmin = dfull.max(), dfull.min()
    if dmax <= 127 and dmin >= -128:
        deltas = dfull.astype(np.int8)
    elif dmax <= 32767 and dmin >= -32768 and arr.dtype == np.int32:
        deltas = dfull.astype(np.int16)  # still half the int32 wire
    else:
        return None
    return x[:V:_CH].astype(np.int32), deltas, V, arr.size, pad_val


def _pack_i16(a):
    a = a.ravel()
    if a.size % 2:
        a = np.concatenate([a, a[-1:]])
    return np.ascontiguousarray(a).view(np.int32)


def _pack_i8(a):
    a = a.ravel()
    if a.size % 4:
        a = np.concatenate([a, np.zeros(4 - a.size % 4, a.dtype)])
    return np.ascontiguousarray(a).view(np.int32)


def _narrow16(a):
    """int16 view of an int32 table whose values fit — halves the wire."""
    a = np.asarray(a)
    if a.dtype == np.int32 and a.size and -32768 <= int(a.min()) and int(a.max()) <= 32767:
        return a.astype(np.int16)
    return a


def _pack_group(items):
    """Pack named float32/int32/int16 arrays into ONE int32 wire blob.

    Encodings (tunnel moves ~90MB/s with ~50ms latency per transfer, so
    both bytes and transfer count matter):
    * float32 rides as a same-width bitcast;
    * int16 ships shift-packed two-per-int32 (widened back on device);
    * 1-D int tables whose intra-chunk first differences fit int8 ship as
      shift-packed deltas + int32 chunk bases, rebuilt by a device cumsum.

    Returns (int32 blob, meta); meta is hashable and drives the traced
    ``_unpack_group``.
    """
    parts = []
    enc = {}
    payloads = []
    off = 0

    def add(key, mode, payload, n_orig):
        nonlocal off
        parts.append((key, mode, off, int(payload.size), int(n_orig)))
        payloads.append(payload)
        off += int(payload.size)

    for key, arr in items:
        arr = np.asarray(arr)
        if arr.dtype == np.float32:
            flat = arr.ravel()
            if flat.size > 4096:
                # constant-then-zero-pad arrays (e.g. unit information
                # weights) ship as 2 words: [bitcast(c), V]
                nz = np.nonzero(flat)[0]
                V = int(nz[-1]) + 1 if nz.size else 0
                c = flat[0]
                if V and c != 0 and (flat[:V] == c).all() and not flat[V:].any():
                    payload = np.empty(2, np.int32)
                    payload[0] = np.float32(c).view(np.int32)
                    payload[1] = V
                    add(key, "fc", payload, flat.size)
                    continue
            add(key, "f32", np.ascontiguousarray(flat).view(np.int32), arr.size)
            continue
        if arr.dtype not in (np.int32, np.int16):
            raise TypeError(f"_pack_group: unsupported dtype {arr.dtype} for {key}")
        e = _try_d8(arr)
        if e is not None:
            bases, deltas, V, N, pad_val = e
            dmode = "p8" if deltas.dtype == np.int8 else "p16"
            add((key, "b"), "p32", bases, bases.size)
            add((key, "d"), dmode,
                _pack_i8(deltas) if dmode == "p8" else _pack_i16(deltas), deltas.size)
            enc[key] = (V, N, pad_val)
        elif arr.dtype == np.int16:
            add(key, "p16", _pack_i16(arr), arr.size)
        else:
            add(key, "p32", np.ascontiguousarray(arr.ravel(), np.int32), arr.size)

    blob = np.concatenate(payloads) if payloads else np.zeros(1, np.int32)
    return blob, (tuple(parts), tuple(sorted(enc.items())))


def _unpack_group(dev, meta):
    """Traced inverse of _pack_group: dict key -> flat array (f32 or i32)."""
    parts_meta, enc_t = meta
    enc = dict(enc_t)
    raw = {}
    for key, mode, off, psize, n_orig in parts_meta:
        v = jax.lax.slice(dev, (off,), (off + psize,))
        if mode == "p32":
            raw[key] = v[:n_orig]
        elif mode == "f32":
            raw[key] = jax.lax.bitcast_convert_type(v, jnp.float32)
        elif mode == "fc":  # constant c for the first V entries, 0 after
            c = jax.lax.bitcast_convert_type(v[:1], jnp.float32)[0]
            V = v[1]
            raw[key] = jnp.where(
                jnp.arange(n_orig, dtype=jnp.int32) < V, c, jnp.float32(0)
            )
        elif mode == "p16":
            lo = (v << 16) >> 16
            hi = v >> 16
            raw[key] = jnp.stack([lo, hi], axis=1).reshape(-1)[:n_orig]
        else:  # p8: four sign-extended bytes per int32
            bs = [((v << (24 - 8 * b)) >> 24) for b in range(4)]
            raw[key] = jnp.stack(bs, axis=1).reshape(-1)[:n_orig]
    out = {}
    for key, (V, N, pad_val) in enc.items():
        body = (
            raw[(key, "d")].reshape(-1, _CH).cumsum(axis=1)
            + raw[(key, "b")][:, None]
        ).reshape(-1)[:V]
        out[key] = jnp.concatenate([body, jnp.full((N - V,), pad_val, jnp.int32)])
    for key, v in raw.items():
        is_enc_part = (
            isinstance(key, tuple)
            and len(key) == 2
            and key[1] in ("b", "d")
            and key[0] in enc
        )
        if not is_enc_part:
            out[key] = v
    return out


def _debug_upload(iparts, flats, early_nbytes, tree):
    import sys

    by_mode: Dict[str, int] = {}
    for key, mode, payload in iparts:
        by_mode[mode] = by_mode.get(mode, 0) + payload.nbytes
    print(
        f"# upload: groups {[f.nbytes/1e6 for f in flats]} MB, early {early_nbytes/1e6} MB, "
        f"int parts by mode {({m: round(b/1e6, 2) for m, b in by_mode.items()})} MB",
        file=sys.stderr,
    )
    paths = {
        i: jax.tree_util.keystr(kp)
        for i, (kp, _) in enumerate(jax.tree_util.tree_flatten_with_path(tree)[0])
    }
    top = sorted(iparts, key=lambda p: -p[2].nbytes)[:12]
    for key, mode, payload in top:
        i = key[0] if isinstance(key, tuple) else key
        print(
            f"#   part {key} {paths.get(i, '?')} mode={mode} "
            f"{payload.nbytes/1e6:.2f} MB",
            file=sys.stderr,
        )


def _packed_device_put(tree, transform=None, transform_key=None, early=None,
                       defer=False):
    """device_put a pytree of NumPy arrays with ONE transfer per dtype group.

    Per-leaf device_put issues one ~30ms round-trip per array through the
    serving tunnel (~40 leaves -> 1.4s); packing into a single flat int32
    blob (floats bitcast, narrow ints shift-packed, banded ids
    delta-encoded — see _pack_group) and slicing device-side costs one
    transfer + cheap async on-device slices.  f64/exotic dtypes ride in
    plain per-dtype groups (the fp64 XLA path).

    ``early`` is a sequence of (device_blob, meta) _pack_group pairs that
    were dispatched BEFORE the planning pass (the engine ships two: the
    cheap-to-pack float tables first so the big transfer hits the wire in
    the ctor's first milliseconds, then the delta-encoded int tables);
    _EarlyRef leaves are rebuilt from them (and padded up to the plan's
    final shapes) instead of re-uploading.  ``transform`` (e.g.
    mxu.derive_consts) runs inside the same unpack dispatch.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)

    fgroups: Dict[str, list] = {}
    gitems = []  # (leaf index, arr) -> int32 group via _pack_group
    early_refs = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, _EarlyRef):
            early_refs[i] = leaf
            continue
        arr = np.asarray(leaf)
        if arr.dtype in (np.float32, np.int32, np.int16):
            gitems.append((i, arr))
        else:
            # f64 and any exotic dtype ride in plain per-dtype groups
            fgroups.setdefault(str(arr.dtype), []).append((i, arr))

    flats = []
    fmeta = []  # (leaf index, group index, offset, shape, dtype str)
    for g, (dts, items) in enumerate(fgroups.items()):
        flats.append(np.concatenate([a.ravel() for _, a in items]))
        off = 0
        for i, a in items:
            fmeta.append((i, g, off, a.shape, dts))
            off += a.size
    gi = len(flats)
    gmeta = None
    if gitems:
        blob, gmeta = _pack_group(gitems)
        if __import__("os").environ.get("CUBA_TPU_DEBUG_UPLOAD"):
            _debug_upload(
                [(k, m, blob[o : o + p]) for k, m, o, p, n in gmeta[0]],
                flats + [blob],
                sum(d.size * 4 for d, _m in early) if early else 0,
                tree,
            )
        flats.append(blob)
    d_flats = jax.device_put(tuple(flats))

    shapes = tuple(
        None if isinstance(l, _EarlyRef) else np.asarray(l).shape for l in leaves
    )
    early_groups = tuple(early) if early is not None else ()
    early_metas = tuple(m for _d, m in early_groups)
    spec = (
        tuple(fmeta), gmeta, shapes,
        tuple(ref.spec(i) for i, ref in sorted(early_refs.items())),
        tuple((f.dtype.str, f.shape) for f in flats),
        early_metas,
    )
    key = ("unpack", spec, transform_key)

    def unpack(*fs):
        out = [None] * len(leaves)
        if early_refs:
            evals = {}
            for g, meta in enumerate(early_metas):
                evals.update(_unpack_group(fs[len(flats) + g], meta))
            for i, ref in early_refs.items():
                src = evals[ref.key].reshape(ref.src_shape)
                if ref.dst_shape != ref.src_shape:
                    pad = [(0, d - s) for s, d in zip(ref.src_shape, ref.dst_shape)]
                    src = jnp.pad(src, pad, constant_values=ref.pad_val)
                out[i] = src
        for i, g, off, shape, _dts in fmeta:
            size = int(np.prod(shape)) if shape else 1
            out[i] = jax.lax.slice(fs[g], (off,), (off + size,)).reshape(shape)
        if gmeta is not None:
            gvals = _unpack_group(fs[gi], gmeta)
            for i, _arr in gitems:
                out[i] = gvals[i].reshape(shapes[i])
        tree_out = jax.tree_util.tree_unflatten(treedef, list(out))
        return transform(tree_out) if transform is not None else tree_out

    args = d_flats + (tuple(d for d, _m in early_groups) if early_refs else ())
    if defer:
        # hand back the blobs + the PURE unpack fn: the caller fuses the
        # unpack into its own jitted dispatch (e.g. the LM loop), removing
        # one ~30-50ms tunnel round trip per engine construction
        return args, unpack, key
    return _jit_cached(key, lambda: unpack)(*args)

class BlockSolverEngine:
    """Owns device constants + compiled functions for one problem structure."""

    def __init__(self, structure: BAStructure, kernels, config: BAConfig):
        self.structure = structure
        self.config = config
        self.dtype = config.resolve_dtype()
        self.chi_dtype = config.resolve_chi_dtype()
        # robust kernels: ((type, delta) mono, (type, delta) stereo) — static
        self.kernels = tuple((int(k[0]), float(k[1])) for k in kernels)

        s = structure
        self.num_p, self.num_l = s.num_p, s.num_l
        self.pad_blocks = _pad_blocks(s.num_p, config.pose_block_pad)
        # band certification (host): block-tridiagonal CR applies when the
        # Schur pattern's half-bandwidth fits 64 pose blocks per CR block.
        # Long-range (loop closure) blocks don't fail certification — they
        # become a Woodbury correction (band_cr.cr_solve_woodbury) when the
        # loop-column set is small enough.
        m_lr, ob_idx = band_cr.certify_lr(s.hsc_row, s.hsc_col, self.pad_blocks)
        self.band_m = m_lr if ob_idx.size == 0 else 0
        self.lr = None  # host-side Woodbury plan (XLA / non-v2 fallback path)
        if m_lr >= 2 and ob_idx.size:
            obr = np.asarray(s.hsc_row, np.int64)[ob_idx]
            obc = np.asarray(s.hsc_col, np.int64)[ob_idx]
            J = np.unique(np.concatenate([obr, obc]))
            if J.size <= 64:
                self.lr = dict(
                    m=m_lr, obr=obr, obc=obc,
                    ob_i=np.searchsorted(J, obr).astype(np.int32),
                    ob_j=np.searchsorted(J, obc).astype(np.int32),
                    jrows=(J[:, None] * 6 + np.arange(6)).reshape(-1).astype(np.int32),
                )
        if config.solver == "band_cr" and not self.band_m:
            raise ValueError(
                "solver='band_cr' requires a band-certified Schur pattern "
                "(half-bandwidth <= 64 pose blocks after the locality "
                "reorder); this problem is not banded — use 'band_lr' "
                "(banded + loop closures), 'dense_cholesky' or 'pcg'"
            )
        if config.solver == "band_lr" and self.lr is None and not self.band_m:
            raise ValueError(
                "solver='band_lr' requires a banded-plus-low-rank Schur "
                "pattern (in-band half-bandwidth <= 64 pose blocks and at "
                "most 64 loop-closure pose-block columns) — use "
                "'dense_cholesky' or 'pcg'"
            )
        # "auto" picks the structure-exploiting solver exactly like the
        # reference's sparse Cholesky + ordering does implicitly
        # (cuda_linear_solver.cpp:342-348): banded pose graph -> cyclic
        # reduction, banded + loop closures -> CR + Woodbury, anything
        # else -> dense MXU factorization while it fits the compile
        # ceiling, then matrix-free PCG (docs/PERF_NOTES.md crossover).
        self.solver = config.solver
        if config.solver == "auto":
            # small systems factor fastest dense (chol(6PB) is ~1ms below
            # PB=512); CR's batched-level overhead pays off from m >= 8
            if self.band_m >= 8:
                self.solver = "band_cr"
            elif self.lr is not None and m_lr >= 8:
                self.solver = "band_lr"
            elif self.pad_blocks <= _DENSE_MAX_PB:
                self.solver = "dense_cholesky"
            else:
                self.solver = "pcg"
        if self.solver == "band_lr" and self.lr is None:
            # pure band after all (explicit band_lr on a loop-free graph)
            self.solver = "band_cr"

        dt = np.dtype(str(self.dtype))
        idt = np.int32

        # MXU fast path (Pallas one-hot segment-matmuls, solver/mxu.py):
        # fp32-only; "auto" enables it off-CPU when the problem has the
        # locality the windowed kernels need (plans.ok).
        mode = config.mxu
        want_mxu = (
            mode in ("on", "interpret")
            or (mode == "auto" and jax.default_backend() != "cpu")
        ) and dt == jnp.float32
        self.mxu_interpret = mode == "interpret"

        # dispatch the plan-INDEPENDENT constants — state, cams, the
        # transposed measurement/omega rows AND the big structure-derived
        # int index tables (incl. the Schur triplet ids, which the C++
        # symbolic pass already computed) — as one or two int32 blobs
        # BEFORE the host planning pass: their tunnel transfer overlaps
        # plan_mxu + the residual constant packing below.
        early = None
        early_avail = {}
        sc_early = None
        if want_mxu and dt == np.float32:
            gm, gs = mxu.guess_e_pads(s)
            # TWO early groups, floats first: the float tables (state,
            # cams, transposed measurements/weights — ~7 of the ~10 MB
            # wire) pack with a plain concat+bitcast, so their transfer
            # hits the tunnel within the ctor's first milliseconds; the
            # int tables need the delta-encode pass (~50 ms host) and the
            # Schur plan, and ride a second blob.  Each device_put gets a
            # 1-element async touch: through the serving tunnel the
            # physical transfer otherwise materializes at the first
            # dependent dispatch, pushing ~0.24 s of wire time into the
            # first optimize instead of overlapping the host planning.
            fl = mxu.rows_float_arrays(s, gm, gs)
            fitems = [
                ("qs", np.asarray(s.qs, dt), 0),
                ("ts", np.asarray(s.ts, dt), 0),
                ("Xws", np.asarray(s.Xws, dt), 0),
                ("cams", np.asarray(s.cams, dt), 0),
                ("measT_m", fl["measT_m"], 0),
                ("measT_s", fl["measT_s"], 0),
                ("omegaT_m", fl["omegaT_m"], 0),
                ("omegaT_s", fl["omegaT_s"], 0),
            ]
            fbytes = sum(np.asarray(a).nbytes for _n, a, _pv in fitems)
            # split only when the float payload is big enough that starting
            # its transfer early beats the cost of a second dispatch: at
            # kitti07 scale (1.6 MB floats) the extra put+touch measured
            # +0.05 s of ctor enqueue overhead, at kitti00 scale (6.9 MB)
            # the early start wins.  Gate on raw nbytes (floats pack ~1:1
            # apart from the constant-array 'fc' shrink) so the non-split
            # path never packs the floats twice
            split = fbytes >= 4 << 20
            fdev = None
            if split:
                fblob, fmeta_e = _pack_group([(n, a) for n, a, _pv in fitems])
                fdev = jax.device_put(fblob)
                jnp.sum(fdev[:1])
            if self.solver != "pcg":
                # the RESOLVED solver, not config.solver: 'auto' problems
                # that resolve to PCG never touch the Schur tables
                sc_early = mxu.plan_schur_for(s)
            iitems = [
                (name, _narrow16(a), pv)
                for name, (a, pv) in mxu.early_int_arrays(s, gm, gs, sc_early).items()
            ]
            if split:
                iblob, imeta_e = _pack_group([(n, a) for n, a, _pv in iitems])
                groups = [(fblob, fmeta_e, "early-f"), (iblob, imeta_e, "early-i")]
            else:
                iblob, imeta_e = _pack_group(
                    [(n, a) for n, a, _pv in fitems + iitems]
                )
                groups = [(iblob, imeta_e, "early")]
            if os.environ.get("CUBA_TPU_DEBUG_UPLOAD"):
                # per-array wire breakdown (name, pack mode, packed MB),
                # largest first — the tool for attacking the ctor wire floor
                for blob_, meta_, label in groups:
                    print(f"# {label} blob: {blob_.nbytes/1e6:.2f} MB", file=sys.stderr)
                    for k, m, _o, p, _n in sorted(meta_[0], key=lambda t: -t[3]):
                        print(f"#   {label} {k} mode={m} {p*4/1e6:.2f} MB", file=sys.stderr)
            idev = jax.device_put(iblob)
            jnp.sum(idev[:1])
            if split:
                early = ((fdev, fmeta_e), (idev, imeta_e))
            else:
                early = ((idev, imeta_e),)
            eitems = fitems + iitems
            early_avail = {n: (a.shape, pv) for n, a, _pv2 in eitems for pv in [_pv2]}

        self.mxu_plans = None
        mxu_consts = None
        if want_mxu:
            # PCG never materializes the Schur complement: skip the
            # multiplication-triplet + dense-formation planning entirely
            plans, mxu_consts = mxu.plan_mxu(
                s, self.pad_blocks, need_dense=self.solver != "pcg",
                sc=sc_early,
            )
            if plans.ok:
                self.mxu_plans = plans
            else:
                mxu_consts = None
        self.use_mxu = self.mxu_plans is not None
        # rows front end: transposed residuals/terms via one-hot gathers
        # (solver/edgerows.py); falls back to the AoS residual path when the
        # pose table is too large for the resident gather
        self.use_rows = self.use_mxu and self.mxu_plans.rows_ok

        def eref(name, cur):
            """_EarlyRef for a leaf whose early part is a usable prefix of
            the planned array `cur`; None -> ship it in the main blob."""
            if name not in early_avail:
                return None
            src_shape, pad_val = early_avail[name]
            cur = np.asarray(cur)
            if cur.size <= 1 and tuple(cur.shape) != tuple(src_shape):
                return None  # dummy on this path — keep as-is
            if cur.ndim != len(src_shape) or any(
                ss > cs for ss, cs in zip(src_shape, cur.shape)
            ):
                return None  # plan shrank below the guess (never in practice)
            return _EarlyRef(name, src_shape, cur.shape, pad_val)

        # build the whole constant set as NumPy, then upload in ONE
        # device_put: each separate transfer costs ~30ms of tunnel latency
        # (docs/PERF_NOTES.md) and there are ~40 arrays here.
        state_np = State(
            qs=eref("qs", s.qs) or np.asarray(s.qs, dt),
            ts=eref("ts", s.ts) or np.asarray(s.ts, dt),
            Xws=eref("Xws", s.Xws) or np.asarray(s.Xws, dt),
        )
        # the XLA-path constants (SchurConsts triplets, per-edge Hpl slots,
        # and — on the rows front end — the whole AoS edge set) are ~25MB at
        # kitti00 scale and never traced when the fast paths are active —
        # don't pay the tunnel transfer for them
        dummy = np.zeros(1, idt)
        dummy_f = np.zeros(1, dt)
        opt = (lambda a: dummy) if self.use_mxu else (lambda a: np.asarray(a, idt))
        ropt = (lambda a, t=dt: np.asarray(a, t)) if not self.use_rows else (
            lambda a, t=dt: dummy if t == idt else dummy_f)
        if mxu_consts is not None:
            upd = {}
            for name in (
                "measT_m", "measT_s", "omegaT_m", "omegaT_s",
                "e2h_m", "e2h_s", "hpl_row", "hpl_col",
                "pose_gid_m", "pose_gid_s",
                "sc_lij", "sc_lk", "hsc_key", "sc_gid", "sc_t0",
            ):
                r = eref(name, getattr(mxu_consts, name))
                if r is not None:
                    upd[name] = r
            if upd:
                mxu_consts = mxu_consts._replace(**upd)
        consts_np = Consts(
            cams=eref("cams", s.cams) or np.asarray(s.cams, dt),
            mono=EdgeConsts(
                meas=ropt(s.mono.measurements),
                omega=ropt(s.mono.omegas),
                pose_idx=ropt(s.mono.pose_idx, idt),
                lm_idx=ropt(s.mono.lm_idx, idt),
                edge2hpl=opt(s.edge2hpl[: s.mono.count]),
            ),
            stereo=EdgeConsts(
                meas=ropt(s.stereo.measurements),
                omega=ropt(s.stereo.omegas),
                pose_idx=ropt(s.stereo.pose_idx, idt),
                lm_idx=ropt(s.stereo.lm_idx, idt),
                edge2hpl=opt(s.edge2hpl[s.mono.count :]),
            ),
            sc=SchurConsts(
                hpl_row=opt(s.hpl_row),
                hpl_col=opt(s.hpl_col),
                hsc_row=opt(s.hsc_row),
                hsc_col=opt(s.hsc_col),
                mul_i=opt(s.mul_i),
                mul_j=opt(s.mul_j),
                mul_k=opt(s.mul_k),
            ),
            mxu=mxu_consts,
        )
        self._early = early
        if self.use_mxu:
            # expand the wire-compressed index tables on device in the same
            # jitted dispatch as the unpack (mxu.derive_consts docstring)
            np_, nl_, rows_ = self.num_p, self.num_l, self.use_rows
            scp_ = self.mxu_plans.sc_pack
            gdv_ = self.mxu_plans.gid_dv
            sc_dv = mxu.derive_statics(self.mxu_plans, s.n_hpl)
            transform = lambda t: (
                t[0], t[1]._replace(
                    mxu=mxu.derive_consts(t[1].mxu, np_, nl_, rows_, scp_,
                                          sc_dv, gdv_)
                )
            )
            tkey = ("derive", np_, nl_, rows_, scp_, sc_dv, gdv_)
        else:
            transform, tkey = None, None
        # deferred upload: keep the packed blobs + a pure unpack fn; the
        # first optimize() fuses the unpack into the LM dispatch (one fewer
        # tunnel round trip), and .state/.consts materialize lazily for the
        # phase-split/profiling/test paths
        self._blobs, self._unpack, self._unpack_key = _packed_device_put(
            (state_np, consts_np), transform, tkey, early=early, defer=True
        )
        self._state_cache = None
        self._consts_cache = None
        # materialize eagerly: fusing the unpack into the LM dispatch was
        # measured SLOWER (XLA schedules decoded constants worse than plain
        # parameters); the dispatch here overlaps the remaining ctor work
        self._materialize()

        # every value the jitted closures capture from `self`, hashable —
        # engines with equal specs share compiled functions via _JIT_CACHE
        self._spec = self._build_spec()

    def _build_spec(self):
        s, cfg = self.structure, self.config
        return (
            self.num_p,
            self.num_l,
            s.n_hpl,
            s.mono.count,
            s.stereo.count,
            bool(s.optimize_p),
            bool(s.optimize_l),
            self.pad_blocks,
            self.kernels,
            str(self.dtype),
            str(self.chi_dtype),
            cfg.solver,
            # the RESOLVED solver + structure facts that pick it: two
            # same-shaped problems under solver="auto" may resolve
            # differently (banded vs not) and must not share compiled fns
            self.solver,
            self.band_m,
            self._lr_key(),
            cfg.max_inner_iterations,
            cfg.tau,
            cfg.scale_eps,
            cfg.attenuation_min,
            cfg.attenuation_max,
            cfg.refinement_steps,
            cfg.numerical_escalation,
            cfg.pcg_max_iterations,
            cfg.pcg_tol,
            self.use_mxu,
            self.mxu_interpret,
            self._mxu_sig(),
        )

    def _lr_key(self):
        """Hashable signature of the band+low-rank plan: the out-of-band
        block indices are embedded as STATIC gather indices in the traced
        fallback path, so the compiled-function cache must key on them."""
        if self.lr is None:
            return None
        return (
            self.lr["m"],
            tuple(self.lr["obr"].tolist()),
            tuple(self.lr["obc"].tolist()),
        )

    def _mxu_sig(self):
        """Static signature of every plan value the traced closures capture."""
        return mxu.static_sig(self.mxu_plans)

    # ------------------------------------------------------------------
    # building blocks (pure functions over (state, consts))
    # ------------------------------------------------------------------

    def _residuals_and_chi(self, state: State, consts: Consts):
        """computeErrors equivalent (cpp:368-382): residuals, Xcs, total chi.

        Rows path (use_rows): returns (pack_m, pack_s, None, None, chi)
        where the packs are the transposed [d, E] row bundles that
        build_system_rows consumes — same arity as the AoS return so every
        caller forwards them blindly."""
        if self.use_rows:
            pack_m, pack_s, chi = mxu.edge_rows_mxu(
                state.qs, state.ts, state.Xws, consts.cams, self.kernels,
                self.chi_dtype,
                (self.structure.mono.count, self.structure.stereo.count),
                self.mxu_plans, consts.mxu, interpret=self.mxu_interpret,
            )
            return pack_m, pack_s, None, None, chi
        chi = jnp.zeros((), self.chi_dtype)
        err2, Xc2 = assembly.edge_residuals(
            state.qs, state.ts, consts.cams, state.Xws, consts.mono, 2
        )
        err3, Xc3 = assembly.edge_residuals(
            state.qs, state.ts, consts.cams, state.Xws, consts.stereo, 3
        )
        if self.structure.mono.count:
            chi = chi + assembly.chi_sum(err2, consts.mono.omega, self.kernels[0], self.chi_dtype)
        if self.structure.stereo.count:
            chi = chi + assembly.chi_sum(err3, consts.stereo.omega, self.kernels[1], self.chi_dtype)
        return err2, Xc2, err3, Xc3, chi

    def _chi_only(self, state: State, consts: Consts):
        _, _, _, _, chi = self._residuals_and_chi(state, consts)
        return chi

    def _build(self, state: State, consts: Consts, err2, Xc2, err3, Xc3):
        """Quadratic-form assembly.  Returns a path-specific system pytree:
        XLA path: (Hpp, bp, Hll, bl, Hpl); MXU path: (HppT, HllT, HplT)."""
        if self.use_rows:
            # err2/Xc2 carry the row packs from the rows residual pass
            return mxu.build_system_rows(
                err2, Xc2, self.kernels, self.num_p, self.num_l,
                self.mxu_plans, consts.mxu, interpret=self.mxu_interpret,
            )
        if self.use_mxu:
            return mxu.build_system_mxu(
                state.qs, consts.cams, self.num_p, self.num_l,
                consts.mono, consts.stereo, err2, Xc2, err3, Xc3,
                self.kernels, self.mxu_plans, consts.mxu,
                interpret=self.mxu_interpret,
            )
        return assembly.build_system(
            state.qs,
            consts.cams,
            self.num_p,
            self.num_l,
            self.structure.n_hpl,
            consts.mono,
            consts.stereo,
            err2,
            Xc2,
            err3,
            Xc3,
            self.kernels,
        )

    def _solve(self, sys, lam, consts: Consts):
        """One damped trial solve (cpp:432-481).  Returns (xp, xl, ok)."""
        s = self.structure
        dt = self.dtype
        if self.use_mxu:
            # optimization_barrier between stages: letting XLA fuse across
            # them costs ~25ms/solve at kitti00 scale (worse scheduling /
            # rematerialization around the 260MB dense intermediates)
            OB = jax.lax.optimization_barrier
            HppT, HllT, HplT = sys
            plans, mc = self.mxu_plans, consts.mxu
            interp = self.mxu_interpret
            iv9, W, bscT, g12 = OB(mxu.prepare_factors_mxu(
                HppT, HllT, HplT, lam, self.num_p, self.num_l, plans, mc,
                interpret=interp,
            ))
            if self.solver == "pcg":
                # matrix-free block-Jacobi PCG on the transposed tables —
                # the large-P path (dense factorization is O(PB^2) memory)
                xT, ok = mxu.pcg_solve_rows(
                    HppT, HplT, W, lam, bscT, self.num_p, self.num_l,
                    plans, mc, self.config.pcg_max_iterations,
                    self.config.pcg_tol, interpret=interp,
                )
                xp = xT.T
                xl = mxu.back_substitute_mxu(
                    iv9, HllT, HplT, g12, xp, self.num_l, plans, mc,
                    interpret=interp,
                )
                return xp, xl, ok
            if self.solver == "band_cr":
                # band-certified structure: block-tridiagonal cyclic
                # reduction (solver/band_cr.py) — batched MXU matmuls with
                # log2(m) sequential depth instead of the dense factor's
                # n/128 panel chain.  The v2 compact formation writes the
                # band storage directly (no 6PB x 6PB dense image at all).
                if plans.v2:
                    Db, Ub = OB(mxu.schur_band_mxu(
                        HppT, W, HplT, lam, self.num_p, self.pad_blocks,
                        plans, mc, dt, interpret=interp,
                    ))
                else:
                    Dm = OB(mxu.schur_dense_mxu(
                        HppT, W, HplT, lam, self.num_p, self.pad_blocks,
                        plans, mc, dt, interpret=interp,
                    ))
                    Db, Ub = band_cr.from_dense(Dm, self.band_m)
                n = 6 * self.pad_blocks
                rhs = jnp.zeros(n, dt).at[: 6 * self.num_p].set(bscT.T.reshape(-1))
                refine = self.config.refinement_steps if dt == jnp.float32 else 0
                x, ok = OB(band_cr.cr_solve(Db, Ub, rhs, refine))
                xp = x[: 6 * self.num_p].reshape(self.num_p, 6)
                xl = mxu.back_substitute_mxu(
                    iv9, HllT, HplT, g12, xp, self.num_l, plans, mc,
                    interpret=interp,
                )
                return xp, xl, ok
            if self.solver == "band_lr":
                # banded + loop closures: CR factor on the in-band part,
                # Woodbury correction over the loop-closure columns — the
                # TPU answer to the reference's fill-reducing sparse
                # Cholesky (cuda_linear_solver.cpp:342-348)
                if plans.v2 and plans.lr_nob:
                    Db, Ub, Vob = OB(mxu.schur_band_mxu(
                        HppT, W, HplT, lam, self.num_p, self.pad_blocks,
                        plans, mc, dt, interpret=interp, with_ob=True,
                    ))
                    ob_i, ob_j, jrows = mc.ob_i, mc.ob_j, mc.ob_jrows
                else:
                    Dm = OB(mxu.schur_dense_mxu(
                        HppT, W, HplT, lam, self.num_p, self.pad_blocks,
                        plans, mc, dt, interpret=interp,
                    ))
                    Db, Ub = band_cr.from_dense(Dm, self.lr["m"])
                    Vob = band_cr.ob_from_dense(Dm, self.lr["obr"], self.lr["obc"])
                    ob_i, ob_j, jrows = (
                        jnp.asarray(self.lr["ob_i"]),
                        jnp.asarray(self.lr["ob_j"]),
                        jnp.asarray(self.lr["jrows"]),
                    )
                n = 6 * self.pad_blocks
                rhs = jnp.zeros(n, dt).at[: 6 * self.num_p].set(bscT.T.reshape(-1))
                # the Woodbury Gershgorin shift trades conditioning for a
                # guaranteed-SPD band factor; one refinement sweep recovers
                # the lost digits even in fp64
                refine = max(
                    self.config.refinement_steps if dt == jnp.float32 else 0, 1
                )
                x, ok = OB(band_cr.cr_solve_woodbury(
                    Db, Ub, rhs, Vob, ob_i, ob_j, jrows, refine,
                ))
                xp = x[: 6 * self.num_p].reshape(self.num_p, 6)
                xl = mxu.back_substitute_mxu(
                    iv9, HllT, HplT, g12, xp, self.num_l, plans, mc,
                    interpret=interp,
                )
                return xp, xl, ok
            Dm = OB(mxu.schur_dense_mxu(
                HppT, W, HplT, lam, self.num_p, self.pad_blocks, plans, mc, dt,
                interpret=interp,
            ))
            n = 6 * self.pad_blocks
            rhs = jnp.zeros(n, dt).at[: 6 * self.num_p].set(bscT.T.reshape(-1))
            refine = self.config.refinement_steps if dt == jnp.float32 else 0
            # Pallas blocked trisolve (solver/trisolve.py): one extra
            # refinement sweep compensates the inverted-diagonal-block
            # substitution's slightly larger residual — without it the LM
            # loop pays ~3 extra step rejections at kitti00 scale, which
            # costs far more than the ~2ms sweep.
            use_ts = (
                jax.default_backend() == "tpu" and trisolve.usable(n, dt)
            )
            if use_ts and refine > 0:
                refine += 1
            x, ok = OB(dense_cholesky.cholesky_solve(Dm, rhs, refine, use_pallas=use_ts))
            xp = x[: 6 * self.num_p].reshape(self.num_p, 6)
            xl = mxu.back_substitute_mxu(
                iv9, HllT, HplT, g12, xp, self.num_l, plans, mc, interpret=interp
            )
            return xp, xl, ok
        Hpp, bp, Hll, bl, Hpl = sys
        if s.optimize_p and s.optimize_l:
            Hpp_d = assembly.damp(Hpp, lam)
            Hll_d = assembly.damp(Hll, lam)
            invHll, W, bsc = schur.prepare_factors(bp, Hll_d, bl, Hpl, consts.sc, self.num_p)
            if self.solver == "pcg":
                op = pcg.SchurOperator(
                    Hpp_d, Hpl, W, consts.sc.hpl_row, consts.sc.hpl_col, self.num_p, self.num_l
                )
                xp, ok = pcg.pcg_solve(
                    op, bsc, self.config.pcg_max_iterations, self.config.pcg_tol
                )
            else:
                Dm = schur.assemble_dense(Hpp_d, W, Hpl, consts.sc, self.num_p, self.pad_blocks)
                n = 6 * self.pad_blocks
                rhs = jnp.zeros(n, dt).at[: 6 * self.num_p].set(bsc.reshape(-1))
                refine = self.config.refinement_steps if dt == jnp.float32 else 0
                if self.solver == "band_cr":
                    Db, Ub = band_cr.from_dense(Dm, self.band_m)
                    x, ok = band_cr.cr_solve(Db, Ub, rhs, refine)
                elif self.solver == "band_lr":
                    Db, Ub = band_cr.from_dense(Dm, self.lr["m"])
                    Vob = band_cr.ob_from_dense(Dm, self.lr["obr"], self.lr["obc"])
                    # >= 1 refinement sweep: the Woodbury Gershgorin shift
                    # trades conditioning for a guaranteed-SPD band factor
                    x, ok = band_cr.cr_solve_woodbury(
                        Db, Ub, rhs, Vob,
                        jnp.asarray(self.lr["ob_i"]),
                        jnp.asarray(self.lr["ob_j"]),
                        jnp.asarray(self.lr["jrows"]),
                        max(refine, 1),
                    )
                else:
                    x, ok = dense_cholesky.cholesky_solve(Dm, rhs, refine)
                xp = x[: 6 * self.num_p].reshape(self.num_p, 6)
            xl = schur.back_substitute(invHll, bl, Hpl, xp, consts.sc, self.num_l)
            return xp, xl, ok
        if s.optimize_p:
            Hpp_d = assembly.damp(Hpp, lam)
            xp = smallmat.solve_sym6x6(Hpp_d, bp)
            return xp, jnp.zeros((0, 3), dt), jnp.all(jnp.isfinite(xp))
        Hll_d = assembly.damp(Hll, lam)
        xl = smallmat.solve_sym3x3(Hll_d, bl)
        return jnp.zeros((0, 6), dt), xl, jnp.all(jnp.isfinite(xl))

    def _apply_update(self, state: State, xp, xl):
        """updatePoses + updateLandmarks (cu:1045-1068), active vertices only."""
        qs, ts, Xws = state.qs, state.ts, state.Xws
        if self.num_p:
            qn, tn = se3.update_pose(xp, qs[: self.num_p], ts[: self.num_p])
            qs = qs.at[: self.num_p].set(qn)
            ts = ts.at[: self.num_p].set(tn)
        if self.num_l:
            Xws = Xws.at[: self.num_l].add(xl)
        return State(qs, ts, Xws)

    def _rhs_of(self, sys):
        """(bp [P,6], bl [L,3]) from the path-specific system pytree."""
        if self.use_mxu:
            HppT, HllT, _ = sys
            return HppT[36:42].T, HllT[9:12].T
        Hpp, bp, Hll, bl, Hpl = sys
        return bp, bl

    def _max_diag(self, sys):
        if self.use_mxu:
            HppT, HllT, _ = sys
            return mxu.max_diagonal_T(HppT, HllT)
        Hpp, bp, Hll, bl, Hpl = sys
        return assembly.max_diagonal(Hpp, Hll)

    def _scale(self, xp, xl, bp, bl, lam):
        """Gain-ratio denominator sum x*(lambda*x + b) (cu:1070-1091)."""
        total = jnp.zeros((), self.dtype)
        if self.num_p:
            total = total + jnp.sum(xp * (lam * xp + bp))
        if self.num_l:
            total = total + jnp.sum(xl * (lam * xl + bl))
        return total

    # ------------------------------------------------------------------
    # fused on-device LM loop
    # ------------------------------------------------------------------

    def _make_lm_run(self, niterations: int):
        cfg = self.config
        maxq = cfg.max_inner_iterations
        dt = self.dtype

        def lm_run(state: State, consts: Consts) -> LMResult:
            def attenuation(rho):
                a = 1.0 - (2.0 * rho - 1.0) ** 3
                return jnp.clip(a, cfg.attenuation_min, cfg.attenuation_max)

            def outer_cond(carry):
                it, done = carry[0], carry[-1]
                return (it < niterations) & ~done

            def outer_body(carry):
                it, st, packs, F, lam, nu, chis, natt, done = carry
                # packs = the residual-pass outputs for st, carried from the
                # accepted trial's Fhat evaluation (or the pre-loop seed):
                # each accepted iteration saves one full residual pass
                sys = self._build(st, consts, *packs)
                bp, bl = self._rhs_of(sys)
                lam = jnp.where(
                    it == 0, cfg.tau * self._max_diag(sys).astype(dt), lam
                )

                def inner_cond(c):
                    q, rho = c[0], c[1]
                    return (q < maxq) & (rho < 0)

                def inner_body(c):
                    q, _, lam_c, nu_c, _, _, Fc = c
                    xp, xl, ok = self._solve(sys, lam_c, consts)
                    trial = self._apply_update(st, xp, xl)
                    # full residual pass: Fhat now AND, on acceptance, the
                    # packs the next outer iteration's build consumes (chi is
                    # the same reduction _chi_only ran — bit-identical)
                    e2t, x2t, e3t, x3t, F0t = self._residuals_and_chi(trial, consts)
                    Fhat = F0t.astype(dt)
                    scale = self._scale(xp, xl, bp, bl, lam_c) + dt.type(cfg.scale_eps)
                    rho = jnp.where(ok, (F - Fhat) / scale, dt.type(-1.0))
                    accept = rho > 0
                    # numerical failure (factorization not finite) marks the
                    # fp32 precision floor, not a trust-region signal: escalate
                    # lambda faster than the reference's nu doubling (which it
                    # applies to both cases, cpp:839-845) to skip dead retries
                    esc = jnp.where(
                        ok, nu_c, jnp.maximum(nu_c, dt.type(cfg.numerical_escalation))
                    )
                    lam_n = jnp.where(accept, lam_c * attenuation(rho), lam_c * esc)
                    nu_n = jnp.where(accept, dt.type(2.0), nu_c * 2.0)
                    st_n = jax.tree.map(lambda a, b: jnp.where(accept, a, b), trial, st)
                    pk_n = jax.tree.map(
                        lambda a, b: jnp.where(accept, a, b),
                        (e2t, x2t, e3t, x3t), packs,
                    )
                    F_n = jnp.where(accept, Fhat, Fc)
                    return (q + 1, rho, lam_n, nu_n, st_n, pk_n, F_n)

                init = (jnp.int32(0), dt.type(-1.0), lam, nu, st, packs, F)
                q, rho, lam, nu, st, packs, F = jax.lax.while_loop(
                    inner_cond, inner_body, init
                )

                chis = chis.at[it].set(F.astype(self.chi_dtype))
                done = (q == maxq) | (rho <= 0) | ~jnp.isfinite(lam)
                return (it + 1, st, packs, F, lam, nu, chis, natt + q, done)

            e20, x20, e30, x30, F00 = self._residuals_and_chi(state, consts)
            init = (
                jnp.int32(0),
                state,
                (e20, x20, e30, x30),
                F00.astype(dt),
                dt.type(0.0),
                dt.type(2.0),
                jnp.zeros((niterations,), self.chi_dtype),
                jnp.int32(0),
                jnp.bool_(False),
            )
            it, st, packs, F, lam, nu, chis, natt, done = jax.lax.while_loop(
                outer_cond, outer_body, init
            )
            return LMResult(state=st, chis=chis, niters=it, final_lambda=lam,
                            nattempts=natt)

        return lm_run

    # -- lazy materialization of the packed upload ----------------------

    def _materialize(self):
        if self._consts_cache is None:
            key = ("materialize", self._unpack_key)
            st, co = _jit_cached(key, lambda: self._unpack)(*self._blobs)
            self._state_cache, self._consts_cache = st, co

    @property
    def state(self) -> State:
        self._materialize()
        return self._state_cache

    @state.setter
    def state(self, value):
        self._state_cache = value

    @property
    def consts(self) -> Consts:
        self._materialize()
        return self._consts_cache

    def optimize(self, state: State, niterations: int) -> LMResult:
        try:
            return self._optimize_once(state, niterations)
        except Exception as e:
            # dense-compile failover: beyond ~PB=4096 the remote TPU
            # compiler dies on the 6PB x 6PB dense image (docs/PERF_NOTES.md
            # crossover).  "auto" avoids that regime statically; when an
            # explicit or band-fallback dense path still hits it, retry the
            # whole run on the matrix-free PCG solver instead of crashing
            # (the reference never faces this: its sparse Cholesky scales,
            # cuda_linear_solver.cpp:342-399).  Only compiler/runtime
            # failures trigger the retry — user errors re-raise unchanged.
            retryable = "Runtime" in type(e).__name__ or "Resource" in type(e).__name__
            if self.solver != "dense_cholesky" or not retryable:
                raise
            import sys

            print(
                "cuba_tpu: dense reduced solve failed to compile at "
                f"pad_blocks={self.pad_blocks}; falling back to solver='pcg'",
                file=sys.stderr,
            )
            self._switch_solver("pcg")
            return self._optimize_once(state, niterations)

    def _switch_solver(self, solver: str) -> None:
        self.solver = solver
        self._spec = self._build_spec()  # resolved solver is part of the key

    def _optimize_once(self, state: State, niterations: int) -> LMResult:
        if state is None and self._consts_cache is None:
            # fast path: unpack the uploaded blobs INSIDE the LM dispatch
            # (used by the public API's first optimize after initialize)
            key = ("lm_run_blob", niterations, self._unpack_key) + self._spec

            def make():
                run = self._make_lm_run(niterations)
                unpack = self._unpack

                def blob_run(*blobs):
                    st, co = unpack(*blobs)
                    return run(st, co)

                return blob_run

            return _jit_cached(key, make)(*self._blobs)
        if state is None:
            state = self.state
        key = ("lm_run", niterations) + self._spec
        fn = _jit_cached(key, lambda: self._make_lm_run(niterations))
        return fn(state, self.consts)

    # ------------------------------------------------------------------
    # fused-path phase attribution (reference 8-phase TimeProfile from a
    # normal optimize() — cuda_bundle_adjustment.cpp:545-562 prints this
    # table after every run; the fused device loop cannot be host-timed
    # per phase, so per-phase costs are calibrated once per compiled spec
    # and each run's measured total is distributed by those ratios)
    # ------------------------------------------------------------------

    def _schur_part(self, sys, lam, consts):
        """The Schur-complement stage of :meth:`_solve` in isolation —
        used only by phase calibration (reference phase '4: Schur
        Complement').  Returns a scalar depending on every stage output so
        XLA cannot dead-code-eliminate the non-opaque (XLA-path) ops."""
        s = self.structure
        dt = self.dtype
        if self.use_mxu:
            HppT, HllT, HplT = sys
            plans, mc = self.mxu_plans, consts.mxu
            interp = self.mxu_interpret
            iv9, W, bscT, g12 = mxu.prepare_factors_mxu(
                HppT, HllT, HplT, lam, self.num_p, self.num_l, plans, mc,
                interpret=interp,
            )
            dep = iv9.ravel()[0] + W.ravel()[0] + bscT.ravel()[0] + g12.ravel()[0]
            if self.solver == "pcg":
                return dep
            if self.solver == "band_cr" and plans.v2:
                Db, Ub = mxu.schur_band_mxu(
                    HppT, W, HplT, lam, self.num_p, self.pad_blocks,
                    plans, mc, dt, interpret=interp,
                )
                return dep + Db[0, 0, 0] + Ub[0, 0, 0]
            Dm = mxu.schur_dense_mxu(
                HppT, W, HplT, lam, self.num_p, self.pad_blocks, plans, mc, dt,
                interpret=interp,
            )
            return dep + Dm[0, 0]
        Hpp, bp, Hll, bl, Hpl = sys
        if not (s.optimize_p and s.optimize_l):
            return jnp.zeros((), dt)
        Hll_d = assembly.damp(Hll, lam)
        invHll, W, bsc = schur.prepare_factors(bp, Hll_d, bl, Hpl, consts.sc, self.num_p)
        dep = invHll.ravel()[0] + W.ravel()[0] + bsc.ravel()[0]
        if self.solver == "pcg":
            return dep
        Hpp_d = assembly.damp(Hpp, lam)
        Dm = schur.assemble_dense(Hpp_d, W, Hpl, consts.sc, self.num_p, self.pad_blocks)
        return dep + Dm[0, 0]

    def phase_calibration(self):
        """Per-phase device seconds, measured once per compiled spec.

        Returns {resid, chi, build, schur, solve, apply}: wall seconds of
        one call to each jitted phase function (best of 2, fenced by a
        4-byte scalar read — docs/PERF_NOTES.md tunnel hygiene).  The
        functions are the same ones optimize_profiled uses, so the
        compile cost is shared and cached."""
        key = ("phase_calib",) + self._spec
        hit = _PHASE_CALIB_CACHE.get(key)
        if hit is not None:
            return hit
        st, co = self.state, self.consts
        residuals = self._get_jit("residuals", self._residuals_and_chi)
        chi_only = self._get_jit("chi_only", self._chi_only)
        build = self._get_jit("build", self._build)
        maxdiag = self._get_jit("maxdiag", self._max_diag)
        solve = self._get_jit("solve", self._solve)
        applyu = self._get_jit("apply", self._apply_update)
        schurp = self._get_jit("schur_part", self._schur_part)

        def fence(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.ravel(leaf)[0])

        def timed(fn, *a):
            out = fn(*a)  # compile + first run
            fence(out)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                out = fn(*a)
                fence(out)
                best = min(best, time.perf_counter() - t0)
            return best, out

        t_resid, r = timed(residuals, st, co)
        err2, Xc2, err3, Xc3, _ = r
        t_chi, _ = timed(chi_only, st, co)
        t_build, sys = timed(build, st, co, err2, Xc2, err3, Xc3)
        lam = self.dtype.type(self.config.tau) * maxdiag(sys).astype(self.dtype)
        t_schur, _ = timed(schurp, sys, lam, co)
        t_solve, sol = timed(solve, sys, lam, co)
        xp, xl, _ = sol
        t_apply, _ = timed(applyu, st, xp, xl)
        calib = {
            "resid": t_resid,
            "chi": t_chi,
            "build": t_build,
            "schur": t_schur,
            "solve": t_solve,
            "apply": t_apply,
        }
        _PHASE_CALIB_CACHE[key] = calib
        return calib

    def attribute_phases(self, total_s: float, niters: int, nattempts: int):
        """Distribute a fused run's measured wall seconds across the
        reference phases using the calibrated per-call ratios.

        Per outer iteration: one residual+chi pass and one build; per
        damped attempt: one solve (Schur + factorization), one trial-chi,
        one update.  '5: Symbolic Decomposition' stays 0 by design — the
        dense blocked Cholesky needs no symbolic pass (SURVEY.md §6; the
        reference spends 353.8 ms there, BASELINE.md)."""
        c = self.phase_calibration()
        n = max(int(niters), 1)
        a = max(int(nattempts), n)
        raw = {
            "2: Compute Error": n * c["resid"] + a * c["chi"],
            "3: Build System": n * c["build"],
            "4: Schur Complement": a * c["schur"],
            "6: Numerical Decomposition": a * max(c["solve"] - c["schur"], 0.0),
            "7: Update Solution": a * c["apply"],
        }
        s = sum(raw.values())
        scale = total_s / s if s > 0 else 0.0
        return {k: v * scale for k, v in raw.items()}

    # ------------------------------------------------------------------
    # phase-split driver (host-stepped; produces the 8-phase TimeProfile)
    # ------------------------------------------------------------------

    def _get_jit(self, name, fn):
        return _jit_cached((name,) + self._spec, lambda: fn)

    def optimize_profiled(self, state: State, niterations: int):
        """Reference-equivalent LM loop stepped from the host with per-phase
        timers (cpp:793-857 + ProfileItem timing).  Same numerics as
        ``optimize``; slower because of the per-phase synchronisation."""
        if state is None:
            state = self.state
        cfg = self.config
        prof = {k: 0.0 for k in PROFILE_ITEMS}
        residuals = self._get_jit("residuals", self._residuals_and_chi)
        chi_only = self._get_jit("chi_only", self._chi_only)
        build = self._get_jit("build", self._build)
        maxdiag = self._get_jit("maxdiag", self._max_diag)
        solve = self._get_jit("solve", self._solve)
        applyu = self._get_jit("apply", self._apply_update)
        scalef = self._get_jit("scale", self._scale)
        rhs_of = self._rhs_of

        def tick():
            jax.block_until_ready(state)
            return time.perf_counter()

        chis = []
        lam, nu, F = 0.0, 2.0, 0.0
        for it in range(niterations):
            t0 = time.perf_counter()
            err2, Xc2, err3, Xc3, F_dev = residuals(state, self.consts)
            F = float(F_dev)
            prof["2: Compute Error"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            sys = jax.block_until_ready(build(state, self.consts, err2, Xc2, err3, Xc3))
            bp, bl = rhs_of(sys)
            prof["3: Build System"] += time.perf_counter() - t0

            if it == 0:
                lam = cfg.tau * float(maxdiag(sys))

            q, rho = 0, -1.0
            while q < cfg.max_inner_iterations and rho < 0:
                t0 = time.perf_counter()
                xp, xl, ok = jax.block_until_ready(
                    solve(sys, self.dtype.type(lam), self.consts)
                )
                prof["6: Numerical Decomposition"] += time.perf_counter() - t0

                t0 = time.perf_counter()
                trial = jax.block_until_ready(applyu(state, xp, xl))
                prof["7: Update Solution"] += time.perf_counter() - t0

                t0 = time.perf_counter()
                Fhat = float(chi_only(trial, self.consts))
                prof["2: Compute Error"] += time.perf_counter() - t0

                scale = float(scalef(xp, xl, bp, bl, self.dtype.type(lam))) + cfg.scale_eps
                rho = (F - Fhat) / scale if bool(ok) else -1.0
                if rho > 0:
                    a = 1.0 - (2.0 * rho - 1.0) ** 3
                    lam *= float(np.clip(a, cfg.attenuation_min, cfg.attenuation_max))
                    nu = 2.0
                    F = Fhat
                    state = trial
                    break
                lam *= nu
                nu *= 2.0
                q += 1

            chis.append(F)
            if q == cfg.max_inner_iterations or rho <= 0 or not np.isfinite(lam):
                break

        chis_arr = jnp.asarray(np.array(chis + [0.0] * (niterations - len(chis))))
        return (
            LMResult(
                state=state,
                chis=chis_arr,
                niters=jnp.int32(len(chis)),
                final_lambda=jnp.asarray(lam, self.dtype),
            ),
            prof,
        )

    # ------------------------------------------------------------------

    def chi_squares(self, state: State) -> np.ndarray:
        """Per-edge unrobustified chi2 in the CALLER's (original insertion)
        edge order — internal results are unpermuted through the structure's
        edge sort (structure.mono_perm/stereo_perm)."""
        if state is None:
            state = self.state

        def fn(st, consts):
            if self.use_rows:
                # rows front end: the AoS edge consts are wire dummies;
                # compute per-edge chi from the transposed packs instead
                from cuba_tpu.solver import edgerows

                pm, ps, _, _, _ = self._residuals_and_chi(st, consts)
                out = []
                for pack, omegaT, count in (
                    (pm, consts.mxu.omegaT_m, self.structure.mono.count),
                    (ps, consts.mxu.omegaT_s, self.structure.stereo.count),
                ):
                    if pack is None or not count:
                        out.append(jnp.zeros((0,), self.dtype))
                        continue
                    errT = pack[1]  # [mdim, e_pad]
                    chis = edgerows.chi_per_edge(list(errT), omegaT)
                    out.append(chis[:count].astype(self.dtype))
                return jnp.concatenate(out)
            out = []
            if self.structure.mono.count:
                e2, _ = assembly.edge_residuals(st.qs, st.ts, consts.cams, st.Xws, consts.mono, 2)
                out.append(assembly.chi_squares(e2, consts.mono.omega))
            else:
                out.append(jnp.zeros((0,), self.dtype))
            if self.structure.stereo.count:
                e3, _ = assembly.edge_residuals(st.qs, st.ts, consts.cams, st.Xws, consts.stereo, 3)
                out.append(assembly.chi_squares(e3, consts.stereo.omega))
            else:
                out.append(jnp.zeros((0,), self.dtype))
            return jnp.concatenate(out)

        internal = np.asarray(self._get_jit("chi_squares", fn)(state, self.consts))
        s = self.structure
        out = np.empty_like(internal)
        nm = s.mono.count
        if s.mono_perm is not None and nm:
            out[: nm][s.mono_perm] = internal[:nm]
        else:
            out[:nm] = internal[:nm]
        if s.stereo_perm is not None and internal.size > nm:
            out[nm:][s.stereo_perm] = internal[nm:]
        else:
            out[nm:] = internal[nm:]
        return out
