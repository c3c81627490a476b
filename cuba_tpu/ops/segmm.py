"""One-hot segment-matmul Pallas kernels — the TPU-native scatter/gather.

The reference's CUDA kernels scatter with atomicAdd (reference:
src/cuda_block_solver.cu:147-148, :818-837) and gather with per-thread
pointer chasing.  XLA's TPU lowering of gather/scatter/segment_sum runs at
~5-10 GB/s (measured, docs/PERF_NOTES.md) — two orders of magnitude below
HBM.  These kernels replace every index-driven reduction with MXU matmuls
against compare-built one-hot matrices:

    out[:, s] (+)= sum_n vals[:, n] * (ids[n] == s)
    ==  vals @ Q,   Q[r, s] = (ids[r] == s)

Q is built on-chip with ``broadcasted_iota`` + compare (never materialized
in HBM), and the contraction runs on the MXU.  Data layout is transposed —
``[D, N]`` with N on lanes — so D=6/12/18/42 block rows cost sublanes, not
128-wide lanes.

Three instantiations (see docs/PERF_NOTES.md "Design conclusions"):

* ``accum_segsum``   — ids in any order, small output (S lanes in VMEM):
                       grid over input chunks, persistent VMEM accumulator.
* ``tiled_segsum``   — ids locally sorted: grid over output tiles, each
                       tile reduces a windowed input range (scalar-prefetch
                       window bases), write-once output.
* ``tiled_gather``   — out[:, s] = src[:, ids[s]]: same skeleton with the
                       one-hot built from output-side ids.

All kernels accumulate in fp32 with ``Precision.HIGHEST`` by default (TPU
matmuls are bf16 at default precision — 1e-3 error, unacceptable here).
Every function has an ``_xla`` reference twin used on CPU, for parity
tests, and as fallback when the host-side plan detects pathological
locality.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST
# Marker for the one-hot dot: Mosaic has no per-operand precision, so we
# split the VALUE operand into a bf16 triple manually (3 DEFAULT-precision
# MXU passes, fp32-exact because the one-hot factor is exact in bf16) —
# half the cost of Precision.HIGHEST's 6 passes.
ONEHOT_PREC = "onehot_bf16x3"


def _trunc_bf16(x):
    """fp32 -> fp32 with the low 16 mantissa bits zeroed (exactly
    bf16-representable).  Done by bit masking, NOT astype: Pallas interpret
    mode treats astype(bfloat16) as a value-preserving relabel, which would
    silently collapse the 3-term split to one rounded pass."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000), jnp.float32)


def _dot(a, b, precision):
    if precision == ONEHOT_PREC:
        bb = b.astype(jnp.bfloat16)
        h1 = _trunc_bf16(a)
        r = a - h1
        h2 = _trunc_bf16(r)
        a3 = (r - h2).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        out = jax.lax.dot_general(h1.astype(jnp.bfloat16), bb, dims,
                                  preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(h2.astype(jnp.bfloat16), bb, dims,
                                   preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(a3, bb, dims, preferred_element_type=jnp.float32)
        return out
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=precision,
        preferred_element_type=jnp.float32,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vmem_for_window(R: int, T_S: int, D: int):
    """Scoped-VMEM cap for the windowed one-hot kernels.  The default
    (16MB) is fine for bench-scale windows, but a large-P full-residency
    gather plan (block = p_src_pad, e.g. 16k+ poses) builds an [R, T_S]
    iota + bf16 one-hot that alone exceeds it — size the cap to the
    working set instead of failing to compile."""
    need = R * T_S * 6 + 2 * D * R * 4 + D * T_S * 8  # iota+onehot, src x2, out
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(120 << 20, max(32 << 20, 2 * need))
    )


# ---------------------------------------------------------------------------
# accum_segsum: unsorted ids, small S (whole output lives in VMEM)
# ---------------------------------------------------------------------------


def accum_segsum(
    vals: jnp.ndarray,  # [D, N], N multiple of chunk
    ids: jnp.ndarray,  # [N] int32; out-of-range ids are dropped
    num_out: int,
    *,
    chunk: int = 1024,
    precision=ONEHOT_PREC,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[D, num_out] with out[:, s] = sum of vals[:, n] where ids[n]==s."""
    D, N = vals.shape
    assert N % chunk == 0, (N, chunk)
    S_pad = _round_up(max(num_out, 1), 128)
    grid = N // chunk

    def kern(ids_ref, vals_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        idv = ids_ref[0, :]
        Q = (
            idv[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (chunk, S_pad), 1)
        ).astype(vals_ref.dtype)
        out_ref[:] += _dot(vals_ref[:], Q, precision)

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda c: (c * 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, chunk), lambda c: (c * 0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, S_pad), lambda c: (c * 0, c * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, S_pad), jnp.float32),
        interpret=interpret,
    )(ids.reshape(1, N), vals)
    return out[:, :num_out]


def accum_segsum_xla(vals, ids, num_out):
    clamped = jnp.where((ids >= 0) & (ids < num_out), ids, num_out)
    return jax.ops.segment_sum(vals.T, clamped, num_segments=num_out + 1)[:num_out].T


# ---------------------------------------------------------------------------
# windowed accum_segsum: ids locally banded, whole output VMEM-resident
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AccumWindowPlan:
    """Per-chunk output windows for accum_segsum_windowed.

    The ids in chunk c all fall in [wb[c], wb[c] + win); wb is 128-aligned.
    Cuts the one-hot factor from [chunk, S_pad] to [chunk, win] — at kitti00
    scale the pose-side quadratic-form accumulate drops ~5x in MXU passes
    (S_pad 1408 -> win 256) because the landmark-major edge order gives
    every 1024-edge chunk a narrow band of observing poses."""

    chunk: int
    win: int
    num_chunks: int
    wb: np.ndarray  # [num_chunks] int32 window base in 128-column units
    out_pad: int
    ok: bool


def plan_accum_windows(
    ids: np.ndarray, num_out: int, *, chunk: int = 1024, max_win: int = 512
) -> AccumWindowPlan:
    ids = np.asarray(ids)
    N = int(ids.size)
    C = max(N // chunk, 1)
    if N % chunk != 0 or num_out <= 0:
        return AccumWindowPlan(chunk, 0, C, np.zeros(C, np.int32), 0, False)
    from cuba_tpu import native

    nat = native.tile_minmax(ids, num_out, chunk, 1, C)
    if nat is not None:
        lo, hi = nat
    else:
        iv = ids.astype(np.int64).reshape(C, chunk)
        valid = (iv >= 0) & (iv < num_out)
        lo = np.where(valid, iv, np.int64(1) << 40).min(axis=1)
        hi = np.where(valid, iv, -1).max(axis=1)
    empty = hi < 0
    lo[empty] = 0
    hi[empty] = 0
    wb = lo // 128  # in 128-column units (Mosaic must prove slice alignment)
    width = int((hi - wb * 128).max()) + 1
    win = max(_round_up(width, 128), 128)
    ok = win <= max_win
    out_pad = max(_round_up(int(wb.max()) * 128 + win, 128), _round_up(num_out, 128))
    return AccumWindowPlan(chunk, win, C, wb.astype(np.int32), out_pad, ok)


def accum_segsum_windowed(
    vals: jnp.ndarray,  # [D, N]
    ids: jnp.ndarray,  # [N] int32; out-of-window/-1 ids are dropped
    num_out: int,
    plan: AccumWindowPlan,
    wb: jnp.ndarray,  # device copy of plan.wb
    *,
    precision=ONEHOT_PREC,
    interpret: bool = False,
) -> jnp.ndarray:
    D, N = vals.shape
    chunk, W, C = plan.chunk, plan.win, plan.num_chunks
    assert N == C * chunk, (N, C, chunk)

    def kern(wb_ref, ids_ref, vals_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        base = wb_ref[c] * 128
        rel = ids_ref[0, :] - base
        Q = (
            rel[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (chunk, W), 1)
        ).astype(vals_ref.dtype)
        out_ref[:, pl.ds(base, W)] += _dot(vals_ref[:], Q, precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda c, wb: (c * 0, c)),
            pl.BlockSpec((D, chunk), lambda c, wb: (c * 0, c)),
        ],
        out_specs=pl.BlockSpec((D, plan.out_pad), lambda c, wb: (c * 0, c * 0)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, plan.out_pad), jnp.float32),
        interpret=interpret,
    )(wb, ids.reshape(1, N), vals)
    return out[:, :num_out]


# ---------------------------------------------------------------------------
# tile plans (host-side, once per initialize)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Window metadata for tiled_segsum / tiled_gather.

    For tile t (T_S output columns / ids), the relevant input columns all lie
    in blocks [base_block[t], base_block[t] + n_blocks) of size block each.
    ``n_pad`` is the padded minor size the runtime array must have.
    """

    tile: int  # T_S: output columns per grid tile
    block: int  # R_in: input columns per inner step
    n_blocks: int  # C: inner steps per tile
    num_tiles: int
    base_block: np.ndarray  # [num_tiles] int32
    n_pad: int  # required padded input minor dim
    ok: bool  # False -> caller must use the XLA fallback


def plan_tiles(
    ids: np.ndarray,  # [N] int32 sorted-ish OUTPUT ids per input (expand mode)
    num_out: int,
    *,
    tile: int = 512,
    block: int = 1024,
    max_blocks: int = 8,
) -> TilePlan:
    """Plan for tiled_segsum: per output tile, the input range covering it.

    Requires mild locality: inputs mapping to tile t span <= max_blocks*block
    contiguous input columns.  Invalid ids (<0 or >=num_out) are ignored.
    """
    N = int(ids.size)
    num_tiles = max((num_out + tile - 1) // tile, 1)
    from cuba_tpu import native

    nat = native.tile_minmax(ids, num_out, tile, 0, num_tiles)
    if nat is not None:
        first, last = nat
    else:
        valid = (ids >= 0) & (ids < num_out)
        idx = np.nonzero(valid)[0]
        t_of = ids[idx] // tile
        first = np.full(num_tiles, np.int64(1) << 62, dtype=np.int64)
        last = np.full(num_tiles, -1, dtype=np.int64)
        np.minimum.at(first, t_of, idx)
        np.maximum.at(last, t_of, idx)
    empty = last < 0
    first[empty] = 0
    last[empty] = 0
    base_block = first // block
    end_block = last // block + 1
    base_block[empty] = -1  # kernels skip compute for empty tiles
    n_blocks = int(np.max(end_block - base_block)) if num_tiles else 1
    n_blocks = max(n_blocks, 1)
    ok = n_blocks <= max_blocks
    n_pad = int(np.max(base_block) + n_blocks) * block if ok else _round_up(N, block)
    n_pad = max(n_pad, block)
    return TilePlan(tile, block, n_blocks, num_tiles, base_block.astype(np.int32), n_pad, ok)


def plan_gather_tiles(
    ids: np.ndarray,  # [N] int32 SOURCE column per output (gather mode)
    num_src: int,
    *,
    tile: int = 512,
    block: int = 1024,
    max_blocks: int = 8,
) -> TilePlan:
    """Plan for tiled_gather: per output tile, the source-column window."""
    N = int(ids.size)
    num_tiles = max((N + tile - 1) // tile, 1)
    from cuba_tpu import native

    nat = native.tile_minmax(ids, num_src, tile, 1, num_tiles)
    if nat is not None:
        lo, hi = nat
        any_valid = hi >= 0
        lo[~any_valid] = 0
        hi[~any_valid] = 0
    else:
        pad = num_tiles * tile - N
        idp = np.concatenate([ids, np.full(pad, -1, np.int32)]).reshape(num_tiles, tile)
        valid = (idp >= 0) & (idp < num_src)
        any_valid = valid.any(axis=1)
        lo = np.where(any_valid, np.where(valid, idp, num_src).min(axis=1), 0)
        hi = np.where(any_valid, np.where(valid, idp, -1).max(axis=1), 0)
    base_block = lo // block
    n_blocks = int(np.max(hi // block + 1 - base_block)) if num_tiles else 1
    base_block[~any_valid] = -1  # kernels skip compute for empty tiles
    n_blocks = max(n_blocks, 1)
    ok = n_blocks <= max_blocks
    n_pad = int(np.max(base_block) + n_blocks) * block if ok else _round_up(num_src, block)
    n_pad = max(n_pad, block)
    return TilePlan(tile, block, n_blocks, num_tiles, base_block.astype(np.int32), n_pad, ok)


# ---------------------------------------------------------------------------
# plan broadening (multi-chip SPMD): pad a plan's STATIC dims up to shared
# maxima so per-shard plans trace to one program under shard_map.  Extra
# tiles carry base_block = -1 (the kernels' empty-tile skip), extra chunks
# carry all-invalid ids, wider windows only enlarge the one-hot factor —
# all semantically inert paddings (tiled_segsum/tiled_gather zero-fill at
# c == 0 unconditionally; schur_fused writes zero windows for -1 triplets).
# ---------------------------------------------------------------------------


def broaden_tile_plan(p: TilePlan, num_tiles: int = 0, n_blocks: int = 0,
                      n_pad: int = 0) -> TilePlan:
    """Pad a TilePlan's statics up to the given minima (see module note)."""
    nt = max(p.num_tiles, num_tiles)
    nb = max(p.n_blocks, n_blocks)
    bb = p.base_block
    if nt > p.num_tiles:
        bb = np.concatenate([bb, np.full(nt - p.num_tiles, -1, np.int32)])
    top = int(bb.max()) if bb.size else -1
    req = (max(top, 0) + nb) * p.block
    npad = _round_up(max(p.n_pad, req, n_pad, p.block), p.block)
    return TilePlan(p.tile, p.block, nb, nt, bb.astype(np.int32), npad, p.ok)


def broaden_accum_plan(p: AccumWindowPlan, num_chunks: int = 0, win: int = 0,
                       out_pad: int = 0) -> AccumWindowPlan:
    """Pad an AccumWindowPlan's statics up to the given minima."""
    nc = max(p.num_chunks, num_chunks)
    w = max(p.win, win)
    wb = p.wb
    if nc > p.num_chunks:
        wb = np.concatenate([wb, np.zeros(nc - p.num_chunks, np.int32)])
    top = int(wb.max()) * 128 if wb.size else 0
    op = _round_up(max(p.out_pad, top + w, out_pad, 128), 128)
    return AccumWindowPlan(p.chunk, w, nc, wb.astype(np.int32), op, p.ok)


def broaden_schur_plan(p: "SchurPlan", num_chunks: int = 0, kwin: int = 0,
                       n_slot_pad: int = 0, n_hsc_pad: int = 0) -> "SchurPlan":
    """Pad a SchurPlan's statics up to the given minima.  Widening kwin
    re-lays the per-chunk gid rows ([C, kwin] with -1 tails); lk local
    indices stay valid (positions within each chunk's block list)."""
    C0, K0 = p.num_chunks, p.kwin
    C = max(C0, num_chunks)
    K = max(K0, _round_up(kwin, 128) if kwin else K0)
    sb, li, lj, lk = p.sb, p.li, p.lj, p.lk
    gid = p.gid.reshape(C0, K0)
    if K > K0:
        gid = np.concatenate(
            [gid, np.full((C0, K - K0), -1, gid.dtype)], axis=1
        )
    if C > C0:
        sb = np.concatenate([sb, np.zeros(C - C0, np.int32)])
        pad = np.full((C - C0) * p.chunk, -1, np.int32)
        li = np.concatenate([li, pad])
        lj = np.concatenate([lj, pad])
        lk = np.concatenate([lk, pad])
        gid = np.concatenate([gid, np.full((C - C0, K), -1, gid.dtype)])
    nsp = max(p.n_slot_pad, (int(sb.max()) + 2) * p.slot_block if sb.size else 0,
              n_slot_pad)
    nhp = max(p.n_hsc_pad, n_hsc_pad)
    return SchurPlan(p.chunk, p.slot_block, K, C, sb.astype(np.int32),
                     li.astype(np.int32), lj.astype(np.int32),
                     lk.astype(np.int32), gid.reshape(-1).astype(np.int32),
                     nsp, nhp, p.ok)


# ---------------------------------------------------------------------------
# tiled_segsum: locally-sorted ids, any S, write-once output tiles
# ---------------------------------------------------------------------------


def tiled_segsum(
    vals: jnp.ndarray,  # [D, n_pad] (padding cols must carry invalid ids)
    ids: jnp.ndarray,  # [n_pad] int32 output column per input column
    num_out: int,
    plan: TilePlan,
    base_block: jnp.ndarray,  # [num_tiles] int32 (device copy of plan.base_block)
    *,
    precision=ONEHOT_PREC,
    interpret: bool = False,
) -> jnp.ndarray:
    D, Np = vals.shape
    T_S, R, C, T = plan.tile, plan.block, plan.n_blocks, plan.num_tiles
    assert Np >= plan.n_pad and Np % R == 0, (Np, plan.n_pad, R)

    def kern(bb_ref, ids_ref, vals_ref, out_ref):
        t = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # bb < 0 marks a tile with no inputs: only the zero-fill runs
        # (97% of dense Schur block-table tiles are empty)
        @pl.when(bb_ref[t] >= 0)
        def _():
            idv = ids_ref[0, :]
            base = t * T_S
            Q = (
                idv[:, None] - base
                == jax.lax.broadcasted_iota(jnp.int32, (R, T_S), 1)
            ).astype(vals_ref.dtype)
            out_ref[:] += _dot(vals_ref[:], Q, precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, R), lambda t, c, bb: (t * 0, jnp.maximum(bb[t], 0) + c)),
            pl.BlockSpec((D, R), lambda t, c, bb: (t * 0, jnp.maximum(bb[t], 0) + c)),
        ],
        out_specs=pl.BlockSpec((D, T_S), lambda t, c, bb: (t * 0, t)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, T * T_S), jnp.float32),
        compiler_params=_vmem_for_window(R, T_S, D),
        interpret=interpret,
    )(base_block, ids.reshape(1, Np), vals)
    return out[:, :num_out]


def tiled_segsum_xla(vals, ids, num_out):
    return accum_segsum_xla(vals, ids, num_out)


# ---------------------------------------------------------------------------
# tiled_gather: out[:, n] = src[:, ids[n]] (ids locally sorted or src small)
# ---------------------------------------------------------------------------


def tiled_gather(
    src: jnp.ndarray,  # [D, n_src_pad]
    ids: jnp.ndarray,  # [N_out_pad] int32 source column per output (invalid -> 0s)
    plan: TilePlan,
    base_block: jnp.ndarray,  # [num_tiles] int32
    *,
    num_out: Optional[int] = None,
    precision=ONEHOT_PREC,
    interpret: bool = False,
) -> jnp.ndarray:
    D, Sp = src.shape
    T_S, R, C, T = plan.tile, plan.block, plan.n_blocks, plan.num_tiles
    assert Sp >= plan.n_pad and Sp % R == 0, (Sp, plan.n_pad, R)
    Np = T * T_S
    assert ids.shape[0] == Np, (ids.shape, Np)

    def kern(bb_ref, ids_ref, src_ref, out_ref):
        t = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(bb_ref[t] >= 0)
        def _():
            cols = ids_ref[0, :]  # [T_S] source column per output
            rbase = (bb_ref[t] + c) * R
            Q = (
                cols[None, :] - rbase
                == jax.lax.broadcasted_iota(jnp.int32, (R, T_S), 0)
            ).astype(src_ref.dtype)
            out_ref[:] += _dot(src_ref[:], Q, precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, T_S), lambda t, c, bb: (t * 0, t)),
            pl.BlockSpec((D, R), lambda t, c, bb: (t * 0, jnp.maximum(bb[t], 0) + c)),
        ],
        out_specs=pl.BlockSpec((D, T_S), lambda t, c, bb: (t * 0, t)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, Np), jnp.float32),
        compiler_params=_vmem_for_window(R, T_S, D),
        interpret=interpret,
    )(base_block, ids.reshape(1, Np), src)
    return out if num_out is None else out[:, :num_out]


def tiled_gather_xla(src, ids, num_out=None):
    n = ids.shape[0] if num_out is None else num_out
    safe = jnp.clip(ids[:n], 0, src.shape[1] - 1)
    valid = (ids[:n] >= 0) & (ids[:n] < src.shape[1])
    return jnp.where(valid[None, :], src[:, safe], 0.0)


# ---------------------------------------------------------------------------
# schur_fused: per-landmark pair products + windowed scatter into Hsc blocks
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SchurPlan:
    """Chunk metadata for schur_fused (host, once per initialize).

    Triplets (mul_i, mul_j, mul_k) are processed in landmark order in chunks
    of ``chunk``.  For chunk c all touched Hpl slots lie in the two
    ``slot_block``-sized blocks starting at block sb[c], and all output Hsc
    block ids lie in [kb[c], kb[c] + kwin).  li/lj/lk are the precomputed
    local ids (-1 for padding).
    """

    chunk: int
    slot_block: int  # W/G input block size (window = 2 blocks)
    kwin: int  # output lanes per chunk (compact block list, 128-aligned)
    num_chunks: int
    sb: np.ndarray  # [C] int32 block index into slot arrays
    li: np.ndarray  # [C*chunk] int32 local slot of W operand
    lj: np.ndarray  # [C*chunk] int32 local slot of G operand
    lk: np.ndarray  # [C*chunk] int32 triplet's index in its chunk's block list
    gid: np.ndarray  # [C*kwin] int32 global Hsc block per output lane (-1 pad)
    n_slot_pad: int  # required padded slot-array minor dim
    n_hsc_pad: int  # required padded output minor dim
    ok: bool


def _chunk_by_landmark(mi, mj, mk, col, chunk, slot_block):
    """Greedy landmark-granular chunking of the (landmark-major sorted)
    triplet streams: close a chunk early (pad with -1) whenever adding the
    next landmark's triplets would overflow the chunk capacity or push the
    chunk's slot window past 2*slot_block.  With no violations this packs
    exactly densely (same output as the plain reshape).  Returns padded
    (mi, mj, mk, num_chunks)."""
    n = mi.size
    lm = col[mi]
    starts = np.flatnonzero(np.concatenate(([True], lm[1:] != lm[:-1])))
    ends = np.append(starts[1:], n)
    counts = ends - starts
    lo_r = np.minimum.reduceat(np.minimum(mi, mj), starts)
    hi_r = np.maximum.reduceat(np.maximum(mi, mj), starts)
    if int(counts.max()) > chunk or int((hi_r - lo_r).max()) >= 2 * slot_block:
        # a single landmark exceeds the chunk/window — no chunking helps;
        # dense packing lets the caller mark the plan infeasible
        C = max((n + chunk - 1) // chunk, 1)
        pad = C * chunk - n
        return (
            np.concatenate([mi, np.full(pad, -1, np.int64)]),
            np.concatenate([mj, np.full(pad, -1, np.int64)]),
            np.concatenate([mk, np.full(pad, -1, np.int64)]),
            C,
        )
    win = 2 * slot_block
    nruns = starts.size
    new_start = np.empty(nruns, np.int64)  # padded position of each run
    cid = 0
    cur_n = 0
    cur_lo = np.int64(0)
    cur_hi = np.int64(-1)
    for r in range(nruns):
        c_, l_, h_ = counts[r], lo_r[r], hi_r[r]
        if cur_n:
            nlo = min(cur_lo, l_)
            nhi = max(cur_hi, h_)
            if cur_n + c_ > chunk or nhi >= (nlo // slot_block) * slot_block + win:
                cid += 1
                cur_n = 0
        if cur_n == 0:
            cur_lo, cur_hi = l_, h_
        else:
            cur_lo = min(cur_lo, l_)
            cur_hi = max(cur_hi, h_)
        new_start[r] = cid * chunk + cur_n
        cur_n += c_
    C = cid + 1
    pos = np.repeat(new_start - starts, counts) + np.arange(n, dtype=np.int64)
    out = []
    for a in (mi, mj, mk):
        p = np.full(C * chunk, -1, np.int64)
        p[pos] = a
        out.append(p)
    return out[0], out[1], out[2], C


def sc_geometry() -> tuple:
    """The session's fused-Schur plan geometry (chunk, slot_block, max_kwin),
    env-overridable via CUBA_TPU_SC_CHUNK / CUBA_TPU_SC_SB.  One source of
    truth for the engine (mxu.plan_schur_for) and the C++ symbolic pass
    (structure.py), so the baked plan always matches what the engine asks
    for.  slot_block sets the fused kernel's gather window (2*SB lanes per
    chunk) — the dominant FLOP term; smaller is faster as long as the
    landmark-granular re-chunk keeps the padding low (kitti00-loop at 256:
    6.6% padding, schur formation 12.75 -> 11.09 ms/attempt)."""
    import os
    import warnings

    def _env_int(name, default):
        raw = os.environ.get(name)
        if raw is None:
            return default
        try:
            return int(raw)
        except ValueError:
            warnings.warn(f"{name}={raw!r} is not an integer; using {default}")
            return default

    # SB=256 default (round 5): the slot window sets 80% of schur_fused's
    # physical FLOPs; halving it from 512 cut the kitti00-loop headline
    # 1.026 -> 0.850 s (with the windowed derive) at identical tunnel
    # weather, with 6.6% chunk padding.  Shapes whose landmarks overflow
    # the tighter window re-chunk at landmark granularity or fall back to
    # the plan-infeasible XLA path exactly as before.
    chunk = _env_int("CUBA_TPU_SC_CHUNK", 1024)
    sb = _env_int("CUBA_TPU_SC_SB", 256)
    # validate before the values reach integer division in the C++ planner
    # (0 would divide-by-zero / UB) or the kernel window geometry (lane
    # windows must be 128-multiples and fit inside one chunk)
    if chunk <= 0 or chunk % 64 != 0:
        warnings.warn(
            f"CUBA_TPU_SC_CHUNK={chunk} invalid (must be a positive "
            f"multiple of 64); using 1024"
        )
        chunk = 1024
    if sb <= 0 or sb % 64 != 0 or sb > chunk:
        # the kernel gather window is 2*sb lanes, so sb must be a positive
        # multiple of 64 (window a multiple of 128) and fit one chunk
        fallback = max(64, min(512, chunk) // 64 * 64)
        warnings.warn(
            f"CUBA_TPU_SC_SB={sb} invalid (must be a positive multiple of "
            f"64 and <= chunk={chunk}); using {fallback}"
        )
        sb = fallback
    return (chunk, sb, 1024)


def plan_schur(
    mul_i: np.ndarray,
    mul_j: np.ndarray,
    mul_k: np.ndarray,
    n_hpl: int,
    n_hsc: int,
    *,
    chunk: int = 1024,
    slot_block: int = 512,
    max_kwin: int = 1024,
    precomputed=None,
    col: "np.ndarray" = None,
) -> SchurPlan:
    """Sort triplets by landmark (== by slot i, since slots are landmark-major)
    and derive per-chunk slot windows + COMPACT output block lists (each chunk
    touches only ~chunk/avg_pairs_per_block distinct Hsc blocks; emitting a
    dense id-window instead dilutes the combine stage ~25x).
    ok=False when locality is insufficient.

    ``precomputed`` takes the raw fused-plan tuple the C++ symbolic pass
    emits alongside the triplets (BAStructure.schur_native) — same layout,
    zero extra work here.  Otherwise dispatches to the standalone C++
    planner (cuba_tpu/native) when available — this is ~0.6s of pure
    indexing at kitti00 scale in NumPy, ~60ms in C++.

    When the densely-packed chunking violates the 2-block slot window (a
    chunk mixing landmarks whose slot ranges span >= 2*slot_block — real
    loop-closure covisibility can do this marginally), the triplets are
    RE-CHUNKED at landmark granularity with padding so every chunk's window
    fits (``col`` required: slot -> landmark).  A failed fast plan
    (precomputed or standalone C++) falls through to this path instead of
    disabling the MXU pipeline."""
    from cuba_tpu import native

    # the C++ paths re-chunk at landmark granularity internally (the core
    # receives col), so their result is final — ok=False means genuinely
    # infeasible.  The precomputed tuple self-describes its geometry.
    if precomputed is not None and precomputed[0] == (chunk, slot_block, max_kwin):
        kwin, ok, C, n_slot_pad, n_hsc_pad, sb, li, lj, lk, gid = precomputed[1:]
        return SchurPlan(chunk, slot_block, int(kwin), C, sb, li, lj, lk,
                         gid, n_slot_pad, n_hsc_pad, ok)

    nat = native.schur_plan(mul_i, mul_j, mul_k, n_hpl, n_hsc, chunk,
                            slot_block, max_kwin, col=col)
    if nat is not None:
        kwin, ok, C, n_slot_pad, n_hsc_pad, sb, li, lj, lk, gid = nat
        return SchurPlan(chunk, slot_block, int(kwin), C, sb, li, lj, lk,
                         gid, n_slot_pad, n_hsc_pad, ok)

    n_mul = int(mul_i.size)
    order = np.argsort(mul_i, kind="stable")  # landmark-major slot order
    mi, mj, mk = mul_i[order], mul_j[order], mul_k[order]
    big = np.int64(1) << 40
    if col is not None and n_mul:
        mi, mj, mk, C = _chunk_by_landmark(
            mi.astype(np.int64), mj.astype(np.int64), mk.astype(np.int64),
            np.asarray(col, np.int64), chunk, slot_block,
        )
    else:
        C = max((n_mul + chunk - 1) // chunk, 1)
        pad = C * chunk - n_mul
        mi = np.concatenate([mi, np.full(pad, -1, np.int64)])
        mj = np.concatenate([mj, np.full(pad, -1, np.int64)])
        mk = np.concatenate([mk, np.full(pad, -1, np.int64)])
    mi2, mj2, mk2 = (a.reshape(C, chunk) for a in (mi, mj, mk))
    valid = mi2 >= 0
    smin = np.where(valid, np.minimum(mi2, mj2), big).min(axis=1)
    smax = np.where(valid, np.maximum(mi2, mj2), -1).max(axis=1)
    none = smax < 0
    smin[none] = 0
    smax[none] = 0
    sb = (smin // slot_block).astype(np.int32)
    ok = bool(np.all(smax - sb.astype(np.int64) * slot_block < 2 * slot_block))
    li = np.where(valid, mi2 - sb[:, None].astype(np.int64) * slot_block, -1)
    lj = np.where(valid, mj2 - sb[:, None].astype(np.int64) * slot_block, -1)

    # compact per-chunk block lists: sorted distinct mk per chunk
    mk_sorted = np.sort(np.where(valid, mk2, big), axis=1)  # [C, chunk]
    isnew = np.ones_like(mk_sorted, dtype=bool)
    isnew[:, 1:] = mk_sorted[:, 1:] != mk_sorted[:, :-1]
    isnew &= mk_sorted < big
    counts = isnew.sum(axis=1)
    kwin = min(max_kwin, max(_round_up(int(counts.max()) if C else 1, 128), 128))
    ok = ok and bool(counts.max() <= kwin if C else True)
    # gid[c, :counts[c]] = sorted distinct blocks of chunk c
    gid = np.full((C, kwin), -1, np.int64)
    if C and ok:
        rank = np.cumsum(isnew, axis=1) - 1  # position among distinct
        rows, cols = np.nonzero(isnew)
        gid[rows, rank[rows, cols]] = mk_sorted[rows, cols]
        # per-triplet local index: one global searchsorted over the row-wise
        # sorted lists, made globally ascending with per-chunk offsets
        stride = np.int64(n_hsc + 2)
        offs = (np.arange(C, dtype=np.int64) * stride)[:, None]
        flat = (np.where(gid >= 0, gid, stride - 1) + offs).reshape(-1)
        queries = (np.where(valid, mk2, 0) + offs).reshape(-1)
        lk = np.searchsorted(flat, queries).astype(np.int64) - (
            np.repeat(np.arange(C, dtype=np.int64), chunk) * kwin
        )
        lk = np.where(valid.reshape(-1), lk, -1).reshape(C, chunk)
    else:
        lk = np.where(valid, mk2, -1)
    n_slot_pad = max((int(sb.max()) + 2) * slot_block if C else slot_block,
                     _round_up(n_hpl, slot_block))
    n_hsc_pad = _round_up(n_hsc, 128)
    return SchurPlan(
        chunk, slot_block, kwin, C, sb,
        li.reshape(-1).astype(np.int32), lj.reshape(-1).astype(np.int32),
        lk.reshape(-1).astype(np.int32), gid.reshape(-1).astype(np.int32),
        n_slot_pad, n_hsc_pad, ok,
    )


def schur_fused(
    W: jnp.ndarray,  # [18, n_slot_pad]  W = Hpl @ invHll, rows (i*3+k)
    G: jnp.ndarray,  # [18, n_slot_pad]  Hpl, rows (j*3+k)
    plan: SchurPlan,
    sb: jnp.ndarray,  # device copies of plan.sb / li / lj / lk
    li: jnp.ndarray,
    lj: jnp.ndarray,
    lk: jnp.ndarray,
    *,
    precision=ONEHOT_PREC,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-chunk windowed pair products: sum over the chunk's triplets t of
    W[:, i_t] (x) G[:, j_t] at window position k_t - kb[c].

    Returns [36, C*kwin]: chunk c's window lives at lanes [c*kwin, (c+1)*kwin)
    and holds Hsc-block contributions for global blocks kb[c]+lane.  Combine
    windows with tiled_segsum over plan.gid (Mosaic cannot express the
    dynamic-lane-offset accumulate that a single-pass kernel would need).
    Together these give the Hpl invHll Hpl^T term of every Hsc block
    (reference: computeHschureKernel, src/cuda_block_solver.cu:964-977,
    minus the sign).
    """
    R = plan.chunk
    SB = plan.slot_block
    KW = plan.kwin
    C = plan.num_chunks
    WIN = 2 * SB

    def kern(sb_ref, li_ref, lj_ref, lk_ref, W0, W1, G0, G1, out_ref):
        Wwin = jnp.concatenate([W0[:], W1[:]], axis=1)  # [18, WIN]
        Gwin = jnp.concatenate([G0[:], G1[:]], axis=1)
        liv = li_ref[0, :]
        ljv = lj_ref[0, :]
        lkv = lk_ref[0, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (WIN, R), 0)
        Qi = (liv[None, :] == rows).astype(Wwin.dtype)
        Qj = (ljv[None, :] == rows).astype(Wwin.dtype)
        Wg = _dot(Wwin, Qi, precision)  # [18, R]
        Gg = _dot(Gwin, Qj, precision)
        prod_rows = []
        for a in range(6):
            for b in range(6):
                prod_rows.append(
                    jnp.sum(Wg[3 * a : 3 * a + 3, :] * Gg[3 * b : 3 * b + 3, :], axis=0)
                )
        prod = jnp.stack(prod_rows, axis=0)  # [36, R]
        Qk = (
            lkv[:, None] == jax.lax.broadcasted_iota(jnp.int32, (R, KW), 1)
        ).astype(prod.dtype)
        out_ref[:] = _dot(prod, Qk, precision)  # [36, KW]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, R), lambda c, sb: (c * 0, c)),  # li
            pl.BlockSpec((1, R), lambda c, sb: (c * 0, c)),  # lj
            pl.BlockSpec((1, R), lambda c, sb: (c * 0, c)),  # lk
            pl.BlockSpec((18, SB), lambda c, sb: (c * 0, sb[c])),  # W0
            pl.BlockSpec((18, SB), lambda c, sb: (c * 0, sb[c] + 1)),  # W1
            pl.BlockSpec((18, SB), lambda c, sb: (c * 0, sb[c])),  # G0
            pl.BlockSpec((18, SB), lambda c, sb: (c * 0, sb[c] + 1)),  # G1
        ],
        out_specs=pl.BlockSpec((36, KW), lambda c, sb: (c * 0, c)),
    )
    N = C * R
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((36, C * KW), jnp.float32),
        interpret=interpret,
    )(sb, li.reshape(1, N), lj.reshape(1, N), lk.reshape(1, N), W, W, G, G)


def schur_fused_xla(W, G, mul_i, mul_j, mul_k, n_hsc):
    """Reference implementation over the (unsorted) triplet arrays."""
    Wg = W[:, mul_i]  # [18, T]
    Gg = G[:, mul_j]
    Wr = Wg.reshape(6, 3, -1)
    Gr = Gg.reshape(6, 3, -1)
    prod = jnp.einsum("akt,bkt->abt", Wr, Gr, precision="highest").reshape(36, -1)
    return jax.ops.segment_sum(prod.T, mul_k, num_segments=n_hsc).T


# ---------------------------------------------------------------------------
# band_transpose: block-table -> dense matrix, skipping empty band tiles
# ---------------------------------------------------------------------------


def _dot_rhs_split(a_onehot, b):
    """dot(a, b) with a exactly representable in bf16 (one-hot) and b split
    into a bf16 triple — fp32-exact selection matmul with b on the right."""
    aa = a_onehot.astype(jnp.bfloat16)
    b1 = b.astype(jnp.bfloat16)
    r = b - b1.astype(jnp.float32)
    b2 = r.astype(jnp.bfloat16)
    b3 = (r - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    out = jax.lax.dot_general(aa, b1, dims, preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(aa, b2, dims, preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(aa, b3, dims, preferred_element_type=jnp.float32)
    return out


def band_transpose(
    m4: jnp.ndarray,  # [36, PB, PB], row (i*6+j) = element (i,j) of block (p,q)
    occ: jnp.ndarray,  # [T*T] int32: 1 if 128-block tile (tp,tq) has data
    PB: int,
    *,
    tile_p: int = 64,
    tile_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """The lane interleave (i*6+j, p, q) -> (6p+i, 6q+j) as one-hot MXU
    matmuls per 128-block tile: out_tile = sum_i Ri (sum_j x_ij Cj^T) with
    Ri[r,p] = (r == 6p+i), Cj[c,q] = (c == 6q+j).  XLA's native transpose
    runs this relayout at ~10 GB/s (~25ms for kitti00) and Mosaic cannot
    compile it as a vector shuffle; as selection matmuls it is exact (the
    value operand uses the bf16x3 split) and empty band tiles are skipped
    (BA Schur complements are ~99% empty off-band)."""
    TP_T, TQ_T = PB // tile_p, PB // tile_q
    TTP, TTQ = tile_p * 6, tile_q * 6

    def kern(occ_ref, x_ref, out_ref):
        tp = pl.program_id(0)
        tq = pl.program_id(1)

        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(occ_ref[tp * TQ_T + tq] > 0)
        def _():
            x = x_ref[:]  # [36, tile_p, tile_q]
            rp = jax.lax.broadcasted_iota(jnp.int32, (TTP, tile_p), 0)
            pp = jax.lax.broadcasted_iota(jnp.int32, (TTP, tile_p), 1)
            cq = jax.lax.broadcasted_iota(jnp.int32, (tile_q, TTQ), 1)
            qq = jax.lax.broadcasted_iota(jnp.int32, (tile_q, TTQ), 0)
            acc = jnp.zeros((TTP, TTQ), jnp.float32)
            for i in range(6):
                Ri = (rp == 6 * pp + i).astype(jnp.float32)  # [TTP, tile_p]
                Bi = jnp.zeros((tile_p, TTQ), jnp.float32)
                for j in range(6):
                    CjT = (cq == 6 * qq + j).astype(jnp.float32)  # [tile_q, TTQ]
                    Bi += _dot(x[i * 6 + j], CjT, ONEHOT_PREC)
                acc += _dot_rhs_split(Ri, Bi)
            out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TP_T, TQ_T),
        in_specs=[pl.BlockSpec((36, tile_p, tile_q), lambda a, b, o: (a * 0, a, b))],
        out_specs=pl.BlockSpec((TTP, TTQ), lambda a, b, o: (a, b)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PB * 6, PB * 6), jnp.float32),
        interpret=interpret,
    )(occ, m4)


# ---------------------------------------------------------------------------
# compact_to_dense: rank-major block tables -> dense damped Schur matrix
# ---------------------------------------------------------------------------


def compact_to_dense(
    gT: jnp.ndarray,  # [36, M*Wg] band-major combined Hsc blocks
    ghr: jnp.ndarray,  # [M*Wg] int32 block row per band slot (-1 pad)
    ghc: jnp.ndarray,  # [M*Wg] int32 block col per band slot (-1 pad)
    dbT: jnp.ndarray,  # [36, PB] damped diagonal blocks (identity on padding)
    occ: jnp.ndarray,  # [T_P*T_Q] int32 tile occupancy
    PB: int,
    Wg: int,
    *,
    tile_p: int = 64,
    tile_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense [6PB, 6PB] damped Schur matrix straight from ONE band-major
    compact block table: band m holds the (row, col)-sorted Hsc blocks
    whose row is in [m*64, (m+1)*64), packed at lanes [m*Wg, m*Wg+count_m).

    The previous layout kept TWO rank-major tables (row-rank up + col-rank
    mirrors), each fed by its own tiled_segsum combine.  Band-major packing
    makes the mirror blocks of output tile (tp, tq) — the blocks whose ROW
    is in tq's column range — a window of the SAME table (bands 2*tq and
    2*tq+1 for tile_q = 128), so one combine feeds both reads, the loop
    shape's col-rank combine (4.5x the odometry grid) disappears, and the
    multichip psum payload halves (docs/PERF_NOTES.md round 4).

      x_ij = RowSel @ (val_ij * ColSel)        (upper blocks, band tp)
           + MirSel @ (val_ji * MirColSel)     (mirrors, bands of tq)
           + diag one-hot * damped Hpp         (fused damping)
      out_tile = sum_i Ri @ (sum_j x_ij @ Cj^T)   (the 6x6 interleave)

    Window bases are pure index math (bands have fixed stride Wg), so no
    scalar prefetch is needed.  Sign matches schur.assemble_dense:
    dense = diag - (up + mirrors).  Replaces the reference's Hsc BSR
    assembly + twistCSR permutations (src/cuda_block_solver.cu:964-977,
    src/cuda_linear_solver.cpp:278-335) with MXU selection matmuls.
    """
    TP_T, TQ_T = PB // tile_p, PB // tile_q
    TTP, TTQ = tile_p * 6, tile_q * 6
    assert tile_q == 2 * tile_p  # mirror window = 2 consecutive bands
    Wu, Wc = Wg, 2 * Wg
    assert Wg % 128 == 0, Wg

    def kern(occ_ref, up_ref, iru_ref, icu_ref, cl_ref, mhr_ref, mhc_ref,
             db_ref, out_ref):
        tp = pl.program_id(0)
        tq = pl.program_id(1)

        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(occ_ref[tp * TQ_T + tq] > 0)
        def _():
            iru_l = iru_ref[0, :] - tp * tile_p  # local row of up slots
            icu_l = icu_ref[0, :] - tq * tile_q  # local col of up slots
            # mirror slots: output row = the block's COLUMN, output col =
            # the block's ROW (transposed read of the tq row-bands)
            ipc_l = mhc_ref[0, :] - tp * tile_p
            irc_l = mhr_ref[0, :] - tq * tile_q
            mir_off_diag = mhr_ref[0, :] != mhc_ref[0, :]

            rr_u = jax.lax.broadcasted_iota(jnp.int32, (tile_p, Wu), 0)
            cc_u = jax.lax.broadcasted_iota(jnp.int32, (Wu, tile_q), 1)
            RowSel = (rr_u == iru_l[None, :]).astype(jnp.bfloat16)
            ColSel = (cc_u == icu_l[:, None]).astype(jnp.float32)
            rr_m = jax.lax.broadcasted_iota(jnp.int32, (tile_p, Wc), 0)
            cc_m = jax.lax.broadcasted_iota(jnp.int32, (Wc, tile_q), 1)
            MirSel = ((rr_m == ipc_l[None, :]) & mir_off_diag[None, :]).astype(jnp.bfloat16)
            MirColSel = (cc_m == irc_l[:, None]).astype(jnp.float32)
            # fused damped-diagonal injection (identity on padding blocks).
            # db arrives in 128-wide blocks (Mosaic lane alignment): slot s
            # holds global block p = (tp//2)*128 + s; select rows/cols by
            # one-hot factors like the up/mirror paths.
            # lax.rem/div: jnp's % promotion recurses under x64 in-kernel
            tp_half = jax.lax.div(tp, jnp.int32(2))
            tp_par = jax.lax.rem(tp, jnp.int32(2))
            ss_r = jax.lax.broadcasted_iota(jnp.int32, (tile_p, 128), 1)
            pp_r = jax.lax.broadcasted_iota(jnp.int32, (tile_p, 128), 0)
            DRowSel = (pp_r == ss_r - tp_par * tile_p).astype(jnp.bfloat16)
            ss_c = jax.lax.broadcasted_iota(jnp.int32, (128, tile_q), 0)
            qq_c = jax.lax.broadcasted_iota(jnp.int32, (128, tile_q), 1)
            DColSel = (qq_c == ss_c + tp_half * 128 - tq * tile_q).astype(jnp.float32)

            rp = jax.lax.broadcasted_iota(jnp.int32, (TTP, tile_p), 0)
            pp = jax.lax.broadcasted_iota(jnp.int32, (TTP, tile_p), 1)
            cq = jax.lax.broadcasted_iota(jnp.int32, (tile_q, TTQ), 1)
            qq = jax.lax.broadcasted_iota(jnp.int32, (tile_q, TTQ), 0)
            acc = jnp.zeros((TTP, TTQ), jnp.float32)
            for i in range(6):
                Ri = (rp == 6 * pp + i).astype(jnp.float32)  # [TTP, tile_p]
                Bi = jnp.zeros((tile_p, TTQ), jnp.float32)
                for j in range(6):
                    vu = up_ref[i * 6 + j, :]   # [Wu]
                    vm = cl_ref[j * 6 + i, :]   # [Wc] transposed mirror element
                    x_ij = -_dot_rhs_split(RowSel, vu[:, None] * ColSel)
                    x_ij -= _dot_rhs_split(MirSel, vm[:, None] * MirColSel)
                    x_ij += _dot_rhs_split(
                        DRowSel, db_ref[i * 6 + j, :][:, None] * DColSel
                    )
                    CjT = (cq == 6 * qq + j).astype(jnp.float32)  # [tile_q, TTQ]
                    Bi += _dot(x_ij, CjT, ONEHOT_PREC)
                acc += _dot_rhs_split(Ri, Bi)
            out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TP_T, TQ_T),
        in_specs=[
            pl.BlockSpec((36, Wu), lambda a, b, o: (a * 0, a)),
            pl.BlockSpec((1, Wu), lambda a, b, o: (a * 0, a)),
            pl.BlockSpec((1, Wu), lambda a, b, o: (a * 0, a)),
            pl.BlockSpec((36, Wc), lambda a, b, o: (a * 0, b)),
            pl.BlockSpec((1, Wc), lambda a, b, o: (a * 0, b)),
            pl.BlockSpec((1, Wc), lambda a, b, o: (a * 0, b)),
            pl.BlockSpec((36, 128), lambda a, b, o: (a * 0, jax.lax.div(a, jnp.int32(2)))),
        ],
        out_specs=pl.BlockSpec((TTP, TTQ), lambda a, b, o: (a, b)),
    )
    MWg = gT.shape[1]
    # windows + double-buffered out tile + unrolled-loop transients push the
    # working set past the 16MB scoped-vmem default at kitti00 scale
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PB * 6, PB * 6), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(occ, gT, ghr.reshape(1, MWg), ghc.reshape(1, MWg),
      gT, ghr.reshape(1, MWg), ghc.reshape(1, MWg), dbT)


def compact_to_band(
    gT: jnp.ndarray,  # [36, M*Wg] band-major combined Hsc blocks
    ghr: jnp.ndarray,  # [M*Wg] int32 block row per band slot (-1 pad)
    ghc: jnp.ndarray,  # [M*Wg] int32 block col per band slot (-1 pad)
    dbT: jnp.ndarray,  # [36, PB] damped diagonal blocks (identity on padding)
    occ_band: jnp.ndarray,  # [m*2] int32: (k, e) band tile occupancy
    PB: int,
    Wg: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Block-tridiagonal storage straight from the band-major compact block
    table — the band-certified sibling of :func:`compact_to_dense` (see
    there for the layout).  The mirror blocks of band tile (k, e) — blocks
    with row in [cbase, cbase+64) and col back in k's range — are exactly
    band k+e of the same table, read transposed.

    Output [m*384, 768]: band tile (k, e) holds the dense 384x384 block
    A[k, k+e] of the damped Schur complement (e=0: diagonal D_k; e=1:
    super-diagonal U_k = A[k, k+1]).  Never materializes the dense
    [6PB, 6PB] matrix: at kitti00 scale that is 2*m = 44 tiles (~13 MB)
    instead of 285 MB.  The selection math is identical to
    compact_to_dense with tile_p = tile_q = 64 pose blocks (384 = 64*6
    scalars, so 6x6 pose blocks never straddle a CR block boundary).
    Sign matches schur.assemble_dense: band = diag - (up + mirrors).
    """
    tile = 64
    TT = tile * 6  # 384
    M = PB // tile
    Wu = Wc = Wg
    assert Wg % 128 == 0, Wg

    def kern(occ_ref, up_ref, iru_ref, icu_ref, cl_ref, mhr_ref, mhc_ref,
             db_ref, out_ref):
        k = pl.program_id(0)
        e = pl.program_id(1)

        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(occ_ref[k * 2 + e] > 0)
        def _():
            rbase = k * tile
            cbase = (k + e) * tile
            iru_l = iru_ref[0, :] - rbase  # local row of up slots
            icu_l = icu_ref[0, :] - cbase  # local col of up slots
            # mirror slots (band k+e read transposed): output row = the
            # block's COLUMN, output col = the block's ROW
            ipc_l = mhc_ref[0, :] - rbase
            irc_l = mhr_ref[0, :] - cbase
            mir_off_diag = mhr_ref[0, :] != mhc_ref[0, :]

            rr_u = jax.lax.broadcasted_iota(jnp.int32, (tile, Wu), 0)
            cc_u = jax.lax.broadcasted_iota(jnp.int32, (Wu, tile), 1)
            RowSel = (rr_u == iru_l[None, :]).astype(jnp.bfloat16)
            ColSel = (cc_u == icu_l[:, None]).astype(jnp.float32)
            rr_m = jax.lax.broadcasted_iota(jnp.int32, (tile, Wc), 0)
            cc_m = jax.lax.broadcasted_iota(jnp.int32, (Wc, tile), 1)
            MirSel = ((rr_m == ipc_l[None, :]) & mir_off_diag[None, :]).astype(jnp.bfloat16)
            MirColSel = (cc_m == irc_l[:, None]).astype(jnp.float32)
            # damped-diagonal injection: db slot s holds global block
            # (k//2)*128 + s; the one-hot selection is naturally zero for
            # e=1 (row and col pose ranges are disjoint there)
            k_half = jax.lax.div(k, jnp.int32(2))
            k_par = jax.lax.rem(k, jnp.int32(2))
            ss_r = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
            pp_r = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 0)
            DRowSel = (pp_r == ss_r - k_par * tile).astype(jnp.bfloat16)
            ss_c = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
            qq_c = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 1)
            DColSel = (qq_c == ss_c + k_half * 128 - cbase).astype(jnp.float32)

            rp = jax.lax.broadcasted_iota(jnp.int32, (TT, tile), 0)
            pp = jax.lax.broadcasted_iota(jnp.int32, (TT, tile), 1)
            cq = jax.lax.broadcasted_iota(jnp.int32, (tile, TT), 1)
            qq = jax.lax.broadcasted_iota(jnp.int32, (tile, TT), 0)
            acc = jnp.zeros((TT, TT), jnp.float32)
            for i in range(6):
                Ri = (rp == 6 * pp + i).astype(jnp.float32)  # [TT, tile]
                Bi = jnp.zeros((tile, TT), jnp.float32)
                for j in range(6):
                    vu = up_ref[i * 6 + j, :]   # [Wu]
                    vm = cl_ref[j * 6 + i, :]   # [Wc] transposed mirror element
                    x_ij = -_dot_rhs_split(RowSel, vu[:, None] * ColSel)
                    x_ij -= _dot_rhs_split(MirSel, vm[:, None] * MirColSel)
                    x_ij += _dot_rhs_split(
                        DRowSel, db_ref[i * 6 + j, :][:, None] * DColSel
                    )
                    CjT = (cq == 6 * qq + j).astype(jnp.float32)  # [tile, TT]
                    Bi += _dot(x_ij, CjT, ONEHOT_PREC)
                acc += _dot_rhs_split(Ri, Bi)
            out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M, 2),
        in_specs=[
            pl.BlockSpec((36, Wu), lambda k, e, o: (k * 0, k)),
            pl.BlockSpec((1, Wu), lambda k, e, o: (k * 0, k)),
            pl.BlockSpec((1, Wu), lambda k, e, o: (k * 0, k)),
            pl.BlockSpec((36, Wc), lambda k, e, o: (k * 0, jnp.minimum(k + e, M - 1))),
            pl.BlockSpec((1, Wc), lambda k, e, o: (k * 0, jnp.minimum(k + e, M - 1))),
            pl.BlockSpec((1, Wc), lambda k, e, o: (k * 0, jnp.minimum(k + e, M - 1))),
            pl.BlockSpec((36, 128), lambda k, e, o: (k * 0, jax.lax.div(k, jnp.int32(2)))),
        ],
        out_specs=pl.BlockSpec((TT, TT), lambda k, e, o: (k, e)),
    )
    MWg = gT.shape[1]
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M * TT, 2 * TT), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(occ_band, gT, ghr.reshape(1, MWg), ghc.reshape(1, MWg),
      gT, ghr.reshape(1, MWg), ghc.reshape(1, MWg), dbT)


# ---------------------------------------------------------------------------
# resident_gather: out[:, n] = src[:, ids[n]] with the whole source in VMEM
# ---------------------------------------------------------------------------


def windowed_gather(
    src: jnp.ndarray,  # [D, S_pad] transposed source
    ids: jnp.ndarray,  # [N] int32 source column per output (-1 -> zeros)
    plan: AccumWindowPlan,  # per-chunk source windows (ids banded)
    wb: jnp.ndarray,  # device copy of plan.wb (128-column units)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """resident_gather with per-chunk source windows: the one-hot factor
    shrinks from [S_pad, chunk] to [win, chunk].  Source stays fully
    VMEM-resident; each chunk reads only its dynamic 128-aligned slice."""
    D, S = src.shape
    N = ids.shape[0]
    chunk, W, C = plan.chunk, plan.win, plan.num_chunks
    assert N == C * chunk and S % 128 == 0 and S >= plan.out_pad, (N, S, plan)

    def kern(wb_ref, ids_ref, src_ref, out_ref):
        c = pl.program_id(0)
        base = wb_ref[c] * 128
        rel = ids_ref[0, :] - base
        Q = (
            jax.lax.broadcasted_iota(jnp.int32, (W, chunk), 0) == rel[None, :]
        ).astype(src_ref.dtype)
        out_ref[:] = _dot(src_ref[:, pl.ds(base, W)], Q, ONEHOT_PREC)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda c, wb: (c * 0, c)),
            pl.BlockSpec((D, S), lambda c, wb: (c * 0, c * 0)),
        ],
        out_specs=pl.BlockSpec((D, chunk), lambda c, wb: (c * 0, c)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, N), jnp.float32),
        interpret=interpret,
    )(wb, ids.reshape(1, N), src)


def resident_gather(
    src: jnp.ndarray,  # [D, S_pad] transposed source (S_pad <= a few K)
    ids: jnp.ndarray,  # [N_pad] int32 source column per output (-1 -> zeros)
    *,
    chunk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-hot MXU gather with a fully VMEM-resident source — the pose-side
    per-edge gather (q/t/cam, 12 rows from <=4k poses).  The XLA gather this
    replaces runs at ~5-10 GB/s (~6.4ms per residual pass at kitti00 scale,
    docs/PERF_NOTES.md); as a [D, S] @ one-hot [S, chunk] matmul it is
    ~0.3ms.  Source rows are real values: the bf16x3 split keeps fp32
    exactness (ONEHOT_PREC splits the value operand)."""
    D, S = src.shape
    N = ids.shape[0]
    assert N % chunk == 0 and S % 128 == 0, (N, chunk, S)
    grid = N // chunk

    def kern(ids_ref, src_ref, out_ref):
        idv = ids_ref[0, :]
        Q = (
            jax.lax.broadcasted_iota(jnp.int32, (S, chunk), 0) == idv[None, :]
        ).astype(src_ref.dtype)
        out_ref[:] = _dot(src_ref[:], Q, ONEHOT_PREC)

    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda c: (c * 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, S), lambda c: (c * 0, c * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, chunk), lambda c: (c * 0, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, N), jnp.float32),
        interpret=interpret,
    )(ids.reshape(1, N), src)


def resident_gather_xla(src, ids):
    safe = jnp.clip(ids, 0, src.shape[1] - 1)
    valid = (ids >= 0) & (ids < src.shape[1])
    return jnp.where(valid[None, :], src[:, safe], 0.0)
