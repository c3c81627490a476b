"""MXU solve path: system assembly + Schur reduction via one-hot matmuls.

This is the TPU fast path.  It replaces the XLA segment_sum/gather pipeline
in assembly.py / schur.py (kept as the CPU / parity / fallback path) with
the Pallas kernels from ops/segmm.py, in transposed ``[D, N]`` layout.

Counterpart of the reference's buildSystem + computeBschure/computeHschure
kernels (reference: src/cuda_block_solver.cu:788-839, :933-977) — but where
CUDA scatters with atomicAdd, every reduction here is an MXU matmul against
a compare-built one-hot matrix (see ops/segmm.py and docs/PERF_NOTES.md for
the measured rationale: XLA scatter ~5-10 GB/s on TPU).

Host-side ``MXUPlans`` is computed once per initialize(); ``plans.ok`` is
False when the problem lacks the locality the windowed kernels need (then
the engine uses the XLA path).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuba_tpu.ops import segmm
from cuba_tpu.solver import assembly
from cuba_tpu.solver.structure import BAStructure


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# host-side planning
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MXUPlans:
    ok: bool
    e_pad_m: int
    e_pad_s: int
    hpl_pad: int  # padded slot count (multiple of 1024)
    p_src_pad: int  # padded pose-source lanes for the xp gather
    hll_m: Optional[segmm.TilePlan] = None
    hll_s: Optional[segmm.TilePlan] = None
    hpl_m: Optional[segmm.TilePlan] = None
    hpl_s: Optional[segmm.TilePlan] = None
    ivs: Optional[segmm.TilePlan] = None  # gather [invHll;bl] rows by hpl_col
    xpg: Optional[segmm.TilePlan] = None  # gather xp rows by hpl_row
    cl: Optional[segmm.TilePlan] = None  # segsum slot contribs by hpl_col
    schur: Optional[segmm.SchurPlan] = None
    pad_blocks: int = 0  # dense Schur block padding (engine's)
    up: Optional[segmm.TilePlan] = None  # schur windows -> dense upper keys
    lo: Optional[segmm.TilePlan] = None  # schur windows -> dense mirror keys
    # v2 dense formation (ONE band-major compact table + compact_to_dense /
    # compact_to_band): preferred; up/lo are the fallback when the per-band
    # block count exceeds the window gate
    v2: bool = False
    maxw: int = 0  # max Hsc blocks per block-row (diagnostic)
    maxwc: int = 0  # max Hsc blocks per block-column (diagnostic)
    wg: int = 0  # band-major lanes per 64-row band (128-aligned)
    up2: Optional[segmm.TilePlan] = None  # windows -> band-slot keys
    # transposed per-edge front end (solver/edgerows.py): one-hot gathers
    # feed [d, E] row math; rows_ok gates it (pose table must fit VMEM)
    rows_ok: bool = False
    p_res_pad: int = 0  # padded pose-source columns for resident_gather
    xwg_m: Optional[segmm.TilePlan] = None  # landmark-row gather windows
    xwg_s: Optional[segmm.TilePlan] = None
    # windowed pose-side accumulates (ids banded by the landmark-major edge
    # order): ~5x fewer MXU passes than the full-width one-hot accum
    paw_m: Optional[segmm.AccumWindowPlan] = None
    paw_s: Optional[segmm.AccumWindowPlan] = None
    paw_b: Optional[segmm.AccumWindowPlan] = None  # bsc accumulate over hpl_row
    # windowed residual pose gather: poses permuted by first-observing edge
    # position so the band covers fixed poses too (they sit after actives in
    # internal order, which would blow the raw-id window)
    rg_m: Optional[segmm.AccumWindowPlan] = None
    rg_s: Optional[segmm.AccumWindowPlan] = None
    # how the schur local-id trio shipped: "dv" (only lk on the wire;
    # li/lj derived on device from hpl_col — canonical enumeration), "p3"
    # (li|lj|lk in one int32), "p2" (li|lj packed, lk separate), "none"
    # (separate tables)
    sc_pack: str = "none"
    sc_ntri: int = 0  # valid triplet count (the "dv" derivation's bound)
    # max landmarks any chunk touches (+1), 128-padded: enables the windowed
    # compare-sum triplet->landmark derivation in derive_consts (the [C,R,wl]
    # rank against each chunk's own cumT window replaces a device-wide
    # 1.95M-element scatter+cumsum — same trick as the dv2 lk derivation).
    # 0 = window too wide at this shape; derive falls back to the cumsum.
    sc_wl: int = 0
    # band + low-rank (loop closure) Woodbury plan: k loop-column pose
    # blocks and n_ob out-of-band Hsc blocks (0 when the pattern is pure
    # band or the loop-column set exceeds the Woodbury gate)
    lr_k: int = 0
    lr_nob: int = 0
    # gid_dv wire mode: pose_gid/lm_gid derived on device from e2h +
    # hpl_row/hpl_col (exception triples for slotless edges) instead of
    # shipping ~1.7 MB of per-edge id tables (kitti00 scale)
    gid_dv: bool = False


class MXUConsts(NamedTuple):
    """Device-side constants for the MXU path (padded, transposed layouts)."""

    # per-edge segment ids (padding/fixed -> -1)
    pose_acc_m: jnp.ndarray
    pose_acc_s: jnp.ndarray
    lm_acc_m: jnp.ndarray
    lm_acc_s: jnp.ndarray
    e2h_m: jnp.ndarray
    e2h_s: jnp.ndarray
    # slot ids (padding -> -1)
    hpl_row: jnp.ndarray  # [hpl_pad]
    hpl_col: jnp.ndarray  # [hpl_pad]
    # tile plan bases
    bb_hll_m: jnp.ndarray
    bb_hll_s: jnp.ndarray
    bb_hpl_m: jnp.ndarray
    bb_hpl_s: jnp.ndarray
    bb_ivs: jnp.ndarray
    bb_xpg: jnp.ndarray
    bb_cl: jnp.ndarray
    # schur plan arrays
    sc_sb: jnp.ndarray
    sc_li: jnp.ndarray
    sc_lj: jnp.ndarray
    sc_lk: jnp.ndarray
    gkey_up: jnp.ndarray  # [C*kwin] dense row-major key per window lane
    gkey_lo: jnp.ndarray  # [C*kwin] mirror key (-1 on diagonal blocks)
    bb_up: jnp.ndarray
    bb_lo: jnp.ndarray
    occ: jnp.ndarray  # [T_P*T_Q] band-transpose tile occupancy
    # v2 formation constants (1-element dummies when plans.v2 is False):
    # ONE band-major compact table (see segmm.compact_to_dense) — the
    # combine key stream plus the per-band-slot (row, col) tables
    gkey_up2: jnp.ndarray = np.zeros(1, np.int32)  # [C*kwin] band-slot key
    bb_up2: jnp.ndarray = np.zeros(1, np.int32)
    iru: jnp.ndarray = np.zeros(1, np.int32)  # [M*Wg] block row per band slot
    icu: jnp.ndarray = np.zeros(1, np.int32)  # [M*Wg] block col per band slot
    occ2: jnp.ndarray = np.zeros(1, np.int32)  # [T_P*T_Q] v2 tile occupancy
    band_occ: jnp.ndarray = np.zeros(1, np.int32)  # [m*2] band (k, e) occupancy
    # rows front-end constants (1-element dummies when plans.rows_ok False).
    # *_gid are UNGATED vertex ids (-1 only on padding): residuals include
    # fixed-vertex edges; the quadratic form's gating stays in pose_acc/lm_acc
    pose_gid_m: jnp.ndarray = np.zeros(1, np.int32)  # [e_pad_m]
    pose_gid_s: jnp.ndarray = np.zeros(1, np.int32)  # [e_pad_s]
    lm_gid_m: jnp.ndarray = np.zeros(1, np.int32)
    lm_gid_s: jnp.ndarray = np.zeros(1, np.int32)
    bb_xwg_m: jnp.ndarray = np.zeros(1, np.int32)
    bb_xwg_s: jnp.ndarray = np.zeros(1, np.int32)
    measT_m: jnp.ndarray = np.zeros((1, 1), np.float32)  # [2, e_pad_m]
    measT_s: jnp.ndarray = np.zeros((1, 1), np.float32)  # [3, e_pad_s]
    omegaT_m: jnp.ndarray = np.zeros(1, np.float32)  # [e_pad_m], 0 on padding
    omegaT_s: jnp.ndarray = np.zeros(1, np.float32)
    # wire-compression: sc_li/sc_lj packed as (li+1)<<16 | (lj+1); the gated
    # pose_acc/lm_acc tables ride as dummies when rows_ok (derivable from the
    # ungated *_gid tables).  engine calls derive_consts() once on device to
    # expand these — kernels never see the packed forms.
    sc_lij: jnp.ndarray = np.zeros(1, np.int32)
    # windowed-accum chunk bases (dummies when the matching plan is absent)
    wb_paw_m: jnp.ndarray = np.zeros(1, np.int32)
    wb_paw_s: jnp.ndarray = np.zeros(1, np.int32)
    wb_paw_b: jnp.ndarray = np.zeros(1, np.int32)
    # windowed residual gather: gather-order pose ranks + source permutation
    pose_gidr_m: jnp.ndarray = np.zeros(1, np.int32)
    pose_gidr_s: jnp.ndarray = np.zeros(1, np.int32)
    res_perm: jnp.ndarray = np.zeros(1, np.int32)  # [p_res_pad] src column order
    wb_rg_m: jnp.ndarray = np.zeros(1, np.int32)
    wb_rg_s: jnp.ndarray = np.zeros(1, np.int32)
    # band+low-rank (Woodbury) constants: rank-major slots of the
    # out-of-band blocks, their loop-column-local (i, j) ids, and the
    # scalar rows of the loop columns (dummies when plans.lr_nob == 0)
    ob_rkey: jnp.ndarray = np.zeros(1, np.int32)  # [n_ob]
    ob_i: jnp.ndarray = np.zeros(1, np.int32)  # [n_ob]
    ob_j: jnp.ndarray = np.zeros(1, np.int32)  # [n_ob]
    ob_jrows: jnp.ndarray = np.zeros(1, np.int32)  # [6*lr_k]
    # "dv2" wire mode: ascending Hsc block keys row*num_p+col ([n_hsc_pad],
    # _HSC_KEY_PAD tail) — derive_consts rebuilds sc_li/sc_lj AND sc_lk from
    # this + hpl_col/hpl_row/gkey_up2, replacing the ~7 MB lk stream at
    # kitti00 scale (dummy outside dv2)
    hsc_key: jnp.ndarray = np.zeros(1, np.int32)
    # "dv2" v2-formation wire: the compact per-chunk window block list
    # ([C*kwin], -1 tails; values < n_hsc so it int16-narrows + delta-packs).
    # derive_consts rebuilds gkey_up2/iru/icu from this + hsc_key —
    # replacing ~3 MB of shipped key tables at kitti00-loop scale (dummy
    # outside dv2)
    sc_gid: jnp.ndarray = np.zeros(1, np.int32)
    # gid_dv wire mode: pose_gid/lm_gid ride DERIVED from e2h via
    # hpl_row/hpl_col gathers; only the edges without an Hpl slot (a fixed
    # endpoint) ship as (index, pose, lm) exception triples (dummies when
    # plans.gid_dv is False; exc_i_* = [e_pad] when the list is empty so the
    # scatter drops it)
    exc_i_m: jnp.ndarray = np.zeros(1, np.int32)
    exc_p_m: jnp.ndarray = np.zeros(1, np.int32)
    exc_l_m: jnp.ndarray = np.zeros(1, np.int32)
    exc_i_s: jnp.ndarray = np.zeros(1, np.int32)
    exc_p_s: jnp.ndarray = np.zeros(1, np.int32)
    exc_l_s: jnp.ndarray = np.zeros(1, np.int32)
    # dv/dv2 wire mode: per-chunk canonical triplet offsets ([C+1] int32,
    # t0[c] = count of valid triplets before chunk c).  Lets derive_consts
    # rebuild li/lj/lk for RE-CHUNKED plans (landmark-granular padding at
    # chunk tails — tighter slot windows at loop-closure covisibility)
    # where padded position != canonical position.  ~8 KB at kitti00 scale;
    # a 1-element dummy means the plan is densely packed (trivial t0)
    sc_t0: jnp.ndarray = np.zeros(1, np.int32)


@dataclasses.dataclass
class MXUForce:
    """Cross-shard minima for plan_mxu's static dims (multi-chip SPMD).

    shard_map traces ONE program for every device, so per-shard MXUPlans
    must agree on every static (paddings, grid sizes, window widths).  The
    multi-chip planner runs plan_mxu per shard, folds the statics with
    ``force_max``, and re-plans with the combined force until the statics
    reach a cross-shard fixpoint (parallel/mxu_shard.py)."""

    e_pad_m: int = 0
    e_pad_s: int = 0
    hpl_pad: int = 0
    p_src_pad: int = 0
    p_res_pad: int = 0
    # name -> (num_tiles, n_blocks, n_pad) for the tile/gather plans
    tiles: dict = dataclasses.field(default_factory=dict)
    # name -> (num_chunks, win, out_pad) for the windowed accum plans
    accums: dict = dataclasses.field(default_factory=dict)
    # (num_chunks, kwin, n_slot_pad, n_hsc_pad)
    schur: tuple = (0, 0, 0, 0)


_TILE_NAMES = ("hll_m", "hll_s", "hpl_m", "hpl_s", "ivs", "xpg", "cl",
               "up2", "xwg_m", "xwg_s")
_ACCUM_NAMES = ("paw_m", "paw_s", "paw_b", "rg_m", "rg_s")


def static_sig(p: Optional[MXUPlans]):
    """Hashable signature of every static plan value the traced closures
    capture — the jit-cache key (engine) and the cross-shard SPMD equality
    check (parallel/mxu_shard.py: shard_map traces one program, so every
    shard's plans must agree on this signature exactly)."""
    if p is None:
        return None
    tp = lambda t: None if t is None else (t.tile, t.block, t.n_blocks, t.num_tiles, t.n_pad)
    aw = lambda t: None if t is None else (t.chunk, t.win, t.num_chunks, t.out_pad, t.ok)
    sc = p.schur
    sc_sig = (
        None if sc is None
        else (sc.chunk, sc.slot_block, sc.kwin, sc.num_chunks,
              sc.n_slot_pad, sc.n_hsc_pad)
    )
    return (
        p.e_pad_m, p.e_pad_s, p.hpl_pad, p.p_src_pad,
        tp(p.hll_m), tp(p.hll_s), tp(p.hpl_m), tp(p.hpl_s),
        tp(p.ivs), tp(p.xpg), tp(p.cl), tp(p.up), tp(p.lo), p.pad_blocks,
        p.v2, p.maxw, p.maxwc, p.wg, tp(p.up2),
        sc_sig,
        p.rows_ok, tp(p.xwg_m), tp(p.xwg_s),
        aw(p.paw_m), aw(p.paw_s), aw(p.paw_b),
        p.p_res_pad, aw(p.rg_m), aw(p.rg_s), p.sc_pack, p.sc_ntri,
        p.lr_k, p.lr_nob, p.gid_dv,
    )


def force_of(plans: MXUPlans) -> MXUForce:
    """Extract the static dims of a planned problem as an MXUForce."""
    tiles = {}
    for nm in _TILE_NAMES:
        t = getattr(plans, nm)
        if t is not None:
            tiles[nm] = (t.num_tiles, t.n_blocks, t.n_pad)
    accums = {}
    for nm in _ACCUM_NAMES:
        a = getattr(plans, nm)
        if a is not None:
            accums[nm] = (a.num_chunks, a.win, a.out_pad)
    sc = plans.schur
    sc_t = (0, 0, 0, 0) if sc is None else (
        sc.num_chunks, sc.kwin, sc.n_slot_pad, sc.n_hsc_pad
    )
    return MXUForce(
        plans.e_pad_m, plans.e_pad_s, plans.hpl_pad, plans.p_src_pad,
        plans.p_res_pad, tiles, accums, sc_t,
    )


def force_max(a: MXUForce, b: MXUForce) -> MXUForce:
    """Elementwise maximum of two forces."""
    tiles = dict(a.tiles)
    for nm, v in b.tiles.items():
        tiles[nm] = tuple(max(x, y) for x, y in zip(tiles.get(nm, (0, 0, 0)), v))
    accums = dict(a.accums)
    for nm, v in b.accums.items():
        accums[nm] = tuple(max(x, y) for x, y in zip(accums.get(nm, (0, 0, 0)), v))
    return MXUForce(
        max(a.e_pad_m, b.e_pad_m), max(a.e_pad_s, b.e_pad_s),
        max(a.hpl_pad, b.hpl_pad), max(a.p_src_pad, b.p_src_pad),
        max(a.p_res_pad, b.p_res_pad), tiles, accums,
        tuple(max(x, y) for x, y in zip(a.schur, b.schur)),
    )


def plan_schur_for(s: BAStructure):
    """The Schur chunk plan for a structure — cheap when the C++ symbolic
    pass precomputed it (structure.schur_native), so the engine can build
    the Schur id tables BEFORE plan_mxu and ship them in the early blob.
    ``col`` enables the landmark-granular re-chunk fallback when the dense
    packing violates the slot window (loop-closure covisibility).

    The plan geometry comes from segmm.sc_geometry() (env-overridable
    CUBA_TPU_SC_CHUNK / CUBA_TPU_SC_SB) — the same source structure.py
    hands the C++ symbolic pass, so the precomputed plan normally matches
    and re-planning never happens on the ctor path."""
    chunk, sb, mk = segmm.sc_geometry()
    return segmm.plan_schur(
        s.mul_i, s.mul_j, s.mul_k, s.n_hpl, s.n_hsc,
        chunk=chunk, slot_block=sb, max_kwin=mk,
        precomputed=s.schur_native, col=s.hpl_col,
    )


def pose_ranks(s: BAStructure) -> np.ndarray:
    """Rank every pose (active AND fixed) by its first observation in the
    locality-ordered edge stream — the windowed residual gather's column
    order (structure-only; shared by plan_mxu and the early upload)."""
    total_p = int(s.qs.shape[0])
    allp = np.concatenate(
        [np.asarray(s.mono.pose_idx, np.int64), np.asarray(s.stereo.pose_idx, np.int64)]
    )
    first = np.full(total_p, np.int64(1) << 60)
    # first-occurrence scatter: reversed fancy assignment (last write wins
    # = first position in forward order) — np.minimum.at is a slow ufunc
    # inner loop (~35 ms at 564k edges on the 1-core host, vs ~4 ms here)
    first[allp[::-1]] = np.arange(allp.size - 1, -1, -1, dtype=np.int64)
    rorder = np.argsort(first, kind="stable")  # gather column -> pose idx
    prank = np.empty(total_p, np.int64)
    prank[rorder] = np.arange(total_p)
    return prank


# one-entry memo: the early upload and plan_mxu pack the SAME plan back to
# back; the shift-or pass over ~3.6M triplets costs ~0.19s at kitti00 scale
_PACK_SCHUR_CACHE: list = [None, None]


def _canonical_schur_ntri(sc, col: np.ndarray) -> int:
    """Valid triplet count if (li, lj) follow the canonical enumeration —
    landmark-major, i-major, j from i to the end of the landmark's slot
    range — else -1.  Canonical streams never ride the wire: derive_consts
    rebuilds them on device from hpl_col (sum over slots of one scatter +
    cumsum + inverse-triangular index math), saving ~6 MB at kitti00 scale.

    The check is complete: the padding-compressed mi must walk every slot
    0..n_hpl-1 once in order, each slot's run length must equal (landmark
    end - slot), and mj must count i..i+len-1 within the run.  Padding
    (-1) is accepted as per-chunk TAILS (landmark-granular re-chunked
    plans), not just a global tail — the device derivation handles the
    position shift via the shipped per-chunk offsets (MXUConsts.sc_t0).  Both triplet generators emit
    this order by construction (native/symbolic.cpp:236-265, structure.
    _pair_expand) and plan_schur's stable sort by mul_i is an identity on
    it — but the check IS on the ctor path, so it dispatches to one C++
    linear pass (ba_canonical_ntri; the NumPy verification below cost
    ~0.15s of serial host time at kitti00 scale and is kept as the twin).
    """
    from cuba_tpu import native

    nat = native.canonical_ntri(
        sc.li, sc.lj, sc.sb, sc.chunk, sc.slot_block, col
    )
    if nat is not None:
        return int(nat)
    li = np.asarray(sc.li, np.int64)
    lj = np.asarray(sc.lj, np.int64)
    valid = li >= 0
    n_tri = int(valid.sum())
    n_hpl = int(col.size)
    if n_tri < 2:
        return -1
    v2 = valid.reshape(sc.num_chunks, sc.chunk)
    if not bool(np.all(v2[:, 1:] <= v2[:, :-1])):
        return -1  # padding must be a per-chunk tail (re-chunked plans)
    base = np.repeat(np.asarray(sc.sb, np.int64) * sc.slot_block, sc.chunk)
    mi = li[valid] + base[valid]
    mj = lj[valid] + base[valid]
    di = np.diff(mi)
    dj = np.diff(mj)
    if not bool(np.all(((di == 0) & (dj == 1)) | ((di > 0) & (mj[1:] == mi[1:])))):
        return -1
    if mi[0] != 0 or mj[0] != 0:
        return -1
    starts = np.flatnonzero(np.concatenate(([True], di > 0)))
    run_vals = mi[starts]
    if run_vals.size != n_hpl or not np.array_equal(run_vals, np.arange(n_hpl)):
        return -1
    # per-run length == landmark-slot-range end - slot
    nl = np.bincount(col, minlength=int(col.max()) + 1 if n_hpl else 1)
    ends = np.cumsum(nl)[col]  # [n_hpl] end slot of each slot's landmark
    run_len = np.diff(np.append(starts, n_tri))
    if not np.array_equal(run_len, ends - run_vals):
        return -1
    return n_tri


_HSC_KEY_PAD = np.int32(2**31 - 1)  # hsc_key tail pad: above every real key


def _gid_exceptions(e2h, ids_p, ids_l, e_pad):
    """Real edges without an Hpl slot (a fixed endpoint): the gid_dv wire
    mode ships these as (index, pose, lm) exception triples and derives
    every other edge's ids from e2h on device (derive_consts).  An empty
    list ships as a single out-of-bounds index so the device scatter drops
    it.  Returns (exc_i, exc_p, exc_l, count)."""
    n = len(ids_p)
    exc = np.flatnonzero(np.asarray(e2h[:n]) < 0)
    if exc.size == 0:
        return (np.array([e_pad], np.int32), np.array([-1], np.int32),
                np.array([-1], np.int32), 0)
    return (exc.astype(np.int32), np.asarray(ids_p, np.int32)[exc],
            np.asarray(ids_l, np.int32)[exc], int(exc.size))


# Band-major window gate.  The compact_to_dense working set is linear in
# Wg — the unrolled 6x6 loop's [Wu,128]/[Wc,128] selection transients
# dominate, measured 65.6MB scoped vmem at Wg=3968 vs the 64MB kernel
# limit (compile OOM).  2048 keeps ~2x VMEM margin and 3x headroom over
# kitti00-loop's Wg=640; scattered covisibility (Wg well past this) is
# better served by the XLA fallback path anyway.
_WG_MAX = 2048

# v2 combine grid budget: num_tiles * n_blocks grid steps, ~0.5us each
# (measured 4.9k steps = 2.3 ms at kitti00-loop scale) — caps the combine
# at ~30 ms on pathologically deep accumulations while letting BAL-scale
# problems (hundreds of triplet blocks per tile) still plan
_COMBINE_STEPS_MAX = 65536


def _wg_of(hsc_row) -> int:
    """Band-major lanes per 64-row band, exactly as plan_mxu's v2 block
    computes it: max Hsc blocks per band, rounded up to 128 lanes."""
    hr = np.asarray(hsc_row, np.int64)
    cnt = int(np.bincount(hr // 64).max()) if hr.size else 1
    return _round_up(max(cnt, 1), 128)


def pack_schur_ids(sc, col: Optional[np.ndarray] = None,
                   hsc: Optional[tuple] = None) -> Tuple[str, dict]:
    """Wire-pack the schur local-id streams (li, lj, lk): "dv2" ships ONLY
    the tiny ascending hsc block-key table (row*num_p+col) and derives li/lj
    AND lk on device (lk = rank of the triplet's Hsc block among the chunk's
    ascending distinct blocks — the definition native/symbolic.cpp implements
    host-side; the device recovers it from hsc_key + the per-chunk window
    block lists sc_gid, see derive_consts); "dv" ships lk int16 and derives li/lj
    from hpl_col (canonical enumeration — see _canonical_schur_ntri);
    otherwise 3-way li|lj|lk in one int32 when compact kwin keeps lk < 254,
    else 2-way li|lj with lk riding int16.
    Returns (mode, {field: array}) — shared by plan_mxu and the early
    upload so both make the IDENTICAL packing decision for the same plan.
    ``col`` is the unpadded hpl_col slot table (required for "dv"/"dv2");
    ``hsc`` = (hsc_row, hsc_col, num_p) enables "dv2" (the caller must only
    pass it when the v2 formation constants — gkey_up2 — will be on device)."""
    dummy = np.zeros(1, np.int32)
    if sc is None:
        return "none", {"sc_lij": dummy, "sc_li": dummy, "sc_lj": dummy,
                        "sc_lk": dummy}
    # CUBA_TPU_SC_PACK caps the wire mode ("p3" ships the packed triplet
    # stream, "dv" derives li/lj only, "dv2" additionally derives lk + the
    # formation tables).  Measurement knob + escape hatch.  Same-session
    # A/B at kitti00-loop scale (docs/PERF_NOTES.md round 4): dv2 with the
    # compare-sum lk derivation = 0.800 s ctor+optimize(10) at 10.1 MB
    # wire vs dv 0.816 s at 14.0 MB — dv2 wins and degrades less on slow
    # tunnels, so it is the default; the earlier searchsorted-based lk
    # (0.59 s of derive dispatch) is what made dv2 a 10x loss before.
    import os

    cap = os.environ.get("CUBA_TPU_SC_PACK", "dv2")
    if cap in ("p3", "none"):
        col = None
    if cap != "dv2":
        hsc = None
    # cache key: a WEAKREF to the plan, not id(sc) — if the first plan is
    # garbage-collected and a later engine's plan lands at the same address
    # (realistic in a long-lived SLAM process building many engines), an
    # id()-keyed hit would return the previous problem's packing (wrong
    # hsc_key/sc_ntri, garbage Schur product, no error).  A dead weakref
    # can never compare `is sc` for a new object, so reuse is impossible.
    import weakref

    ckey = (col is not None, hsc is not None)
    cached = _PACK_SCHUR_CACHE[0]
    if cached is not None and cached[0]() is sc and cached[1] == ckey:
        return _PACK_SCHUR_CACHE[1]
    ckey = (weakref.ref(sc), ckey)
    li32 = np.asarray(sc.li, np.int32)
    lj32 = np.asarray(sc.lj, np.int32)
    lk32 = np.asarray(sc.lk, np.int32)

    if col is not None and li32.size:
        n_tri = _canonical_schur_ntri(sc, np.asarray(col, np.int64))
        if n_tri > 0:
            # per-chunk canonical offsets: the device derivation needs them
            # when the plan is re-chunked (padding at chunk tails shifts
            # padded position away from canonical position); trivial for
            # densely packed plans, where the 1-element dummy ships instead
            cnt = np.count_nonzero(
                li32.reshape(sc.num_chunks, sc.chunk) >= 0, axis=1
            )
            t0 = np.zeros(sc.num_chunks + 1, np.int32)
            t0[1:] = np.cumsum(cnt).astype(np.int32)
            dense = bool(np.all(t0[: sc.num_chunks] ==
                                np.arange(sc.num_chunks) * sc.chunk))
            t0_ship = {} if dense else {"sc_t0": t0}
            def narrow16(a):
                a = np.asarray(a)
                if a.size == 0 or (a.min() >= -32768 and a.max() <= 32767):
                    return a.astype(np.int16)
                return a.astype(np.int32)

            key = None
            if hsc is not None:
                hsc_row, hsc_col, num_p = hsc
                # mul_k is the SORTED rank of the pair key (np.unique /
                # the C++ hash-map+sort agree — asserted identical in
                # tests/test_structure.py), so the device can recover it
                # with one searchsorted; gate on int32 key range, a
                # strictly-ascending table (structure.py), the band-major
                # window geometry (the v2 formation gate), and the
                # flattened per-chunk searchsorted offsets fitting int32
                stride = sc.n_hsc_pad + 1  # > any global block id
                if (0 < len(hsc_row) and num_p <= 46340
                        and _wg_of(hsc_row) <= _WG_MAX
                        and sc.num_chunks * stride < 2**31 - 1):
                    k64 = (np.asarray(hsc_row, np.int64) * num_p
                           + np.asarray(hsc_col, np.int64))
                    if k64.size == 1 or bool(np.all(np.diff(k64) > 0)):
                        key = np.full(sc.n_hsc_pad, _HSC_KEY_PAD, np.int32)
                        key[: k64.size] = k64.astype(np.int32)
            if key is not None:
                out = "dv2", {
                    "sc_lij": dummy, "sc_li": dummy, "sc_lj": dummy,
                    "sc_lk": dummy, "hsc_key": key, "sc_ntri": n_tri,
                    **t0_ship,
                }
            else:
                out = "dv", {
                    "sc_lij": dummy, "sc_li": dummy, "sc_lj": dummy,
                    "sc_lk": narrow16(lk32), "sc_ntri": n_tri,
                    **t0_ship,
                }
            _PACK_SCHUR_CACHE[0] = ckey
            _PACK_SCHUR_CACHE[1] = out
            return out

    def narrow(a):
        a = np.asarray(a)
        if a.size == 0 or (a.min() >= -32768 and a.max() <= 32767):
            return a.astype(np.int16)
        return a.astype(np.int32)

    pack3 = bool(
        li32.size
        and li32.max() < 1022 and lj32.max() < 1022 and lk32.max() < 254
        and li32.min() >= -1 and lj32.min() >= -1 and lk32.min() >= -1
    )
    pack2 = not pack3 and bool(
        li32.size and li32.max() < 32767 and lj32.max() < 32767
        and li32.min() >= -1 and lj32.min() >= -1
    )
    if pack3:
        out = "p3", {
            "sc_lij": ((li32 + 1) << 19) | ((lj32 + 1) << 8) | (lk32 + 1),
            "sc_li": dummy, "sc_lj": dummy, "sc_lk": dummy,
        }
    elif pack2:
        out = "p2", {
            "sc_lij": ((li32 + 1) << 16) | (lj32 + 1),
            "sc_li": dummy, "sc_lj": dummy,
            "sc_lk": narrow(lk32) if lk32.size else dummy,
        }
    else:
        out = "none", {
            "sc_lij": dummy,
            "sc_li": narrow(li32) if li32.size else dummy,
            "sc_lj": narrow(lj32) if lj32.size else dummy,
            "sc_lk": narrow(lk32) if lk32.size else dummy,
        }
    _PACK_SCHUR_CACHE[0] = ckey
    _PACK_SCHUR_CACHE[1] = out
    return out


def _pad_ids(ids, n, valid_mask=None):
    """-1-padded int32 table of ``ids`` (int32 straight through — the
    int64 detour doubled the copy bandwidth of ~10 padded tables per
    plan pass; all indices here are < 2^31)."""
    out = np.full(n, -1, np.int32)
    v = np.asarray(ids, np.int32)
    if valid_mask is None:
        out[: v.size] = v
    else:
        out[: v.size] = np.where(valid_mask, v, np.int32(-1))
    return out


def early_int_arrays(s: BAStructure, e_pad_m: int, e_pad_s: int, sc) -> dict:
    """The big plan-INDEPENDENT int index tables, built at the guessed edge
    paddings so the engine can pack + dispatch them before plan_mxu runs
    (the ~0.2s tunnel transfer then overlaps the planning pass).  Content
    must equal the prefix of the corresponding plan_mxu table; the traced
    unpack pads the tail with each table's pad value (-1).

    Returns {name: (array, pad_val)}."""
    Em, Es = s.mono.count, s.stereo.count
    n_hpl = s.n_hpl
    hpl_pad = max(_round_up(n_hpl, 1024), sc.n_slot_pad if sc is not None else 1024)

    pad_ids = _pad_ids

    out = {
        "e2h_m": pad_ids(s.edge2hpl[:Em], e_pad_m, s.edge2hpl[:Em] < n_hpl),
        "e2h_s": pad_ids(s.edge2hpl[Em:], e_pad_s, s.edge2hpl[Em:] < n_hpl),
        "hpl_row": pad_ids(s.hpl_row, hpl_pad),
        "hpl_col": pad_ids(s.hpl_col, hpl_pad),
    }
    # predict plan_mxu's gid_dv gate (same exception count off the same
    # e2h tables): when it will hold, pose_gid never rides the wire at all
    # (derive_consts rebuilds it from e2h); a rows_ok failure downstream
    # just means the dummy ships in the main blob instead — no correctness
    # dependence on the prediction
    n_exc = int(np.count_nonzero(out["e2h_m"][:Em] < 0)) + int(
        np.count_nonzero(out["e2h_s"][:Es] < 0)
    )
    if n_exc * 8 > Em + Es:
        out["pose_gid_m"] = pad_ids(s.mono.pose_idx, e_pad_m)
        out["pose_gid_s"] = pad_ids(s.stereo.pose_idx, e_pad_s)
    if sc is not None:
        # predict plan_mxu's packing decision: pass hsc when the v2 window
        # geometry will hold (pack_schur_ids gates on maxw/maxwc itself; a
        # rare up2/cl2 plan failure downgrades plan_mxu to "dv" and the lk
        # stream simply rides the main blob instead — wire cost, not error)
        _mode, ids = pack_schur_ids(
            sc, col=np.asarray(s.hpl_col),
            hsc=(s.hsc_row, s.hsc_col, s.num_p),
        )
        if ids["sc_lij"].size > 1:
            out["sc_lij"] = (ids["sc_lij"], 0)
        if ids["sc_lk"].size > 1:
            out["sc_lk"] = (ids["sc_lk"], 0)
        if "sc_t0" in ids:
            out["sc_t0"] = (ids["sc_t0"], 0)
        if "hsc_key" in ids:
            out["hsc_key"] = (ids["hsc_key"], int(_HSC_KEY_PAD))
            # dv2 predicted -> the v2 formation tables will be derived from
            # (hsc_key, sc_gid): ship the compact window list early too
            out["sc_gid"] = (np.asarray(sc.gid, np.int32).reshape(-1), -1)
    return {
        k: (v if isinstance(v, tuple) else (v, -1)) for k, v in out.items()
    }


def guess_e_pads(s: BAStructure) -> Tuple[int, int]:
    """The edge paddings plan_mxu almost always settles on (its fixpoint
    iteration rarely grows them) — lets the engine pack and dispatch the
    plan-independent float constants BEFORE the planning pass so the tunnel
    transfer overlaps the host symbolic work."""
    return (
        max(_round_up(s.mono.count, 1024), 1024),
        max(_round_up(s.stereo.count, 1024), 1024),
    )


def rows_float_arrays(s: BAStructure, e_pad_m: int, e_pad_s: int) -> dict:
    """Padded transposed measurement/omega rows for the rows front end."""
    Em_, Es_ = s.mono.count, s.stereo.count
    measT_m = np.zeros((2, e_pad_m), np.float32)
    measT_m[:, :Em_] = np.asarray(s.mono.measurements, np.float32).T
    measT_s = np.zeros((3, e_pad_s), np.float32)
    measT_s[:, :Es_] = np.asarray(s.stereo.measurements, np.float32).T
    omegaT_m = np.zeros(e_pad_m, np.float32)
    omegaT_m[:Em_] = np.asarray(s.mono.omegas, np.float32)
    omegaT_s = np.zeros(e_pad_s, np.float32)
    omegaT_s[:Es_] = np.asarray(s.stereo.omegas, np.float32)
    return dict(measT_m=measT_m, measT_s=measT_s, omegaT_m=omegaT_m, omegaT_s=omegaT_s)


def plan_mxu(
    s: BAStructure, pad_blocks: int = 0, need_dense: bool = True, sc=None,
    force: Optional[MXUForce] = None, wire_pack: bool = True,
) -> Tuple[MXUPlans, Optional[MXUConsts]]:
    """Build all window plans + padded device constants.  Host, once.

    Paddings and plans are interdependent (a plan's window coverage can
    exceed the round-up padding), so iterate to a fixpoint (2 passes in
    practice).

    need_dense=False (the PCG reduced solver, BAConfig.solver="pcg") skips
    the Schur multiplication-triplet planning and the dense-formation plans
    entirely — PCG's matvec is matrix-free (schur_matvec_rows) and never
    touches them.

    ``force`` raises every static dim to at least the given minima so
    per-shard plans share one traced program under shard_map (MXUForce).
    ``wire_pack=False`` emits fully-expanded int32 constants (no int16
    narrowing, no schur-id packing, gated acc tables and rank-order gather
    ids included) — the multi-chip path device_puts them directly and never
    calls derive_consts.
    """
    num_p, num_l, n_hpl = s.num_p, s.num_l, s.n_hpl
    if num_p == 0 or num_l == 0 or n_hpl == 0:
        return MXUPlans(False, 0, 0, 0, 0), None
    if need_dense and pad_blocks % 128 != 0:
        # the dense-formation occupancy maps tile PB into 64x128 blocks
        raise ValueError(
            f"pad_blocks must be a positive multiple of 128, got {pad_blocks} "
            "(the engine rounds num_p up via engine._pad_blocks)"
        )

    pad_ids = _pad_ids

    Em, Es = s.mono.count, s.stereo.count
    # pass int32 straight through: the C++ planner consumes int32 and the
    # int64 round trip cost ~80ms of pure conversion at kitti00 scale
    if sc is None and need_dense:
        sc = plan_schur_for(s)
    fz = force if force is not None else MXUForce()
    if sc is not None and any(fz.schur):
        sc = segmm.broaden_schur_plan(sc, *fz.schur)
    e_pad_m = max(_round_up(Em, 1024), 1024, fz.e_pad_m)
    e_pad_s = max(_round_up(Es, 1024), 1024, fz.e_pad_s)
    hpl_pad = max(_round_up(n_hpl, 1024), sc.n_slot_pad if sc else 1024,
                  fz.hpl_pad)
    p_src_pad = max(_round_up(num_p + 1, 1024), 1024, fz.p_src_pad)

    def btile(p, name):
        m = fz.tiles.get(name)
        return p if m is None else segmm.broaden_tile_plan(p, *m)

    def baccum(p, name):
        m = fz.accums.get(name)
        return p if m is None else segmm.broaden_accum_plan(p, *m)

    for _ in range(4):
        lm_m = pad_ids(s.mono.lm_idx, e_pad_m, s.mono.lm_idx < num_l)
        lm_s = pad_ids(s.stereo.lm_idx, e_pad_s, s.stereo.lm_idx < num_l)
        e2h_m = pad_ids(s.edge2hpl[:Em], e_pad_m, s.edge2hpl[:Em] < n_hpl)
        e2h_s = pad_ids(s.edge2hpl[Em:], e_pad_s, s.edge2hpl[Em:] < n_hpl)
        hcol = pad_ids(s.hpl_col, hpl_pad)
        hrow = pad_ids(s.hpl_row, hpl_pad)

        hll_m = btile(segmm.plan_tiles(lm_m, num_l), "hll_m")
        hll_s = btile(segmm.plan_tiles(lm_s, num_l), "hll_s")
        hpl_m = btile(segmm.plan_tiles(e2h_m, hpl_pad), "hpl_m")
        hpl_s = btile(segmm.plan_tiles(e2h_s, hpl_pad), "hpl_s")
        ivs = btile(segmm.plan_gather_tiles(hcol, num_l), "ivs")
        xpg = btile(
            segmm.plan_gather_tiles(hrow, num_p, block=p_src_pad, max_blocks=1),
            "xpg")
        cl = btile(segmm.plan_tiles(hcol, num_l), "cl")

        need_em = max(e_pad_m, _round_up(max(hll_m.n_pad, hpl_m.n_pad), 1024))
        need_es = max(e_pad_s, _round_up(max(hll_s.n_pad, hpl_s.n_pad), 1024))
        need_hpl = max(hpl_pad, _round_up(max(
            ivs.num_tiles * ivs.tile, xpg.num_tiles * xpg.tile, cl.n_pad), 1024))
        if (need_em, need_es, need_hpl) == (e_pad_m, e_pad_s, hpl_pad):
            break
        e_pad_m, e_pad_s, hpl_pad = need_em, need_es, need_hpl

    # dense formation: window lanes -> block keys.  v2 (preferred) combines
    # ONCE into a band-major compact table (band m = blocks with row in
    # [64m, 64(m+1)), Wg lanes per band) that compact_to_dense/band window
    # for BOTH the upper and mirror reads — vs the dense-key fallback's
    # PB^2-key combines (~13ms of pure grid overhead per pass) and vs the
    # earlier two rank-major tables whose second (col-rank) combine cost
    # 4.5x the odometry grid on loop-closure shapes (docs/PERF_NOTES.md).
    PB = max(pad_blocks, 1)
    n_hsc = int(s.hsc_row.size)
    up = lo = up2 = None
    v2 = False
    maxw = maxwc = wg = 0
    lr_k = lr_nob = 0
    ob_consts = {}
    i32 = np.int32
    if sc is not None and sc.ok:
        gid = sc.gid.astype(np.int64)
        r = np.where(gid >= 0, s.hsc_row[np.maximum(gid, 0)], 0).astype(np.int64)
        c = np.where(gid >= 0, s.hsc_col[np.maximum(gid, 0)], 0).astype(np.int64)
        hr = np.asarray(s.hsc_row, np.int64)
        hc = np.asarray(s.hsc_col, np.int64)
        rowcnt = np.bincount(hr, minlength=PB)
        colcnt = np.bincount(hc, minlength=PB)
        maxw = int(rowcnt.max()) if n_hsc else 1  # diagnostics / sig only
        maxwc = int(colcnt.max()) if n_hsc else 1
        M = PB // 64
        bandcnt = np.bincount(hr // 64, minlength=M)
        wg = _round_up(max(int(bandcnt.max()) if n_hsc else 1, 1), 128)
        if wg <= _WG_MAX and n_hsc:
            # blocks are (row, col)-sorted: position within the band is the
            # band slot (host twin of derive_consts' dv2 derivation)
            bandstart = np.zeros(M + 1, np.int64)
            np.cumsum(bandcnt, out=bandstart[1:])
            bslot = (hr // 64) * wg + (
                np.arange(n_hsc, dtype=np.int64) - bandstart[hr // 64]
            )
            gkey_up2 = np.where(gid >= 0, bslot[np.maximum(gid, 0)], -1).astype(i32)
            # adaptive per-tile block cap: dense problems (BAL-scale L/E)
            # legitimately have hundreds of triplet blocks per output tile
            # (n_tri/n_hsc deep accumulation, not scatter) — gate the
            # combine on TOTAL grid cost, not a fixed per-tile span
            n_t_up2 = max((M * wg + 127) // 128, 1)
            mb = max(32, _COMBINE_STEPS_MAX // n_t_up2)
            up2 = btile(segmm.plan_tiles(
                gkey_up2, M * wg, tile=128, block=512, max_blocks=mb), "up2")
            iru = np.full(M * wg, -1, i32)
            icu = np.full(M * wg, -1, i32)
            iru[bslot] = hr
            icu[bslot] = hc
            occ2 = np.zeros((PB // 64, PB // 128), i32)
            occ2[hr // 64, hc // 128] = 1
            occ2[hc // 64, hr // 128] = 1
            dd = np.arange(PB)
            occ2[dd // 64, dd // 128] = 1
            occ2 = occ2.reshape(-1)
            v2 = up2.ok
            # band + low-rank (loop closure): identify out-of-band blocks
            # and their loop-column set J.  The Woodbury solver corrects
            # the CR band factor with 6*|J| extra RHS columns; gate at 64
            # pose blocks (384 columns) like the CR bandwidth itself.
            from cuba_tpu.solver import band_cr as _band_cr

            _m_lr, ob_idx = _band_cr.certify_lr(hr, hc, PB)
            if v2 and _m_lr >= 2 and ob_idx.size:
                obr, obc = hr[ob_idx], hc[ob_idx]
                J = np.unique(np.concatenate([obr, obc]))
                if J.size <= 64:
                    lr_k, lr_nob = int(J.size), int(ob_idx.size)
                    ob_consts = dict(
                        ob_rkey=bslot[ob_idx].astype(i32),
                        ob_i=np.searchsorted(J, obr).astype(i32),
                        ob_j=np.searchsorted(J, obc).astype(i32),
                        ob_jrows=(J[:, None] * 6 + np.arange(6)).reshape(-1).astype(i32),
                    )
            # band (k, e) occupancy for compact_to_band: D_k always carries
            # the damped diagonal; U_k only when adjacent-tile blocks exist
            occ_band = np.zeros((PB // 64) * 2, i32)
            occ_band[0::2] = 1
            tr, tc = hr // 64, hc // 64
            adj = np.abs(tr - tc) == 1
            if adj.any():
                occ_band[np.minimum(tr[adj], tc[adj]) * 2 + 1] = 1
        if not v2:
            gkey_up = np.where(gid >= 0, r * PB + c, -1).astype(i32)
            gkey_lo = np.where((gid >= 0) & (r != c), c * PB + r, -1).astype(i32)
            # block=128: the combine's MXU cost is ~ num_tiles*n_blocks*block,
            # and inputs are tiny compact lists — small blocks cut the floor
            up = segmm.plan_tiles(gkey_up, PB * PB, block=128, max_blocks=64)
            lo = segmm.plan_tiles(gkey_lo, PB * PB, block=128, max_blocks=64)
            # band-transpose occupancy: 64x128-block tiles containing any
            # dense block (data, mirrors, or the diagonal incl. padding)
            occ = np.zeros((PB // 64, PB // 128), np.int32)
            v = gid >= 0
            occ[r[v] // 64, c[v] // 128] = 1
            occ[c[v] // 64, r[v] // 128] = 1
            dd = np.arange(PB)
            occ[dd // 64, dd // 128] = 1
            occ = occ.reshape(-1)

    # transposed per-edge front end: ungated vertex ids for the one-hot
    # gathers (solver/edgerows.py).  The pose table rides fully VMEM-resident
    # in resident_gather (gate at 4k poses); landmark rows use windowed
    # tiled_gather over the landmark-major edge order.
    total_p = int(s.qs.shape[0])
    total_l = int(s.Xws.shape[0])
    p_res_pad = max(_round_up(max(total_p, 1), 128), fz.p_res_pad)
    pose_gid_m = pad_ids(s.mono.pose_idx, e_pad_m)
    pose_gid_s = pad_ids(s.stereo.pose_idx, e_pad_s)
    lm_gid_m = pad_ids(s.mono.lm_idx, e_pad_m)
    lm_gid_s = pad_ids(s.stereo.lm_idx, e_pad_s)
    xwg_m = btile(segmm.plan_gather_tiles(lm_gid_m, total_l), "xwg_m")
    xwg_s = btile(segmm.plan_gather_tiles(lm_gid_s, total_l), "xwg_s")
    rows_ok = (
        p_res_pad <= 4096
        and xwg_m.ok and xwg_s.ok
        and xwg_m.num_tiles * xwg_m.tile == e_pad_m
        and xwg_s.num_tiles * xwg_s.tile == e_pad_s
    )

    # windowed residual gather: rank every pose (active AND fixed) by its
    # first observation in the locality-ordered edge stream, so each chunk's
    # gather ids form a narrow band over the permuted source table
    # (pose_ranks — shared with the early-upload path)
    prank = pose_ranks(s)
    rorder = np.empty(total_p, np.int64)
    rorder[prank] = np.arange(total_p)  # gather column -> pose idx
    pose_gidr_m = pad_ids(prank[np.asarray(s.mono.pose_idx, np.int64)], e_pad_m)
    pose_gidr_s = pad_ids(prank[np.asarray(s.stereo.pose_idx, np.int64)], e_pad_s)
    rg_m = baccum(segmm.plan_accum_windows(pose_gidr_m, total_p, max_win=1024),
                  "rg_m")
    rg_s = baccum(segmm.plan_accum_windows(pose_gidr_s, total_p, max_win=1024),
                  "rg_s")
    rg_usable = rg_m.ok and rg_s.ok
    if rg_usable:
        # source must cover every chunk's [base, base+win) slice
        p_res_pad = max(p_res_pad, rg_m.out_pad, rg_s.out_pad)
    else:
        rg_m = rg_s = None

    # windowed pose-side accumulates (gated per-plan at the call sites)
    pacc_m = pad_ids(s.mono.pose_idx, e_pad_m, s.mono.pose_idx < num_p)
    pacc_s = pad_ids(s.stereo.pose_idx, e_pad_s, s.stereo.pose_idx < num_p)
    hrow_np = pad_ids(s.hpl_row, hpl_pad)
    paw_m = baccum(segmm.plan_accum_windows(pacc_m, num_p), "paw_m")
    paw_s = baccum(segmm.plan_accum_windows(pacc_s, num_p), "paw_s")
    paw_b = baccum(segmm.plan_accum_windows(hrow_np, num_p), "paw_b")

    all_plans = (hll_m, hll_s, hpl_m, hpl_s, ivs, xpg, cl)
    ok = all(p.ok for p in all_plans)
    if need_dense:
        ok = (
            ok
            and sc.ok
            and (v2 or (up is not None and up.ok and lo.ok))
            and pad_blocks > 0
        )
    # gather id arrays must exactly match their output geometry
    ok = ok and ivs.num_tiles * ivs.tile == hpl_pad == xpg.num_tiles * xpg.tile

    plans = MXUPlans(
        ok, e_pad_m, e_pad_s, hpl_pad, p_src_pad,
        hll_m, hll_s, hpl_m, hpl_s, ivs, xpg, cl, sc, pad_blocks, up, lo,
        v2, maxw, maxwc, wg, up2,
        rows_ok, p_res_pad, xwg_m, xwg_s,
        paw_m, paw_s, paw_b,
        rg_m, rg_s,
        lr_k=lr_k, lr_nob=lr_nob,
    )
    if not ok:
        return plans, None

    dummy = np.zeros(1, i32)
    # schur-id wire packing decision FIRST: the v2-formation and rows wire
    # modes below condition on it ("dv2" puts hsc_key on device, which the
    # gkey/iru derivations need)
    if wire_pack:
        # "dv2" needs gkey_up2 on device for the lk derivation — only offer
        # the hsc table when the v2 formation actually planned
        plans.sc_pack, _scids = pack_schur_ids(
            sc, col=None if sc is None else np.asarray(s.hpl_col),
            hsc=(s.hsc_row, s.hsc_col, num_p) if v2 else None,
        )
        plans.sc_ntri = int(_scids.get("sc_ntri", 0))
        if plans.sc_pack in ("dv", "dv2") and sc is not None:
            plans.sc_wl = _lm_window(
                np.asarray(s.hpl_col), num_l, sc,
                _scids.get("sc_t0"), plans.sc_ntri,
            )
        sc_lij = _scids["sc_lij"]
        sc_li = _scids["sc_li"]
        sc_lj = _scids["sc_lj"]
        sc_lk_c = _scids["sc_lk"]
        hsc_key_c = _scids.get("hsc_key", dummy)
        sc_t0_c = _scids.get("sc_t0", dummy)
    else:
        # expanded local-id streams: nothing to unpack on device
        plans.sc_pack, plans.sc_ntri = "none", 0
        sc_lij = dummy
        sc_li = np.asarray(sc.li, i32) if sc is not None else dummy
        sc_lj = np.asarray(sc.lj, i32) if sc is not None else dummy
        sc_lk_c = np.asarray(sc.lk, i32) if sc is not None else dummy
        hsc_key_c = dummy
        sc_t0_c = dummy
    dv2 = plans.sc_pack == "dv2"
    if rows_ok:
        fl = rows_float_arrays(s, e_pad_m, e_pad_s)
        measT_m, measT_s = fl["measT_m"], fl["measT_s"]
        omegaT_m, omegaT_s = fl["omegaT_m"], fl["omegaT_s"]
        if rg_usable:
            res_perm_np = np.full(p_res_pad, total_p, np.int32)
            res_perm_np[:total_p] = rorder
            # pose_gidr_m/s never ride the wire: derive_consts rebuilds
            # them on device from res_perm + the ungated pose gids
            rg_consts = dict(
                res_perm=res_perm_np,
                wb_rg_m=np.asarray(rg_m.wb, i32),
                wb_rg_s=np.asarray(rg_s.wb, i32),
            )
        else:
            rg_consts = {}
        if not wire_pack and rg_usable:
            # expanded rank-order gather ids: derive_consts never runs on
            # the multi-chip path, so ship them directly
            rg_consts.update(
                pose_gidr_m=pose_gidr_m.astype(i32),
                pose_gidr_s=pose_gidr_s.astype(i32),
            )
        gid_dt = np.int16 if wire_pack else i32
        rows_consts = dict(
            **rg_consts,
            bb_xwg_m=np.asarray(xwg_m.base_block, i32),
            bb_xwg_s=np.asarray(xwg_s.base_block, i32),
            measT_m=measT_m, measT_s=measT_s,
            omegaT_m=omegaT_m, omegaT_s=omegaT_s,
        )
        exc_m = _gid_exceptions(e2h_m, s.mono.pose_idx, s.mono.lm_idx, e_pad_m)
        exc_s = _gid_exceptions(e2h_s, s.stereo.pose_idx, s.stereo.lm_idx,
                                e_pad_s)
        plans.gid_dv = bool(
            wire_pack and (exc_m[3] + exc_s[3]) * 8 <= Em + Es
        )
        if plans.gid_dv:
            # pose_gid/lm_gid never ride the wire: derive_consts rebuilds
            # them from e2h via hpl_row/hpl_col gathers; only the slotless
            # (fixed-endpoint) edges ship as exception triples (~KB vs the
            # ~1.7 MB gid tables at kitti00 scale)
            rows_consts.update(
                exc_i_m=exc_m[0], exc_p_m=exc_m[1], exc_l_m=exc_m[2],
                exc_i_s=exc_s[0], exc_p_s=exc_s[1], exc_l_s=exc_s[2],
            )
        else:
            rows_consts.update(
                pose_gid_m=pose_gid_m.astype(gid_dt),  # rows gate: num_p <= 4096
                pose_gid_s=pose_gid_s.astype(gid_dt),
                lm_gid_m=lm_gid_m, lm_gid_s=lm_gid_s,
            )
    else:
        rows_consts = {}
    if v2:
        v2_consts = dict(
            bb_up2=np.asarray(up2.base_block, i32),
            occ2=occ2,
            band_occ=occ_band,
        )
        if dv2:
            # gkey_up2/iru/icu are all functions of (hsc_key, gid):
            # derive_consts rebuilds them on device.  Only the compact
            # window block list rides the wire (int16 + delta-packed:
            # ~0.6 MB vs the ~3 MB of shipped key tables at kitti00-loop
            # scale, docs/PERF_NOTES.md)
            g = np.asarray(sc.gid, np.int64).reshape(-1)
            v2_consts["sc_gid"] = (
                g.astype(np.int16)
                if g.size and g.max() <= 32767 and g.min() >= -32768
                else g.astype(i32)
            )
        else:
            v2_consts.update(gkey_up2=gkey_up2, iru=iru, icu=icu)
        # fallback-path constants become dummies (not uploaded at size)
        gkey_up = gkey_lo = dummy
        bb_up = bb_lo = occ_c = dummy
    elif up is not None:
        v2_consts = {}
        bb_up = np.asarray(up.base_block, i32)
        bb_lo = np.asarray(lo.base_block, i32)
        occ_c = occ
    else:  # PCG: no dense formation at all
        v2_consts = {}
        gkey_up = gkey_lo = dummy
        bb_up = bb_lo = occ_c = dummy

    def narrow(a):
        """int16 when values fit — halves the wire cost of the big index
        tables (engine._packed_device_put widens back to int32 on device).
        wire_pack=False keeps int32 (no widening pass on the direct path)."""
        a = np.asarray(a)
        if not wire_pack:
            return a.astype(i32)
        if a.size == 0 or (a.min() >= -32768 and a.max() <= 32767):
            return a.astype(np.int16)
        return a.astype(i32)

    # wire-compression (tunnel ~50MB/s): pack the schur local ids into one
    # int32 when they fit 15 bits, and skip the gated acc tables when the
    # rows front end uploads the ungated gids anyway (engine.derive_consts
    # expands both on device).
    sc_sb_c = np.asarray(sc.sb, i32) if sc is not None else dummy

    # NumPy arrays: the engine uploads the whole Consts pytree in ONE
    # device_put (each separate transfer costs ~30ms tunnel latency).
    skip_acc = rows_ok and wire_pack  # derive_consts rebuilds them on device
    consts = MXUConsts(
        pose_acc_m=dummy if skip_acc else narrow(pacc_m),
        pose_acc_s=dummy if skip_acc else narrow(pacc_s),
        lm_acc_m=dummy if skip_acc else lm_m,
        lm_acc_s=dummy if skip_acc else lm_s,
        e2h_m=e2h_m,
        e2h_s=e2h_s,
        hpl_row=narrow(hrow),
        hpl_col=hcol,
        bb_hll_m=np.asarray(hll_m.base_block, i32),
        bb_hll_s=np.asarray(hll_s.base_block, i32),
        bb_hpl_m=np.asarray(hpl_m.base_block, i32),
        bb_hpl_s=np.asarray(hpl_s.base_block, i32),
        bb_ivs=np.asarray(ivs.base_block, i32),
        bb_xpg=np.asarray(xpg.base_block, i32),
        bb_cl=np.asarray(cl.base_block, i32),
        sc_sb=sc_sb_c,
        sc_li=sc_li,
        sc_lj=sc_lj,
        sc_lk=sc_lk_c,
        sc_lij=sc_lij,
        hsc_key=hsc_key_c,
        sc_t0=sc_t0_c,
        wb_paw_m=np.asarray(paw_m.wb, i32) if paw_m.ok else dummy,
        wb_paw_s=np.asarray(paw_s.wb, i32) if paw_s.ok else dummy,
        wb_paw_b=np.asarray(paw_b.wb, i32) if paw_b.ok else dummy,
        gkey_up=gkey_up,
        gkey_lo=gkey_lo,
        bb_up=bb_up,
        bb_lo=bb_lo,
        occ=occ_c,
        **v2_consts,
        **rows_consts,
        **ob_consts,
    )
    return plans, consts


def _lm_window(col: np.ndarray, num_l: int, sc, sc_t0, n_tri: int) -> int:
    """Host twin of the derive-time chunk->landmark window: the max number
    of landmarks any chunk's triplets touch, +1, rounded to 128 lanes.
    Returns 0 (fall back to the device-wide cumsum derivation) when a chunk
    spans more than _LM_WL_MAX landmarks — only possible with pathologically
    tiny observation counts."""
    if n_tri <= 0:
        return 0
    C, chunk = sc.num_chunks, sc.chunk
    nl = np.bincount(col, minlength=num_l).astype(np.int64)
    cumT = np.zeros(num_l + 1, np.int64)
    np.cumsum(nl * (nl + 1) // 2, out=cumT[1:])
    if sc_t0 is not None and np.asarray(sc_t0).size == C + 1:
        t0 = np.asarray(sc_t0, np.int64)
    else:
        t0 = np.arange(C + 1, dtype=np.int64) * chunk
    t0 = np.minimum(t0, n_tri)
    lm0 = np.searchsorted(cumT, t0[:C], side="right") - 1
    lm1 = np.searchsorted(cumT, np.maximum(t0[1:] - 1, t0[:C]), side="right") - 1
    wl = int((lm1 - lm0).max()) + 1
    wl = -(-wl // 128) * 128
    return wl if wl <= _LM_WL_MAX else 0


_LM_WL_MAX = 1024  # compare-sum cost scales with wl; beyond this the
# device-wide cumsum derivation is the better program


def derive_statics(plans: MXUPlans, n_hpl: int) -> Optional[tuple]:
    """The hashable statics derive_consts needs for the plan's wire modes —
    built here so the engine, the tests and any other derive_consts caller
    make the identical tuple."""
    if plans.sc_pack not in ("dv", "dv2") or plans.schur is None:
        return None
    sch = plans.schur
    t = (n_hpl, sch.chunk, sch.slot_block, plans.sc_ntri, sch.num_chunks)
    if plans.sc_pack == "dv2":
        t += (sch.kwin, plans.wg, plans.pad_blocks, sch.n_hsc_pad)
    return t + (plans.sc_wl,)


def derive_consts(
    mc: MXUConsts, num_p: int, num_l: int, rows_ok: bool, sc_pack: str = "p2",
    sc_dv: Optional[tuple] = None, gid_dv: bool = False,
) -> MXUConsts:
    """Expand the wire-compressed constants on device (engine calls this in
    one jitted dispatch right after the packed upload): rebuild sc_li/sc_lj
    from hpl_col ("dv"/"dv2" modes — canonical triplet enumeration, nothing
    on the wire), sc_lk from hsc_key + sc_gid ("dv2"), and the band-major
    v2 formation tables gkey_up2/iru/icu from hsc_key + sc_gid ("dv2"), or
    unpack sc_lij; derive the gated acc tables, the rank-order pose gather
    ids, and (``gid_dv``) the per-edge pose/lm ids themselves from e2h +
    the exception triples.

    ``sc_dv`` = (n_hpl, chunk, slot_block, n_tri, num_chunks) statics for
    the "dv" derivation; "dv2" appends (kwin, wg, pad_blocks, n_hsc_pad)
    (None otherwise).
    """
    if sc_pack not in ("none", "p2", "p3", "dv", "dv2"):
        raise ValueError(f"unknown sc_pack mode {sc_pack!r}")
    if sc_pack in ("dv", "dv2") and sc_dv is None:
        raise ValueError(f"sc_pack={sc_pack!r} requires sc_dv statics")
    if sc_pack == "dv2" and len(sc_dv) < 9:
        raise ValueError("sc_pack='dv2' requires the 9-tuple sc_dv statics")
    upd = {}
    i32 = jnp.int32
    if sc_pack == "dv2":
        # band-major v2 formation tables: every one is a function of
        # (hsc_key, sc_gid).  Host twin: the v2 block of plan_mxu.
        _kwin, Wg, PB, n_hsc_pad = sc_dv[5:9]
        M = PB // 64
        hk = mc.hsc_key
        vb = hk != _HSC_KEY_PAD
        hr = jnp.where(vb, hk // num_p, 0).astype(i32)
        hc = jnp.where(vb, hk - hr * num_p, 0).astype(i32)
        lanes = jnp.arange(n_hsc_pad, dtype=i32)
        # first block of band m sits at searchsorted(hk, 64*m*num_p);
        # position within the band is the band slot ((row, col)-sorted)
        bandstart = jnp.searchsorted(
            hk, jnp.arange(M, dtype=i32) * (64 * num_p)
        ).astype(i32)
        band = hr // 64
        bslot = jnp.where(vb, band * Wg + (lanes - bandstart[band]), -1)
        gid = mc.sc_gid.astype(i32)
        gv = gid >= 0
        g0 = jnp.minimum(jnp.maximum(gid, 0), n_hsc_pad - 1)
        upd["gkey_up2"] = jnp.where(gv, bslot[g0], -1)
        oob = jnp.where(vb, bslot, M * Wg)
        upd["iru"] = jnp.full(M * Wg, -1, i32).at[oob].set(hr, mode="drop")
        upd["icu"] = jnp.full(M * Wg, -1, i32).at[oob].set(hc, mode="drop")
    if sc_pack in ("dv", "dv2"):
        # canonical enumeration: for landmark l with slots [a_l, b_l), the
        # triplets are (i, j) for i = a_l..b_l-1, j = i..b_l-1 in order —
        # verified host-side by _canonical_schur_ntri before choosing "dv".
        # One scatter + two cumsums + three gathers + an inverse-triangular
        # index inversion; replaces a ~7.8 MB wire table at kitti00 scale.
        n_hpl, chunk, slot_block, n_tri, C = sc_dv[:5]
        col = mc.hpl_col[:n_hpl]
        nl = jnp.zeros(num_l, jnp.int32).at[col].add(1)
        start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(nl)])
        Tl = nl * (nl + 1) // 2
        cumT = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(Tl)])
        n_pad = C * chunk
        # per-chunk canonical offsets: shipped (sc_t0) for re-chunked plans
        # whose padding sits at chunk tails; densely packed plans derive the
        # trivial arange and pc == t
        if mc.sc_t0.size == C + 1:
            t0 = mc.sc_t0.astype(jnp.int32)
        else:
            t0 = jnp.arange(C + 1, dtype=jnp.int32) * chunk
        r = jnp.arange(chunk, dtype=jnp.int32)
        pc = (t0[:C, None] + r[None, :]).reshape(-1)  # canonical position
        valid = (
            (r[None, :] < (t0[1:] - t0[:C])[:, None]).reshape(-1)
            & (pc < n_tri)
        )
        wl = sc_dv[-1] if len(sc_dv) in (6, 10) else 0
        if wl > 0:
            # triplet -> landmark via the chunk-windowed compare-sum: chunks
            # process landmarks in order, so chunk c touches the contiguous
            # landmark range [lm0[c], lm0[c] + wl); the landmark of canonical
            # position pc is lm0[c] + rank of pc among the window's cumT
            # boundaries.  One fused [C, R, wl] compare-sum — the same trick
            # as dv2's lk, replacing the device-wide scatter + 1.95M-element
            # cumsum below (~90 ms at kitti00 scale -> ~10 ms).
            lm0 = jnp.clip(
                jnp.searchsorted(cumT, t0[:C], side="right").astype(jnp.int32)
                - 1, 0, num_l - 1,
            )
            w = jnp.arange(wl, dtype=jnp.int32)
            lmw = jnp.minimum(lm0[:, None] + 1 + w[None, :], num_l)
            cumTw = cumT[lmw]  # [C, wl]
            rank = (
                (cumTw[:, None, :] <= pc.reshape(C, chunk)[:, :, None])
                .sum(-1)
                .astype(jnp.int32)
            )
            lm = (lm0[:, None] + rank).reshape(-1)
        else:
            # fallback: inclusive cumsum over boundary marks placed at the
            # PADDED position of each landmark's canonical boundary (mapped
            # through t0 with one tiny [num_l]-query searchsorted).
            # (A searchsorted(cumT, t) computes the same thing but measured
            # 3x SLOWER — log(L) sequential 1.95M-query gather passes lose
            # to one device cumsum.  Same reason dv2's lk searchsorted cost
            # ~0.5 s.)
            q = jnp.minimum(cumT[1:], t0[C])
            cq = jnp.clip(
                jnp.searchsorted(t0, q, side="right").astype(jnp.int32) - 1,
                0, C - 1,
            )
            bpos = jnp.minimum(cq * chunk + (q - t0[cq]), n_pad)
            marks = jnp.zeros(n_pad + 1, jnp.int32).at[bpos].add(1)
            lm = jnp.cumsum(marks)[:n_pad]
        lm_c = jnp.minimum(lm, num_l - 1)
        p = pc - cumT[lm_c]
        n = nl[lm_c]
        # invert off(i) = i*n - i*(i-1)/2 <= p: fp32 sqrt + exact fix-up
        nf = n.astype(jnp.float32)
        disc = (2.0 * nf + 1.0) ** 2 - 8.0 * p.astype(jnp.float32)
        i0 = jnp.floor(
            (2.0 * nf + 1.0 - jnp.sqrt(jnp.maximum(disc, 0.0))) * 0.5
        ).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, jnp.maximum(n - 1, 0))

        def offi(i):
            return i * n - i * (i - 1) // 2

        for _ in range(3):
            i0 = jnp.where(offi(i0) > p, i0 - 1, i0)
            i0 = jnp.where(p >= offi(i0) + (n - i0), i0 + 1, i0)
        j0 = p - offi(i0) + i0
        base = jnp.broadcast_to(
            mc.sc_sb[:, None] * slot_block, (C, chunk)
        ).reshape(-1)
        gi = start[lm_c] + i0  # global Hpl slot of the W operand
        gj = start[lm_c] + j0
        upd["sc_li"] = jnp.where(valid, gi - base, -1)
        upd["sc_lj"] = jnp.where(valid, gj - base, -1)
        if sc_pack == "dv2":
            # lk = rank of the triplet's Hsc block among its chunk's
            # ascending distinct blocks (SchurPlan.gid semantics).  Rank
            # the triplet's pair key (row_i*num_p + row_j) directly
            # against the CHUNK's own block keys hsc_key[sc_gid[c]]: one
            # fused [C, R, kwin] compare-sum, no searchsorted — two
            # sequential log-pass searchsorteds over 1.95M queries
            # measured ~0.48 s here; the compare-sum is ~10 ms (VPU,
            # PERF_NOTES r4).
            kwin, n_hsc_pad = sc_dv[5], sc_dv[8]
            hk = mc.hsc_key
            # hpl_row may still be int16-narrowed here (the packed-upload
            # path widens before deriving, test paths may not): the pair
            # key below needs int32 arithmetic
            ri = mc.hpl_row[jnp.clip(gi, 0, n_hpl - 1)].astype(jnp.int32)
            rj = mc.hpl_row[jnp.clip(gj, 0, n_hpl - 1)].astype(jnp.int32)
            key = ri * num_p + rj
            gid_w = mc.sc_gid.astype(jnp.int32).reshape(C, kwin)
            hkey_w = jnp.where(
                gid_w >= 0,
                hk[jnp.clip(gid_w, 0, n_hsc_pad - 1)],
                jnp.int32(2**31 - 1),  # -1 tails never rank below a key
            )
            lk = (
                (hkey_w[:, None, :] < key.reshape(C, chunk)[:, :, None])
                .sum(-1)
                .astype(jnp.int32)
                .reshape(-1)
            )
            upd["sc_lk"] = jnp.where(valid, lk, -1)
    elif mc.sc_lij.size > 1:
        if sc_pack == "p3":
            upd["sc_li"] = (mc.sc_lij >> 19) - 1
            upd["sc_lj"] = ((mc.sc_lij >> 8) & 0x7FF) - 1
            upd["sc_lk"] = (mc.sc_lij & 0xFF) - 1
        else:
            upd["sc_li"] = (mc.sc_lij >> 16) - 1
            upd["sc_lj"] = (mc.sc_lij & 0xFFFF) - 1

    if rows_ok:
        pgm, pgs = mc.pose_gid_m, mc.pose_gid_s
        lgm, lgs = mc.lm_gid_m, mc.lm_gid_s
        if gid_dv:
            # per-edge pose/lm ids from the slot tables: slotted edges
            # gather hpl_row/hpl_col at e2h; slotless (fixed-endpoint)
            # edges come from the exception triples — replaces ~1.7 MB of
            # shipped id tables at kitti00 scale
            hrow = mc.hpl_row.astype(i32)
            hcol = mc.hpl_col.astype(i32)

            def _gids(e2h, exc_i, exc_p, exc_l):
                e0 = jnp.maximum(e2h, 0)
                pg = jnp.where(e2h >= 0, hrow[e0], -1)
                lg = jnp.where(e2h >= 0, hcol[e0], -1)
                pg = pg.at[exc_i].set(exc_p, mode="drop")
                lg = lg.at[exc_i].set(exc_l, mode="drop")
                return pg, lg

            pgm, lgm = _gids(mc.e2h_m, mc.exc_i_m, mc.exc_p_m, mc.exc_l_m)
            pgs, lgs = _gids(mc.e2h_s, mc.exc_i_s, mc.exc_p_s, mc.exc_l_s)
            upd["pose_gid_m"], upd["pose_gid_s"] = pgm, pgs
            upd["lm_gid_m"], upd["lm_gid_s"] = lgm, lgs

        def gate(g, n):
            return jnp.where((g >= 0) & (g < n), g, -1)

        upd["pose_acc_m"] = gate(pgm, num_p)
        upd["pose_acc_s"] = gate(pgs, num_p)
        upd["lm_acc_m"] = gate(lgm, num_l)
        upd["lm_acc_s"] = gate(lgs, num_l)
        if mc.res_perm.size > 1:
            # rank-order pose gather ids: prank = inverse permutation of
            # res_perm, then one [e_pad]-sized gather per edge stream —
            # replaces two shipped int16 tables (~1.1 MB at kitti00 scale)
            P = mc.res_perm.shape[0]
            prank = jnp.zeros(P + 1, jnp.int32).at[mc.res_perm].set(
                jnp.arange(P, dtype=jnp.int32)
            )
            for nm, gid in (("pose_gidr_m", pgm), ("pose_gidr_s", pgs)):
                upd[nm] = jnp.where(gid >= 0, prank[jnp.maximum(gid, 0)], -1)
    return mc._replace(**upd)


# ---------------------------------------------------------------------------
# device-side phases
# ---------------------------------------------------------------------------


def _terms_T(qs, cams, err, Xc, ec, mdim, kernel, e_pad):
    """Per-edge weighted GN terms, transposed + lane-padded:
    ([42,e_pad],[12,e_pad],[18,e_pad]).

    Rows are built as [E] vectors and stacked, so the [D, E] outputs are
    written natively — the einsum-then-``.T`` formulation this replaces
    materialized [E, 42] and paid a ~9ms XLA transpose (10 GB/s relayout,
    docs/PERF_NOTES.md) per build at kitti00 scale.
    """
    from cuba_tpu.ops import jacobians, robust

    q = qs[ec.pose_idx]
    cam = cams[ec.pose_idx]
    x = ec.omega * jnp.sum(err * err, axis=-1)
    w = ec.omega * robust.weight(x, kernel[0], kernel[1])
    JP, JL = jacobians.compute(Xc, q, cam, mdim)  # [E, mdim, 6], [E, mdim, 3]
    wJP = [[w * JP[:, k, i] for i in range(6)] for k in range(mdim)]
    JPv = [[JP[:, k, j] for j in range(6)] for k in range(mdim)]
    wJL = [[w * JL[:, k, a] for a in range(3)] for k in range(mdim)]
    JLv = [[JL[:, k, b] for b in range(3)] for k in range(mdim)]
    ev = [err[:, k] for k in range(mdim)]

    rows42 = [
        sum(wJP[k][i] * JPv[k][j] for k in range(mdim))
        for i in range(6) for j in range(6)
    ] + [sum(wJP[k][i] * ev[k] for k in range(mdim)) for i in range(6)]
    rows12 = [
        sum(wJL[k][a] * JLv[k][b] for k in range(mdim))
        for a in range(3) for b in range(3)
    ] + [sum(wJL[k][a] * ev[k] for k in range(mdim)) for a in range(3)]
    rows18 = [
        sum(wJP[k][i] * JLv[k][b] for k in range(mdim))
        for i in range(6) for b in range(3)
    ]
    pad = ((0, 0), (0, e_pad - err.shape[0]))
    return (
        jnp.pad(jnp.stack(rows42), pad),
        jnp.pad(jnp.stack(rows12), pad),
        jnp.pad(jnp.stack(rows18), pad),
    )


def edge_rows_mxu(qs, ts, Xws, cams, kernels, chi_dtype, counts,
                  plans: MXUPlans, mc: MXUConsts, interpret=False):
    """Transposed residual front end (solver/edgerows.py): one-hot gathers +
    [d, E] row math.  Returns (pack_m, pack_s, chi); pack = (g12 [12,E],
    errT [mdim,E], XcT [3,E], inv_z [E]) or None for an absent edge type.

    Replaces the AoS edge_residuals path whose XLA gathers run at ~5-10
    GB/s and whose [E, mdim] layout uses 2-3 of 128 lanes
    (docs/PERF_NOTES.md: gathers 6.4ms + compute 3.7ms per pass)."""
    from cuba_tpu.solver import edgerows

    total_p = qs.shape[0]
    psrc = jnp.concatenate([qs, ts, cams], axis=1).T  # [12, total_p]
    psrc = jnp.pad(psrc, ((0, 0), (0, plans.p_res_pad - total_p)))
    use_rg = plans.rg_m is not None
    if use_rg:
        # permute source columns into first-observation order so each
        # chunk's gather window is narrow (plan_mxu rg_* plans)
        psrc = psrc[:, mc.res_perm]
    XwT = Xws.T  # [3, total_l]
    chi = jnp.zeros((), chi_dtype)
    packs = []
    for count, pgid, lgid, xwg, bbx, measT, omegaT, mdim, kern, rgp, rgid, rwb in (
        (counts[0], mc.pose_gid_m, mc.lm_gid_m, plans.xwg_m, mc.bb_xwg_m,
         mc.measT_m, mc.omegaT_m, 2, kernels[0], plans.rg_m, mc.pose_gidr_m,
         mc.wb_rg_m),
        (counts[1], mc.pose_gid_s, mc.lm_gid_s, plans.xwg_s, mc.bb_xwg_s,
         mc.measT_s, mc.omegaT_s, 3, kernels[1], plans.rg_s, mc.pose_gidr_s,
         mc.wb_rg_s),
    ):
        if count == 0:
            packs.append(None)
            continue
        if use_rg:
            g12 = segmm.windowed_gather(psrc, rgid, rgp, rwb, interpret=interpret)
        else:
            g12 = segmm.resident_gather(psrc, pgid, interpret=interpret)
        src_pad = max(xwg.n_pad, _round_up(XwT.shape[1], xwg.block))
        xw = segmm.tiled_gather(
            jnp.pad(XwT, ((0, 0), (0, src_pad - XwT.shape[1]))),
            lgid, xwg, bbx, interpret=interpret,
        )
        err, Xc, _R, inv_z = edgerows.residual_rows(
            g12, xw, measT, pgid >= 0, mdim
        )
        chi = chi + edgerows.chi_rows(err, omegaT, kern, chi_dtype)
        packs.append((g12, jnp.stack(err), jnp.stack(list(Xc)), inv_z))
    return packs[0], packs[1], chi


def _pose_accum(v42, pose_ids, num_p, paw, wb, interpret):
    """Pose-side quadratic-form accumulate: windowed when the plan allows
    (banded ids from the landmark-major edge order), full-width fallback."""
    if paw is not None and paw.ok:
        return segmm.accum_segsum_windowed(
            v42, pose_ids, num_p, paw, wb, interpret=interpret
        )
    return segmm.accum_segsum(v42, pose_ids, num_p, interpret=interpret)


def build_system_rows(pack_m, pack_s, kernels, num_p, num_l,
                      plans: MXUPlans, mc: MXUConsts, interpret=False):
    """build_system_mxu over row packs from edge_rows_mxu — the GN term rows
    are computed in [d, E] layout and fed straight to the one-hot segment
    reductions (no [E, ...] materialization anywhere)."""
    from cuba_tpu.solver import edgerows

    outs = []
    for pack, omegaT, mdim, kern, pose_ids, lm_ids, e2h, hll_p, hpl_p, bb_hll, bb_hpl, paw, wb in (
        (pack_m, mc.omegaT_m, 2, kernels[0], mc.pose_acc_m, mc.lm_acc_m,
         mc.e2h_m, plans.hll_m, plans.hpl_m, mc.bb_hll_m, mc.bb_hpl_m,
         plans.paw_m, mc.wb_paw_m),
        (pack_s, mc.omegaT_s, 3, kernels[1], mc.pose_acc_s, mc.lm_acc_s,
         mc.e2h_s, plans.hll_s, plans.hpl_s, mc.bb_hll_s, mc.bb_hpl_s,
         plans.paw_s, mc.wb_paw_s),
    ):
        if pack is None:
            continue
        g12, errT, XcT, inv_z = pack
        R = edgerows.rotmat_rows(g12[0:4])
        v42, v12, v18 = edgerows.term_rows(
            errT, (XcT[0], XcT[1], XcT[2]), R, inv_z, g12, omegaT, kern, mdim
        )
        HppT = _pose_accum(v42, pose_ids, num_p, paw, wb, interpret)
        HllT = segmm.tiled_segsum(v12, lm_ids, num_l, hll_p, bb_hll, interpret=interpret)
        HplT = segmm.tiled_segsum(v18, e2h, plans.hpl_pad, hpl_p, bb_hpl, interpret=interpret)
        outs.append((HppT, HllT, HplT))
    if len(outs) == 1:
        return outs[0]
    return tuple(a + b for a, b in zip(outs[0], outs[1]))


def build_system_mxu(qs, cams, num_p, num_l, mono, stereo, err2, Xc2, err3, Xc3,
                     kernels, plans: MXUPlans, mc: MXUConsts, interpret=False):
    """Returns (HppT [42,P], HllT [12,L], HplT [18,hpl_pad]).

    HppT rows: Hpp row-major 36 then bp 6.  HllT rows: Hll 9 then bl 3.
    HplT rows: Hpl row-major (i*3+k).
    """
    outs = []
    for ec, err, Xc, mdim, kern, e_pad, pose_ids, lm_ids, e2h, hll_p, hpl_p, bb_hll, bb_hpl, paw, wb in (
        (mono, err2, Xc2, 2, kernels[0], plans.e_pad_m, mc.pose_acc_m, mc.lm_acc_m,
         mc.e2h_m, plans.hll_m, plans.hpl_m, mc.bb_hll_m, mc.bb_hpl_m,
         plans.paw_m, mc.wb_paw_m),
        (stereo, err3, Xc3, 3, kernels[1], plans.e_pad_s, mc.pose_acc_s, mc.lm_acc_s,
         mc.e2h_s, plans.hll_s, plans.hpl_s, mc.bb_hll_s, mc.bb_hpl_s,
         plans.paw_s, mc.wb_paw_s),
    ):
        if ec.meas.shape[0] == 0:
            continue
        v42, v12, v18 = _terms_T(qs, cams, err, Xc, ec, mdim, kern, e_pad)
        HppT = _pose_accum(v42, pose_ids, num_p, paw, wb, interpret)
        HllT = segmm.tiled_segsum(v12, lm_ids, num_l, hll_p, bb_hll, interpret=interpret)
        HplT = segmm.tiled_segsum(v18, e2h, plans.hpl_pad, hpl_p, bb_hpl, interpret=interpret)
        outs.append((HppT, HllT, HplT))
    if len(outs) == 1:
        return outs[0]
    return tuple(a + b for a, b in zip(outs[0], outs[1]))


def _sym3x3_inv_rows(h: jnp.ndarray) -> jnp.ndarray:
    """Closed-form symmetric 3x3 inverse over row-major rows [9, L].

    Term-for-term identical to ops.smallmat.sym3x3_inv (reference:
    Sym3x3Inv, src/cuda_block_solver.cu:417-452) so the MXU and XLA paths
    agree to rounding even on near-singular landmarks."""
    a00, a01, a02 = h[0], h[1], h[2]
    a11, a12 = h[4], h[5]
    a22 = h[8]
    det = (
        a00 * a11 * a22
        + a01 * a12 * a02
        + a02 * a01 * a12
        - a00 * a12 * a12
        - a02 * a11 * a02
        - a01 * a01 * a22
    )
    inv_det = 1.0 / det
    b00 = inv_det * (a11 * a22 - a12 * a12)
    b01 = inv_det * (a02 * a12 - a01 * a22)
    b11 = inv_det * (a00 * a22 - a02 * a02)
    b02 = inv_det * (a01 * a12 - a02 * a11)
    b12 = inv_det * (a02 * a01 - a00 * a12)
    b22 = inv_det * (a00 * a11 - a01 * a01)
    return jnp.stack([b00, b01, b02, b01, b11, b12, b02, b12, b22])


def prepare_factors_mxu(HppT, HllT, HplT, lam, num_p, num_l,
                        plans: MXUPlans, mc: MXUConsts, interpret=False,
                        axis_name=None):
    """Damped invHll, W = Hpl invHll, bsc = bp - W bl.  All transposed.

    Returns (iv9 [9,L], W [18,hpl_pad], bscT [6,P], g12 [12,hpl_pad]).

    ``axis_name``: multi-chip landmark axis — the shard-local W·bl pose
    accumulate is psum'd before subtracting from bp (HppT must already be
    globally reduced by the caller; HllT/HplT are shard-local).
    """
    hll_d = HllT[:9].at[jnp.asarray([0, 4, 8])].add(lam)
    # near-singular landmarks (few observations) make the fp32 closed-form
    # determinant cancel catastrophically; the inverse is tiny work on [9,L]
    # so compute it in fp64 when available (emulated on TPU, still cheap)
    if jax.config.jax_enable_x64 and hll_d.dtype != jnp.float64:
        iv9 = _sym3x3_inv_rows(hll_d.astype(jnp.float64)).astype(hll_d.dtype)
    else:
        iv9 = _sym3x3_inv_rows(hll_d)
    src12 = jnp.concatenate([iv9, HllT[9:12]], axis=0)  # [12, L]
    # pad source lanes: >= plan window coverage AND a block multiple
    src_pad = max(plans.ivs.n_pad, _round_up(src12.shape[1], plans.ivs.block))
    src12 = jnp.pad(src12, ((0, 0), (0, src_pad - src12.shape[1])))
    g12 = segmm.tiled_gather(src12, mc.hpl_col, plans.ivs, mc.bb_ivs, interpret=interpret)
    W_rows = []
    for i in range(6):
        for m in range(3):
            W_rows.append(
                HplT[3 * i + 0] * g12[0 + m]
                + HplT[3 * i + 1] * g12[3 + m]
                + HplT[3 * i + 2] * g12[6 + m]
            )
    W = jnp.stack(W_rows)  # [18, hpl_pad]
    wbl = jnp.stack([
        W[3 * i + 0] * g12[9] + W[3 * i + 1] * g12[10] + W[3 * i + 2] * g12[11]
        for i in range(6)
    ])  # [6, hpl_pad]
    # slot ids for the accumulate: hpl_row over padded slots (invalid -> -1)
    bsc_sub = _pose_accum(wbl, mc.hpl_row, num_p, plans.paw_b, mc.wb_paw_b, interpret)
    if axis_name is not None:
        bsc_sub = jax.lax.psum(bsc_sub, axis_name)
    bscT = HppT[36:42] - bsc_sub
    return iv9, W, bscT, g12


def schur_dense_mxu(HppT, W, HplT, lam, num_p, pad_blocks,
                    plans: MXUPlans, mc: MXUConsts, dtype, interpret=False):
    """Dense padded Schur matrix, formed without any XLA scatter.

    The fused kernel's per-chunk windows are combined straight into the
    row-major dense BLOCK TABLE [36, PB*PB] by two tiled_segsum calls
    (upper keys r*PB+c are monotone along window lanes; mirror keys rely
    on band locality) — then one transpose yields the [6PB, 6PB] matrix.
    The 11853-block XLA scatter this replaces cost ~45ms/attempt
    (docs/PERF_NOTES.md)."""
    assert pad_blocks == plans.pad_blocks
    PB = pad_blocks

    if plans.v2:
        gT = schur_compact_mxu(W, HplT, plans, mc, interpret=interpret)
        return dense_from_compact(
            gT, HppT, lam, num_p, pad_blocks, plans, mc, dtype,
            interpret=interpret,
        )

    win = segmm.schur_fused(
        W, HplT, plans.schur, mc.sc_sb, mc.sc_li, mc.sc_lj, mc.sc_lk,
        interpret=interpret,
    )  # [36, C*kwin] per-chunk windows
    wpad = _round_up(max(plans.up.n_pad, plans.lo.n_pad, win.shape[1]), 1024)
    win = jnp.pad(win, ((0, 0), (0, wpad - win.shape[1])))

    def keys(k):
        return jnp.pad(k, (0, wpad - k.shape[0]), constant_values=-1)

    up = jax.lax.optimization_barrier(
        segmm.tiled_segsum(win, keys(mc.gkey_up), PB * PB, plans.up, mc.bb_up,
                           interpret=interpret))
    lo = jax.lax.optimization_barrier(
        segmm.tiled_segsum(win, keys(mc.gkey_lo), PB * PB, plans.lo, mc.bb_lo,
                           interpret=interpret))
    # mirror blocks are transposed: row (i*6+j) of `lo` holds element (j,i)
    perm36 = jnp.asarray(
        np.arange(36).reshape(6, 6).T.reshape(-1), jnp.int32
    )
    m36 = -(up + lo[perm36])  # [36, PB*PB], block (p,q) at column p*PB+q
    # add damped Hpp on the block diagonal (identity on padding blocks) in
    # the pre-transpose layout where it fuses into the combine output pass
    # (an XLA scatter here costs ~20ms, a post-transpose mask ~15ms)
    Hpp_d = HppT[:36].T.reshape(num_p, 6, 6)
    Hpp_d = Hpp_d + lam * jnp.eye(6, dtype=Hpp_d.dtype)
    eye_pad = jnp.broadcast_to(jnp.eye(6, dtype=Hpp_d.dtype), (PB - num_p, 6, 6))
    dbT = jnp.concatenate([Hpp_d, eye_pad], axis=0).reshape(PB, 36).T  # [36, PB]
    eye_mask = (jnp.arange(PB)[:, None] == jnp.arange(PB)[None, :]).astype(m36.dtype)
    m4 = jax.lax.optimization_barrier(
        m36.reshape(36, PB, PB) + dbT[:, :, None] * eye_mask[None, :, :])
    # lane interleave (i*6+j, p, q) -> (6p+i, 6q+j) via the band-aware
    # one-hot-matmul kernel (XLA's native transpose runs at ~10GB/s here)
    return segmm.band_transpose(m4, mc.occ, PB, interpret=interpret).astype(dtype)


def schur_band_mxu(HppT, W, HplT, lam, num_p, pad_blocks,
                   plans: MXUPlans, mc: MXUConsts, dtype, interpret=False,
                   with_ob=False):
    """Damped Schur complement in block-tridiagonal storage (D, U) for the
    cyclic-reduction solver (solver/band_cr.py), never materializing the
    dense matrix.  Requires the v2 compact formation plans and a
    band-certified structure (band_cr.certify); the engine falls back to
    from_dense(schur_dense_mxu(...)) otherwise.

    ``with_ob=True`` additionally returns the OUT-of-band (loop closure)
    block values [n_ob, 6, 6] gathered from the compact band-major table —
    compact_to_band's one-hot selection drops them from (D, U) naturally,
    and band_cr.cr_solve_woodbury folds them back in as a low-rank
    correction (plans.lr_nob > 0 required)."""
    assert plans.v2 and pad_blocks == plans.pad_blocks
    gT = schur_compact_mxu(W, HplT, plans, mc, interpret=interpret)
    return band_from_compact(
        gT, HppT, lam, num_p, pad_blocks, plans, mc, dtype,
        interpret=interpret, with_ob=with_ob,
    )


def schur_compact_mxu(W, HplT, plans: MXUPlans, mc: MXUConsts,
                      interpret=False):
    """Shard-local half of the v2 Schur formation: per-chunk windowed pair
    products (schur_fused) combined into ONE band-major compact table
    (gT [36, M*Wg], segmm.compact_to_dense docstring).  The multi-chip
    engine psums this table over the landmark axis — 36*M*Wg floats,
    ~3.6 MB at kitti00 scale vs the ~285 MB dense image — then runs the
    replicated formation (band_from_compact / dense_from_compact)."""
    M = plans.pad_blocks // 64
    win = segmm.schur_fused(
        W, HplT, plans.schur, mc.sc_sb, mc.sc_li, mc.sc_lj, mc.sc_lk,
        interpret=interpret,
    )
    wpad = _round_up(max(plans.up2.n_pad, win.shape[1]), 1024)
    win = jnp.pad(win, ((0, 0), (0, wpad - win.shape[1])))
    keys = jnp.pad(mc.gkey_up2, (0, wpad - mc.gkey_up2.shape[0]),
                   constant_values=-1)
    return segmm.tiled_segsum(
        win, keys, M * plans.wg, plans.up2, mc.bb_up2, interpret=interpret)


def dense_from_compact(gT, HppT, lam, num_p, pad_blocks,
                       plans: MXUPlans, mc: MXUConsts, dtype, interpret=False):
    """Replicated half of the v2 dense formation (see schur_compact_mxu)."""
    PB = pad_blocks
    Hpp_d = HppT[:36].T.reshape(num_p, 6, 6)
    Hpp_d = Hpp_d + lam * jnp.eye(6, dtype=Hpp_d.dtype)
    eye_pad = jnp.broadcast_to(jnp.eye(6, dtype=Hpp_d.dtype), (PB - num_p, 6, 6))
    dbT = jnp.concatenate([Hpp_d, eye_pad], axis=0).reshape(PB, 36).T
    return segmm.compact_to_dense(
        gT, mc.iru, mc.icu, dbT, mc.occ2, PB, plans.wg,
        interpret=interpret,
    ).astype(dtype)


def band_from_compact(gT, HppT, lam, num_p, pad_blocks,
                      plans: MXUPlans, mc: MXUConsts, dtype, interpret=False,
                      with_ob=False):
    """Replicated half of the v2 band formation: damped diagonal + the
    compact table scattered into block-tridiagonal (D, U) storage."""
    PB = pad_blocks
    Hpp_d = HppT[:36].T.reshape(num_p, 6, 6)
    Hpp_d = Hpp_d + lam * jnp.eye(6, dtype=Hpp_d.dtype)
    eye_pad = jnp.broadcast_to(jnp.eye(6, dtype=Hpp_d.dtype), (PB - num_p, 6, 6))
    dbT = jnp.concatenate([Hpp_d, eye_pad], axis=0).reshape(PB, 36).T
    band = segmm.compact_to_band(
        gT, mc.iru, mc.icu, dbT, mc.band_occ, PB, plans.wg,
        interpret=interpret,
    )
    M = PB // 64
    arr = band.reshape(M, 384, 2, 384).astype(dtype)
    if with_ob:
        # sign: the combined table holds +sum(W Hpl^T); the Schur block is
        # its negation (band = diag - (up + mirrors), compact_to_band doc)
        Vob = -(gT[:, mc.ob_rkey].T.reshape(-1, 6, 6)).astype(dtype)
        return arr[:, :, 0, :], arr[:, :, 1, :], Vob
    return arr[:, :, 0, :], arr[:, :, 1, :]


def back_substitute_mxu(iv9, HllT, HplT, g12, xp, num_l,
                        plans: MXUPlans, mc: MXUConsts, interpret=False):
    """xl = invHll (bl - Hpl^T xp) in transposed layout.  Returns [L, 3]."""
    num_p = xp.shape[0]
    xpT = jnp.zeros((6, plans.xpg.n_pad), xp.dtype).at[:, :num_p].set(xp.T)
    xpg = segmm.tiled_gather(xpT, mc.hpl_row, plans.xpg, mc.bb_xpg, interpret=interpret)
    contrib = jnp.stack([
        HplT[0 + k] * xpg[0] + HplT[3 + k] * xpg[1] + HplT[6 + k] * xpg[2]
        + HplT[9 + k] * xpg[3] + HplT[12 + k] * xpg[4] + HplT[15 + k] * xpg[5]
        for k in range(3)
    ])  # [3, hpl_pad]
    red = segmm.tiled_segsum(contrib, mc.hpl_col, num_l, plans.cl, mc.bb_cl,
                             interpret=interpret)
    clT = HllT[9:12] - red
    xlT = jnp.stack([
        iv9[3 * m + 0] * clT[0] + iv9[3 * m + 1] * clT[1] + iv9[3 * m + 2] * clT[2]
        for m in range(3)
    ])
    return xlT.T


def _hpp_matvec_rows(HppT, lam, xT):
    """(Hpp + lam*I) x over transposed rows: xT [6, P] -> [6, P]."""
    return jnp.stack([
        sum(HppT[6 * i + j] * xT[j] for j in range(6)) + lam * xT[i]
        for i in range(6)
    ])


def schur_matvec_rows(HppT, HplT, W, lam, xT, num_p, num_l,
                      plans: MXUPlans, mc: MXUConsts, interpret=False,
                      axis_name=None):
    """Matrix-free Schur matvec Hsc x = (Hpp + lam I) x - W (Hpl^T x).

    The Schur complement is never materialized (no multiplication triplets,
    no dense matrix): one slot gather of x, a per-landmark segment reduce,
    a gather back to slots and a pose-side accumulate — O(n_hpl) work via
    the same one-hot MXU kernels the assembly uses.  This is what makes
    ``BAConfig(solver="pcg")`` usable on the TPU fast path for pose counts
    where the dense factorization's PB^2 memory loses (the reference covers
    that regime with sparse Cholesky, cuda_linear_solver.cpp:147-232)."""
    xg_src = jnp.zeros((6, plans.xpg.n_pad), xT.dtype).at[:, :num_p].set(xT)
    xg = segmm.tiled_gather(xg_src, mc.hpl_row, plans.xpg, mc.bb_xpg,
                            interpret=interpret)
    a3 = jnp.stack([
        sum(HplT[3 * i + k] * xg[i] for i in range(6)) for k in range(3)
    ])  # Hpl^T x per slot [3, hpl_pad]
    aL = segmm.tiled_segsum(a3, mc.hpl_col, num_l, plans.cl, mc.bb_cl,
                            interpret=interpret)
    src_pad = max(plans.ivs.n_pad, _round_up(aL.shape[1], plans.ivs.block))
    ag = segmm.tiled_gather(
        jnp.pad(aL, ((0, 0), (0, src_pad - aL.shape[1]))),
        mc.hpl_col, plans.ivs, mc.bb_ivs, interpret=interpret,
    )
    y6 = jnp.stack([
        sum(W[3 * i + k] * ag[k] for k in range(3)) for i in range(6)
    ])  # [6, hpl_pad]
    ysub = _pose_accum(y6, mc.hpl_row, num_p, plans.paw_b, mc.wb_paw_b, interpret)
    if axis_name is not None:
        # multi-chip: x is replicated (pose space); only the shard-local
        # slot contributions need the ICI all-reduce (~[6, P] floats)
        ysub = jax.lax.psum(ysub, axis_name)
    return _hpp_matvec_rows(HppT, lam, xT) - ysub


def schur_block_diag_inv_rows(HppT, HplT, W, lam, num_p,
                              plans: MXUPlans, mc: MXUConsts, interpret=False,
                              axis_name=None):
    """Inverted exact 6x6 block diagonal of the damped Schur complement,
    as transposed rows [36, P] — the block-Jacobi preconditioner."""
    d36 = jnp.stack([
        sum(W[3 * i + k] * HplT[3 * j + k] for k in range(3))
        for i in range(6) for j in range(6)
    ])  # W Hpl^T diagonal contribution per slot [36, hpl_pad]
    corr = _pose_accum(d36, mc.hpl_row, num_p, plans.paw_b, mc.wb_paw_b, interpret)
    if axis_name is not None:
        corr = jax.lax.psum(corr, axis_name)
    M = (HppT[:36] - corr).T.reshape(num_p, 6, 6)
    M = M + lam * jnp.eye(6, dtype=M.dtype)
    return jnp.linalg.inv(M).reshape(num_p, 36).T


def pcg_solve_rows(HppT, HplT, W, lam, bT, num_p, num_l,
                   plans: MXUPlans, mc: MXUConsts,
                   max_iterations: int, tol: float, interpret=False,
                   axis_name=None, with_iters: bool = False):
    """Block-Jacobi preconditioned CG on the matrix-free Schur operator,
    all in transposed rows layout.  Returns (xT [6, P], ok), or
    (xT, ok, k) with ``with_iters`` (k = CG steps taken — the replicated
    latency-chain length in the multi-chip scaling model).

    Same control flow as solver/pcg.py::pcg_solve (the XLA-path twin);
    non-convergence reports ok=False and the LM loop rejects the step —
    the reference's zero-pivot semantics (cuda_linear_solver.cpp:175-189).
    """
    Minv36 = schur_block_diag_inv_rows(
        HppT, HplT, W, lam, num_p, plans, mc, interpret=interpret,
        axis_name=axis_name,
    )

    def apply_M(rT):
        return jnp.stack([
            sum(Minv36[6 * i + j] * rT[j] for j in range(6)) for i in range(6)
        ])

    def matvec(xT):
        return schur_matvec_rows(
            HppT, HplT, W, lam, xT, num_p, num_l, plans, mc,
            interpret=interpret, axis_name=axis_name,
        )

    def dot(a, c):
        return jnp.sum(a * c)

    b_norm2 = dot(bT, bT)
    tol2 = (tol * tol) * b_norm2
    x0 = jnp.zeros_like(bT)
    z0 = apply_M(bT)
    rz0 = dot(bT, z0)

    def cond(state):
        k, _, r, _, _ = state
        return (k < max_iterations) & (dot(r, r) > tol2)

    def body(state):
        k, x, r, p, rz = state
        Ap = matvec(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, jnp.ones_like(pAp), pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, jnp.ones_like(rz), rz)
        p = z + beta * p
        return (k + 1, x, r, p, rz_new)

    k, x, r, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, bT, z0, rz0)
    )
    ok = (dot(r, r) <= tol2) & jnp.all(jnp.isfinite(x))
    x = jnp.where(ok, x, jnp.zeros_like(x))
    if with_iters:
        return x, ok, k
    return x, ok


def max_diagonal_T(HppT, HllT):
    """max over block-diagonal entries from the transposed system arrays."""
    mp = jnp.max(HppT[jnp.asarray([0, 7, 14, 21, 28, 35])])
    ml = jnp.max(HllT[jnp.asarray([0, 4, 8])])
    return jnp.maximum(jnp.maximum(mp, ml), 0.0)
