"""Problem compiler: graph -> static index structure (the symbolic pass).

This is the TPU-native counterpart of the reference's host/GPU structural
work: active/fixed vertex partitioning (reference:
src/cuda_bundle_adjustment.cpp:140-199), edge gathering with fixed-endpoint
flags (cpp:202-247), the Hpl block-CSC pattern + edge->slot inverse map
(src/cuda_block_solver.cu:1158-1173), the Hsc co-observation block pattern
(src/sparse_block_matrix.cpp:55-133) and the Schur multiplication triplets
(cu:979-1000).  All of it runs ONCE per initialize() as vectorized NumPy; the
output is a set of static-shaped integer arrays that parameterize the jitted
numeric path.  There is no on-device symbolic work and no runtime sorting.

Design deltas vs the reference (deliberate, TPU-first):
  * Hpl blocks are deduplicated per (pose,landmark) pair; multiple edges
    between the same pair sum via segment_sum (the reference gives each edge
    a private slot and would mis-assemble Hsc for duplicated pairs).
  * The Schur system is assembled densely (padded to the MXU tile), so the
    BSR->CSR expansion and fill-reducing ordering (cuda_linear_solver.cpp)
    have no equivalent here - dense blocked Cholesky needs no symbolic phase.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

PDIM = 6  # pose block size (reference: src/constants.h:23)
LDIM = 3  # landmark block size (reference: src/constants.h:24)


@dataclasses.dataclass
class EdgeArrays:
    """Per-edge SoA data for one measurement dimension (2=mono, 3=stereo)."""

    measurements: np.ndarray  # [E, mdim] float64
    omegas: np.ndarray  # [E] float64 (scalar information)
    pose_idx: np.ndarray  # [E] int32, iP in [0, total_p) (fixed poses >= num_p)
    lm_idx: np.ndarray  # [E] int32, iL in [0, total_l)

    @property
    def count(self) -> int:
        return int(self.measurements.shape[0])


@dataclasses.dataclass
class BAStructure:
    """Static problem structure produced once per initialize()."""

    # sizes
    num_p: int  # active (free) poses
    num_l: int  # active (free) landmarks
    total_p: int  # active + fixed poses
    total_l: int
    # initial state, gathered in internal-index order (active first)
    qs: np.ndarray  # [total_p, 4] (x,y,z,w)
    ts: np.ndarray  # [total_p, 3]
    cams: np.ndarray  # [total_p, 5]
    Xws: np.ndarray  # [total_l, 3]
    # edges
    mono: EdgeArrays
    stereo: EdgeArrays
    # Hpl structure (block-CSC over deduplicated (pose, landmark) pairs,
    # sorted by (landmark col, pose row))
    hpl_row: np.ndarray  # [n_hpl] pose row of each slot
    hpl_col: np.ndarray  # [n_hpl] landmark col of each slot
    edge2hpl: np.ndarray  # [E2+E3] slot per combined edge id; n_hpl if not both-free
    # Hsc block pattern: unique upper-tri pose pairs (r <= c), row-major sorted
    hsc_row: np.ndarray  # [n_hsc]
    hsc_col: np.ndarray  # [n_hsc]
    # Schur multiplication triplets: Hsc[k] -= HplinvHll[i] @ Hpl[j]^T
    mul_i: np.ndarray  # [n_mul] Hpl slot
    mul_j: np.ndarray  # [n_mul] Hpl slot (same landmark column, row >= row of i)
    mul_k: np.ndarray  # [n_mul] Hsc block id (ascending - segment_sum friendly)
    # internal edge order (edges are sorted by (landmark, pose) for the MXU
    # window plans): internal_edges = original_edges[perm].  Per-edge outputs
    # (chiSquared) must be scattered back through these.
    mono_perm: np.ndarray = None  # [E2] int64
    stereo_perm: np.ndarray = None  # [E3] int64
    # active-landmark renumbering applied for pose-locality (old -> new)
    lm_rank: np.ndarray = None  # [num_l] int64
    # active-pose renumbering applied for Schur bandwidth (old -> new), or
    # None when the temporal order is kept.  Plays the reference's
    # fill-reducing-ordering role (cuda_linear_solver.cpp:342-348): a
    # loop-closure trajectory is circular in temporal order; the cycle fold
    # restores a band (see _pose_band_perm).  Internal only — the graph
    # layer updates vertex iP so the public API is unaffected.
    pose_rank: np.ndarray = None  # [num_p] int64
    # fused Schur chunk plan from the C++ symbolic pass (raw tuple:
    # ((chunk, slot_block, max_kwin), kwin, ok, C, n_slot_pad, n_hsc_pad,
    # sb, li, lj, lk, gid), geometry self-describing = segmm.sc_geometry()
    # at build time), or None on the NumPy path — segmm.plan_schur consumes
    # it when the requested geometry matches and skips its own planning.
    schur_native: tuple = None

    @property
    def n_hpl(self) -> int:
        return int(self.hpl_row.shape[0])

    @property
    def n_hsc(self) -> int:
        return int(self.hsc_row.shape[0])

    @property
    def n_mul(self) -> int:
        return int(self.mul_i.shape[0])

    @property
    def optimize_p(self) -> bool:
        return self.num_p > 0

    @property
    def optimize_l(self) -> bool:
        return self.num_l > 0

    def shape_signature(self) -> Tuple:
        """Key for the jit cache: recompile only when shapes change."""
        return (
            self.num_p,
            self.num_l,
            self.total_p,
            self.total_l,
            self.mono.count,
            self.stereo.count,
            self.n_hpl,
            self.n_hsc,
            self.n_mul,
        )


def _pair_expand(col_ptr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """For CSC segments, emit all within-segment index pairs (i, j), i <= j.

    Vectorized equivalent of the reference's per-landmark double loop
    (cu:988-998).  Returns (i_idx, j_idx) into the slot array.
    """
    seg_len = np.diff(col_ptr)  # [ncols]
    n_slots = int(col_ptr[-1])
    if n_slots == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    # rank of each slot within its column
    col_of_slot = np.repeat(np.arange(seg_len.size), seg_len)
    rank = np.arange(n_slots) - col_ptr[col_of_slot]
    # slot s pairs with slots s .. end_of_column
    counts = seg_len[col_of_slot] - rank
    i_idx = np.repeat(np.arange(n_slots), counts)
    offsets = np.arange(counts.sum()) - np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    j_idx = i_idx + offsets
    return i_idx, j_idx


def build_structure_from_arrays(
    qs: np.ndarray,
    ts: np.ndarray,
    cams: np.ndarray,
    Xws: np.ndarray,
    fixed_pose_mask: np.ndarray,
    fixed_lm_mask: np.ndarray,
    mono_p: np.ndarray,
    mono_l: np.ndarray,
    mono_z: np.ndarray,
    mono_w: np.ndarray,
    stereo_p: np.ndarray,
    stereo_l: np.ndarray,
    stereo_z: np.ndarray,
    stereo_w: np.ndarray,
) -> BAStructure:
    """Array fast path: compile a problem given SoA arrays directly, skipping
    the per-object graph (used by benchmarks and large synthetic runs where
    building 500k+ Python edge objects would dominate).

    Semantics match build_structure: active vertices first in index order,
    fixed appended after; both-fixed edges dropped.  Vertices with no edges
    are kept (they simply have empty rows) — unlike the object path — so
    callers should pass only referenced vertices for exact reference parity.
    """
    nP, nL = qs.shape[0], Xws.shape[0]
    fixed_pose_mask = np.asarray(fixed_pose_mask, bool)
    fixed_lm_mask = np.asarray(fixed_lm_mask, bool)

    # internal index: active first (stable in id order), fixed after
    def perm_of(fixed_mask):
        order = np.concatenate([np.where(~fixed_mask)[0], np.where(fixed_mask)[0]])
        inv = np.empty_like(order)
        inv[order] = np.arange(order.size)
        return order, inv

    p_order, p_inv = perm_of(fixed_pose_mask)
    l_order, l_inv = perm_of(fixed_lm_mask)
    num_p = int((~fixed_pose_mask).sum())
    num_l = int((~fixed_lm_mask).sum())

    def gather(ep, el, ez, ew, mdim):
        ep = np.asarray(ep, np.int64)
        el = np.asarray(el, np.int64)
        keep = ~(fixed_pose_mask[ep] & fixed_lm_mask[el])
        return EdgeArrays(
            np.asarray(ez, np.float64).reshape(-1, mdim)[keep],
            np.asarray(ew, np.float64)[keep],
            p_inv[ep[keep]].astype(np.int32),
            l_inv[el[keep]].astype(np.int32),
        )

    mono = gather(mono_p, mono_l, mono_z, mono_w, 2)
    stereo = gather(stereo_p, stereo_l, stereo_z, stereo_w, 3)
    return _finish_structure(
        num_p,
        num_l,
        nP,
        nL,
        np.asarray(qs, np.float64)[p_order],
        np.asarray(ts, np.float64)[p_order],
        np.asarray(cams, np.float64)[p_order],
        np.asarray(Xws, np.float64)[l_order],
        mono,
        stereo,
    )


def build_structure(
    pose_ids_sorted: List[int],
    poses: Dict[int, "object"],
    lm_ids_sorted: List[int],
    landmarks: Dict[int, "object"],
    mono_edges: List[object],
    stereo_edges: List[object],
) -> BAStructure:
    """Compile the graph into a BAStructure.

    Follows the reference's gather pass exactly (cpp:115-247): vertices with
    no edges are skipped; active vertices get internal indices 0..n-1 in id
    order, fixed ones are appended after; edges with both endpoints fixed are
    dropped; an (iP,iL) Hpl block exists only when both endpoints are free.
    """
    # --- vertex partition ------------------------------------------------
    active_p, fixed_p = [], []
    for pid in pose_ids_sorted:
        v = poses[pid]
        if not v.edges:
            continue
        (fixed_p if v.fixed else active_p).append(v)
    active_l, fixed_l = [], []
    for lid in lm_ids_sorted:
        v = landmarks[lid]
        if not v.edges:
            continue
        (fixed_l if v.fixed else active_l).append(v)

    num_p, num_l = len(active_p), len(active_l)
    all_p = active_p + fixed_p
    all_l = active_l + fixed_l
    for i, v in enumerate(all_p):
        v.iP = i
    for i, v in enumerate(all_l):
        v.iL = i

    total_p, total_l = len(all_p), len(all_l)
    qs = np.stack([v.q for v in all_p]) if total_p else np.zeros((0, 4))
    ts = np.stack([v.t for v in all_p]) if total_p else np.zeros((0, 3))
    cams = np.stack([v.camera.to_array() for v in all_p]) if total_p else np.zeros((0, 5))
    Xws = np.stack([v.Xw for v in all_l]) if total_l else np.zeros((0, 3))

    # --- edge gather ------------------------------------------------------
    def gather(edges, mdim):
        meas, om, pi, li = [], [], [], []
        for e in edges:
            vp, vl = e.vertexP, e.vertexL
            if vp.fixed and vl.fixed:
                continue  # inactive edge (cpp:212,233)
            meas.append(e.measurement)
            om.append(e.information)
            pi.append(vp.iP)
            li.append(vl.iL)
        if meas:
            return EdgeArrays(
                np.asarray(meas, dtype=np.float64).reshape(-1, mdim),
                np.asarray(om, dtype=np.float64),
                np.asarray(pi, dtype=np.int32),
                np.asarray(li, dtype=np.int32),
            )
        return EdgeArrays(
            np.zeros((0, mdim)), np.zeros(0), np.zeros(0, np.int32), np.zeros(0, np.int32)
        )

    mono = gather(mono_edges, 2)
    stereo = gather(stereo_edges, 3)
    s = _finish_structure(num_p, num_l, total_p, total_l, qs, ts, cams, Xws, mono, stereo)
    # _finish_structure renumbers active landmarks for locality (and active
    # poses for Schur bandwidth, when beneficial); update the vertices'
    # internal indices so finalize() writes back to the right rows
    for v in active_l:
        v.iL = int(s.lm_rank[v.iL])
    if s.pose_rank is not None:
        for v in active_p:
            v.iP = int(s.pose_rank[v.iP])
    return s


def _pose_band_perm(num_p, mono: EdgeArrays, stereo: EdgeArrays):
    """Bandwidth-reducing ACTIVE-pose permutation (old -> new), or None.

    Plays the role of the reference's fill-reducing ordering (METIS on the
    Schur pattern, cuda_linear_solver.cpp:342-348) for the band solvers.
    Loop-closure covisibility makes the temporal pose order CIRCULAR — the
    seam links the first and last poses, which breaks band certification
    and every windowed kernel plan.  Folding the cycle (0, P-1, 1, P-2, …)
    relabels it into a band of twice the window width, so a single-loop
    trajectory rides the fast band path with no low-rank correction at all.

    Applied only when it helps: raw bandwidth over the certification
    threshold (64 poses), folded bandwidth under it.  Multi-loop chords
    that folding cannot band-ify are left to the Woodbury solver
    (band_cr.cr_solve_woodbury).
    """
    if num_p <= 128:
        return None
    big = np.int64(1) << 60
    lo = None
    for ec in (mono, stereo):
        pi = np.asarray(ec.pose_idx, np.int64)
        li = np.asarray(ec.lm_idx, np.int64)
        m = pi < num_p
        if not m.any():
            continue
        if lo is None:
            n_lm = int(li.max()) + 1
            lo = np.full(n_lm, big)
            hi = np.full(n_lm, -1, np.int64)
        elif int(li.max()) >= lo.size:
            pad = int(li.max()) + 1 - lo.size
            lo = np.concatenate([lo, np.full(pad, big)])
            hi = np.concatenate([hi, np.full(pad, -1, np.int64)])
        np.minimum.at(lo, li[m], pi[m])
        np.maximum.at(hi, li[m], pi[m])
    if lo is None:
        return None
    seen = hi >= 0
    if not seen.any():
        return None
    bw0 = int((hi[seen] - lo[seen]).max())
    if bw0 <= 64:
        return None  # already band-certifiable in temporal order
    ids = np.arange(num_p, dtype=np.int64)
    fold = np.minimum(2 * ids, 2 * (num_p - 1 - ids) + 1)
    flo = np.full(lo.size, big)
    fhi = np.full(hi.size, -1, np.int64)
    for ec in (mono, stereo):
        pi = np.asarray(ec.pose_idx, np.int64)
        li = np.asarray(ec.lm_idx, np.int64)
        m = pi < num_p
        if m.any():
            fp = fold[pi[m]]
            np.minimum.at(flo, li[m], fp)
            np.maximum.at(fhi, li[m], fp)
    bw1 = int((fhi[seen] - flo[seen]).max())
    if bw1 <= 64 and bw1 < bw0:
        return fold.astype(np.int64)
    return None


def _locality_reorder(num_l, mono: EdgeArrays, stereo: EdgeArrays, Xws):
    """Renumber ACTIVE landmarks by their min observing pose and sort each
    edge type by (new landmark, pose).

    Internal ordering only (invisible through the public API — callers keep
    the id<->index maps).  This gives the Schur mul-triplets the
    pose-locality the MXU window kernels need (solver/mxu.py): without it,
    a chunk of landmark-sorted triplets scatters across the whole Hsc block
    range.  Returns (rank[num_l], mono_perm, stereo_perm, Xws)."""
    from cuba_tpu import native

    native_out = None
    if native.get_lib() is not None:
        total_p = int(
            max(
                mono.pose_idx.max(initial=-1),
                stereo.pose_idx.max(initial=-1),
            )
            + 1
        )
        total_l = int(
            max(
                mono.lm_idx.max(initial=-1),
                stereo.lm_idx.max(initial=-1),
                num_l - 1,
            )
            + 1
        )
        native_out = native.locality_reorder(
            mono.pose_idx, mono.lm_idx, stereo.pose_idx, stereo.lm_idx,
            max(total_p, 1), max(total_l, 1), num_l,
        )
    if native_out is not None:
        rank, mono_perm, stereo_perm, mono_new_li, stereo_new_li = native_out

        def apply(ec: EdgeArrays, perm, new_li):
            return EdgeArrays(
                ec.measurements[perm], ec.omegas[perm], ec.pose_idx[perm], new_li
            )

        Xws = Xws.copy()
        # scatter-permute (rank is a permutation: new[rank[old]] = old row);
        # one O(n) pass instead of argsort + gather
        Xws[np.asarray(rank, np.int64)] = Xws[:num_l].copy()
        return (
            rank,
            apply(mono, mono_perm, mono_new_li),
            mono_perm,
            apply(stereo, stereo_perm, stereo_new_li),
            stereo_perm,
            Xws,
        )
    minp = np.full(num_l, np.int64(1) << 60, np.int64)
    for ec in (mono, stereo):
        li = np.asarray(ec.lm_idx, np.int64)
        m = li < num_l
        if m.any():
            np.minimum.at(minp, li[m], np.asarray(ec.pose_idx, np.int64)[m])
    order = np.argsort(minp, kind="stable")  # new -> old
    rank = np.empty(num_l, np.int64)
    rank[order] = np.arange(num_l)

    def remap_sort(ec: EdgeArrays):
        li = np.asarray(ec.lm_idx, np.int64)
        new_li = np.where(li < num_l, rank[np.minimum(li, max(num_l - 1, 0))], li)
        perm = np.lexsort((ec.pose_idx, new_li))
        return (
            EdgeArrays(
                ec.measurements[perm],
                ec.omegas[perm],
                ec.pose_idx[perm],
                new_li[perm].astype(np.int32),
            ),
            perm,
        )

    mono2, mono_perm = remap_sort(mono)
    stereo2, stereo_perm = remap_sort(stereo)
    Xws = Xws.copy()
    Xws[:num_l] = Xws[:num_l][order]
    return rank, mono2, mono_perm, stereo2, stereo_perm, Xws


def _finish_structure(
    num_p: int,
    num_l: int,
    total_p: int,
    total_l: int,
    qs: np.ndarray,
    ts: np.ndarray,
    cams: np.ndarray,
    Xws: np.ndarray,
    mono: EdgeArrays,
    stereo: EdgeArrays,
) -> BAStructure:
    """Shared symbolic pass: Hpl CSC, Hsc pattern, Schur mul-triplets.

    Dispatches to the C++ implementation (cuba_tpu/native/symbolic.cpp) when
    available; the NumPy code below is the reference fallback and produces
    identical output (asserted in tests/test_structure.py).
    """
    pose_rank = _pose_band_perm(num_p, mono, stereo)
    if pose_rank is not None:
        # relabel active poses (fixed ids >= num_p are untouched) and
        # reorder the state rows to match; everything downstream — edge
        # streams, Hpl rows, Hsc pattern, window plans — sees the banded
        # index space
        order = np.argsort(pose_rank)  # new -> old
        qs = qs.copy()
        ts = ts.copy()
        cams = cams.copy()
        qs[:num_p] = qs[:num_p][order]
        ts[:num_p] = ts[:num_p][order]
        cams[:num_p] = cams[:num_p][order]

        def remap_poses(ec: EdgeArrays) -> EdgeArrays:
            pi = np.asarray(ec.pose_idx, np.int64)
            new = np.where(
                pi < num_p, pose_rank[np.minimum(pi, max(num_p - 1, 0))], pi
            )
            return EdgeArrays(
                ec.measurements, ec.omegas, new.astype(np.int32), ec.lm_idx
            )

        mono = remap_poses(mono)
        stereo = remap_poses(stereo)
    if num_l:
        lm_rank, mono, mono_perm, stereo, stereo_perm, Xws = _locality_reorder(
            num_l, mono, stereo, Xws
        )
    else:
        lm_rank = np.zeros(0, np.int64)
        mono_perm = np.arange(mono.count, dtype=np.int64)
        stereo_perm = np.arange(stereo.count, dtype=np.int64)

    e_pi = np.concatenate([mono.pose_idx, stereo.pose_idx])
    e_li = np.concatenate([mono.lm_idx, stereo.lm_idx])

    from cuba_tpu import native
    from cuba_tpu.ops import segmm

    nat = native.symbolic_compile(e_pi, e_li, num_p, num_l,
                                  sc_geom=segmm.sc_geometry())
    if nat is not None:
        (hpl_row, hpl_col, edge2hpl, hsc_row, hsc_col, mul_i, mul_j, mul_k,
         schur_native) = nat
        return BAStructure(
            num_p=num_p,
            num_l=num_l,
            total_p=total_p,
            total_l=total_l,
            qs=qs,
            ts=ts,
            cams=cams,
            Xws=Xws,
            mono=mono,
            stereo=stereo,
            hpl_row=hpl_row,
            hpl_col=hpl_col,
            edge2hpl=edge2hpl,
            hsc_row=hsc_row,
            hsc_col=hsc_col,
            mul_i=mul_i,
            mul_j=mul_j,
            mul_k=mul_k,
            mono_perm=mono_perm,
            stereo_perm=stereo_perm,
            lm_rank=lm_rank,
            pose_rank=pose_rank,
            schur_native=schur_native,
        )

    # --- Hpl block-CSC (deduplicated) ------------------------------------
    both_free = (e_pi < num_p) & (e_li < num_l)

    pair_key = e_li.astype(np.int64) * max(total_p, 1) + e_pi.astype(np.int64)
    free_keys = pair_key[both_free]
    uniq_keys, inv = np.unique(free_keys, return_inverse=True)  # sorted by (col, row)
    n_hpl = uniq_keys.size
    hpl_col = (uniq_keys // max(total_p, 1)).astype(np.int32)
    hpl_row = (uniq_keys % max(total_p, 1)).astype(np.int32)

    edge2hpl = np.full(e_pi.size, n_hpl, dtype=np.int32)  # n_hpl == "no slot"
    edge2hpl[both_free] = inv.astype(np.int32)

    # --- Hsc pattern + mul triplets ---------------------------------------
    col_ptr = np.zeros(num_l + 1, dtype=np.int64)
    if n_hpl:
        np.add.at(col_ptr, hpl_col + 1, 1)
        np.cumsum(col_ptr, out=col_ptr)
    i_idx, j_idx = _pair_expand(col_ptr)
    if i_idx.size:
        r1 = hpl_row[i_idx].astype(np.int64)
        r2 = hpl_row[j_idx].astype(np.int64)
        blk_key = r1 * max(num_p, 1) + r2  # r1 <= r2 within a sorted column
        uniq_blk, mul_k = np.unique(blk_key, return_inverse=True)
        hsc_row = (uniq_blk // max(num_p, 1)).astype(np.int32)
        hsc_col = (uniq_blk % max(num_p, 1)).astype(np.int32)
        # triplets stay in landmark-major generation order (mul_i
        # non-decreasing) — the layout the fused Schur kernel plans over;
        # mul_k values are row-major Hsc ranks (np.unique sorts keys)
        mul_i = i_idx.astype(np.int32)
        mul_j = j_idx.astype(np.int32)
        mul_k = mul_k.astype(np.int32)
    else:
        hsc_row = np.zeros(0, dtype=np.int32)
        hsc_col = np.zeros(0, dtype=np.int32)
        mul_i = mul_j = mul_k = np.zeros(0, dtype=np.int32)

    return BAStructure(
        num_p=num_p,
        num_l=num_l,
        total_p=total_p,
        total_l=total_l,
        qs=qs,
        ts=ts,
        cams=cams,
        Xws=Xws,
        mono=mono,
        stereo=stereo,
        hpl_row=hpl_row,
        hpl_col=hpl_col,
        edge2hpl=edge2hpl,
        hsc_row=hsc_row,
        hsc_col=hsc_col,
        mul_i=mul_i,
        mul_j=mul_j,
        mul_k=mul_k,
        mono_perm=mono_perm,
        stereo_perm=stereo_perm,
        lm_rank=lm_rank,
        pose_rank=pose_rank,
    )
