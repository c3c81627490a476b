"""Per-shard MXU planning for multi-chip bundle adjustment.

The multi-chip engine (parallel/sharding.py) partitions landmarks — and
their edges, Hpl slots and Schur triplets — across a 1-D device mesh.  Its
first-cut assembly used the XLA segment_sum path per shard, which runs at
the ~5-10 GB/s scatter speed the single-chip MXU kernels exist to avoid
(docs/PERF_NOTES.md key fact 1).  This module makes the Pallas one-hot
kernel family (ops/segmm.py, solver/mxu.py) usable *inside* shard_map:

  1. ``shard_structures`` cuts the global BAStructure into S shard-local
     BAStructures (global poses + global Hsc pattern, local landmarks /
     edges / slots / triplets).  The landmark partition is contiguous, so
     each shard inherits the global locality order — the windowed plans
     stay narrow.
  2. ``plan_sharded`` runs plan_mxu per shard and folds the plan STATICS
     (paddings, tile grids, window widths) to cross-shard maxima with
     MXUForce, re-planning until every shard traces to the same program —
     shard_map is SPMD, one trace for all devices.
  3. The per-shard device constants are stacked along a leading shard axis
     and handed to shard_map with ``P(AXIS)`` in_specs; the body squeezes
     the axis and calls the SAME mxu.* functions the single-chip engine
     uses, with psums at exactly four points: chi, HppT, the W·bl pose
     accumulate (prepare_factors_mxu axis_name) and the compact Schur
     table (schur_compact_mxu output, 36*M*Wg floats — ~3.6 MB
     at kitti00 scale vs the ~285 MB dense image).

The reference has no counterpart (single-GPU, SURVEY.md §2); this is the
TPU scaling extension's fast path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from cuba_tpu.solver import mxu
from cuba_tpu.solver.structure import BAStructure, EdgeArrays


def _lm_owner(num_l: int, S: int) -> Tuple[np.ndarray, int]:
    """Contiguous landmark partition: owner = g // base, base = ceil(L/S)."""
    base = -(-num_l // S) if num_l else 0
    if num_l == 0:
        return np.zeros(0, np.int64), 0
    owner = np.minimum(np.arange(num_l) // max(base, 1), S - 1)
    return owner, base


def shard_structures(s: BAStructure, S: int) -> Optional[List[BAStructure]]:
    """Cut the global structure into S shard-local BAStructures.

    Every shard keeps the GLOBAL poses (replicated) and the GLOBAL Hsc
    block pattern (mul_k stays a global block id — the compact Schur
    tables psum into one global key space).  Landmarks, edges, Hpl slots
    and triplets are shard-local; every shard is padded to the same
    ``base`` active-landmark count (dummy landmarks have no edges) and
    carries the replicated fixed-landmark tail.  Returns None when the
    partition cannot produce valid shards (fewer active landmarks than
    shards, or a shard without slots).
    """
    num_l, total_l = s.num_l, s.total_l
    n_fixed = total_l - num_l
    owner, base = _lm_owner(num_l, S)
    if base == 0 or num_l < S:
        return None
    total_l_s = base + n_fixed

    # slots: hpl_col is sorted ascending, so owners are non-decreasing and
    # each shard's slots form one contiguous global range
    col = np.asarray(s.hpl_col, np.int64)
    slot_owner = owner[col] if s.n_hpl else np.zeros(0, np.int64)
    slot_start = np.searchsorted(slot_owner, np.arange(S))
    slot_end = np.searchsorted(slot_owner, np.arange(S), side="right")
    if np.any(slot_end - slot_start == 0):
        return None  # a shard with no slots cannot take the MXU path
    # triplets: mul_i walks slots in ascending order (landmark-major)
    trip_owner = slot_owner[np.asarray(s.mul_i, np.int64)] if s.n_mul else np.zeros(0, np.int64)
    trip_start = np.searchsorted(trip_owner, np.arange(S))
    trip_end = np.searchsorted(trip_owner, np.arange(S), side="right")

    def split_edges(ea: EdgeArrays, e_off: int):
        E = ea.count
        lm = np.asarray(ea.lm_idx, np.int64)
        if E:
            is_fixed = lm >= num_l
            own = np.where(
                is_fixed, np.arange(E) % S,  # fixed-lm edges: pose terms only
                owner[np.minimum(lm, max(num_l - 1, 0))],
            )
        else:
            own = np.zeros(0, np.int64)
        e2h = np.asarray(s.edge2hpl[e_off : e_off + E], np.int64)
        per, per_e2h = [], []
        for sh in range(S):
            sel = np.flatnonzero(own == sh)
            lml = lm[sel]
            lml = np.where(lml >= num_l, base + (lml - num_l), lml - sh * base)
            per.append(EdgeArrays(
                measurements=ea.measurements[sel],
                omegas=ea.omegas[sel],
                pose_idx=np.asarray(ea.pose_idx, np.int32)[sel],
                lm_idx=lml.astype(np.int32),
            ))
            n_hpl_sh = int(slot_end[sh] - slot_start[sh])
            e2 = e2h[sel]
            per_e2h.append(
                np.where(e2 < s.n_hpl, e2 - slot_start[sh], n_hpl_sh).astype(np.int64)
            )
        return per, per_e2h

    mono_per, mono_e2h = split_edges(s.mono, 0)
    stereo_per, stereo_e2h = split_edges(s.stereo, s.mono.count)

    shards = []
    for sh in range(S):
        a, b = int(slot_start[sh]), int(slot_end[sh])
        ta, tb = int(trip_start[sh]), int(trip_end[sh])
        lo, hi = sh * base, min((sh + 1) * base, num_l)
        Xws = np.zeros((total_l_s, 3), s.Xws.dtype)
        Xws[: hi - lo] = s.Xws[lo:hi]
        if n_fixed:
            Xws[base:] = s.Xws[num_l:]
        shards.append(BAStructure(
            num_p=s.num_p,
            num_l=base,
            total_p=s.total_p,
            total_l=total_l_s,
            qs=s.qs, ts=s.ts, cams=s.cams,
            Xws=Xws,
            mono=mono_per[sh],
            stereo=stereo_per[sh],
            hpl_row=np.asarray(s.hpl_row, np.int64)[a:b],
            hpl_col=col[a:b] - sh * base,
            edge2hpl=np.concatenate([mono_e2h[sh], stereo_e2h[sh]]),
            hsc_row=s.hsc_row,  # GLOBAL pattern (replicated formation)
            hsc_col=s.hsc_col,
            mul_i=np.asarray(s.mul_i, np.int64)[ta:tb] - a,
            mul_j=np.asarray(s.mul_j, np.int64)[ta:tb] - a,
            mul_k=np.asarray(s.mul_k, np.int64)[ta:tb],  # GLOBAL block id
        ))
    return shards


@dataclasses.dataclass
class MXUShardPlan:
    """Unified per-shard MXU plans + stacked device constants."""

    plans: mxu.MXUPlans  # shared statics (every shard verified identical)
    consts: "mxu.MXUConsts"  # numpy arrays stacked along a leading [S] axis
    counts: Tuple[int, int]  # unified edge-stream gates (max over shards)
    num_l_s: int  # uniform per-shard active landmark count (padded)
    total_l_s: int
    structures: List[BAStructure]


def plan_sharded(
    s: BAStructure, S: int, pad_blocks: int, need_dense: bool = True,
) -> Optional[MXUShardPlan]:
    """Plan the MXU pipeline for every shard with unified statics.

    Runs plan_mxu per shard, folds the statics with force_max, and
    re-plans until the cross-shard static signature is a fixpoint
    (2 passes in practice).  Returns None when any shard's plan is
    infeasible (the engine falls back to the XLA segment_sum body).
    """
    shards = shard_structures(s, S)
    if shards is None:
        return None
    force = None
    outs = None
    for _ in range(4):
        outs = [
            mxu.plan_mxu(ss, pad_blocks, need_dense=need_dense,
                         force=force, wire_pack=False)
            for ss in shards
        ]
        if not all(p.ok and p.rows_ok for p, _ in outs):
            return None
        f = mxu.force_of(outs[0][0])
        for p, _ in outs[1:]:
            f = mxu.force_max(f, mxu.force_of(p))
        sigs = {mxu.static_sig(p) for p, _ in outs}
        if len(sigs) == 1:
            break
        force = f
    else:
        return None
    if len({mxu.static_sig(p) for p, _ in outs}) != 1:
        return None
    stacked = mxu.MXUConsts(*[
        np.stack([np.asarray(getattr(c, name)) for _, c in outs])
        for name in mxu.MXUConsts._fields
    ])
    counts = (
        max(ss.mono.count for ss in shards),
        max(ss.stereo.count for ss in shards),
    )
    return MXUShardPlan(
        plans=outs[0][0],
        consts=stacked,
        counts=counts,
        num_l_s=shards[0].num_l,
        total_l_s=shards[0].total_l,
        structures=shards,
    )
