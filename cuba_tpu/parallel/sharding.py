"""Landmark-sharded multi-chip bundle adjustment (shard_map + psum).

The reference is strictly single-GPU (its only parallelism is per-edge CUDA
threads + atomics; there is no NCCL/MPI anywhere — SURVEY.md §2).  This
module adds the TPU-native scaling axis: landmarks (and their edges) are
partitioned across a device mesh, poses are replicated, and the Schur
reduction rides ICI all-reduces:

  per shard:   residuals, chi2 part, Hpp/bp contributions, Hll/bl (owned),
               Hpl blocks (owned), invHll, W = Hpl invHll, local triplet
               products segment-summed into the SPARSE Hsc block table
  collectives: chi2 = psum;  Hpp [P,6,6], bp [P,6], bsc [P,6] and the
               sparse Hsc block table [n_hsc,6,6] = psum — the per-attempt
               all-reduce is ~36*n_hsc floats (~1.7 MB at kitti00 scale),
               NOT the dense padded matrix (~285 MB), which is formed
               REPLICATED from the reduced table on every device
  replicated:  dense formation, lambda control, dense Cholesky of the
               reduced system, pose update (identical on every device)
  local:       back-substitution xl and landmark updates (owned landmarks)

The whole LM loop (same control law as the single-chip engine,
reference: src/cuda_bundle_adjustment.cpp:793-857) runs inside ONE
shard_map-ped jitted while_loop: zero host synchronisation per iteration,
collectives only where the math requires them.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cuba_tpu.config import BAConfig
from cuba_tpu.ops import robust, se3, smallmat
from cuba_tpu.solver import assembly, dense_cholesky, pcg
from cuba_tpu.solver.assembly import EdgeConsts
from cuba_tpu.solver.structure import BAStructure

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

AXIS = "landmarks"


class ShardedSchurOperator(NamedTuple):
    """Matrix-free Schur operator over landmark-sharded slot tables.

    Per matvec: the shard-local gather/segment work runs on each device's
    OWN slots, then ONE [P, 6] psum (~32 KB at kitti00 scale) combines the
    pose-side contributions over ICI — the scalable multichip solve path
    (the replicated dense/band factorization does O(P^2) work per device;
    this does O(n_hpl / n_devices) + one small collective per CG step)."""

    Hpp_d: jnp.ndarray  # [P, 6, 6] damped, replicated (already psum'd)
    Hpl: jnp.ndarray  # [n_hpl_local, 6, 3] shard-local slots
    W: jnp.ndarray  # [n_hpl_local, 6, 3] Hpl @ invHll
    hpl_row: jnp.ndarray  # local slot -> global pose row
    hpl_col: jnp.ndarray  # local slot -> local landmark col
    num_p: int
    num_l: int  # local landmark pad

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        a = jax.ops.segment_sum(
            jnp.einsum("kij,ki->kj", self.Hpl, x[self.hpl_row], precision="highest"),
            self.hpl_col,
            num_segments=self.num_l,
        )
        y2 = jax.ops.segment_sum(
            jnp.einsum("kij,kj->ki", self.W, a[self.hpl_col], precision="highest"),
            self.hpl_row,
            num_segments=self.num_p,
        )
        y2 = jax.lax.psum(y2, AXIS)
        return jnp.einsum("pij,pj->pi", self.Hpp_d, x, precision="highest") - y2

    def block_diagonal(self) -> jnp.ndarray:
        contrib = jnp.einsum("kil,kjl->kij", self.W, self.Hpl)
        corr = jax.ops.segment_sum(contrib, self.hpl_row, num_segments=self.num_p)
        return self.Hpp_d - jax.lax.psum(corr, AXIS)


class ShardedConsts(NamedTuple):
    """Per-shard device arrays; leading axis = shard."""

    cams: jnp.ndarray  # [total_p, 5] replicated
    mono: EdgeConsts  # leading axis [S, E2pad, ...]; lm_idx is shard-LOCAL
    stereo: EdgeConsts
    hpl_row: jnp.ndarray  # [S, Hpad] global pose row per local slot
    hpl_col: jnp.ndarray  # [S, Hpad] shard-local landmark col
    mul_i: jnp.ndarray  # [S, Mpad] local slot
    mul_j: jnp.ndarray  # [S, Mpad]
    mul_k: jnp.ndarray  # [S, Mpad] GLOBAL Hsc block id (n_hsc on padding)
    lm_count: jnp.ndarray  # [S] active landmarks in shard
    # replicated Hsc block pattern for the per-device dense formation
    hsc_row: jnp.ndarray  # [n_hsc]
    hsc_col: jnp.ndarray  # [n_hsc]


@dataclasses.dataclass
class ShardedProblem:
    structure: BAStructure
    n_shards: int
    lm_pad: int  # landmarks per shard (padded)
    lm_pad_active: int  # offset of the replicated fixed-landmark tail
    consts: ShardedConsts
    qs: jnp.ndarray  # [total_p, 4] replicated
    ts: jnp.ndarray
    Xws: jnp.ndarray  # [S, lm_pad, 3] sharded
    lm_shard: np.ndarray  # [num_l] -> shard id (for gathering results)
    lm_local: np.ndarray  # [num_l] -> local index


def _pad2(a: np.ndarray, n: int, fill=0):
    out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


def shard_problem(structure: BAStructure, n_shards: int, dtype) -> ShardedProblem:
    """Partition landmarks round-robin-by-block and regroup all per-edge /
    per-slot / per-triplet arrays by owning shard, padded to equal size.

    Padded edges carry omega = 0 (zero contribution everywhere) and index 0.
    Fixed landmarks are replicated to every shard's tail (they are read-only).
    """
    s = structure
    S = n_shards
    num_l, total_l = s.num_l, s.total_l
    n_fixed_l = total_l - num_l

    # contiguous blocks of active landmarks per shard
    base = -(-num_l // S) if num_l else 0  # ceil
    lm_shard = np.minimum(np.arange(num_l) // max(base, 1), S - 1) if num_l else np.zeros(0, int)
    lm_local = (np.arange(num_l) - lm_shard * base).astype(np.int64) if num_l else np.zeros(0, int)
    per_shard_active = np.bincount(lm_shard, minlength=S) if num_l else np.zeros(S, int)
    lm_pad_active = int(per_shard_active.max()) if num_l else 0
    # fixed landmarks appended (replicated) after the active block
    lm_pad = max(lm_pad_active + n_fixed_l, 1)

    # local Xws per shard
    Xws_s = np.zeros((S, lm_pad, 3))
    for sh in range(S):
        sel = np.where(lm_shard == sh)[0]
        Xws_s[sh, : sel.size] = s.Xws[sel]
        if n_fixed_l:
            Xws_s[sh, lm_pad_active : lm_pad_active + n_fixed_l] = s.Xws[num_l:]

    def lm_to_local(gl):
        """Global landmark index -> (shard, local)."""
        gl = np.asarray(gl, np.int64)
        is_fixed = gl >= num_l
        sh = np.where(is_fixed, 0, lm_shard[np.minimum(gl, max(num_l - 1, 0))])
        loc = np.where(
            is_fixed,
            lm_pad_active + (gl - num_l),
            lm_local[np.minimum(gl, max(num_l - 1, 0))],
        )
        return sh, loc

    # --- regroup edges by shard; fixed-landmark edges go to the pose? ----
    # every edge references exactly one landmark; edges on fixed landmarks
    # are assigned to shard 0 is WRONG for Hpp balance but correct math —
    # they are assigned to the shard where the (replicated) fixed landmark
    # lives locally: shard (edge_id % S) for load balance.
    def split_edges(ea, combined_offset):
        E = ea.count
        gl = ea.lm_idx.astype(np.int64)
        sh, loc = lm_to_local(gl)
        is_fixed = gl >= num_l
        if E:
            sh = np.where(is_fixed, np.arange(E) % S, sh)  # balance fixed-lm edges
        counts = np.bincount(sh, minlength=S) if E else np.zeros(S, int)
        Epad = max(int(counts.max()), 1)
        meas = np.zeros((S, Epad, ea.measurements.shape[1]))
        omega = np.zeros((S, Epad))
        pidx = np.zeros((S, Epad), np.int32)
        lidx = np.zeros((S, Epad), np.int32)
        e2h = np.zeros((S, Epad), np.int32)
        src_rows = []  # (shard, slot) -> combined edge id, for chi2 queries
        for shd in range(S):
            sel = np.where(sh == shd)[0]
            meas[shd, : sel.size] = ea.measurements[sel]
            omega[shd, : sel.size] = ea.omegas[sel]
            pidx[shd, : sel.size] = ea.pose_idx[sel]
            lidx[shd, : sel.size] = loc[sel]
            e2h[shd, : sel.size] = s.edge2hpl[sel + combined_offset]
            src_rows.append(sel + combined_offset)
        return meas, omega, pidx, lidx, e2h, src_rows

    m_meas, m_om, m_pi, m_li, m_e2h, _ = split_edges(s.mono, 0)
    t_meas, t_om, t_pi, t_li, t_e2h, _ = split_edges(s.stereo, s.mono.count)

    # --- regroup Hpl slots and triplets by owning shard -------------------
    slot_sh = lm_shard[s.hpl_col] if s.n_hpl else np.zeros(0, int)
    slot_counts = np.bincount(slot_sh, minlength=S) if s.n_hpl else np.zeros(S, int)
    Hpad = max(int(slot_counts.max()), 1)
    hpl_row_s = np.zeros((S, Hpad), np.int32)
    hpl_col_s = np.zeros((S, Hpad), np.int32)
    slot_remap = np.zeros(s.n_hpl + 1, np.int32)  # global slot -> local, pad -> Hpad
    slot_remap[s.n_hpl] = Hpad
    for sh in range(S):
        sel = np.where(slot_sh == sh)[0]
        hpl_row_s[sh, : sel.size] = s.hpl_row[sel]
        hpl_col_s[sh, : sel.size] = lm_local[s.hpl_col[sel]]
        slot_remap[sel] = np.arange(sel.size, dtype=np.int32)
    # remap edge2hpl (stored above as global ids) to local ids
    m_e2h = slot_remap[np.minimum(m_e2h, s.n_hpl)]
    t_e2h = slot_remap[np.minimum(t_e2h, s.n_hpl)]

    trip_sh = slot_sh[s.mul_i] if s.n_mul else np.zeros(0, int)
    trip_counts = np.bincount(trip_sh, minlength=S) if s.n_mul else np.zeros(S, int)
    Mpad = max(int(trip_counts.max()), 1)
    mul_i_s = np.full((S, Mpad), Hpad, np.int32)  # pad -> zero W slot
    mul_j_s = np.full((S, Mpad), Hpad, np.int32)
    mul_k_s = np.full((S, Mpad), s.n_hsc, np.int32)  # pad -> dropped segment
    for sh in range(S):
        sel = np.where(trip_sh == sh)[0]
        mul_i_s[sh, : sel.size] = slot_remap[s.mul_i[sel]]
        mul_j_s[sh, : sel.size] = slot_remap[s.mul_j[sel]]
        mul_k_s[sh, : sel.size] = s.mul_k[sel]

    dt = dtype
    consts = ShardedConsts(
        cams=jnp.asarray(s.cams, dt),
        mono=EdgeConsts(
            meas=jnp.asarray(m_meas, dt),
            omega=jnp.asarray(m_om, dt),
            pose_idx=jnp.asarray(m_pi),
            lm_idx=jnp.asarray(m_li),
            edge2hpl=jnp.asarray(m_e2h),
        ),
        stereo=EdgeConsts(
            meas=jnp.asarray(t_meas, dt),
            omega=jnp.asarray(t_om, dt),
            pose_idx=jnp.asarray(t_pi),
            lm_idx=jnp.asarray(t_li),
            edge2hpl=jnp.asarray(t_e2h),
        ),
        hpl_row=jnp.asarray(hpl_row_s),
        hpl_col=jnp.asarray(hpl_col_s),
        mul_i=jnp.asarray(mul_i_s),
        mul_j=jnp.asarray(mul_j_s),
        mul_k=jnp.asarray(mul_k_s),
        lm_count=jnp.asarray(per_shard_active, jnp.int32),
        hsc_row=jnp.asarray(s.hsc_row, jnp.int32),
        hsc_col=jnp.asarray(s.hsc_col, jnp.int32),
    )
    return ShardedProblem(
        structure=s,
        n_shards=S,
        lm_pad=lm_pad,
        lm_pad_active=lm_pad_active,
        consts=consts,
        qs=jnp.asarray(s.qs, dt),
        ts=jnp.asarray(s.ts, dt),
        Xws=jnp.asarray(Xws_s, dt),
        lm_shard=lm_shard,
        lm_local=lm_local,
    )


class MultiChipEngine:
    """Fused multi-chip LM over a 1-D landmark mesh."""

    def __init__(self, structure: BAStructure, kernels, config: BAConfig, mesh: Mesh):
        if AXIS not in mesh.axis_names:
            raise ValueError(f"mesh must have axis '{AXIS}'")
        self.mesh = mesh
        self.config = config
        self.dtype = config.resolve_dtype()
        self.chi_dtype = config.resolve_chi_dtype()
        self.kernels = tuple((int(k[0]), float(k[1])) for k in kernels)
        self.structure = structure
        self.num_p = structure.num_p
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self.problem = shard_problem(structure, n_dev, self.dtype)
        # pad dense reduced system to whole MXU tiles (6*PB multiple of 384)
        self.pad_blocks = max(((self.num_p + 63) // 64) * 64, 64)
        # band-certified pose graphs skip the replicated dense formation
        # entirely: the reduced block table scatters into block-tridiagonal
        # storage (~13 MB vs 285 MB at kitti00 scale) solved by cyclic
        # reduction (solver/band_cr.py)
        from cuba_tpu.solver import band_cr

        self.band_m = band_cr.certify(
            structure.hsc_row, structure.hsc_col, self.pad_blocks
        )
        if config.solver == "band_cr" and not self.band_m:
            raise ValueError(
                "solver='band_cr' requires a band-certified Schur pattern; "
                "this problem is not banded — use 'dense_cholesky' or 'pcg'"
            )
        if config.solver == "pcg":
            # matrix-free sharded PCG: the only solve path whose per-device
            # work SHRINKS with the device count (the band/dense factor is
            # replicated) — the large-P multichip configuration
            self.solver = "pcg"
        elif config.solver == "band_cr" and self.band_m:
            self.solver = "band_cr"
        elif config.solver == "auto" and self.band_m >= 8:
            # same gate as the single-chip auto (engine.py): CR's batched
            # level overhead only pays off from m >= 8; small banded
            # systems factor fastest dense
            self.solver = "band_cr"
        elif config.solver == "auto" and self.pad_blocks > 4096:
            self.solver = "pcg"  # dense image exceeds the compile ceiling
        else:
            self.solver = "dense_cholesky"
        self._jit_cache = {}

        # MXU fast path (VERDICT r2 ask 5): per-shard Pallas one-hot
        # assembly inside shard_map instead of the ~5-10 GB/s XLA
        # segment_sum body.  Gated like the single-chip engine (fp32,
        # off-CPU unless forced) plus per-solver plan feasibility; any
        # infeasibility falls back to the XLA body below.
        mode = config.mxu
        self.mxu_interpret = mode == "interpret"
        want_mxu = (
            mode in ("on", "interpret")
            or (mode == "auto" and jax.default_backend() != "cpu")
        ) and self.dtype == jnp.float32
        self.mxu_sp = None
        if want_mxu and structure.optimize_p and structure.optimize_l:
            from cuba_tpu.parallel import mxu_shard
            from cuba_tpu.solver.engine import _pad_blocks as _engine_pb

            # the MXU formation kernels tile PB into 64x128 blocks: use the
            # single-chip engine's 128-multiple padding for the MXU plan
            # (band certification is granularity-64 and unaffected)
            sp = mxu_shard.plan_sharded(
                structure, n_dev, _engine_pb(structure.num_p),
                need_dense=self.solver != "pcg",
            )
            if sp is not None and self.solver != "pcg" and not sp.plans.v2:
                sp = None  # band/dense formation needs the compact tables
            self.mxu_sp = sp
            # loop-closure upgrade (MXU path only): banded + a few
            # long-range blocks solves via the CR factor + Woodbury
            # correction instead of the dense factorization — same gate as
            # the single-chip auto (engine.py: m_lr >= 8); the XLA body
            # keeps the dense path
            if (sp is not None and sp.plans.lr_nob
                    and config.solver in ("auto", "band_lr")
                    and self.solver == "dense_cholesky"):
                from cuba_tpu.solver import band_cr as _bcr

                m_lr, _ = _bcr.certify_lr(
                    structure.hsc_row, structure.hsc_col, sp.plans.pad_blocks
                )
                if config.solver == "band_lr" or m_lr >= 8:
                    self.solver = "band_lr"
            if self.solver == "band_lr" and (
                    sp is None or not sp.plans.lr_nob):
                self.solver = "dense_cholesky"  # infeasible: honest fallback

    # --- shard-local math --------------------------------------------------

    def _local_chi_and_terms(self, qs, ts, Xws_l, c: ShardedConsts):
        """Per-shard residuals + chi part.  Padded edges have omega=0."""
        out = {}
        chi = jnp.zeros((), self.chi_dtype)
        for name, ec, mdim, kern in (
            ("mono", c.mono, 2, self.kernels[0]),
            ("stereo", c.stereo, 3, self.kernels[1]),
        ):
            err, Xc = assembly.edge_residuals(qs, ts, c.cams, Xws_l, ec, mdim)
            # padded edges: omega=0 -> x=0 -> rho(0)=0 for all kernel types.
            # chi_sum routes fp32 through the compensated two-float tree
            # (ops/dsum.py) — same accumulator as the single-chip engine, so
            # multi-chip chi2 stays parity-grade at real edge counts.
            chi = chi + assembly.chi_sum(err, ec.omega, kern, self.chi_dtype)
            out[name] = (err, Xc)
        return out, chi

    def _band_tables(self):
        """Host-side scatter index tables for the replicated band formation
        (cached; shared by the fused body and the profile stages)."""
        if getattr(self, "_band_np", None) is None:
            hr_np = np.asarray(self.structure.hsc_row, np.int64)
            hc_np = np.asarray(self.structure.hsc_col, np.int64)
            tr_np, tc_np = hr_np // 64, hc_np // 64
            lr_np, lc_np = hr_np % 64, hc_np % 64
            same_np = tr_np == tc_np
            self._band_np = dict(
                M_band=self.pad_blocks // 64,
                tr=tr_np, lr=lr_np, lc=lc_np,
                same=same_np,
                offd=same_np & (hr_np != hc_np),
                adj=tc_np == tr_np + 1,
                z64=np.zeros_like(lr_np),
            )
        return self._band_np

    def _local_fns(self, c: ShardedConsts):
        """(lm_active, chi_global, build, solve) over shard-LOCAL consts —
        shared by the fused XLA LM body (_make_lm_run) and the host-stepped
        profile stages (optimize_profiled)."""
        cfg = self.config
        dt = self.dtype
        num_p = self.num_p
        num_l_pad = self.problem.lm_pad
        PB = self.pad_blocks
        n_hpl_pad = int(self.problem.consts.hpl_row.shape[1])
        kernels = self.kernels
        n_hsc = int(self.problem.consts.hsc_row.shape[0])
        use_pcg = self.solver == "pcg"
        use_band = self.solver == "band_cr" and n_hsc > 0
        if use_band:
            from cuba_tpu.solver import band_cr

            bt = self._band_tables()
            M_band = bt["M_band"]
            tr_np, lr_np, lc_np = bt["tr"], bt["lr"], bt["lc"]
            same_np, offd_np, adj_np, z64 = (
                bt["same"], bt["offd"], bt["adj"], bt["z64"])
        cams = c.cams
        hpl_row, hpl_col = c.hpl_row, c.hpl_col
        mul_i, mul_j, mul_k = c.mul_i, c.mul_j, c.mul_k
        hsc_row, hsc_col = c.hsc_row, c.hsc_col
        # mask for locally-owned ACTIVE landmarks (excludes pad + fixed)
        lm_active = (jnp.arange(num_l_pad) < c.lm_count)[:, None]

        def chi_global(qs_, ts_, Xws_):
            _, chi = self._local_chi_and_terms(qs_, ts_, Xws_, c)
            return jax.lax.psum(chi, AXIS)

        def build(qs_, ts_, Xws_):
            terms, chi = self._local_chi_and_terms(qs_, ts_, Xws_, c)
            chi = jax.lax.psum(chi, AXIS)
            err2, Xc2 = terms["mono"]
            err3, Xc3 = terms["stereo"]
            Hpp, bp, Hll, bl, Hpl = assembly.build_system(
                qs_, cams, num_p, num_l_pad, n_hpl_pad,
                c.mono, c.stereo, err2, Xc2, err3, Xc3, kernels,
            )
            Hpp = jax.lax.psum(Hpp, AXIS)
            bp = jax.lax.psum(bp, AXIS)
            return chi, Hpp, bp, Hll, bl, Hpl

        def solve(Hpp, bp, Hll, bl, Hpl, lam):
            Hpp_d = assembly.damp(Hpp, lam)
            # only damp owned active landmarks; padded rows get identity
            Hll_d = assembly.damp(Hll, lam)
            eye3 = jnp.eye(3, dtype=dt)
            Hll_d = jnp.where(lm_active[:, :, None], Hll_d, eye3)
            invHll = smallmat.sym3x3_inv(Hll_d)
            W = jnp.einsum("kij,kjl->kil", Hpl, invHll[hpl_col], precision="highest")
            Wbl = jnp.einsum("kij,kj->ki", W, bl[hpl_col], precision="highest")
            bsc_local = -jax.ops.segment_sum(Wbl, hpl_row, num_segments=num_p)
            # triplet products segment-summed into the SPARSE Hsc block
            # table; pad triplets carry mul_k == n_hsc and drop out.  The
            # all-reduce moves 36*n_hsc floats (~1.7 MB at kitti00 scale)
            # instead of the padded dense image (~285 MB).
            # Layout: gathers and products run in 2-D [18|36, T] rows — on a
            # real chip the [T, 6, 6] form pads 28x under the (8, 128) HBM
            # tiling (measured 7.4 GB for the product alone at kitti00
            # scale, an OOM); the row form pads ~1.3x.
            WT = W.reshape(-1, 18).T  # [18, n_hpl_local]
            GT = Hpl.reshape(-1, 18).T
            safe_i = jnp.minimum(mul_i, n_hpl_pad - 1)
            safe_j = jnp.minimum(mul_j, n_hpl_pad - 1)
            Wg = WT[:, safe_i]  # [18, T], rows (i*3+k)
            Gg = GT[:, safe_j]  # [18, T], rows (j*3+k)
            prod36 = jnp.stack([
                sum(Wg[3 * a + k] * Gg[3 * b + k] for k in range(3))
                for a in range(6) for b in range(6)
            ])  # [36, T], row (a*6+b)
            prod36 = jnp.where((mul_i >= n_hpl_pad)[None, :],
                               jnp.zeros_like(prod36), prod36)
            blocks = jax.ops.segment_sum(
                prod36.T, jnp.minimum(mul_k, n_hsc), num_segments=n_hsc + 1
            )[:n_hsc].reshape(-1, 6, 6)
            blocks = jax.lax.psum(blocks, AXIS)
            bsc = bp + jax.lax.psum(bsc_local, AXIS)
            if use_pcg:
                # sharded matrix-free PCG: per-device O(local slots)
                # matvec + one [P,6] psum per CG step; no replicated
                # factorization at all (ShardedSchurOperator docstring)
                op = ShardedSchurOperator(
                    Hpp_d, Hpl, W, hpl_row, hpl_col, num_p, num_l_pad
                )
                xp, ok = pcg.pcg_solve(
                    op, bsc, cfg.pcg_max_iterations, cfg.pcg_tol
                )
                contrib = jnp.einsum(
                    "kij,ki->kj", Hpl, xp[hpl_row], precision="highest"
                )
                cl = bl - jax.ops.segment_sum(
                    contrib, hpl_col, num_segments=num_l_pad
                )
                xl = jnp.einsum("kij,kj->ki", invHll, cl, precision="highest")
                xl = jnp.where(lm_active, xl, jnp.zeros_like(xl))
                return xp, xl, ok, bsc
            n = 6 * PB
            rhs = jnp.zeros(n, dt).at[: 6 * num_p].set(bsc.reshape(-1))
            refine = cfg.refinement_steps if dt == jnp.float32 else 0
            diag = jnp.arange(num_p)
            if use_band:
                # replicated BAND formation: scatter the reduced block
                # table into block-tridiagonal storage (D, U) and solve
                # by cyclic reduction — no 6PB x 6PB image at all
                bz = jnp.zeros_like(blocks)
                blkT = jnp.swapaxes(blocks, -1, -2)
                D5 = jnp.zeros((M_band, 64, 6, 64, 6), dt)
                D5 = D5.at[tr_np, np.where(same_np, lr_np, z64), :,
                           np.where(same_np, lc_np, z64), :].add(
                    jnp.where(same_np[:, None, None], -blocks, bz))
                D5 = D5.at[tr_np, np.where(offd_np, lc_np, z64), :,
                           np.where(offd_np, lr_np, z64), :].add(
                    jnp.where(offd_np[:, None, None], -blkT, bz))
                p_np = np.arange(num_p)
                D5 = D5.at[p_np // 64, p_np % 64, :, p_np % 64, :].add(Hpp_d)
                pad_np = np.arange(num_p, PB)
                eye6 = jnp.broadcast_to(
                    jnp.eye(6, dtype=dt), (pad_np.size, 6, 6))
                D5 = D5.at[pad_np // 64, pad_np % 64, :, pad_np % 64, :].add(eye6)
                U5 = jnp.zeros((M_band, 64, 6, 64, 6), dt)
                U5 = U5.at[np.where(adj_np, tr_np, 0 * tr_np),
                           np.where(adj_np, lr_np, z64), :,
                           np.where(adj_np, lc_np, z64), :].add(
                    jnp.where(adj_np[:, None, None], -blocks, bz))
                Db = D5.reshape(M_band, 384, 384)
                Ub = U5.reshape(M_band, 384, 384)
                x, ok = band_cr.cr_solve(Db, Ub, rhs, refine)
            else:
                # replicated dense formation from the reduced block table
                # (upper-tri blocks + symmetric mirror, the reference's
                # BSR->CSR expansion semantics,
                # sparse_block_matrix.cpp:205-226)
                D = jnp.zeros((PB, 6, PB, 6), dt)
                D = D.at[hsc_row, :, hsc_col, :].add(-blocks)
                off = (hsc_row != hsc_col)[:, None, None]
                D = D.at[hsc_col, :, hsc_row, :].add(
                    jnp.where(off, -jnp.swapaxes(blocks, -1, -2),
                              jnp.zeros_like(blocks))
                )
                # replicated: add damped Hpp to diagonal + identity padding
                D = D.at[diag, :, diag, :].add(Hpp_d)
                Dm = D.reshape(n, n) + jnp.diag(
                    jnp.concatenate(
                        [jnp.zeros(6 * num_p, dt), jnp.ones(n - 6 * num_p, dt)])
                )
                x, ok = dense_cholesky.cholesky_solve(Dm, rhs, refine)
            xp = x[: 6 * num_p].reshape(num_p, 6)
            # local back-substitution
            contrib = jnp.einsum("kij,ki->kj", Hpl, xp[hpl_row], precision="highest")
            cl = bl - jax.ops.segment_sum(contrib, hpl_col, num_segments=num_l_pad)
            xl = jnp.einsum("kij,kj->ki", invHll, cl, precision="highest")
            xl = jnp.where(lm_active, xl, jnp.zeros_like(xl))
            return xp, xl, ok, bsc
        return lm_active, chi_global, build, solve

    def _make_lm_run(self, niterations: int):
        cfg = self.config
        dt = self.dtype
        maxq = cfg.max_inner_iterations
        num_p = self.num_p

        def shard_body(qs, ts, Xws_l, cams, mono, stereo, hpl_row, hpl_col,
                       mul_i, mul_j, mul_k, lm_count, hsc_row, hsc_col):
            # squeeze the leading shard axis shard_map leaves on sharded args
            (Xws_l, mono, stereo, hpl_row, hpl_col, mul_i, mul_j, mul_k,
             lm_count) = jax.tree.map(
                lambda a: a[0],
                (Xws_l, mono, stereo, hpl_row, hpl_col, mul_i, mul_j, mul_k,
                 lm_count),
            )
            c = ShardedConsts(cams, mono, stereo, hpl_row, hpl_col,
                              mul_i, mul_j, mul_k, lm_count, hsc_row, hsc_col)
            lm_active, chi_global, build, solve = self._local_fns(c)


            def outer_cond(carry):
                it, done = carry[0], carry[-1]
                return (it < niterations) & ~done

            def outer_body(carry):
                it, qs0, ts0, Xw0, lam, nu, natt, chis, done = carry

                F_chi, Hpp, bp, Hll, bl, Hpl = build(qs0, ts0, Xw0)
                F = F_chi.astype(dt)
                maxd = jnp.maximum(
                    jnp.max(jnp.diagonal(Hpp, axis1=-2, axis2=-1)),
                    jax.lax.pmax(
                        jnp.max(
                            jnp.where(
                                lm_active,
                                jnp.diagonal(Hll, axis1=-2, axis2=-1),
                                jnp.zeros_like(bl),
                            )
                        ),
                        AXIS,
                    ),
                )
                lam = jnp.where(it == 0, dt.type(cfg.tau) * jnp.maximum(maxd, 0), lam)

                def inner_cond(cc):
                    return (cc[0] < maxq) & (cc[1] < 0)

                def inner_body(cc):
                    q, _, lam_c, nu_c, _, Fc = cc
                    xp, xl, ok, _ = solve(Hpp, bp, Hll, bl, Hpl, lam_c)
                    qn, tn = se3.update_pose(xp, qs0[:num_p], ts0[:num_p])
                    qs1 = qs0.at[:num_p].set(qn)
                    ts1 = ts0.at[:num_p].set(tn)
                    Xw1 = Xw0 + xl
                    Fhat = chi_global(qs1, ts1, Xw1).astype(dt)
                    sc_local = jnp.sum(xl * (lam_c * xl + bl))
                    scale = (
                        jnp.sum(xp * (lam_c * xp + bp))
                        + jax.lax.psum(sc_local, AXIS)
                        + dt.type(cfg.scale_eps)
                    )
                    rho = jnp.where(ok, (F - Fhat) / scale, dt.type(-1.0))
                    accept = rho > 0
                    att = jnp.clip(
                        1.0 - (2.0 * rho - 1.0) ** 3, cfg.attenuation_min, cfg.attenuation_max
                    )
                    lam_n = jnp.where(accept, lam_c * att, lam_c * nu_c)
                    nu_n = jnp.where(accept, dt.type(2.0), nu_c * 2.0)
                    st_n = jax.tree.map(
                        lambda a, b: jnp.where(accept, a, b), (qs1, ts1, Xw1), (qs0, ts0, Xw0)
                    )
                    return (q + 1, rho, lam_n, nu_n, st_n, jnp.where(accept, Fhat, Fc))

                init = (jnp.int32(0), dt.type(-1.0), lam, nu, (qs0, ts0, Xw0), F)
                q, rho, lam, nu, (qs1, ts1, Xw1), F = jax.lax.while_loop(
                    inner_cond, inner_body, init
                )
                chis = chis.at[it].set(F.astype(self.chi_dtype))
                done = (q == maxq) | (rho <= 0) | ~jnp.isfinite(lam)
                return (it + 1, qs1, ts1, Xw1, lam, nu, natt + q, chis, done)

            init = (
                jnp.int32(0), qs, ts, Xws_l,
                dt.type(0.0), dt.type(2.0), jnp.int32(0),
                jnp.zeros((niterations,), self.chi_dtype), jnp.bool_(False),
            )
            it, qs_f, ts_f, Xw_f, lam, nu, natt, chis, done = jax.lax.while_loop(
                outer_cond, outer_body, init
            )
            return qs_f, ts_f, Xw_f[None], chis, it, lam, natt

        sharded = P(AXIS)
        rep = P()
        in_specs = (
            rep, rep, sharded, rep,
            EdgeConsts(sharded, sharded, sharded, sharded, sharded),
            EdgeConsts(sharded, sharded, sharded, sharded, sharded),
            sharded, sharded, sharded, sharded, sharded, sharded, rep, rep,
        )
        out_specs = (rep, rep, sharded, rep, rep, rep, rep)

        def run(qs, ts, Xws_s, c: ShardedConsts):
            return shard_map(
                shard_body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )(qs, ts, Xws_s, c.cams, c.mono, c.stereo, c.hpl_row, c.hpl_col,
              c.mul_i, c.mul_j, c.mul_k, c.lm_count, c.hsc_row, c.hsc_col)

        return run

    def _make_lm_run_mxu(self, niterations: int):
        """MXU (Pallas one-hot) multi-chip LM: the same control law as
        _make_lm_run, with the per-shard assembly and Schur reduction on
        the single-chip kernel family (solver/mxu.py) instead of the XLA
        segment_sum path (docs/PERF_NOTES.md: ~5-10 GB/s on TPU).  psums
        at exactly four points: chi, HppT, the W·bl pose accumulate
        (prepare_factors_mxu axis_name) and the compact Schur tables.  The
        reduced solve runs replicated from the psum'd compact tables (band
        CR / dense Cholesky); PCG runs sharded with one [6, P] psum per CG
        step (pcg_solve_rows axis_name)."""
        from cuba_tpu.solver import band_cr, mxu

        cfg = self.config
        dt = self.dtype
        maxq = cfg.max_inner_iterations
        num_p = self.num_p
        sp = self.mxu_sp
        plans = sp.plans
        PB = plans.pad_blocks  # 128-multiple (MXU formation tiling)
        counts = sp.counts
        num_l_s = sp.num_l_s
        kernels = self.kernels
        interp = self.mxu_interpret
        chi_dtype = self.chi_dtype
        use_pcg = self.solver == "pcg"
        use_band = self.solver == "band_cr"
        use_bandlr = self.solver == "band_lr"

        def shard_body(qs, ts, Xws_l, cams, mc):
            Xws_l = Xws_l[0]
            mc = jax.tree.map(lambda a: a[0], mc)

            def residuals(qs_, ts_, Xws_):
                pack_m, pack_s, chi = mxu.edge_rows_mxu(
                    qs_, ts_, Xws_, cams, kernels, chi_dtype, counts,
                    plans, mc, interpret=interp,
                )
                return pack_m, pack_s, jax.lax.psum(chi, AXIS)

            def chi_global(qs_, ts_, Xws_):
                return residuals(qs_, ts_, Xws_)[2]

            def build(qs_, ts_, Xws_):
                pack_m, pack_s, chi = residuals(qs_, ts_, Xws_)
                HppT, HllT, HplT = mxu.build_system_rows(
                    pack_m, pack_s, kernels, num_p, num_l_s, plans, mc,
                    interpret=interp,
                )
                HppT = jax.lax.psum(HppT, AXIS)
                return chi, HppT, HllT, HplT

            def solve(HppT, HllT, HplT, lam):
                iv9, W, bscT, g12 = mxu.prepare_factors_mxu(
                    HppT, HllT, HplT, lam, num_p, num_l_s, plans, mc,
                    interpret=interp, axis_name=AXIS,
                )
                if use_pcg:
                    xT, ok = mxu.pcg_solve_rows(
                        HppT, HplT, W, lam, bscT, num_p, num_l_s, plans, mc,
                        cfg.pcg_max_iterations, cfg.pcg_tol,
                        interpret=interp, axis_name=AXIS,
                    )
                    xp = xT.T
                else:
                    gT = mxu.schur_compact_mxu(
                        W, HplT, plans, mc, interpret=interp)
                    gT = jax.lax.psum(gT, AXIS)
                    n = 6 * PB
                    rhs = jnp.zeros(n, dt).at[: 6 * num_p].set(
                        bscT.T.reshape(-1))
                    refine = cfg.refinement_steps if dt == jnp.float32 else 0
                    if use_band:
                        Db, Ub = mxu.band_from_compact(
                            gT, HppT, lam, num_p, PB, plans, mc, dt,
                            interpret=interp)
                        x, ok = band_cr.cr_solve(Db, Ub, rhs, refine)
                    elif use_bandlr:
                        # banded + loop closures: CR factor + Woodbury
                        # correction over the out-of-band columns (the
                        # single-chip band_lr path, replicated from the
                        # psum'd compact table); >= 1 refinement sweep
                        # compensates the Gershgorin SPD shift
                        Db, Ub, Vob = mxu.band_from_compact(
                            gT, HppT, lam, num_p, PB, plans, mc, dt,
                            interpret=interp, with_ob=True)
                        x, ok = band_cr.cr_solve_woodbury(
                            Db, Ub, rhs, Vob, mc.ob_i, mc.ob_j, mc.ob_jrows,
                            max(refine, 1))
                    else:
                        Dm = mxu.dense_from_compact(
                            gT, HppT, lam, num_p, PB, plans, mc, dt,
                            interpret=interp)
                        x, ok = dense_cholesky.cholesky_solve(Dm, rhs, refine)
                    xp = x[: 6 * num_p].reshape(num_p, 6)
                xl = mxu.back_substitute_mxu(
                    iv9, HllT, HplT, g12, xp, num_l_s, plans, mc,
                    interpret=interp)
                return xp, xl, ok

            def outer_cond(carry):
                it, done = carry[0], carry[-1]
                return (it < niterations) & ~done

            def outer_body(carry):
                it, qs0, ts0, Xw0, lam, nu, natt, chis, done = carry
                F_chi, HppT, HllT, HplT = build(qs0, ts0, Xw0)
                F = F_chi.astype(dt)
                bp = HppT[36:42].T  # [P, 6]
                bl = HllT[9:12].T  # [num_l_s, 3] shard-local
                maxd = jax.lax.pmax(mxu.max_diagonal_T(HppT, HllT), AXIS)
                lam = jnp.where(it == 0, dt.type(cfg.tau) * maxd.astype(dt), lam)

                def inner_cond(cc):
                    return (cc[0] < maxq) & (cc[1] < 0)

                def inner_body(cc):
                    q, _, lam_c, nu_c, _, Fc = cc
                    xp, xl, ok = solve(HppT, HllT, HplT, lam_c)
                    qn, tn = se3.update_pose(xp, qs0[:num_p], ts0[:num_p])
                    qs1 = qs0.at[:num_p].set(qn)
                    ts1 = ts0.at[:num_p].set(tn)
                    Xw1 = Xw0.at[:num_l_s].add(xl)
                    Fhat = chi_global(qs1, ts1, Xw1).astype(dt)
                    sc_local = jnp.sum(xl * (lam_c * xl + bl))
                    scale = (
                        jnp.sum(xp * (lam_c * xp + bp))
                        + jax.lax.psum(sc_local, AXIS)
                        + dt.type(cfg.scale_eps)
                    )
                    rho = jnp.where(ok, (F - Fhat) / scale, dt.type(-1.0))
                    accept = rho > 0
                    att = jnp.clip(
                        1.0 - (2.0 * rho - 1.0) ** 3,
                        cfg.attenuation_min, cfg.attenuation_max,
                    )
                    lam_n = jnp.where(accept, lam_c * att, lam_c * nu_c)
                    nu_n = jnp.where(accept, dt.type(2.0), nu_c * 2.0)
                    st_n = jax.tree.map(
                        lambda a, b: jnp.where(accept, a, b),
                        (qs1, ts1, Xw1), (qs0, ts0, Xw0),
                    )
                    return (q + 1, rho, lam_n, nu_n, st_n,
                            jnp.where(accept, Fhat, Fc))

                init = (jnp.int32(0), dt.type(-1.0), lam, nu,
                        (qs0, ts0, Xw0), F)
                q, rho, lam, nu, (qs1, ts1, Xw1), F = jax.lax.while_loop(
                    inner_cond, inner_body, init
                )
                chis = chis.at[it].set(F.astype(self.chi_dtype))
                done = (q == maxq) | (rho <= 0) | ~jnp.isfinite(lam)
                return (it + 1, qs1, ts1, Xw1, lam, nu, natt + q, chis, done)

            init = (
                jnp.int32(0), qs, ts, Xws_l,
                dt.type(0.0), dt.type(2.0), jnp.int32(0),
                jnp.zeros((niterations,), self.chi_dtype), jnp.bool_(False),
            )
            it, qs_f, ts_f, Xw_f, lam, nu, natt, chis, done = jax.lax.while_loop(
                outer_cond, outer_body, init
            )
            return qs_f, ts_f, Xw_f[None], chis, it, lam, natt

        sharded = P(AXIS)
        rep = P()

        def run(qs, ts, Xws_s, cams, mc):
            return shard_map(
                shard_body,
                mesh=self.mesh,
                in_specs=(rep, rep, sharded, rep, sharded),
                out_specs=(rep, rep, sharded, rep, rep, rep, rep),
                check_vma=False,
            )(qs, ts, Xws_s, cams, mc)

        return run

    def _mxu_device_consts(self):
        if getattr(self, "_mxu_dc", None) is None:
            self._mxu_dc = jax.tree.map(jnp.asarray, self.mxu_sp.consts)
        return self._mxu_dc

    # ------------------------------------------------------------------
    # host-stepped profile (the reference's 8-phase TimeProfile semantics,
    # cuda_bundle_adjustment.cpp:77-88 — same split as the single-chip
    # engine.optimize_profiled: phases 2/3/6/7 measured exactly, 4 folded
    # into 6 and 5 zero like the exact single-chip profile)
    # ------------------------------------------------------------------

    def _stage_jits(self):
        """Per-phase shard_map stages over the XLA body's local functions.
        Sharded intermediates (Hll/bl/Hpl/xl) stay device-resident between
        stages with a leading [S] axis."""
        if getattr(self, "_stages", None) is not None:
            return self._stages
        num_p = self.num_p
        sharded, rep = P(AXIS), P()
        con = (rep, EdgeConsts(*([sharded] * 5)), EdgeConsts(*([sharded] * 5)),
               sharded, sharded, sharded, sharded, sharded, sharded, rep, rep)

        def local_c(cargs):
            (cams, mono, stereo, hpl_row, hpl_col, mul_i, mul_j, mul_k,
             lm_count, hsc_row, hsc_col) = cargs
            (mono, stereo, hpl_row, hpl_col, mul_i, mul_j, mul_k,
             lm_count) = jax.tree.map(
                lambda a: a[0],
                (mono, stereo, hpl_row, hpl_col, mul_i, mul_j, mul_k, lm_count),
            )
            return ShardedConsts(cams, mono, stereo, hpl_row, hpl_col,
                                 mul_i, mul_j, mul_k, lm_count,
                                 hsc_row, hsc_col)

        def chi_body(qs, ts, Xws_l, *cargs):
            _, chi_g, _, _ = self._local_fns(local_c(cargs))
            return chi_g(qs, ts, Xws_l[0])

        def build_body(qs, ts, Xws_l, *cargs):
            lm_active, _, build, _ = self._local_fns(local_c(cargs))
            chi, Hpp, bp, Hll, bl, Hpl = build(qs, ts, Xws_l[0])
            maxd = jnp.maximum(
                jnp.max(jnp.diagonal(Hpp, axis1=-2, axis2=-1)),
                jax.lax.pmax(
                    jnp.max(jnp.where(
                        lm_active,
                        jnp.diagonal(Hll, axis1=-2, axis2=-1),
                        jnp.zeros_like(bl),
                    )),
                    AXIS,
                ),
            )
            return chi, Hpp, bp, Hll[None], bl[None], Hpl[None], maxd

        def solve_body(Hpp, bp, Hll, bl, Hpl, lam, *cargs):
            _, _, _, solve = self._local_fns(local_c(cargs))
            xp, xl, ok, _ = solve(Hpp, bp, Hll[0], bl[0], Hpl[0], lam)
            return xp, xl[None], ok

        def update_body(qs, ts, Xws_l, xp, xl):
            qn, tn = se3.update_pose(xp, qs[:num_p], ts[:num_p])
            return (qs.at[:num_p].set(qn), ts.at[:num_p].set(tn),
                    (Xws_l[0] + xl[0])[None])

        def scale_body(xp, xl, bp, bl, lam):
            sc_local = jnp.sum(xl[0] * (lam * xl[0] + bl[0]))
            return jnp.sum(xp * (lam * xp + bp)) + jax.lax.psum(sc_local, AXIS)

        def smap(body, in_specs, out_specs):
            return jax.jit(shard_map(
                body, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False,
            ))

        self._stages = dict(
            chi=smap(chi_body, (rep, rep, sharded) + con, rep),
            build=smap(build_body, (rep, rep, sharded) + con,
                       (rep, rep, rep, sharded, sharded, sharded, rep)),
            solve=smap(solve_body,
                       (rep, rep, sharded, sharded, sharded, rep) + con,
                       (rep, sharded, rep)),
            update=smap(update_body, (rep, rep, sharded, rep, sharded),
                        (rep, rep, sharded)),
            scale=smap(scale_body, (rep, sharded, rep, sharded, rep), rep),
        )
        return self._stages

    def optimize_profiled(self, niterations: int):
        """Host-stepped multi-chip LM with per-phase timers — the
        reference-parity TimeProfile on the sharded XLA pipeline (exact
        timings; the fused body stays the performance path, same split as
        the single-chip exact profile).  Returns (chis, prof)."""
        import time

        from cuba_tpu.solver.engine import PROFILE_ITEMS

        cfg = self.config
        p = self.problem
        c = p.consts
        cargs = (c.cams, c.mono, c.stereo, c.hpl_row, c.hpl_col,
                 c.mul_i, c.mul_j, c.mul_k, c.lm_count, c.hsc_row, c.hsc_col)
        st = self._stage_jits()
        prof = {k: 0.0 for k in PROFILE_ITEMS}
        qs, ts, Xws = p.qs, p.ts, p.Xws
        chis = []
        lam, nu, F = 0.0, 2.0, 0.0
        natt = 0
        for it in range(niterations):
            t0 = time.perf_counter()
            F_dev, Hpp, bp, Hll, bl, Hpl, maxd = jax.block_until_ready(
                st["build"](qs, ts, Xws, *cargs)
            )
            F = float(F_dev)
            prof["3: Build System"] += time.perf_counter() - t0
            if it == 0:
                lam = cfg.tau * float(maxd)
            q, rho = 0, -1.0
            while q < cfg.max_inner_iterations and rho < 0:
                t0 = time.perf_counter()
                xp, xl, ok = jax.block_until_ready(
                    st["solve"](Hpp, bp, Hll, bl, Hpl, self.dtype.type(lam),
                                *cargs)
                )
                prof["6: Numerical Decomposition"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                qs1, ts1, Xws1 = jax.block_until_ready(
                    st["update"](qs, ts, Xws, xp, xl)
                )
                prof["7: Update Solution"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                Fhat = float(st["chi"](qs1, ts1, Xws1, *cargs))
                prof["2: Compute Error"] += time.perf_counter() - t0
                scale = float(
                    st["scale"](xp, xl, bp, bl, self.dtype.type(lam))
                ) + cfg.scale_eps
                rho = (F - Fhat) / scale if bool(ok) else -1.0
                if rho > 0:
                    a = 1.0 - (2.0 * rho - 1.0) ** 3
                    lam *= float(np.clip(a, cfg.attenuation_min,
                                         cfg.attenuation_max))
                    nu, F = 2.0, Fhat
                    qs, ts, Xws = qs1, ts1, Xws1
                    break
                lam *= nu
                nu *= 2.0
                q += 1
            natt += q if rho <= 0 else q + 1
            chis.append(F)
            if q == cfg.max_inner_iterations or rho <= 0 or not np.isfinite(lam):
                break
        p.qs, p.ts, p.Xws = qs, ts, Xws
        return np.asarray(chis), prof, lam, natt

    def optimize(self, niterations: int):
        """Fused sharded LM.  Returns (chis, qs, ts, Xws_s, final_lambda,
        nattempts) — the diagnostics feed the public time_profile()
        attribution exactly like the single-chip LMResult's."""
        use_mxu = self.mxu_sp is not None
        key = ("mlm_mxu" if use_mxu else "mlm", niterations)
        if key not in self._jit_cache:
            fn = (self._make_lm_run_mxu(niterations) if use_mxu
                  else self._make_lm_run(niterations))
            self._jit_cache[key] = jax.jit(fn)
        p = self.problem
        if use_mxu:
            qs, ts, Xws_s, chis, it, lam, natt = self._jit_cache[key](
                p.qs, p.ts, p.Xws, p.consts.cams, self._mxu_device_consts()
            )
        else:
            qs, ts, Xws_s, chis, it, lam, natt = self._jit_cache[key](
                p.qs, p.ts, p.Xws, p.consts
            )
        p.qs, p.ts, p.Xws = qs, ts, Xws_s
        # ONE host transfer for every scalar diagnostic: separate
        # np.asarray / int() reads each pay a full serving-tunnel RTT
        # (~24 ms) — three of them were the bulk of the measured ~23 ms
        # fixed per-call overhead vs the single-chip engine
        chis_h, it_h, lam_h, natt_h = jax.device_get((chis, it, lam, natt))
        return np.asarray(chis_h)[: int(it_h)], qs, ts, Xws_s, lam_h, natt_h

    def gathered_landmarks(self) -> np.ndarray:
        """[num_l, 3] active landmark estimates in global order."""
        Xws = np.asarray(self.problem.Xws)
        return Xws[self.problem.lm_shard, self.problem.lm_local]


class MultiChipSolverAdapter:
    """``BlockSolverEngine``-shaped facade over :class:`MultiChipEngine` so
    the public :class:`cuba_tpu.BundleAdjustment` runs multi-chip
    transparently via ``BAConfig(mesh=...)`` — the reference has no
    equivalent (single-GPU, SURVEY.md §2); this is the TPU scaling
    extension (BASELINE config 5)."""

    def __init__(self, structure: BAStructure, kernels, config: BAConfig, mesh: Mesh):
        self.structure = structure
        self.config = config
        self.dtype = config.resolve_dtype()
        self._mc = MultiChipEngine(structure, kernels, config, mesh)
        self._kernels = tuple((int(k[0]), float(k[1])) for k in kernels)

    def _global_state(self):
        from cuba_tpu.solver.engine import State

        p = self._mc.problem
        s = self.structure
        Xg = np.zeros((s.total_l, 3), np.asarray(p.Xws).dtype)
        if s.num_l:
            Xg[: s.num_l] = self._mc.gathered_landmarks()
        if s.total_l > s.num_l:  # replicated fixed tail lives on shard 0
            nf = s.total_l - s.num_l
            Xg[s.num_l :] = np.asarray(p.Xws)[0, p.lm_pad_active : p.lm_pad_active + nf]
        return State(qs=jnp.asarray(p.qs), ts=jnp.asarray(p.ts), Xws=jnp.asarray(Xg))

    def optimize(self, state, niterations: int):
        """Run the sharded LM loop.  ``state`` is ignored: the sharded
        problem carries its own (device-resident, shard-partitioned) state,
        updated in place across calls — semantics match repeated
        ``optimize()`` on the single-chip engine."""
        from cuba_tpu.solver.engine import LMResult

        chis, qs, ts, _, lam, natt = self._mc.optimize(niterations)
        chis_full = np.zeros(niterations, np.float64)
        chis_full[: chis.size] = chis
        return LMResult(
            state=self._global_state(),
            chis=jnp.asarray(chis_full),
            niters=jnp.int32(chis.size),
            final_lambda=lam,
            nattempts=natt,
        )

    def optimize_profiled(self, state, niterations: int):
        """Host-stepped multi-chip LM with the reference's 8-phase
        TimeProfile (exact per-phase timings on the sharded XLA stage
        pipeline; same phase split as the single-chip exact profile —
        reference: cuda_bundle_adjustment.cpp:77-88, :793-857)."""
        from cuba_tpu.solver.engine import LMResult

        chis, prof, lam, natt = self._mc.optimize_profiled(niterations)
        chis_full = np.zeros(niterations, np.float64)
        chis_full[: chis.size] = chis
        return (
            LMResult(
                state=self._global_state(),
                chis=jnp.asarray(chis_full),
                niters=jnp.int32(chis.size),
                final_lambda=jnp.asarray(lam, self.dtype),
                nattempts=jnp.int32(natt),
            ),
            prof,
        )

    def chi_squares(self, state) -> np.ndarray:
        """Per-edge unrobustified chi2 in original insertion order (the
        public chiSquared query, reference: cuda_block_solver.cu:841-875) —
        computed replicated on the default device from the gathered state."""
        from cuba_tpu.solver import assembly
        from cuba_tpu.solver.assembly import EdgeConsts

        s = self.structure
        st = state if state is not None else self._global_state()
        dt = self.dtype
        out = []
        for ea, mdim in ((s.mono, 2), (s.stereo, 3)):
            if not ea.count:
                out.append(np.zeros(0, np.float64))
                continue
            ec = EdgeConsts(
                meas=jnp.asarray(ea.measurements, dt),
                omega=jnp.asarray(ea.omegas, dt),
                pose_idx=jnp.asarray(ea.pose_idx),
                lm_idx=jnp.asarray(ea.lm_idx),
                edge2hpl=jnp.zeros(ea.count, jnp.int32),
            )
            err, _ = assembly.edge_residuals(
                jnp.asarray(st.qs, dt), jnp.asarray(st.ts, dt),
                jnp.asarray(s.cams, dt), jnp.asarray(st.Xws, dt), ec, mdim,
            )
            out.append(np.asarray(assembly.chi_squares(err, ec.omega)))
        internal = np.concatenate(out)
        res = np.empty_like(internal)
        nm = s.mono.count
        if s.mono_perm is not None and nm:
            res[:nm][s.mono_perm] = internal[:nm]
        else:
            res[:nm] = internal[:nm]
        if s.stereo_perm is not None and internal.size > nm:
            res[nm:][s.stereo_perm] = internal[nm:]
        else:
            res[nm:] = internal[nm:]
        return res

    # ------------------------------------------------------------------
    # fused-run phase attribution (the public time_profile() path —
    # graph.py calls attribute_phases after fused optimize(); the
    # single-chip twin is BlockSolverEngine.attribute_phases)
    # ------------------------------------------------------------------

    def phase_calibration(self):
        """One timed call per sharded stage (build / solve / update / chi)
        on the XLA stage pipeline — the per-phase cost ratios used to
        split a fused mesh run's wall time.  Cached per adapter.  When the
        fused run used the MXU body, the XLA-stage ratios are still the
        attribution basis (marked as estimates via
        BundleAdjustment.attributed_phases, like the single-chip fused
        path)."""
        if getattr(self, "_phase_cal", None) is not None:
            return self._phase_cal
        import time as _time

        mc = self._mc
        p = mc.problem
        c = p.consts
        cargs = (c.cams, c.mono, c.stereo, c.hpl_row, c.hpl_col,
                 c.mul_i, c.mul_j, c.mul_k, c.lm_count, c.hsc_row, c.hsc_col)
        st = mc._stage_jits()
        qs, ts, Xws = p.qs, p.ts, p.Xws

        def timed(fn, *a):
            jax.block_until_ready(fn(*a))  # compile outside the timing
            t0 = _time.perf_counter()
            out = jax.block_until_ready(fn(*a))
            return _time.perf_counter() - t0, out

        tb, (_F, Hpp, bp, Hll, bl, Hpl, maxd) = timed(st["build"], qs, ts, Xws, *cargs)
        lam = self.dtype.type(self.config.tau * float(maxd))
        tsv, (xp, xl, _ok) = timed(st["solve"], Hpp, bp, Hll, bl, Hpl, lam, *cargs)
        tu, (qs1, ts1, Xws1) = timed(st["update"], qs, ts, Xws, xp, xl)
        tc, _ = timed(st["chi"], qs1, ts1, Xws1, *cargs)
        self._phase_cal = dict(build=tb, solve=tsv, update=tu, chi=tc)
        return self._phase_cal

    def attribute_phases(self, total_s: float, niters: int, nattempts: int):
        """Distribute a fused mesh run's wall seconds across the reference
        phases by the calibrated stage ratios — same mapping as the
        host-stepped multi-chip profile (build per outer iteration; solve,
        update and trial-chi per damped attempt; '4: Schur Complement'
        folded into 6 and '5: Symbolic Decomposition' zero, matching
        optimize_profiled)."""
        c = self.phase_calibration()
        n = max(int(niters), 1)
        a = max(int(nattempts), n)
        raw = {
            "2: Compute Error": a * c["chi"],
            "3: Build System": n * c["build"],
            "6: Numerical Decomposition": a * c["solve"],
            "7: Update Solution": a * c["update"],
        }
        s = sum(raw.values())
        scale = total_s / s if s > 0 else 0.0
        return {k: v * scale for k, v in raw.items()}
