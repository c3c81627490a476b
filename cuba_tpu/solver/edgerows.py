"""Transposed ("rows") per-edge front end: residuals, chi and GN terms on
``[E]`` lane vectors.

The AoS formulation (assembly.py / ops/jacobians.py) keeps per-edge data as
``[E, mdim, d]`` arrays: on TPU that layout puts E on *sublanes* and wastes
125 of 128 vector lanes, and the XLA gathers feeding it run at ~5-10 GB/s
(measured: gathers 6.4ms + compute 3.7ms per residual pass at kitti00
scale, docs/PERF_NOTES.md).  Here every per-edge quantity is a flat ``[E]``
vector (E on lanes, full VPU width), inputs arrive from the one-hot MXU
gather kernels (ops/segmm.py resident_gather / tiled_gather), and the GN
term rows feed the build kernels directly — nothing is ever materialized in
``[E, ...]`` layout.

Math is term-for-term identical to the AoS path (reference:
src/cuda_block_solver.cu:262-290 projection, :329-415 Jacobians,
:732-786 computeActiveErrors) so the two paths agree to f32 rounding;
tests/test_mxu_path.py asserts it.

Padding lanes carry gathered zeros (their one-hot column is empty) which
would produce inf/NaN through the 1/Z projection; ``_inv_z`` therefore
masks by validity and the padded omega (0) kills any remaining junk in the
weighted terms.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from cuba_tpu.ops import dsum, robust


def rotmat_rows(q4: Sequence[jnp.ndarray]) -> List[List[jnp.ndarray]]:
    """Unit quaternion rows (x, y, z, w) -> 3x3 rotation entries [i][j] of
    [E] vectors (ops/quaternion.py to_rotation_matrix, row-wise)."""
    x, y, z, w = q4
    tx, ty, tz = 2 * x, 2 * y, 2 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    return [
        [1 - (tyy + tzz), txy - twz, txz + twy],
        [txy + twz, 1 - (txx + tzz), tyz - twx],
        [txz - twy, tyz + twx, 1 - (txx + tyy)],
    ]


def residual_rows(
    g12: Sequence[jnp.ndarray],  # 12 gathered pose rows: q(4), t(3), cam(5)
    xw: Sequence[jnp.ndarray],  # 3 gathered landmark rows
    measT: jnp.ndarray,  # [mdim, E] measurement rows
    valid: jnp.ndarray,  # [E] bool (False on padding lanes)
    mdim: int,
):
    """err rows [mdim], Xc rows (X, Y, Z), R rows; all [E] lane vectors."""
    q4 = g12[0:4]
    t3 = g12[4:7]
    cam = g12[7:12]
    R = rotmat_rows(q4)
    X = R[0][0] * xw[0] + R[0][1] * xw[1] + R[0][2] * xw[2] + t3[0]
    Y = R[1][0] * xw[0] + R[1][1] * xw[1] + R[1][2] * xw[2] + t3[1]
    Z = R[2][0] * xw[0] + R[2][1] * xw[1] + R[2][2] * xw[2] + t3[2]
    inv_z = jnp.where(valid, 1.0 / jnp.where(valid, Z, 1.0), 0.0)
    u = cam[0] * inv_z * X + cam[2]
    v = cam[1] * inv_z * Y + cam[3]
    if mdim == 2:
        err = [u - measT[0], v - measT[1]]
    else:
        ur = u - cam[4] * inv_z
        err = [u - measT[0], v - measT[1], ur - measT[2]]
    err = [jnp.where(valid, e, 0.0) for e in err]
    return err, (X, Y, Z), R, inv_z


def chi_rows(err, omega, kernel, chi_dtype) -> jnp.ndarray:
    """sum_e rho(omega |e|^2) over rows (cu:771-785); padding omega is 0.

    fp32 chi_dtype routes through the two-float tree (ops/dsum.py) so the
    default no-x64 config keeps fp64-grade chi2 accumulation."""
    x = omega * sum(e * e for e in err)
    rho = robust.robustify(x, kernel[0], kernel[1])
    if jnp.dtype(chi_dtype) == jnp.float32:
        return dsum.accurate_sum(rho.astype(jnp.float32))
    return jnp.sum(rho.astype(chi_dtype))


def chi_per_edge(err, omega) -> jnp.ndarray:
    """Per-edge unrobustified chi2 row [E] (public chiSquared, cu:841-875)."""
    return omega * sum(e * e for e in err)


def jac_rows(Xc, R, inv_z, cam, mdim: int):
    """JP[k][i] (mdim x 6) and JL[k][a] (mdim x 3) rows of [E] vectors.

    Same expressions as ops/jacobians.py mono/stereo (reference:
    src/cuda_block_solver.cu:329-415), evaluated per component.
    """
    X, Y, Z = Xc
    fu, fv, bf = cam[7 + 0], cam[7 + 1], cam[7 + 4]
    x = inv_z * X
    y = inv_z * Y
    fu_iz = fu * inv_z
    fv_iz = fv * inv_z
    r = R
    zero = jnp.zeros_like(fu)

    if mdim == 2:
        JL = [
            [-fu_iz * (r[0][k] - x * r[2][k]) for k in range(3)],
            [-fv_iz * (r[1][k] - y * r[2][k]) for k in range(3)],
        ]
        JP = [
            [fu * x * y, -fu * (1 + x * x), fu * y, -fu_iz, zero, fu_iz * x],
            [fv * (1 + y * y), -fv * x * y, -fv * x, zero, -fv_iz, fv_iz * y],
        ]
        return JP, JL

    inv_zz = inv_z * inv_z
    jl0 = [-fu * r[0][k] * inv_z + fu * X * r[2][k] * inv_zz for k in range(3)]
    jl1 = [-fv * r[1][k] * inv_z + fv * Y * r[2][k] * inv_zz for k in range(3)]
    jl2 = [jl0[k] - bf * r[2][k] * inv_zz for k in range(3)]
    jp0 = [X * Y * inv_zz * fu, -(1 + X * X * inv_zz) * fu, Y * inv_z * fu,
           -inv_z * fu, zero, X * inv_zz * fu]
    jp1 = [(1 + Y * Y * inv_zz) * fv, -X * Y * inv_zz * fv, -X * inv_z * fv,
           zero, -inv_z * fv, Y * inv_zz * fv]
    jp2 = [jp0[0] - bf * Y * inv_zz, jp0[1] + bf * X * inv_zz, jp0[2],
           jp0[3], zero, jp0[5] - bf * inv_zz]
    return [jp0, jp1, jp2], [jl0, jl1, jl2]


def term_rows(err, Xc, R, inv_z, cam_rows, omega, kernel, mdim: int):
    """Weighted GN term rows: (v42 [42,E], v12 [12,E], v18 [18,E]).

    Row order matches mxu's table layout: Hpp row-major (i*6+j) then bp,
    Hll (a*3+b) then bl, Hpl (i*3+b).  Padding lanes: omega == 0.
    """
    x = omega * sum(e * e for e in err)
    w = omega * robust.weight(x, kernel[0], kernel[1])
    JP, JL = jac_rows(Xc, R, inv_z, cam_rows, mdim)
    wJP = [[w * JP[k][i] for i in range(6)] for k in range(mdim)]
    wJL = [[w * JL[k][a] for a in range(3)] for k in range(mdim)]

    rows42 = [
        sum(wJP[k][i] * JP[k][j] for k in range(mdim))
        for i in range(6) for j in range(6)
    ] + [sum(wJP[k][i] * err[k] for k in range(mdim)) for i in range(6)]
    rows12 = [
        sum(wJL[k][a] * JL[k][b] for k in range(mdim))
        for a in range(3) for b in range(3)
    ] + [sum(wJL[k][a] * err[k] for k in range(mdim)) for a in range(3)]
    rows18 = [
        sum(wJP[k][i] * JL[k][b] for k in range(mdim))
        for i in range(6) for b in range(3)
    ]
    return jnp.stack(rows42), jnp.stack(rows12), jnp.stack(rows18)
