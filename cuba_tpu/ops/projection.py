"""Camera projection: world -> camera -> image, mono (pinhole) and stereo
(pinhole + disparity).

Camera parameters ride on the pose vertex as a 5-vector (fx, fy, cx, cy, bf),
matching the reference's simplification (reference: README.md:45,
src/cuda_block_solver.cu:117-128 CameraParamView, :262-290 projectW2C /
projectC2I).  The stereo third coordinate is u_right = u - bf/Z.
"""

from __future__ import annotations

import jax.numpy as jnp

from cuba_tpu.ops import quaternion as quat


def world_to_camera(q: jnp.ndarray, t: jnp.ndarray, Xw: jnp.ndarray) -> jnp.ndarray:
    """Xc = R(q) Xw + t, all (...,3)/( ...,4)."""
    return quat.rotate(q, Xw) + t


def project_mono(Xc: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """(...,3) camera point, (...,5) camera -> (...,2) pixel."""
    inv_z = 1.0 / Xc[..., 2]
    u = cam[..., 0] * inv_z * Xc[..., 0] + cam[..., 2]
    v = cam[..., 1] * inv_z * Xc[..., 1] + cam[..., 3]
    return jnp.stack([u, v], axis=-1)


def project_stereo(Xc: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """(...,3) camera point, (...,5) camera -> (...,3) (u_l, v, u_r)."""
    inv_z = 1.0 / Xc[..., 2]
    u = cam[..., 0] * inv_z * Xc[..., 0] + cam[..., 2]
    v = cam[..., 1] * inv_z * Xc[..., 1] + cam[..., 3]
    ur = u - cam[..., 4] * inv_z
    return jnp.stack([u, v, ur], axis=-1)


def project(Xc: jnp.ndarray, cam: jnp.ndarray, mdim: int) -> jnp.ndarray:
    if mdim == 2:
        return project_mono(Xc, cam)
    if mdim == 3:
        return project_stereo(Xc, cam)
    raise ValueError(f"measurement dim must be 2 or 3, got {mdim}")
