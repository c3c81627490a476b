"""Unit tests for core math ops: quaternions, SE3 exp, projection, Jacobians,
robust kernels, fixed-size solves.  Validated against scipy and finite
differences / jax.jacfwd (the reference has no unit tests; SURVEY.md section 4
mandates we do better)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot
import scipy.linalg

from cuba_tpu.ops import quaternion as quat
from cuba_tpu.ops import se3, projection, jacobians, robust, smallmat


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 3] < 0] *= -1
    return q


class TestQuaternion:
    def test_rotate_matches_scipy(self, rng):
        q = random_quats(rng, 64)
        v = rng.normal(size=(64, 3))
        got = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
        want = ScipyRot.from_quat(q).apply(v)  # scipy also uses (x,y,z,w)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_to_rotation_matrix(self, rng):
        q = random_quats(rng, 64)
        got = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
        want = ScipyRot.from_quat(q).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_from_rotation_matrix_roundtrip(self, rng):
        q = random_quats(rng, 256)
        R = ScipyRot.from_quat(q).as_matrix()
        got = np.asarray(quat.from_rotation_matrix(jnp.asarray(R)))
        # sign convention: compare up to sign, then check w>=0 after normalize
        got = np.asarray(quat.normalize(jnp.asarray(got)))
        np.testing.assert_allclose(np.abs(got), np.abs(q), atol=1e-9)
        dots = np.abs(np.sum(got * q, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-9)

    def test_from_rotation_matrix_covers_all_branches(self):
        # near-identity (trace>0) and the three 180-degree axis rotations
        mats = [np.eye(3)]
        for axis in np.eye(3):
            mats.append(ScipyRot.from_rotvec(np.pi * axis).as_matrix())
        for R in mats:
            qr = np.asarray(quat.from_rotation_matrix(jnp.asarray(R)))
            R2 = np.asarray(quat.to_rotation_matrix(jnp.asarray(qr / np.linalg.norm(qr))))
            np.testing.assert_allclose(R2, R, atol=1e-12)

    def test_multiply_matches_scipy(self, rng):
        a, b = random_quats(rng, 32), random_quats(rng, 32)
        got = np.asarray(quat.multiply(jnp.asarray(a), jnp.asarray(b)))
        want = (ScipyRot.from_quat(a) * ScipyRot.from_quat(b)).as_quat()
        # scipy canonicalizes differently; compare rotations
        dots = np.abs(np.sum(got / np.linalg.norm(got, axis=-1, keepdims=True) * want, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-12)

    def test_normalize_w_positive(self, rng):
        q = rng.normal(size=(128, 4))
        out = np.asarray(quat.normalize(jnp.asarray(q)))
        assert np.all(out[:, 3] >= 0)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-12)


class TestSE3:
    def test_exp_matches_expm(self, rng):
        """Closed-form exp vs scipy.linalg.expm of the 4x4 twist matrix."""
        deltas = rng.normal(size=(32, 6)) * 0.7
        qs, ts = se3.exp(jnp.asarray(deltas))
        qs, ts = np.array(qs), np.array(ts)
        for d, q, t in zip(deltas, qs, ts):
            omega, upsilon = d[:3], d[3:]
            xi = np.zeros((4, 4))
            xi[:3, :3] = np.array(
                [[0, -omega[2], omega[1]], [omega[2], 0, -omega[0]], [-omega[1], omega[0], 0]]
            )
            xi[:3, 3] = upsilon
            T = scipy.linalg.expm(xi)
            Rq = ScipyRot.from_quat(q / np.linalg.norm(q)).as_matrix()
            np.testing.assert_allclose(Rq, T[:3, :3], atol=1e-9)
            np.testing.assert_allclose(t, T[:3, 3], atol=1e-9)

    def test_exp_small_angle(self):
        deltas = np.zeros((3, 6))
        deltas[0, :3] = [1e-7, 0, 0]
        deltas[1, 3:] = [1.0, 2.0, 3.0]
        deltas[2, :3] = [1e-6, -1e-6, 1e-7]
        deltas[2, 3:] = [0.1, 0.2, 0.3]
        qs, ts = se3.exp(jnp.asarray(deltas))
        assert np.all(np.isfinite(np.asarray(qs)))
        assert np.all(np.isfinite(np.asarray(ts)))
        # pure translation: q = identity, t = upsilon
        np.testing.assert_allclose(np.asarray(qs)[1], [0, 0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(np.asarray(ts)[1], [1, 2, 3], atol=1e-12)

    def test_update_pose_left_composition(self, rng):
        q0 = random_quats(rng, 8)
        t0 = rng.normal(size=(8, 3))
        delta = rng.normal(size=(8, 6)) * 0.1
        qn, tn = se3.update_pose(jnp.asarray(delta), jnp.asarray(q0), jnp.asarray(t0))
        qn, tn = np.array(qn), np.array(tn)
        eq, et = se3.exp(jnp.asarray(delta))
        eq, et = np.array(eq), np.array(et)
        Re = ScipyRot.from_quat(eq / np.linalg.norm(eq, axis=-1, keepdims=True))
        R0 = ScipyRot.from_quat(q0)
        Rn_want = (Re * R0).as_matrix()
        tn_want = et + Re.apply(t0)
        np.testing.assert_allclose(ScipyRot.from_quat(qn).as_matrix(), Rn_want, atol=1e-9)
        np.testing.assert_allclose(tn, tn_want, atol=1e-9)
        assert np.all(qn[:, 3] >= 0)


def make_scene(rng, n):
    """Random well-posed cameras/points in front of the camera."""
    q = random_quats(rng, n)
    t = rng.normal(size=(n, 3)) * 0.1
    cam = np.tile(np.array([718.856, 718.856, 607.1928, 185.2157, 386.1448]), (n, 1))
    # points in front of camera: sample Xc with positive depth, back-project
    Xc = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(2.0, 30.0, n)], axis=-1
    )
    R = ScipyRot.from_quat(q).as_matrix()
    Xw = np.einsum("nji,nj->ni", R, Xc - t)  # R^T (Xc - t)
    return q, t, cam, Xw, Xc


class TestProjection:
    def test_world_to_camera(self, rng):
        q, t, cam, Xw, Xc = make_scene(rng, 64)
        got = np.asarray(projection.world_to_camera(jnp.asarray(q), jnp.asarray(t), jnp.asarray(Xw)))
        np.testing.assert_allclose(got, Xc, atol=1e-9)

    def test_project_stereo_disparity(self, rng):
        q, t, cam, Xw, Xc = make_scene(rng, 64)
        p3 = np.asarray(projection.project_stereo(jnp.asarray(Xc), jnp.asarray(cam)))
        p2 = np.asarray(projection.project_mono(jnp.asarray(Xc), jnp.asarray(cam)))
        np.testing.assert_allclose(p3[:, :2], p2, atol=1e-12)
        np.testing.assert_allclose(p3[:, 2], p2[:, 0] - cam[:, 4] / Xc[:, 2], atol=1e-10)


class TestJacobians:
    """Jacobians vs jax.jacfwd of the residual.

    Convention: stored JP/JL are the negated derivative of the residual
    e = proj - meas w.r.t. a *left-composed* pose increment / landmark shift:
    the GN step solves (J^T W J) d = J^T W e and applies exp(d) directly.
    """

    @pytest.mark.parametrize("mdim", [2, 3])
    def test_landmark_jacobian(self, rng, mdim):
        q, t, cam, Xw, _ = make_scene(rng, 16)
        q, t, cam, Xw = map(jnp.asarray, (q, t, cam, Xw))

        def resid(Xw_i, q_i, t_i, cam_i):
            Xc = projection.world_to_camera(q_i, t_i, Xw_i)
            return projection.project(Xc, cam_i, mdim)

        J_auto = jax.vmap(jax.jacfwd(resid))(Xw, q, t, cam)
        Xc = projection.world_to_camera(q, t, Xw)
        _, JL = jacobians.compute(Xc, q, cam, mdim)
        np.testing.assert_allclose(np.asarray(JL), -np.asarray(J_auto), atol=1e-8)

    @pytest.mark.parametrize("mdim", [2, 3])
    def test_pose_jacobian(self, rng, mdim):
        q, t, cam, Xw, _ = make_scene(rng, 16)
        q, t, cam, Xw = map(jnp.asarray, (q, t, cam, Xw))

        def resid_of_delta(delta, q_i, t_i, Xw_i, cam_i):
            qn, tn = se3.update_pose(delta, q_i, t_i)
            Xc = projection.world_to_camera(qn, tn, Xw_i)
            return projection.project(Xc, cam_i, mdim)

        zero = jnp.zeros((16, 6), dtype=jnp.float64)
        J_auto = jax.vmap(jax.jacfwd(resid_of_delta))(zero, q, t, Xw, cam)
        Xc = projection.world_to_camera(q, t, Xw)
        JP, _ = jacobians.compute(Xc, q, cam, mdim)
        np.testing.assert_allclose(np.asarray(JP), -np.asarray(J_auto), atol=1e-7)


class TestRobust:
    def test_none_identity(self, rng):
        x = jnp.asarray(rng.uniform(0, 100, 64))
        np.testing.assert_array_equal(np.asarray(robust.robustify(x, robust.NONE, 0.0)), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(robust.weight(x, robust.NONE, 0.0)), np.ones(64))

    @pytest.mark.parametrize("ktype", [robust.HUBER, robust.TUKEY])
    def test_derivative_consistency(self, rng, ktype):
        """weight == d rho / d x by finite differences (and autodiff)."""
        delta = 2.4494897  # sqrt(5.991), the g2o mono default
        x = jnp.asarray(np.sort(rng.uniform(0.01, 30.0, 128)))
        rho = lambda v: robust.robustify(v, ktype, delta)
        w_got = np.asarray(robust.weight(x, ktype, delta))
        w_auto = np.asarray(jax.vmap(jax.grad(rho))(x))
        np.testing.assert_allclose(w_got, w_auto, atol=1e-9)

    def test_huber_values(self):
        d = 2.0
        x = jnp.asarray([0.0, 3.9999, 4.0, 4.0001, 16.0])
        got = np.asarray(robust.robustify(x, robust.HUBER, d))
        want = np.array([0.0, 3.9999, 4.0, 2 * np.sqrt(4.0001) * 2 - 4, 2 * 4.0 * 2 - 4])
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_tukey_saturates(self):
        d = 3.0
        x = jnp.asarray([9.0, 100.0, 1e6])
        got = np.asarray(robust.robustify(x, robust.TUKEY, d))
        np.testing.assert_allclose(got, 3.0, atol=1e-12)  # d^2/3
        w = np.asarray(robust.weight(x, robust.TUKEY, d))
        np.testing.assert_allclose(w, [0.0, 0.0, 0.0], atol=1e-12)


class TestSmallMat:
    def _spd(self, rng, n, d):
        A = rng.normal(size=(n, d, d))
        return A @ A.transpose(0, 2, 1) + 0.5 * np.eye(d)

    def test_sym3x3_inv(self, rng):
        A = self._spd(rng, 64, 3)
        got = np.asarray(smallmat.sym3x3_inv(jnp.asarray(A)))
        np.testing.assert_allclose(got, np.linalg.inv(A), rtol=1e-9, atol=1e-9)
        np.testing.assert_array_equal(got, got.transpose(0, 2, 1))  # exact symmetry

    def test_solve_sym3x3(self, rng):
        A = self._spd(rng, 64, 3)
        b = rng.normal(size=(64, 3))
        got = np.asarray(smallmat.solve_sym3x3(jnp.asarray(A), jnp.asarray(b)))
        want = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)

    def test_solve_sym6x6(self, rng):
        A = self._spd(rng, 64, 6)
        b = rng.normal(size=(64, 6))
        got = np.asarray(smallmat.solve_sym6x6(jnp.asarray(A), jnp.asarray(b)))
        want = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-7)
