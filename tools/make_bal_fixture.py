"""Generate the vendored BAL-format fixture data/bal_toy.txt.gz.

The public BAL archives (grail.cs.washington.edu/projects/bal) are not
redistributable inside this repo and the build environment has no network
egress, so the repo vendors a synthetic problem written in the *genuine*
BAL text format instead: a camera ring orbiting a 3D point blob, BAL -z
projection convention, nonzero radial distortion (k1/k2), noisy
observations, and perturbed initial estimates.  Everything the loader
must handle in a real download — Rodrigues rotations, the -z convention,
per-camera focal lengths, distortion — is exercised.

Run:  python tools/make_bal_fixture.py [out.txt.gz]
"""

import gzip
import sys

import numpy as np


def rot_look_at_origin(C: np.ndarray, up_hint=np.array([0.0, 1.0, 0.0])) -> np.ndarray:
    """World->camera rotation whose -z axis points from camera center C
    toward the world origin (the BAL viewing convention)."""
    fwd = -C / np.linalg.norm(C)
    zc = -fwd  # camera +z axis, in world coords
    right = np.cross(up_hint, zc)
    right = right / np.linalg.norm(right)
    up = np.cross(zc, right)
    return np.stack([right, up, zc])  # rows = camera axes


def mat_to_rodrigues(R: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(R).as_rotvec()


def generate(n_cams=20, n_pts=500, seed=3, noise_px=0.4,
             clustered=False, obs_per_pt=None):
    """``clustered=True`` gives Ladybug-like covisibility: each point is
    anchored near one ring angle and observed only by the few cameras in
    a local angular window (real BAL problems average ~4 obs/point with
    strongly local visibility, not the random-half toy pattern), with
    consumer-lens-strength barrel distortion (several percent at the
    image edge, vs the toy's sub-0.5%)."""
    rng = np.random.default_rng(seed)
    # point blob around the origin
    pts = rng.normal(scale=2.0, size=(n_pts, 3))
    # camera ring, radius ~10, slight height wobble
    ang = np.linspace(0, 2 * np.pi, n_cams, endpoint=False)
    centers = np.stack([10 * np.cos(ang), 0.5 * np.sin(3 * ang), 10 * np.sin(ang)], axis=1)
    f = rng.uniform(800.0, 1200.0, size=n_cams)
    if clustered:
        # barrel distortion at magnitudes a real wide-angle rig shows on
        # normalized radius (|p| reaches ~0.6 here -> r2 ~ 0.36:
        # k1*r2 ~ -5..-9%, k2*r4 ~ +0.1%), safely inside the invertible
        # range of r(p)*|p| (monotonic to |p| ~ 1.2 at k1=-0.25)
        pt_ang = rng.uniform(0, 2 * np.pi, n_pts)
        radial = rng.uniform(4.5, 7.5, n_pts)
        pts = np.stack([
            radial * np.cos(pt_ang),
            rng.normal(scale=0.6, size=n_pts),
            radial * np.sin(pt_ang),
        ], axis=1)
        f = rng.uniform(380.0, 420.0, size=n_cams)  # Ladybug-like focals
        k1 = rng.uniform(-0.25, -0.15, size=n_cams)
        k2 = rng.uniform(0.003, 0.01, size=n_cams)
    else:
        pt_ang = None
        k1 = rng.uniform(-5e-2, -1e-2, size=n_cams)
        k2 = rng.uniform(1e-3, 5e-3, size=n_cams)

    cams = np.zeros((n_cams, 9))
    Rs, ts = [], []
    for i in range(n_cams):
        R = rot_look_at_origin(centers[i])
        t = -R @ centers[i]
        Rs.append(R)
        ts.append(t)
        cams[i, 0:3] = mat_to_rodrigues(R)
        cams[i, 3:6] = t
        cams[i, 6:9] = (f[i], k1[i], k2[i])

    obs = []
    for i in range(n_cams):
        P = pts @ Rs[i].T + ts[i]  # [n_pts, 3], Pz < 0 by construction
        p = -P[:, :2] / P[:, 2:3]  # ideal normalized (BAL convention)
        r2 = np.sum(p * p, axis=1)
        d = f[i] * (1.0 + k1[i] * r2 + k2[i] * r2 * r2)[:, None] * p
        if pt_ang is not None:
            # local covisibility: camera i sees points anchored within an
            # angular window, tuned for the requested mean obs/point
            dang = np.abs((pt_ang - ang[i] + np.pi) % (2 * np.pi) - np.pi)
            target = obs_per_pt if obs_per_pt else 4.1
            # window holds ~1.5*target cameras; keep 2/3 of candidates
            halfwin = 1.5 * target * np.pi / n_cams
            vis = (dang < halfwin) & (rng.random(n_pts) < 2.0 / 3.0)
            vis &= P[:, 2] < -0.5  # in front of the BAL camera
        else:
            # each camera sees a random ~half of the points
            vis = rng.random(n_pts) < 0.5
        for j in np.flatnonzero(vis):
            obs.append((i, j, d[j, 0] + rng.normal(scale=noise_px), d[j, 1] + rng.normal(scale=noise_px)))

    # perturb initial estimates the way real BAL inputs are imperfect
    # (clustered preset: ~10x rougher, real SfM initials start at several
    # px of reprojection error, not a fraction of one)
    pscale = 10.0 if clustered else 1.0
    cams_init = cams.copy()
    cams_init[:, 0:3] += rng.normal(scale=2e-3 * pscale, size=(n_cams, 3))
    cams_init[:, 3:6] += rng.normal(scale=2e-2 * pscale, size=(n_cams, 3))
    pts_init = pts + rng.normal(scale=2e-2 * pscale, size=pts.shape)
    return cams_init, pts_init, obs


def write(path, cams, pts, obs):
    op = gzip.open(path, "wt") if path.endswith(".gz") else open(path, "w")
    with op as fh:
        fh.write(f"{len(cams)} {len(pts)} {len(obs)}\n")
        for i, j, x, y in obs:
            fh.write(f"{i} {j} {x:.12g} {y:.12g}\n")
        for c in cams:
            for v in c:
                fh.write(f"{v:.17g}\n")
        for p in pts:
            for v in p:
                fh.write(f"{v:.17g}\n")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ladybug-scale":
        # Ladybug-49's published shape: 49 cams / 7776 pts / 31843 obs
        out = sys.argv[2] if len(sys.argv) > 2 else "data/bal_ladybug_scale.txt.gz"
        cams, pts, obs = generate(n_cams=49, n_pts=7776, seed=7,
                                  noise_px=0.6, clustered=True)
    else:
        out = sys.argv[1] if len(sys.argv) > 1 else "data/bal_toy.txt.gz"
        cams, pts, obs = generate()
    write(out, cams, pts, obs)
    print(f"wrote {out}: {len(cams)} cams / {len(pts)} pts / {len(obs)} obs")
