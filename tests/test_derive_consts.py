"""Device-side derivation of wire-compressed index tables (mxu.derive_consts).

The "dv" schur-id mode ships ONLY lk; li/lj are rebuilt on device from
hpl_col via the canonical triplet enumeration (landmark-major, i-major).
The "dv2" mode ships NOTHING but the tiny ascending hsc block-key table:
lk is rebuilt on device too, as a fused compare-sum against the chunk's
own block keys (hsc_key[sc_gid]) — ~4 MB less ctor wire at kitti00 scale
for ~7 ms of derive dispatch.  dv2 is the DEFAULT since round 4
(docs/PERF_NOTES.md); it is still forced explicitly here so the tests
pin the machinery independent of any future default change.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuba_tpu.io import synthetic
from cuba_tpu.solver import mxu
from cuba_tpu.solver.structure import build_structure_from_arrays


@pytest.fixture(autouse=True)
def _force_dv2(monkeypatch):
    monkeypatch.setenv("CUBA_TPU_SC_PACK", "dv2")


def _structure(num_p=220, num_l=6000, seed=0, loop=False, fixed_lms=0):
    prob = synthetic.generate(
        num_poses=num_p, num_landmarks=num_l, mean_obs_per_landmark=5.5,
        stereo_fraction=0.25, seed=seed, loop_closure=loop,
    )
    cams = np.tile(prob.cam, (num_p, 1))
    fixed_p = np.zeros(num_p, bool)
    fixed_p[prob.fixed_poses] = True
    fixed_l = np.zeros(num_l, bool)
    if fixed_lms:
        fixed_l[:: num_l // fixed_lms] = True
    return build_structure_from_arrays(
        prob.qs, prob.ts, cams, prob.Xws, fixed_p, fixed_l,
        prob.mono_p, prob.mono_l, prob.mono_z, prob.mono_w,
        prob.stereo_p, prob.stereo_l, prob.stereo_z, prob.stereo_w,
    )


def _derived(s, pad_blocks=256):
    plans, consts = mxu.plan_mxu(s, pad_blocks, need_dense=True)
    assert plans.ok
    sc_dv = mxu.derive_statics(plans, s.n_hpl)
    mc = type(consts)(**{k: jnp.asarray(v) for k, v in consts._asdict().items()})
    out = mxu.derive_consts(mc, s.num_p, s.num_l, plans.rows_ok,
                            plans.sc_pack, sc_dv, plans.gid_dv)
    return plans, consts, out


def _assert_schur_ids_exact(plans, out, check_lk):
    np.testing.assert_array_equal(np.asarray(out.sc_li),
                                  np.asarray(plans.schur.li, np.int32))
    np.testing.assert_array_equal(np.asarray(out.sc_lj),
                                  np.asarray(plans.schur.lj, np.int32))
    if check_lk:
        np.testing.assert_array_equal(np.asarray(out.sc_lk),
                                      np.asarray(plans.schur.lk, np.int32))


def test_dv2_mode_chosen_and_exact():
    s = _structure()
    plans, consts, out = _derived(s)
    # canonical generation order + v2 window geometry hold at this scale
    assert plans.sc_pack == "dv2"
    assert consts.sc_lij.size == 1  # no li/lj stream on the wire
    assert consts.sc_lk.size == 1  # no lk stream on the wire either
    assert consts.hsc_key.size == plans.schur.n_hsc_pad
    _assert_schur_ids_exact(plans, out, check_lk=True)


def test_dv2_mode_with_loop_closures():
    s = _structure(loop=True, seed=2)
    plans, consts, out = _derived(s)
    assert plans.sc_pack == "dv2"
    _assert_schur_ids_exact(plans, out, check_lk=True)


def test_dv_mode_when_hsc_withheld():
    """Without the hsc table (non-v2 formation), the packer falls back to
    "dv": lk rides the wire, li/lj are still derived; the derivation stays
    exact."""
    s = _structure(num_p=120, num_l=2500, seed=3)
    sc = mxu.plan_schur_for(s)
    mode, ids = mxu.pack_schur_ids(sc, col=np.asarray(s.hpl_col), hsc=None)
    assert mode == "dv"
    assert ids["sc_lk"].size > 1
    # the packed lk stream must equal the plan's
    np.testing.assert_array_equal(
        np.asarray(ids["sc_lk"], np.int32), np.asarray(sc.lk, np.int32)
    )


def test_gidr_derivation_matches_host():
    s = _structure()
    plans, consts, out = _derived(s)
    if consts.res_perm.size <= 1:
        pytest.skip("rank-gather plan absent at this scale")
    prank = mxu.pose_ranks(s)
    for name, pidx, epad in (
        ("pose_gidr_m", s.mono.pose_idx, plans.e_pad_m),
        ("pose_gidr_s", s.stereo.pose_idx, plans.e_pad_s),
    ):
        ref = np.full(epad, -1, np.int32)
        ref[: len(pidx)] = prank[np.asarray(pidx, np.int64)]
        np.testing.assert_array_equal(np.asarray(getattr(out, name)), ref)


@pytest.mark.parametrize("pack", ["dv", "dv2"])
def test_rechunked_plan_derivation_exact(pack, monkeypatch):
    """A landmark-granular RE-CHUNKED plan (tight slot windows pad chunk
    tails, so padded position != canonical position) must still derive
    li/lj (and lk under dv2) exactly — the shipped per-chunk offsets
    MXUConsts.sc_t0 carry the position shift."""
    monkeypatch.setenv("CUBA_TPU_SC_SB", "64")  # force re-chunk
    monkeypatch.setenv("CUBA_TPU_SC_PACK", pack)
    s = _structure(loop=True, seed=2)
    sc = mxu.plan_schur_for(s)
    li2 = np.asarray(sc.li).reshape(sc.num_chunks, sc.chunk)
    assert bool(np.any((li2 < 0)[:-1].sum(1) > 0)), "re-chunk did not pad"
    plans, consts, out = _derived(s)
    assert plans.sc_pack == pack
    assert consts.sc_t0.size == plans.schur.num_chunks + 1
    _assert_schur_ids_exact(plans, out, check_lk=(pack == "dv2"))


@pytest.mark.parametrize("pack", ["dv", "dv2"])
def test_cumsum_fallback_derivation_exact(pack, monkeypatch):
    """The windowed compare-sum landmark derivation is gated by sc_wl; when
    a chunk would span more landmarks than _LM_WL_MAX (sc_wl = 0), the
    device-wide scatter+cumsum path must still derive exactly."""
    monkeypatch.setenv("CUBA_TPU_SC_PACK", pack)
    monkeypatch.setattr(mxu, "_LM_WL_MAX", 0)  # force the fallback
    s = _structure(loop=True, seed=2)
    plans, consts, out = _derived(s)
    assert plans.sc_pack == pack
    assert plans.sc_wl == 0  # gate engaged
    _assert_schur_ids_exact(plans, out, check_lk=(pack == "dv2"))


def test_pack_cache_survives_plan_gc_and_address_reuse():
    """Regression (round-4 verdict): the pack cache was keyed on id(sc); if
    the first plan was garbage-collected and a later engine's plan landed at
    the same address, pack_schur_ids returned the PREVIOUS problem's packing
    (wrong hsc_key/sc_ntri) with no error.  The cache now holds a weakref —
    a dead ref can never match a new object, so a second engine built after
    the first is freed must always get its own packing."""
    import dataclasses
    import gc

    s1 = _structure(num_p=60, num_l=800, seed=0)
    s2 = _structure(num_p=60, num_l=900, seed=5)
    sc1_proto = mxu.plan_schur_for(s1)
    sc2_proto = mxu.plan_schur_for(s2)
    col1 = np.asarray(s1.hpl_col)
    col2 = np.asarray(s2.hpl_col)

    mxu._PACK_SCHUR_CACHE[0] = None  # cold ground truth for problem 2
    mode_ref, ids_ref = mxu.pack_schur_ids(
        dataclasses.replace(sc2_proto), col=col2, hsc=None
    )
    mxu._PACK_SCHUR_CACHE[0] = None

    hit_address_reuse = False
    for _ in range(64):
        a = dataclasses.replace(sc1_proto)
        mxu.pack_schur_ids(a, col=col1, hsc=None)
        # the cached key must die with the plan (this is the fix: a weakref,
        # not an id() that a new allocation can collide with)
        old_id = id(a)
        del a
        gc.collect()
        cached_key = mxu._PACK_SCHUR_CACHE[0]
        assert cached_key[0]() is None, "cache key outlived the plan"
        b = dataclasses.replace(sc2_proto)
        hit_address_reuse |= id(b) == old_id  # CPython readily reuses slots
        mode2, ids2 = mxu.pack_schur_ids(b, col=col2, hsc=None)
        assert mode2 == mode_ref
        for k in ids_ref:
            np.testing.assert_array_equal(ids2[k], ids_ref[k], err_msg=k)
        mxu._PACK_SCHUR_CACHE[0] = None
        if hit_address_reuse:
            break
    # best-effort: on CPython the freed dataclass slot is normally reused
    # immediately, making this a true id-collision reproduction; the
    # dead-weakref assertion above is the deterministic guarantee either way


def test_canonicity_check_rejects_reordered_streams():
    """A non-canonical triplet order must fall back to a packed wire mode
    (the derivation would silently rebuild the wrong ids otherwise)."""
    s = _structure(num_p=60, num_l=800)
    sc = mxu.plan_schur_for(s)
    col = np.asarray(s.hpl_col)
    assert mxu._canonical_schur_ntri(sc, col) > 0
    # swap two interior triplets -> not canonical any more
    li = np.asarray(sc.li).copy()
    lj = np.asarray(sc.lj).copy()
    k = np.flatnonzero(li >= 0)[10:12]
    li[k[0]], li[k[1]] = li[k[1]], li[k[0]]
    lj[k[0]], lj[k[1]] = lj[k[1]], lj[k[0]]
    import dataclasses

    sc2 = dataclasses.replace(sc, li=li, lj=lj)
    assert mxu._canonical_schur_ntri(sc2, col) == -1


def test_derive_consts_rejects_unknown_mode():
    s = _structure(num_p=60, num_l=800)
    plans, consts = mxu.plan_mxu(s, 128, need_dense=True)
    mc = type(consts)(**{k: jnp.asarray(v) for k, v in consts._asdict().items()})
    with pytest.raises(ValueError, match="unknown sc_pack"):
        mxu.derive_consts(mc, s.num_p, s.num_l, plans.rows_ok, "bogus", None)
    with pytest.raises(ValueError, match="requires sc_dv"):
        mxu.derive_consts(mc, s.num_p, s.num_l, plans.rows_ok, "dv", None)


def _expanded_reference(s, pad_blocks=256):
    """wire_pack=False ships every table fully expanded — the ground truth
    for what each derivation must rebuild."""
    ref_plans, ref = mxu.plan_mxu(s, pad_blocks, need_dense=True,
                                  wire_pack=False)
    assert ref_plans.ok
    return ref


@pytest.mark.parametrize("loop", [False, True])
def test_v2_formation_tables_derived_exact(loop):
    """dv2 ships only (hsc_key, sc_gid); the band-major formation tables
    gkey_up2/iru/icu must rebuild bit-exactly (vs the expanded
    wire_pack=False tables)."""
    s = _structure(loop=loop, seed=2 if loop else 0)
    plans, consts, out = _derived(s)
    assert plans.sc_pack == "dv2"
    assert consts.sc_gid.size > 1  # the compact window list rides the wire
    for name in ("gkey_up2", "iru", "icu"):
        assert getattr(consts, name).size == 1, f"{name} shipped"
    ref = _expanded_reference(s)
    for name in ("gkey_up2", "iru", "icu"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name), np.int32), err_msg=name,
        )


@pytest.mark.parametrize("fixed_lms", [0, 40])
def test_edge_gids_derived_exact(fixed_lms):
    """gid_dv ships only exception triples for slotless (fixed-endpoint)
    edges; pose_gid/lm_gid and everything downstream (acc gates, gidr)
    must rebuild exactly."""
    s = _structure(fixed_lms=fixed_lms)
    plans, consts, out = _derived(s)
    if not plans.rows_ok:
        pytest.skip("rows front end absent at this scale")
    assert plans.gid_dv
    assert consts.pose_gid_m.size == 1  # nothing on the wire
    assert consts.lm_gid_m.size == 1
    if fixed_lms:
        assert consts.exc_i_m.size > 1  # fixed landmarks -> real exceptions
    ref = _expanded_reference(s)
    for name in ("pose_gid_m", "pose_gid_s", "lm_gid_m", "lm_gid_s",
                 "pose_acc_m", "pose_acc_s", "lm_acc_m", "lm_acc_s",
                 "pose_gidr_m", "pose_gidr_s"):
        r = np.asarray(getattr(ref, name), np.int32)
        if r.size <= 1:
            continue  # plan variant without this table
        np.testing.assert_array_equal(
            np.asarray(getattr(out, name)), r, err_msg=name,
        )
