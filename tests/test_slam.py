"""Visual-odometry pipeline tests: synthetic ground truth ATE harness plus
an image-level smoke run (BASELINE.json config[3])."""

import jax
import numpy as np
import pytest

#: Fast-lane exclusion (VERDICT r3 #7): this module is SLAM/distributed-
#: heavy; `pytest -m 'not slow'` skips it for kernel iteration.
pytestmark = pytest.mark.slow

import pytest as _pytest


@_pytest.fixture(autouse=True)
def _x64(x64):
    """All tests in this module run under scoped float64 (see conftest.x64:
    a module-level global flip contaminated the whole session)."""
    yield

import jax.numpy as jnp

from feature_detector_fast_tpu.models import lie, slam, twoview


def make_trajectory(n_frames, step=0.4, turn=0.06):
    """Ground-truth world_T_cam poses: forward motion with gentle turning."""
    poses = [np.eye(4)]
    for k in range(n_frames - 1):
        xi = np.array([0.03 * np.sin(k), 0.0, step, 0.0, turn, 0.0])
        rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))  # cam_k_T_cam_{k+1}
        poses.append(poses[-1] @ rel)
    return np.stack(poses)


def make_cloud(rng, n_pts):
    return np.stack([
        rng.uniform(-6, 10, n_pts), rng.uniform(-4, 4, n_pts),
        rng.uniform(-2, 22, n_pts)
    ], axis=-1)


def project(lm, T, noise=0.0, rng=None):
    """Normalized projection + visibility of landmark cloud ``lm`` from
    world_T_cam ``T``.  Slot i of the result is landmark i — the identity
    slot mapping slam's index-based chaining expects of synthetic data."""
    n_pts = lm.shape[0]
    Xc = (np.linalg.inv(T) @ np.concatenate(
        [lm, np.ones((n_pts, 1))], axis=1).T).T[:, :3]
    vis = Xc[:, 2] > 0.5
    p = Xc[:, :2] / np.maximum(Xc[:, 2:3], 1e-9)
    vis &= (np.abs(p[:, 0]) < 0.7) & (np.abs(p[:, 1]) < 0.55)
    if noise:
        p = p + rng.normal(0, noise, p.shape)
    return p, vis


def synth_pair_data(rng, gt_poses, n_pts=4000, noise=0.0):
    """Per-consecutive-pair normalized correspondences from a shared
    landmark cloud; slot == landmark id in every frame, so scale chaining
    links pairs by index."""
    lm = make_cloud(rng, n_pts)
    projs = [project(lm, T, noise=noise, rng=rng) for T in gt_poses]
    pair_data = []
    for k in range(len(gt_poses) - 1):
        pa, va = projs[k]
        pb, vb = projs[k + 1]
        valid = va & vb
        pair_data.append((pa.copy(), pb.copy(), valid.copy()))
    return pair_data


def test_vo_synthetic_ate(rng):
    gt = make_trajectory(8)
    pair_data = synth_pair_data(rng, gt)
    est = slam.run_vo_matches(pair_data, slam.VOConfig())
    ate = slam.evaluate_ate(est, gt)
    # exact observations: trajectory recovered to ~numerical precision
    assert ate < 1e-3, ate


def test_vo_synthetic_ate_noisy(rng):
    gt = make_trajectory(8)
    pair_data = synth_pair_data(rng, gt, noise=2e-4)
    est = slam.run_vo_matches(pair_data, slam.VOConfig())
    ate = slam.evaluate_ate(est, gt)
    trajectory_len = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0),
                                    axis=1).sum()
    assert ate < 0.02 * trajectory_len, (ate, trajectory_len)


def test_vo_scale_chaining(rng):
    """Scale must propagate: without chaining, each unit-baseline pair
    would make the trajectory step sizes equal; with it, the true step
    length ratios are recovered (up to global scale)."""
    poses = [np.eye(4)]
    steps = [0.2, 0.5, 1.0, 0.3]
    for s in steps:
        xi = np.array([0.0, 0.0, s, 0.0, 0.02, 0.0])
        poses.append(poses[-1] @ np.asarray(lie.se3_exp(jnp.asarray(xi))))
    gt = np.stack(poses)
    pair_data = synth_pair_data(rng, gt)
    est = slam.run_vo_matches(pair_data, slam.VOConfig())
    d_est = np.linalg.norm(np.diff(est[:, :3, 3], axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1)
    ratios = d_est / d_est[0]
    want = d_gt / d_gt[0]
    np.testing.assert_allclose(ratios, want, rtol=0.02)


def test_vo_images_smoke(reference_image):
    """Image-level pipeline runs and returns finite poses.  (Rolled frames
    form a planar scene — degenerate for essential geometry — so only
    structural sanity is asserted here; metric accuracy is covered by the
    synthetic harness above.)"""
    frames = [
        np.roll(reference_image, 4 * k, axis=1) for k in range(3)
    ]
    cfg = slam.VOConfig(max_keypoints=256,
                        camera=twoview.Camera(300.0, 300.0, 150.0, 100.0))
    est = slam.run_vo_images(frames, cfg)
    assert est.shape == (3, 4, 4)
    assert np.isfinite(est).all()


def test_vo_loop_closure_reduces_drift(rng):
    """Circular trajectory returning near the start: odometry noise drifts;
    a loop-closure edge between last and first frames pulls it back."""
    n = 12
    poses = [np.eye(4)]
    for k in range(n - 1):
        xi = np.array([0.0, 0.0, 0.8, 0.0, 2 * np.pi / (n - 1), 0.0])
        poses.append(poses[-1] @ np.asarray(lie.se3_exp(jnp.asarray(xi))))
    gt = np.stack(poses)

    # ONE landmark cloud for odometry and loop pair: slot == landmark id,
    # so the loop pair's scale links against pair 0's depths by exact
    # slot index even though the odometry observations are noisy.
    lm = make_cloud(rng, 6000)
    projs = [project(lm, T, noise=1.5e-3, rng=rng) for T in gt]
    pair_data = [
        (projs[k][0], projs[k + 1][0], projs[k][1] & projs[k + 1][1])
        for k in range(n - 1)
    ]

    # Loop closure between frames 0 and n-1 (revisited view), clean
    # projections of the same cloud.
    p0, v0 = project(lm, gt[0])
    pN, vN = project(lm, gt[n - 1])
    loop = [(0, n - 1, p0, pN, v0 & vN)]

    est_no = slam.run_vo_matches(list(pair_data), slam.VOConfig())
    mets = []
    # This loop pair closes onto a nearly COINCIDENT pose (frame 11 of a
    # 12-pose circuit sits on frame 0): its unit-baseline triangulation
    # is legitimately noise-dispersed, so the depth-ratio MAD gate is
    # widened for it (the default 0.3 is tuned for revisits with real
    # baseline; round-4's per-pair GN refinement nudged this pair's
    # dispersion from 0.26 to 0.38 — right through the default gate).
    est_lc = slam.run_vo_matches(
        list(pair_data), slam.VOConfig(loop_ratio_mad_max=0.5),
        loop_pairs=loop, metrics=mets)
    ate_no = slam.evaluate_ate(est_no, gt)
    ate_lc = slam.evaluate_ate(est_lc, gt)
    assert any(m.get("loop_closure") for m in mets), mets
    assert ate_lc < ate_no, (ate_no, ate_lc)


def test_vo_ba_refinement(rng):
    """BA refinement over tracks built from pair inliers must reduce ATE
    on a noisy trajectory (structure-from-motion polish)."""
    gt = make_trajectory(7)
    pair_data = synth_pair_data(rng, gt, n_pts=3000, noise=8e-4)
    est = slam.run_vo_matches(list(pair_data), slam.VOConfig())
    est_ba = slam.run_vo_matches(list(pair_data), slam.VOConfig(),
                                 ba_refine=True)
    ate = slam.evaluate_ate(est, gt)
    ate_ba = slam.evaluate_ate(est_ba, gt)
    assert np.isfinite(est_ba).all()
    assert ate_ba < ate * 0.6, (ate, ate_ba)  # BA must materially improve


def test_vo_ba_refinement_distributed(rng):
    """Distributed SLAM configuration: the BA refinement runs over the
    8-device mesh (observations sharded, psum Schur reductions) and
    matches the single-device refinement's quality."""
    from feature_detector_fast_tpu.parallel import mesh as meshlib

    gt = make_trajectory(6)
    pair_data = synth_pair_data(rng, gt, n_pts=2000, noise=8e-4)
    est1 = slam.run_vo_matches(list(pair_data), slam.VOConfig(),
                               ba_refine=True)
    est8 = slam.run_vo_matches(list(pair_data), slam.VOConfig(),
                               ba_refine=True, mesh=meshlib.make_mesh())
    a1 = slam.evaluate_ate(est1, gt)
    a8 = slam.evaluate_ate(est8, gt)
    assert abs(a1 - a8) < 0.25 * max(a1, a8) + 1e-9, (a1, a8)


def test_vo_empty_pair_data():
    """0/1-frame sequences return the identity trajectory instead of
    crashing on an empty batch (ADVICE r2)."""
    est = slam.run_vo_matches([], slam.VOConfig())
    assert est.shape == (1, 4, 4)
    np.testing.assert_allclose(est[0], np.eye(4))


def test_vo_loop_pair_wider_than_main_batch(rng):
    """A loop pair with MORE correspondence slots than the consecutive
    pairs must not widen the main batch after estimation (ADVICE r2: est
    kept the old K and inlier masks stopped broadcasting).  Wide-slot
    loop input is truncated — extra slots can't link against est anyway."""
    gt = make_trajectory(5)
    pair_data = synth_pair_data(rng, gt, n_pts=1500, noise=5e-4)
    # loop pair observed with a wider slot capacity (extra padded slots)
    p0, v0 = project(make_cloud(rng, 1500), gt[0])
    pN, vN = project(make_cloud(rng, 1500), gt[-1])
    wide = np.zeros((2500, 2))
    wide_b = np.zeros((2500, 2))
    wide_v = np.zeros(2500, bool)
    wide[:1500], wide_b[:1500], wide_v[:1500] = p0, pN, v0 & vN
    mets = []
    est = slam.run_vo_matches(
        list(pair_data), slam.VOConfig(),
        loop_pairs=[(0, len(gt) - 1, wide, wide_b, wide_v)],
        metrics=mets, ba_refine=True,
    )
    assert est.shape == (len(gt), 4, 4)
    assert np.isfinite(est).all()


def test_vo_ba_windowed_routing(rng):
    """Trajectories >= windowed_threshold frames route ba_refine through
    sliding-window BA (sequence parallelism, VERDICT r2 #7); the windowed
    route must match the global-BA route's quality, single-device and on
    the 8-device mesh."""
    from feature_detector_fast_tpu.models import slam as slam_mod
    from feature_detector_fast_tpu.parallel import mesh as meshlib

    gt = make_trajectory(18, step=0.35)
    pair_data = synth_pair_data(rng, gt, n_pts=3000, noise=6e-4)
    batch = slam_mod._as_pair_batch(pair_data)
    est = slam_mod.estimate_pairs(batch, slam.VOConfig())
    base = slam.run_vo_matches(list(pair_data), slam.VOConfig())

    # default threshold (16): 18 frames -> windowed
    win = slam_mod.refine_with_ba(base, batch, est)
    # forced global BA on the same inputs
    glob = slam_mod.refine_with_ba(base, batch, est, windowed_threshold=99)
    # windowed over the mesh (sequence-parallel)
    win8 = slam_mod.refine_with_ba(base, batch, est,
                                   mesh=meshlib.make_mesh())

    a0 = slam.evaluate_ate(base, gt)
    aw = slam.evaluate_ate(win, gt)
    ag = slam.evaluate_ate(glob, gt)
    a8 = slam.evaluate_ate(win8, gt)
    # windowed refinement must not degrade the trajectory, must stay in
    # the same quality class as global BA, and shard without quality loss
    assert aw < a0 * 1.1, (a0, aw)
    assert aw < max(2.0 * ag, 0.02 * a0 + 1e-6) + 1e-9, (ag, aw)
    assert abs(a8 - aw) < 0.3 * max(a8, aw) + 1e-9, (aw, a8)


def test_build_tracks_merges_loop_links():
    """build_tracks with loop_links (round 4): a loop correspondence must
    MERGE the two chain tracks it connects into one long-range track;
    tracks observing one frame at two different slots are dropped."""
    P, K = 4, 6  # 5 frames
    pa = np.zeros((P, K, 2)); pb = np.zeros((P, K, 2))
    for k in range(P):
        for s in range(K):
            pa[k, s] = [k + 0.01 * s, s]
            pb[k, s] = [k + 1 + 0.01 * s, s]
    valid = np.ones((P, K), bool)
    idx_b = np.tile(np.arange(K, dtype=np.int32), (P, 1))  # identity slots
    batch = slam.PairBatch(pa, pb, valid, idx_b)
    inl = np.zeros((P, K), bool)
    inl[0, 0] = True                  # track A: frames 0-1, slot 0
    inl[3, 1] = True                  # track B: frames 3-4, slot 1
    est = slam.PairEstimates(
        R=np.tile(np.eye(3), (P, 1, 1)), t_unit=np.zeros((P, 3)),
        inl=inl, depths_a=np.ones((P, K)), depths_b=np.ones((P, K)))

    oc0, ol0, _ = slam.build_tracks(batch, est, min_len=2)
    assert int(ol0.max()) + 1 == 2  # two separate 2-frame tracks

    # loop pair (0, 4): frame-0 slot 0 <-> frame-4 slot 1 merges A and B
    # into one 4-frame long-range track (distinct frames 0, 1, 3, 4)
    lpa = np.zeros((K, 2)); lpb = np.zeros((K, 2))
    lpa[0] = pa[0, 0]; lpb[0] = pb[3, 1]
    linl = np.zeros(K, bool); linl[0] = True
    lidx = np.full(K, -1, np.int32); lidx[0] = 1
    oc, ol, uv = slam.build_tracks(batch, est,
                                   loop_links=[(0, 4, lpa, lpb, linl, lidx)])
    assert int(ol.max()) + 1 == 1  # merged into ONE track
    assert oc.tolist() == [0, 1, 3, 4]  # spans the loop, (track, frame)-sorted

    # conflicting link: loop (0, 1) claims frame-0 slot 0 == frame-1
    # slot 1, so the merged component observes frame 1 at slots 0 AND 1
    # (physically impossible) -> track A dropped whole; B survives
    oc2, ol2, _ = slam.build_tracks(
        batch, est, min_len=2, loop_links=[(0, 1, lpa, lpb, linl, lidx)])
    assert int(ol2.max()) + 1 == 1 and oc2.tolist() == [3, 4]


def test_frame_signatures_pooled_bits():
    """_frame_signatures: mean of unpacked descriptor bits over VALID
    keypoints only, per frame."""
    desc = np.zeros((2, 3, 8), np.uint32)
    desc[0, 0, 0] = 0b1   # frame 0, kp 0: bit 0 set
    desc[0, 1, 0] = 0b1   # frame 0, kp 1: bit 0 set
    desc[0, 2, 0] = 0xFFFFFFFF  # invalid slot: must not contribute
    dvalid = np.array([[True, True, False], [True, False, False]])
    desc[1, 0, 7] = 0b10  # frame 1, kp 0: bit 225 set
    sig = np.asarray(slam._frame_signatures(jnp.asarray(desc),
                                            jnp.asarray(dvalid)))
    assert sig.shape == (2, 256)
    assert sig[0, 0] == 1.0          # both valid kps have bit 0
    assert sig[0, 1:].max() == 0.0   # nothing else (invalid kp excluded)
    assert sig[1, 7 * 32 + 1] == 1.0
    assert sig[1].sum() == 1.0
