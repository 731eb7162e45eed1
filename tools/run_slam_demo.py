"""End-to-end SLAM demo: sequence -> trajectory -> ATE.

Three modes (BASELINE.json config[3], SURVEY.md §7 step 5):

  * default — synthetic landmark correspondences: geometric VO with a
    loop closure on a ground-truth loop trajectory,
  * ``--render`` — deterministically rendered 3-D image sequence through
    the FULL pipeline (pixels -> FAST -> BRIEF -> match -> pose graph),
  * ``--sequence <path>`` — a real monocular dataset directory, TUM
    (rgb.txt/groundtruth.txt) or KITTI odometry (image_0/calib.txt),
    autodetected; prints scale-aligned ATE when ground truth exists,
  * ``--images <dir>`` — any directory of PNG/JPEG frames (no poses, no
    calibration): grayscale-converts, runs the full pipeline, prints
    per-pair match/inlier metrics (ATE skipped).

Prints one JSON record per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def demo_synthetic(n: int) -> int:
    import jax.numpy as jnp

    from feature_detector_fast_tpu.models import lie, slam

    rng = np.random.default_rng(7)

    # ground-truth loop trajectory
    poses = [np.eye(4)]
    for k in range(n - 1):
        xi = np.array([0.0, 0.0, 0.7, 0.0, 2 * np.pi / (n - 1), 0.0])
        poses.append(poses[-1] @ np.asarray(lie.se3_exp(jnp.asarray(xi))))
    gt = np.stack(poses)

    # synthetic landmark observations (slot == landmark id, the identity
    # index mapping slam's chaining expects of synthetic data)
    n_pts = 5000
    lm = np.stack([
        rng.uniform(-6, 10, n_pts), rng.uniform(-4, 4, n_pts),
        rng.uniform(-2, 22, n_pts)
    ], axis=-1)

    def proj(T):
        Xc = (np.linalg.inv(T) @ np.concatenate(
            [lm, np.ones((n_pts, 1))], axis=1).T).T[:, :3]
        vis = Xc[:, 2] > 0.5
        p = Xc[:, :2] / np.maximum(Xc[:, 2:3], 1e-9)
        vis &= (np.abs(p[:, 0]) < 0.7) & (np.abs(p[:, 1]) < 0.55)
        return p, vis

    projs = [proj(T) for T in gt]
    noise = 5e-4
    pair_data = []
    for k in range(n - 1):
        pa, va = projs[k]
        pb, vb = projs[k + 1]
        pair_data.append((
            pa + rng.normal(0, noise, pa.shape) * (k > 0),
            pb + rng.normal(0, noise, pb.shape),
            va & vb,
        ))
    loop = [(0, n - 1, projs[0][0], projs[n - 1][0],
             projs[0][1] & projs[n - 1][1])]

    t0 = time.perf_counter()
    mets = []
    est = slam.run_vo_matches(pair_data, slam.VOConfig(), metrics=mets)
    t_vo = time.perf_counter() - t0
    ate = slam.evaluate_ate(est, gt)
    print(json.dumps({"stage": "vo_odometry", "frames": n,
                      "ate": round(ate, 5), "sec": round(t_vo, 2)}))

    t0 = time.perf_counter()
    est_lc = slam.run_vo_matches(pair_data, slam.VOConfig(),
                                 loop_pairs=loop, metrics=mets)
    ate_lc = slam.evaluate_ate(est_lc, gt)
    print(json.dumps({"stage": "vo_loop_closure", "ate": round(ate_lc, 5),
                      "sec": round(time.perf_counter() - t0, 2)}))

    inliers = [m["inliers"] for m in mets if not m.get("loop_closure")]
    print(json.dumps({"stage": "summary",
                      "mean_pair_inliers": int(np.mean(inliers)),
                      "ate_odometry": round(ate, 5),
                      "ate_with_loop_closure": round(ate_lc, 5)}))
    return 0


def demo_render(n: int) -> int:
    """Staged image-level SLAM on a rendered closed circuit with a real
    revisit, camera degradations (noise/blur/vignette) and interior 3-D
    boxes: odometry -> +image-level loop closures -> +BA refinement, each
    stage scored against the exact render poses."""
    from feature_detector_fast_tpu.io import render
    from feature_detector_fast_tpu.models import slam

    cfg = render.RenderConfig(z_back=12.0, cell=0.3, n_boxes=10,
                              noise_sigma=4.0, blur=True, vignette=0.25,
                              seed=3)
    gt = render.loop_trajectory(max(n, 16), radius=2.0)
    t0 = time.perf_counter()
    frames = render.render_sequence(gt, cfg)
    print(json.dumps({"stage": "render", "frames": len(frames),
                      "size": [cfg.height, cfg.width],
                      "degradations": "noise+blur+vignette",
                      "sec": round(time.perf_counter() - t0, 2)}))
    vocfg = slam.VOConfig(
        max_keypoints=512, camera=cfg.camera(),
        # loop-closure tuning for a circuit of this length: tight ratio
        # gate, far-revisit SE(3) edges only, moderate edge weight (the
        # scale-drift solve uses every accepted loop regardless)
        loop_ratio_mad_max=0.15, loop_edge_weight=0.3,
        loop_edge_min_gap=(3 * len(frames)) // 4,
    )
    traj = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()

    t0 = time.perf_counter()
    mets = []
    est = slam.run_vo_images(frames, vocfg, metrics=mets)
    ate = slam.evaluate_ate(est, gt)
    print(json.dumps({
        "stage": "vo_images", "ate": round(ate, 5),
        "trajectory_len": round(traj, 3),
        "ate_pct_of_trajectory": round(100 * ate / traj, 2),
        "mean_pair_inliers": int(np.mean([m["inliers"] for m in mets])),
        "sec": round(time.perf_counter() - t0, 2),
    }))

    t0 = time.perf_counter()
    mets_lc = []
    est_lc = slam.run_vo_images(frames, vocfg, loop_closure_gap=10,
                                metrics=mets_lc)
    ate_lc = slam.evaluate_ate(est_lc, gt)
    n_loops = sum(1 for m in mets_lc if m.get("loop_closure"))
    print(json.dumps({
        "stage": "vo_loop_closure", "ate": round(ate_lc, 5),
        "ate_pct_of_trajectory": round(100 * ate_lc / traj, 2),
        "loop_edges": n_loops,
        "sec": round(time.perf_counter() - t0, 2),
    }))

    t0 = time.perf_counter()
    est_ba = slam.run_vo_images(frames, vocfg, loop_closure_gap=10,
                                ba_refine=True)
    ate_ba = slam.evaluate_ate(est_ba, gt)
    print(json.dumps({
        "stage": "vo_ba_refined", "ate": round(ate_ba, 5),
        "ate_pct_of_trajectory": round(100 * ate_ba / traj, 2),
        "sec": round(time.perf_counter() - t0, 2),
    }))
    print(json.dumps({
        "stage": "summary", "ate_odometry": round(ate, 5),
        "ate_with_loop_closure": round(ate_lc, 5),
        "ate_with_ba": round(ate_ba, 5),
    }))
    return 0


def demo_images(path: str, max_frames: int) -> int:
    """Plain image-directory mode (VERDICT r3 #6): glob PNG/JPEG frames,
    grayscale-convert, run the full VO pipeline.  No poses are available,
    so only per-pair front-end/geometry metrics are printed (ATE skipped);
    the moment real calibrated frames appear, --sequence runs unmodified.

    Frames of mixed sizes are center-cropped to the common minimum (the
    batched front-end needs one static shape)."""
    import glob

    from feature_detector_fast_tpu.models import slam, twoview
    from feature_detector_fast_tpu.utils import image as imglib

    paths = sorted(
        p for pat in ("*.png", "*.jpg", "*.jpeg", "*.PNG", "*.JPG")
        for p in glob.glob(os.path.join(path, pat))
    )[:max_frames]
    if len(paths) < 2:
        print(json.dumps({"error": "need >= 2 images", "path": path,
                          "found": len(paths)}))
        return 1
    frames = [imglib.load_luma8(p) for p in paths]
    h = min(f.shape[0] for f in frames)
    w = min(f.shape[1] for f in frames)
    frames = [
        f[(f.shape[0] - h) // 2 : (f.shape[0] - h) // 2 + h,
          (f.shape[1] - w) // 2 : (f.shape[1] - w) // 2 + w]
        for f in frames
    ]
    print(json.dumps({"stage": "load", "format": "images",
                      "frames": len(frames), "size": [h, w]}))
    # No calibration: a generic pinhole from the image size (f ~ 0.9*w,
    # principal point at center).  Good enough for relative pair metrics;
    # absolute trajectory quality needs --sequence with real intrinsics.
    cam = twoview.Camera(0.9 * w, 0.9 * w, w / 2.0, h / 2.0)
    vocfg = slam.VOConfig(max_keypoints=1024, camera=cam)
    t0 = time.perf_counter()
    mets = []
    est = slam.run_vo_images(frames, vocfg, metrics=mets)
    pair_mets = [m for m in mets if not m.get("loop_closure")]
    for m in pair_mets:
        print(json.dumps({"stage": "pair", "pair": list(m["pair"]),
                          "matches": m["matches"], "inliers": m["inliers"]}))
    print(json.dumps({
        "stage": "vo_images", "frames": len(frames),
        "mean_pair_matches": int(np.mean([m["matches"] for m in pair_mets])),
        "mean_pair_inliers": int(np.mean([m["inliers"] for m in pair_mets])),
        "trajectory_frames": int(est.shape[0]),
        "ate": None,
        "sec": round(time.perf_counter() - t0, 2),
    }))
    return 0


def demo_sequence(path: str, max_frames: int) -> int:
    from feature_detector_fast_tpu.models import slam, twoview
    from feature_detector_fast_tpu.utils import image as imglib

    gt = None
    if os.path.exists(os.path.join(path, "calib.txt")):
        from feature_detector_fast_tpu.io import kitti

        paths, gt, cam = kitti.load_sequence(path, max_frames=max_frames)
        fmt = "kitti"
    elif os.path.exists(os.path.join(path, "rgb.txt")):
        from feature_detector_fast_tpu.io import tum

        paths, gt = tum.load_sequence(path, max_frames=max_frames)
        # TUM freiburg default intrinsics; override in code for other rigs
        cam = twoview.Camera(525.0, 525.0, 319.5, 239.5)
        fmt = "tum"
    else:
        print(json.dumps({"error": "unrecognized sequence layout",
                          "path": path}))
        return 1

    frames = [imglib.load_luma8(p) for p in paths]
    print(json.dumps({"stage": "load", "format": fmt,
                      "frames": len(frames),
                      "size": list(frames[0].shape)}))
    vocfg = slam.VOConfig(max_keypoints=1024, camera=cam)
    t0 = time.perf_counter()
    mets = []
    est = slam.run_vo_images(frames, vocfg, metrics=mets)
    rec = {
        "stage": "vo_images",
        "mean_pair_inliers": int(np.mean([m["inliers"] for m in mets])),
        "sec": round(time.perf_counter() - t0, 2),
    }
    if gt is not None:
        rec["ate"] = round(slam.evaluate_ate(est, gt[: len(est)]), 5)
    print(json.dumps(rec))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("n_frames", nargs="?", type=int, default=10)
    ap.add_argument("--render", action="store_true",
                    help="rendered 3-D image sequence through the full "
                         "pipeline")
    ap.add_argument("--sequence", metavar="PATH",
                    help="TUM or KITTI sequence directory")
    ap.add_argument("--images", metavar="DIR",
                    help="plain directory of PNG/JPEG frames (no poses: "
                         "per-pair metrics only, ATE skipped)")
    ap.add_argument("--max-frames", type=int, default=30)
    args = ap.parse_args()

    from feature_detector_fast_tpu.utils import cache

    cache.enable()
    if args.images:
        return demo_images(args.images, args.max_frames)
    if args.sequence:
        return demo_sequence(args.sequence, args.max_frames)
    if args.render:
        return demo_render(args.n_frames)
    return demo_synthetic(args.n_frames)


if __name__ == "__main__":
    sys.exit(main())
