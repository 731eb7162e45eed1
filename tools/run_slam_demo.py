"""End-to-end SLAM demo: synthetic sequence -> trajectory -> ATE.

Generates a ground-truth trajectory and landmark cloud, runs the geometric
VO pipeline (essential RANSAC, monocular scale chaining, pose graph with a
loop closure), evaluates scale-aligned ATE, and optionally refines with
sliding-window BA.  Prints one JSON record per stage.

Usage: python tools/run_slam_demo.py [n_frames]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax.numpy as jnp

    from feature_detector_fast_tpu.models import lie, slam
    from feature_detector_fast_tpu.utils import cache

    cache.enable()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.default_rng(7)

    # ground-truth loop trajectory
    poses = [np.eye(4)]
    for k in range(n - 1):
        xi = np.array([0.0, 0.0, 0.7, 0.0, 2 * np.pi / (n - 1), 0.0])
        poses.append(poses[-1] @ np.asarray(lie.se3_exp(jnp.asarray(xi))))
    gt = np.stack(poses)

    # synthetic landmark observations
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


if __name__ == "__main__":
    sys.exit(main())
