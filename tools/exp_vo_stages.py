"""Round-4 VO geometry-stage profile: where run_vo_matches' time goes.

vo_bench measured 28.4 f/s odometry at F=64 VGA with the geometry stage
(batched RANSAC + fused per-pair GN refinement + chaining + pose graph)
at 1.79 s — far above any single dispatch's compute.  This breaks the
stage into timed pieces (warm compiles, one process):

  * estimate_pairs WITHOUT the fused per-pair GN refinement,
  * estimate_pairs WITH it (the production default),
  * refinement sensitivity: (iters, cg) in {(6,12) default, (4,8), (2,6)},
  * pose-graph optimize alone,
  * full run_vo_matches.

Usage: python tools/exp_vo_stages.py [n_frames]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main() -> int:
    from feature_detector_fast_tpu.utils import cache as _cache

    _cache.enable()

    import jax

    from feature_detector_fast_tpu.io import render
    from feature_detector_fast_tpu.models import slam

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    cfg = render.RenderConfig(width=640, height=480, fx=520.0, fy=520.0,
                              z_back=12.0, cell=0.3, n_boxes=10,
                              noise_sigma=4.0, blur=True, vignette=0.25,
                              seed=3)
    gt = render.loop_trajectory(n, radius=2.0, laps=max(1, n // 64))
    frames = render.render_sequence(gt, cfg)
    traj = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
    base = slam.VOConfig(max_keypoints=512, camera=cfg.camera())
    pd = slam.frontend_matches(frames, base)
    batch = slam._as_pair_batch(list(pd))

    def timed(label, fn, reps=3):
        fn()  # warm (compile)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        rec = {"stage": label, "sec": round(sorted(ts)[len(ts) // 2], 3),
               "min": round(min(ts), 3)}
        print(json.dumps(rec), flush=True)
        print(rec, file=sys.stderr, flush=True)
        return out

    variants = [("refine6x12", 6, 12), ("refine4x8", 4, 8),
                ("refine2x6", 2, 6), ("norefine", 0, 12)]
    ests = {}
    for label, it, cg in variants:
        vc = dataclasses.replace(base, pair_refine_iters=it,
                                 pair_refine_cg=cg)
        ests[label] = timed(f"estimate_pairs {label}",
                            lambda vc=vc: slam.estimate_pairs(batch, vc))

    # quality impact of the variants on the full odometry trajectory
    for label, it, cg in variants:
        vc = dataclasses.replace(base, pair_refine_iters=it,
                                 pair_refine_cg=cg)
        est = slam.run_vo_matches(list(pd), vc)
        a = slam.evaluate_ate(est, gt)
        print(json.dumps({"stage": f"odometry_ate {label}",
                          "ate_pct": round(100 * a / traj, 3)}), flush=True)

    timed("run_vo_matches (default)",
          lambda: slam.run_vo_matches(list(pd), base))
    return 0


if __name__ == "__main__":
    sys.exit(main())
