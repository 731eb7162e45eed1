"""TUM loader, checkpoint/resume, and tracing utility tests."""

import os

import numpy as np
import pytest

from feature_detector_fast_tpu.io import kitti, tum
from feature_detector_fast_tpu.utils import checkpoint, tracing


def write_tum_fixture(root, n=5):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    from PIL import Image

    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# color images\n")
        for i in range(n):
            name = f"rgb/{i:04d}.png"
            Image.fromarray(
                np.full((24, 32), i * 10, np.uint8)
            ).save(os.path.join(root, name))
            f.write(f"{100.0 + i * 0.1:.4f} {name}\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# ground truth\n")
        for i in range(n):
            # slight timestamp offset to exercise association
            f.write(f"{100.004 + i * 0.1:.4f} {i * 0.5} 0 0 0 0 0 1\n")


def test_tum_load_sequence(tmp_path):
    root = str(tmp_path / "seq")
    write_tum_fixture(root)
    paths, poses = tum.load_sequence(root)
    assert len(paths) == 5 and poses.shape == (5, 4, 4)
    np.testing.assert_allclose(poses[:, 0, 3], np.arange(5) * 0.5)
    np.testing.assert_allclose(poses[0, :3, :3], np.eye(3), atol=1e-12)
    assert all(os.path.exists(p) for p in paths)


def write_kitti_fixture(root, seq="04", n=4):
    from PIL import Image

    seq_dir = os.path.join(root, "sequences", seq)
    img_dir = os.path.join(seq_dir, "image_0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    for i in range(n):
        Image.fromarray(np.full((24, 32), i * 10, np.uint8)).save(
            os.path.join(img_dir, f"{i:06d}.png")
        )
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.write("P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0\n")
        f.write("P1: 718.856 0 607.1928 -386.1448 0 718.856 185.2157 0 "
                "0 0 1 0\n")
    with open(os.path.join(root, "poses", f"{seq}.txt"), "w") as f:
        for i in range(n):
            # forward motion: translation (0, 0, i)
            f.write("1 0 0 0 0 1 0 0 0 0 1 %d\n" % i)
    return seq_dir


def test_kitti_load_sequence(tmp_path):
    seq_dir = write_kitti_fixture(str(tmp_path))
    paths, poses, cam = kitti.load_sequence(seq_dir)
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
    assert poses.shape == (4, 4, 4)
    np.testing.assert_allclose(poses[:, 2, 3], np.arange(4))
    np.testing.assert_allclose(poses[:, 3], np.tile([0, 0, 0, 1], (4, 1)))
    assert (cam.fx, cam.fy) == (718.856, 718.856)
    np.testing.assert_allclose((cam.cx, cam.cy), (607.1928, 185.2157))


def test_kitti_max_frames_and_missing_poses(tmp_path):
    seq_dir = write_kitti_fixture(str(tmp_path), n=5)
    paths, poses, cam = kitti.load_sequence(seq_dir, max_frames=3)
    assert len(paths) == 3 and poses.shape[0] == 3
    # eval-style sequence: no poses file anywhere
    os.remove(os.path.join(str(tmp_path), "poses", "04.txt"))
    paths, poses, cam = kitti.load_sequence(seq_dir)
    assert poses is None and len(paths) == 5


def test_quaternion_to_matrix_known():
    # 90 degrees about z: q = (0, 0, sin45, cos45)
    s = np.sqrt(0.5)
    R = tum.quaternion_to_matrix(np.array([0, 0, s, s]))
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    np.testing.assert_allclose(R, want, atol=1e-12)


def test_associate_greedy_nearest():
    a = [(0.0, []), (1.0, []), (2.0, [])]
    b = [(0.01, []), (1.015, []), (5.0, [])]
    got = tum.associate(a, b, max_difference=0.02)
    assert got == [(0, 0), (1, 1)]


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {
        "poses": rng.normal(0, 1, (4, 4, 4)).astype(np.float32),
        "points": rng.normal(0, 1, (10, 3)).astype(np.float32),
        "frame": np.int32(7),
    }
    d = str(tmp_path / "ckpt")
    checkpoint.save_state(d, 3, state)
    checkpoint.save_state(d, 7, state)
    assert checkpoint.latest_step(d) == 7
    restored = checkpoint.restore_state(d, template=checkpoint._arrayify(state))
    np.testing.assert_array_equal(restored["poses"], state["poses"])
    np.testing.assert_array_equal(restored["frame"], state["frame"])
    assert checkpoint.restore_state(str(tmp_path / "none")) is None


def test_tracing_flag(monkeypatch, capsys):
    monkeypatch.setenv(tracing.TRACE_ENV, "0")
    tracing.trace("hidden")
    monkeypatch.setenv(tracing.TRACE_ENV, "1")
    tracing.trace("shown", 42)
    out = capsys.readouterr().out
    assert "hidden" not in out and "[fdf] shown 42" in out
