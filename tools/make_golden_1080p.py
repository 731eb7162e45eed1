"""Generate the committed 1080p golden frame (media/golden_1080p.png).

The reference pins its golden keypoint hash on the author's PRIVATE 1080p
game screenshot (tests/compare.rs:81-89) — unverifiable from this repo.
This script deterministically renders a NATURAL-STATISTICS substitute at
the reference's true benchmark scale: a single seamless 1920x1080 frame
(no tiling — tiled frames have artificial corner statistics at the seams)
with smooth multi-octave shading, hard-edged polygons/ellipses/lines at
many scales and contrasts, and mild quantized texture.  Corner density is
tuned to the same order as the reference frame's (23184 OFF keypoints at
t=16 n=9, README.md:58-59).

Deterministic: fixed seed, pure numpy + PIL rasterization, no platform-
dependent float paths in the image content (everything quantizes to u8
through round-half-away ints).  Run once; the PNG is committed and
test_golden.py pins its FNV hash, so a regenerated file that differs is a
test failure, not silent drift.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image, ImageDraw

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, os.pardir, "media", "golden_1080p.png")
W, H = 1920, 1080
SEED = 0xFA57


def value_noise(rng: np.random.Generator, h: int, w: int, cells: int,
                amp: float) -> np.ndarray:
    """One octave of bilinear value noise (smooth — contributes shading,
    not corners)."""
    gy, gx = cells, int(cells * w / h)
    grid = rng.uniform(-amp, amp, (gy + 1, gx + 1))
    ys = np.linspace(0, gy, h, endpoint=False)
    xs = np.linspace(0, gx, w, endpoint=False)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = grid[y0][:, x0]
    b = grid[y0][:, x0 + 1]
    c = grid[y0 + 1][:, x0]
    d = grid[y0 + 1][:, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def render() -> np.ndarray:
    rng = np.random.default_rng(SEED)

    # --- smooth base shading: 4 octaves of value noise around mid-grey ---
    base = np.full((H, W), 118.0)
    for cells, amp in ((3, 38.0), (7, 22.0), (17, 12.0), (41, 6.0)):
        base += value_noise(rng, H, W, cells, amp)

    img = Image.fromarray(np.clip(base, 8, 244).astype(np.uint8), "L")
    draw = ImageDraw.Draw(img)

    def lum(lo=10, hi=245):
        return int(rng.integers(lo, hi))

    # --- large structures: a few big quads (building/window-like) ---
    for _ in range(28):
        cx, cy = rng.integers(0, W), rng.integers(0, H)
        w2, h2 = rng.integers(40, 320), rng.integers(30, 240)
        ang = rng.uniform(0, np.pi)
        ca, sa = np.cos(ang), np.sin(ang)
        pts = []
        for dx, dy in ((-w2, -h2), (w2, -h2), (w2, h2), (-w2, h2)):
            pts.append((cx + dx * ca - dy * sa, cy + dx * sa + dy * ca))
        v = lum()
        draw.polygon(pts, fill=v)
        if rng.random() < 0.5:  # outline at different contrast
            draw.line(pts + [pts[0]], fill=lum(), width=int(rng.integers(1, 5)))

    # --- medium shapes: triangles, ellipses, thin bars ---
    for _ in range(240):
        kind = rng.integers(0, 3)
        v = lum()
        if kind == 0:
            pts = [(int(rng.integers(0, W)), int(rng.integers(0, H)))]
            for _ in range(2):
                pts.append((pts[0][0] + int(rng.integers(-140, 140)),
                            pts[0][1] + int(rng.integers(-140, 140))))
            draw.polygon(pts, fill=v)
        elif kind == 1:
            x, y = int(rng.integers(0, W)), int(rng.integers(0, H))
            rx, ry = int(rng.integers(6, 90)), int(rng.integers(6, 90))
            draw.ellipse((x - rx, y - ry, x + rx, y + ry), fill=v)
        else:
            x, y = int(rng.integers(0, W)), int(rng.integers(0, H))
            dx, dy = int(rng.integers(-260, 260)), int(rng.integers(-260, 260))
            draw.line((x, y, x + dx, y + dy), fill=v,
                      width=int(rng.integers(1, 7)))

    # --- small high-frequency detail: dots, plus-marks, tiny boxes ---
    for _ in range(1400):
        x, y = int(rng.integers(0, W)), int(rng.integers(0, H))
        s = int(rng.integers(1, 7))
        v = lum()
        kind = rng.integers(0, 3)
        if kind == 0:
            draw.rectangle((x, y, x + s, y + s), fill=v)
        elif kind == 1:
            draw.line((x - s, y, x + s, y), fill=v, width=1)
            draw.line((x, y - s, x, y + s), fill=v, width=1)
        else:
            draw.ellipse((x - s, y - s, x + s, y + s), outline=v,
                         width=1)

    out = np.asarray(img, dtype=np.float64)

    # --- mild quantized texture (below threshold on flat areas: |d| <= 6
    #     < t=16, so it textures gradients without carpeting the frame) ---
    tex = rng.integers(-6, 7, (H, W)).astype(np.float64)
    smooth = value_noise(rng, H, W, 11, 1.0)
    out = out + tex * (smooth > 0)  # texture only over ~half the frame

    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def main() -> int:
    frame = render()
    Image.fromarray(frame, "L").save(OUT, optimize=True)

    # report corner statistics (cv2 = real OpenCV ground truth)
    import cv2

    for nonmax, name in ((False, "off"), (True, "max_threshold")):
        det = cv2.FastFeatureDetector_create(
            threshold=16, nonmaxSuppression=nonmax,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
        n = len(det.detect(frame))
        print(f"cv2 t=16 n=9 {name}: {n} keypoints")
    print(f"wrote {os.path.normpath(OUT)} ({os.path.getsize(OUT)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
