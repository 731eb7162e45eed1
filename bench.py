"""Headline benchmark: 1080p FAST frames/sec on one TPU chip.

Mirrors the reference's criterion benchmark (benches/benchmark.rs:18-50):
three configs — nonmax Off / MaxThreshold / SumAbsolute — at t=16, n=9 on a
1920x1080 grayscale frame.  The reference's published numbers (README.md:
54-65, BASELINE.md) on an i7-4770TE are:

    Off           5.3381 ms  -> 187.33 f/s   (23184 keypoints)
    MaxThreshold  8.7080 ms  -> 114.84 f/s   ( 7646 keypoints)
    SumAbsolute   7.2343 ms  -> 138.23 f/s   ( 8307 keypoints)

The benchmark frame is deterministic: the committed 300x200 reference frame
(media/Screenshot315_torch_grey.png) tiled to 1920x1080, preserving
realistic corner statistics.

Headline protocol matches the reference's criterion loop (one in-memory
image reused across iterations, benches/benchmark.rs:24-27): the frame
batch is device-resident, and each round runs the full detector contract —
dense detect + score + nonmax + hierarchical compaction via the fused
Pallas kernel — producing per-frame packed keypoint words on chip.
stderr also reports an e2e figure including host->device image streaming
and device->host result materialization + decode; on this sandbox the TPU
is attached through a network relay (~25 ms RTT, ~25 MB/s readback), so
that number is transfer-bound and not comparable to a PCIe-attached
host.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
Diagnostics go to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BASELINES = {
    "off": 1000.0 / 5.3381,  # README.md:59
    "max_threshold": 1000.0 / 8.7080,  # README.md:62
    "sum_absolute": 1000.0 / 7.2343,  # README.md:65
}

BATCH = 16        # e2e loop (host transfer bound through the relay)
CHIP_BATCH = 64   # chip-sustained loop (amortizes dispatch)
ROUNDS = 10
CHIP_ROUNDS = 20  # on-device scan rounds (one dispatch total)
CHIP_REPS = 5     # repetitions of the on-device scan; median is headline
# Initial superword-compaction caps (256-pixel superwords with >= 1
# keypoint, per frame; ops.compact.SUPER_SPAN words each).  The warmup
# round measures the TRUE superword count and re-sizes the cap to the next
# multiple of 512 with ~12% headroom — compaction cost scales with the cap
# (top_k partial sort), so the timed loop shouldn't pay for an arbitrarily
# conservative one, and an unusually dense INPUT_FILE frame must not
# overflow either.
CAPS = {"off": 1 << 12, "max_threshold": 1 << 11, "sum_absolute": 1 << 11}


def build_1080p_frame() -> np.ndarray:
    """Benchmark frame.  Like the reference bench (benchmark.rs:6-7), the
    INPUT_FILE env var substitutes a real frame; the default is the
    committed natural-statistics 1080p golden frame (media/golden_1080p.png
    — single seamless render, 24130 OFF keypoints vs the reference frame's
    23184; tests/test_golden.py pins its hash and counts).  Falls back to
    tiling the 300x200 reference frame if the golden frame is absent."""
    import os

    from feature_detector_fast_tpu.utils.image import load_luma8

    override = os.environ.get("INPUT_FILE")
    if override:
        return load_luma8(override)
    media_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "media")
    golden = os.path.join(media_dir, "golden_1080p.png")
    if os.path.exists(golden):
        return load_luma8(golden)
    small = load_luma8(os.path.join(media_dir, "Screenshot315_torch_grey.png"))
    reps_y = -(-1080 // small.shape[0])
    reps_x = -(-1920 // small.shape[1])
    return np.tile(small, (reps_y, reps_x))[:1080, :1920].copy()


def bench_config(batch_np, config, cap) -> tuple:
    """Pipelined batched rounds; returns (sec/frame, keypoints/frame,
    device-only sec/frame)."""
    import jax
    import jax.numpy as jnp

    from feature_detector_fast_tpu.api import (
        _detect_compact_batch,
        _detect_compact_batch_packed,
        _grow_cap,
        _max_super_cap,
        effective_width,
        unpack_batch_packed,
    )

    width = effective_width(batch_np.shape[-1])

    # Warmup: compile + one full round including transfers + host decode,
    # growing the cap if the frame overflows it — via the SAME
    # api._grow_cap policy the production overflow retries use.  The cap
    # this loop lands on IS the cap production serving lands on for this
    # frame (overflow-retry fixpoint from the same initial cap), so the
    # timed loops below measure exactly the production cap regime —
    # including the identity-layout jump _grow_cap makes on dense frames
    # (ADVICE r3: a separate tight_cap mirror here measured a DIFFERENT
    # regime than production for mid-density frames).
    dev_imgs = jax.device_put(batch_np)
    max_cap = _max_super_cap(*batch_np.shape[-2:])
    while True:
        args = (int(config.threshold), int(config.count), config.nonmax, cap)
        packed = np.asarray(_detect_compact_batch_packed(dev_imgs, *args))
        n_supers = int(packed[:, 1].max())
        if n_supers <= cap:
            break
        cap = _grow_cap(cap, n_supers, max_cap)
    kps = unpack_batch_packed(packed, cap, width)
    n_kp = len(kps[0])

    t0 = time.perf_counter()
    outs = [
        _detect_compact_batch_packed(jax.device_put(batch_np), *args)
        for _ in range(ROUNDS)
    ]
    for o in outs:  # overlap result readback across rounds
        o.copy_to_host_async()
    host = [unpack_batch_packed(np.asarray(o), cap, width) for o in outs]
    dt = time.perf_counter() - t0
    assert all(len(h[0]) == n_kp for h in host)

    # Chip-sustained: the exact analogue of the reference's criterion loop
    # (benches/benchmark.rs:24-27 reuses one in-memory image across
    # b.iter()): input resident, full detect + score + nonmax + compaction
    # produced per round.  The rounds loop runs ON DEVICE (lax.scan, one
    # dispatch, one scalar fetch) — per-dispatch host round trips through
    # this ~25 ms-RTT relay would otherwise dominate and jitter the
    # measurement.  Each round XORs the batch with a runtime-zero byte fed
    # from the scan stream, so XLA cannot hoist the loop-invariant work
    # out of the loop; results are reduced into the carry, so no round is
    # dead code.  Uses the tuple-output compaction (the single-buffer
    # packed layout is a readback-transport format, not part of the
    # detection contract).
    chip_np = np.broadcast_to(batch_np[0], (CHIP_BATCH,) + batch_np.shape[1:])
    dev_batch = jax.device_put(np.ascontiguousarray(chip_np))

    @functools.partial(jax.jit, static_argnums=(2,))
    def chip_loop(imgs, zeros, rounds):
        def body(c, z):
            sidx, sbits, n, n_supers = _detect_compact_batch(imgs ^ z, *args)
            r = (n.sum(dtype=jnp.int32) + n_supers.sum(dtype=jnp.int32)
                 + sidx.sum(dtype=jnp.int32) + sbits.sum(dtype=jnp.int32))
            return c + r, None
        c, _ = jax.lax.scan(body, jnp.int32(0), zeros[:rounds])
        return c

    # Warm with the SAME static round count as the timed call — a different
    # scan length is a different XLA program, and its compile would land
    # inside the timed region.  The on-device scan is repeated CHIP_REPS
    # times and the MEDIAN is the headline: single timings through the
    # network-relay attach jitter (CLAUDE.md documents ±50% across
    # processes; repeated in-process scans agree within ~2%), and the
    # reference's criterion harness likewise reports a CI, not a point
    # (benches/benchmark.rs + README.md:54-65).
    zeros = jax.device_put(np.zeros(CHIP_ROUNDS, np.uint8))
    int(chip_loop(dev_batch, zeros, CHIP_ROUNDS))
    dts = []
    for _ in range(CHIP_REPS):
        t0 = time.perf_counter()
        int(chip_loop(dev_batch, zeros, CHIP_ROUNDS))
        dts.append(time.perf_counter() - t0)
    per_frame = sorted(d / (CHIP_ROUNDS * CHIP_BATCH) for d in dts)

    return dt / (ROUNDS * BATCH), n_kp, per_frame


def main() -> int:
    import jax

    from feature_detector_fast_tpu.utils import cache as _cache

    _cache.enable()

    from feature_detector_fast_tpu import Config, NonmaxMode

    img = build_1080p_frame()
    batch_np = np.broadcast_to(img, (BATCH,) + img.shape).copy()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    results = {}
    for name, config in (
        ("off", Config(16, 9, NonmaxMode.OFF)),
        ("max_threshold", Config(16, 9, NonmaxMode.MAX_THRESHOLD)),
        ("sum_absolute", Config(16, 9, NonmaxMode.SUM_ABSOLUTE)),
    ):
        sec_e2e, n_kp, per_frame = bench_config(batch_np, config, CAPS[name])
        sec_chip = per_frame[len(per_frame) // 2]  # median of CHIP_REPS scans
        results[name] = (1.0 / sec_chip, 1.0 / sec_e2e)
        print(
            f"{name}: chip-sustained {sec_chip * 1e3:.3f} ms/frame = "
            f"{1.0 / sec_chip:.1f} f/s ({1.0 / sec_chip / BASELINES[name]:.2f}x "
            f"reference) [min/median/max over {len(per_frame)} scans: "
            f"{per_frame[0] * 1e3:.3f}/{sec_chip * 1e3:.3f}/"
            f"{per_frame[-1] * 1e3:.3f} ms] | e2e incl. host materialization "
            f"over the network relay {sec_e2e * 1e3:.3f} ms = "
            f"{1.0 / sec_e2e:.1f} f/s ({n_kp} keypoints)",
            file=sys.stderr,
        )

    fps_off = results["off"][0]
    print(json.dumps({
        "metric": "1080p FAST frames/sec/chip (t=16 n=9, nonmax off; "
                  "detect+score+compact on chip, image resident as in reference bench)",
        "value": round(fps_off, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_off / BASELINES["off"], 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
