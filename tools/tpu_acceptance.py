"""On-hardware acceptance harness.

The CPU test suite runs the Pallas kernels in interpret mode; this tool is
the real-TPU analogue of the reference's differential harness
(tests/compare.rs): for every (nonmax mode, count 9..=16) it runs the
compiled Mosaic kernels — dense and packed-words — on the benchmark frame
and asserts bit-exact agreement with the XLA dense pipeline, then checks
the golden keypoint counts on the committed frame via the public API.

Prints one JSON line: {"ok": bool, "configs": N, "failures": [...]}.

Usage:  timeout 1800 python tools/tpu_acceptance.py [--artifact PATH]
(first run compiles ~50 programs through the relay; the persistent compile
cache makes reruns fast.)

``--artifact PATH`` additionally writes the full record — git commit,
frame, per-config results, golden counts — as JSON.  CLAUDE.md's rule:
run this after ANY kernel or descriptor change and COMMIT the artifact
(ACCEPTANCE_rNN.json) with the change, so acceptance claims are
auditable instead of living in code comments (VERDICT r2 #6).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from feature_detector_fast_tpu.utils import cache as _cache

_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from feature_detector_fast_tpu import Config, NonmaxMode, detect_arrays  # noqa: E402
from feature_detector_fast_tpu.ops import compact, fast, fast_pallas  # noqa: E402

GOLDEN = {  # committed 300x200 frame, t=16 n=9 (tests/test_golden.py)
    NonmaxMode.OFF: 309,
    NonmaxMode.MAX_THRESHOLD: 131,
    NonmaxMode.SUM_ABSOLUTE: 135,
}


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", metavar="PATH", default=None,
                    help="write the full acceptance record as JSON")
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "configs": 0,
                          "failures": ["not running on TPU"]}))
        return 1
    passed = []

    from bench import build_1080p_frame

    img = build_1080p_frame()
    im = jnp.asarray(img)
    wpw = fast_pallas.padded_width(im.shape[1]) // 32
    failures = []
    n_cfg = 0

    for mode in NonmaxMode:
        for count in range(9, 17):
            n_cfg += 1
            tag = f"{mode.name} c={count}"

            def one_config():
                # Pass the frame as a traced argument — a zero-arg closure
                # bakes the ~2 MB frame into every compiled program as an
                # XLA constant (~72 copies through the relay + compile
                # cache, all invalidated by a different INPUT_FILE).
                mp, sp = fast_pallas.detect_dense_pallas(im, 16, count, mode)
                mx, sx = fast.detect_dense_jit(im, 16, count, mode)
                np.testing.assert_array_equal(np.asarray(mp), np.asarray(mx))
                np.testing.assert_array_equal(np.asarray(sp), np.asarray(sx))
                words = jax.jit(
                    fast_pallas.detect_words_padded,
                    static_argnums=(1, 2, 3, 4),
                )(im, 16, count, mode, False)
                ref_bits, _ = jax.jit(
                    lambda image, c, m: compact.pack_mask_words(
                        fast_pallas.detect_dense_padded(image, 16, c, m)[0]),
                    static_argnums=(1, 2),
                )(im, count, mode)
                np.testing.assert_array_equal(
                    np.asarray(words)[:, :wpw].reshape(-1),
                    np.asarray(ref_bits))

            # The relay's remote Mosaic compile service crashes
            # TRANSIENTLY (HTTP 500 "tpu_compile_helper subprocess exit
            # code 1" — the same program compiles fine seconds later;
            # observed repeatedly in the round-4 tile sweeps).  A
            # correctness MISMATCH is deterministic, so retry runtime
            # errors once but never AssertionErrors.
            try:
                try:
                    one_config()
                except AssertionError:
                    raise
                except Exception as e:  # noqa: BLE001 — transient relay?
                    print(f"{tag}: retry after {type(e).__name__}",
                          file=sys.stderr, flush=True)
                    one_config()
                passed.append(tag)
                print(f"{tag}: bit-exact (dense + packed words)",
                      file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001 — harness records and moves on
                failures.append(f"{tag}: {type(e).__name__}: {e}")
                print(f"{tag}: FAIL {type(e).__name__}", file=sys.stderr,
                      flush=True)

    # BRIEF: the compiled patch-extraction descriptor paths (plain +
    # steered) must match the sparse-gather semantic references bit-for-
    # bit on hardware at every valid slot (the CPU suite only covers
    # interpret mode).
    from feature_detector_fast_tpu.models import brief

    try:
        mask, score = fast.detect_dense_jit(im, 16, 9, NonmaxMode.SUM_ABSOLUTE)
        kps = brief.select_topk(mask, score, 512)
        for oriented, ref_fn in (
            (False, brief.describe),
            (True, brief.describe_oriented),
        ):
            d_ref, v_ref = ref_fn(im, kps)
            d_p, v_p = brief.describe_patched(im, kps, oriented=oriented)
            np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_p))
            vr = np.asarray(v_ref)
            np.testing.assert_array_equal(
                np.asarray(d_ref)[vr], np.asarray(d_p)[vr])
            print(f"BRIEF patched oriented={oriented}: bit-exact vs sparse "
                  f"({int(vr.sum())} valid slots)", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        failures.append(f"BRIEF patched: {type(e).__name__}: {e}")
        print(f"BRIEF patched: FAIL {type(e).__name__}", file=sys.stderr,
              flush=True)

    from feature_detector_fast_tpu.utils.image import load_luma8

    small = load_luma8(os.path.join(os.path.dirname(__file__), "..", "media",
                                    "Screenshot315_torch_grey.png"))
    goldens = {}
    for mode, want in GOLDEN.items():
        got = len(detect_arrays(small, Config(16, 9, mode)))
        goldens[mode.name] = {"got": got, "want": want}
        if got != want:
            failures.append(f"golden {mode.name}: {got} != {want}")
        print(f"golden {mode.name}: {got} (want {want})", file=sys.stderr)

    if args.artifact:
        import subprocess
        import time as _time

        try:
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip()
        except Exception:  # noqa: BLE001
            head = "unknown"
        record = {
            "ok": not failures,
            "timestamp": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
            "git_head": head,
            "device": str(jax.devices()[0]),
            "frame": os.environ.get("INPUT_FILE", "media/golden_1080p.png"),
            "configs_run": n_cfg,
            "configs_passed": passed,
            "brief_checked": True,
            "goldens": goldens,
            "failures": failures,
        }
        with open(args.artifact, "w") as f:
            json.dump(record, f, indent=1)
        print(f"artifact written: {args.artifact}", file=sys.stderr)

    print(json.dumps({"ok": not failures, "configs": n_cfg,
                      "failures": failures}))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
