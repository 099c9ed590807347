"""Write a TUM-RGB-D-format dataset directory from the analytic scene.

The evaluation environment has no network egress and ships no RGB-D
datasets, so the real TUM fr1 sequences cannot be fetched (BASELINE.md
configs 1-3 name them).  This generates the closest substitute that
still exercises the ENTIRE dataset code path — 16-bit depth PNGs at
5000 units/m, depth.txt, groundtruth.txt with quaternion poses — from
the analytic SDF scene, with an optional Kinect-style depth noise model
(quadratic-in-z Gaussian noise + quantization + edge dropout), so
`apps/run_fusion.py --sequence <dir>` and `io/datasets.TUMSequence` run
exactly as they would on the real data.

``--format icl`` writes the ICL-NUIM flavor instead (BASELINE.md config
3's dataset family): the TUM-compatible ICL release layout with the
ICL camera convention — NEGATIVE fy (y axis flipped, io/datasets.py
ICL_CAMERA) — so the fy<0 code path runs loader-to-app end-to-end
(tests/test_icl_format.py).

Usage:
  python scripts/make_synthetic_dataset.py --out /tmp/tum_synth \
      --frames 60 --noise 1.0 [--vga] [--format icl]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_topfusion")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# The environment may pre-register an accelerator PJRT plugin that
# overrides JAX_PLATFORMS from the env; honor the variable explicitly so
# subprocess tests (and users) can force a platform.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat and "," not in _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)



def kinect_noise(depth_m: np.ndarray, rng: np.random.Generator,
                 scale: float = 1.0) -> np.ndarray:
    """Kinect-class axial noise: sigma(z) ~= 1.2 mm + 1.9 mm * (z-0.4)^2
    (Khoshelham & Elberink 2012 magnitudes), plus 1-2% random edge dropout."""
    z = depth_m
    valid = z > 0
    sigma = (0.0012 + 0.0019 * np.square(np.maximum(z - 0.4, 0.0))) * scale
    noisy = z + rng.normal(0.0, 1.0, z.shape) * sigma
    drop = rng.random(z.shape) < 0.015 * scale
    return np.where(valid & ~drop, np.maximum(noisy, 0.0), 0.0)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--noise", type=float, default=1.0,
                    help="noise scale (0 = perfect depth)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--vga", action="store_true",
                    help="640x480 TUM fr1 intrinsics (default 320x240)")
    ap.add_argument("--angle", type=float, default=8.0)
    ap.add_argument("--shift", type=float, default=0.10)
    ap.add_argument("--format", choices=("tum", "icl"), default="tum",
                    help="dataset flavor: tum (fr1 intrinsics) or icl "
                    "(ICL-NUIM convention, NEGATIVE fy)")
    args = ap.parse_args()

    import imageio.v3 as iio
    import jax
    import jax.numpy as jnp

    from topfusion_tpu.config import CameraConfig
    from topfusion_tpu.io.datasets import (
        ICL_CAMERA,
        TUM_DEPTH_SCALE,
        TUM_FR1_CAMERA,
    )
    from topfusion_tpu.io.synthetic import SyntheticScene, orbit_trajectory
    from topfusion_tpu.io.trajectory import save_tum_trajectory

    if args.format == "icl":
        cam = ICL_CAMERA if args.vga else CameraConfig(
            width=320, height=240, fx=240.6, fy=-240.0, cx=159.75,
            cy=119.75,  # ICL-NUIM halved, fy NEGATIVE (its convention)
        )
    elif args.vga:
        cam = TUM_FR1_CAMERA
    else:
        cam = CameraConfig(width=320, height=240, fx=258.65, fy=258.25,
                           cx=159.3, cy=127.65)  # TUM fr1 halved

    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)
    scene = SyntheticScene()
    poses = orbit_trajectory(
        args.frames, max_angle_deg=args.angle, max_shift=args.shift,
        seed=args.seed,
    )
    render = jax.jit(lambda T: scene.render_depth(cam, T))
    rng = np.random.default_rng(args.seed)

    lines = []
    stamps = []
    for i, T in enumerate(poses):
        ts = i / 30.0
        d = np.asarray(render(jnp.asarray(T, jnp.float32)))
        if args.noise > 0:
            d = kinect_noise(d, rng, args.noise)
        png = np.clip(np.round(d * TUM_DEPTH_SCALE), 0, 65535).astype(
            np.uint16
        )
        rel = f"depth/{ts:.6f}.png"
        iio.imwrite(os.path.join(args.out, rel), png)
        lines.append(f"{ts:.6f} {rel}")
        stamps.append(ts)

    with open(os.path.join(args.out, "depth.txt"), "w") as f:
        f.write("# timestamp filename\n")
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(args.out, "camera.txt"), "w") as f:
        f.write(f"{cam.width} {cam.height} {cam.fx} {cam.fy} "
                f"{cam.cx} {cam.cy}\n")
    save_tum_trajectory(
        os.path.join(args.out, "groundtruth.txt"),
        [np.asarray(T) for T in poses],
        timestamps=stamps,
    )
    print(f"wrote {len(poses)} frames to {args.out} "
          f"({cam.width}x{cam.height}, noise={args.noise})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
