"""Single-panorama spherical-Gaussian fit (replaces the RegressionNetwork/
panorama.py overfit demo): fit K lights + ambient to one .exr panorama and
save the reconstruction next to it.

Usage:
  python -m emlight_tpu.cli.fit_single --pano scene.exr [--lights 3] [--steps 500]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pano", required=True)
    ap.add_argument("--lights", type=int, default=3)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--out", default=None, help="output prefix (default: <pano>_fit)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from ..core.hdr import TONEMAP_VIZ, read_hdr, resize_panorama, write_hdr
    from ..representation.fit import fit_spherical_gaussians

    img = read_hdr(args.pano)
    h, w = args.height, args.height * 2
    if img.shape[:2] != (h, w):
        img = resize_panorama(img, (w, h))

    fitted, env, metrics = fit_spherical_gaussians(
        jnp.asarray(img), n_lights=args.lights, steps=args.steps, lr=args.lr
    )
    loss0, loss1 = float(metrics["loss"][0]), float(metrics["loss"][-1])
    print(f"loss {loss0:.5g} -> {loss1:.5g} over {args.steps} steps")
    for k in ("dirs", "sizes", "colors", "ambient"):
        print(k, np.asarray(fitted[k]).round(4).tolist())

    prefix = args.out or os.path.splitext(args.pano)[0] + "_fit"
    write_hdr(prefix + ".exr", np.asarray(env))
    tone, _ = TONEMAP_VIZ(np.maximum(np.asarray(env), 0))
    ref_tone, _ = TONEMAP_VIZ(np.maximum(img, 0))
    strip = np.hstack([ref_tone, tone])
    Image.fromarray((strip * 255).astype(np.uint8)).save(prefix + ".jpg")
    print(f"wrote {prefix}.exr / .jpg")


if __name__ == "__main__":
    main()
