"""Bulk tonemapped previews (replaces RegressionNetwork/representation/
exr_reader.py): panorama .exr -> .jpg with the viz tonemap.

Usage:
  python -m emlight_tpu.cli.preview --hdr_dir .../warpedHDROutputs --out_dir previews/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hdr_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    from PIL import Image

    from ..core.hdr import TONEMAP_VIZ, read_hdr

    names = sorted(n for n in os.listdir(args.hdr_dir) if n.endswith(".exr"))
    if args.limit:
        names = names[: args.limit]
    os.makedirs(args.out_dir, exist_ok=True)
    for nm in names:
        img = read_hdr(os.path.join(args.hdr_dir, nm))
        tone, _ = TONEMAP_VIZ(img)
        Image.fromarray((tone * 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, nm.replace(".exr", ".jpg"))
        )
    print(f"wrote {len(names)} previews")


if __name__ == "__main__":
    main()
