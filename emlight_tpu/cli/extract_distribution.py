"""Anchor-GT extraction CLI (mirrors RegressionNetwork/representation/
distribution_representation.py:123-147, minus the hardcoded /home paths).

Batches panoramas onto the device and runs the one-matmul extractor
(representation/extract.py) — the >=10x preprocessing-throughput target.

Fully pipelined: a background thread decodes batch i+2 (threaded C++ EXR
loader when built), the host->device transfer of batch i+1 is enqueued and
extraction dispatched BEFORE the results of batch i are fetched, and pickle
writes happen on a writer thread — decode, PCIe transfer, device compute and
host serialization all overlap.

Usage:
  python -m emlight_tpu.cli.extract_distribution --hdr_dir .../warpedHDROutputs \
      --out_dir .../pkl [--anchors 128] [--batch 16] [--preview_dir tmp/]
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hdr_dir", required=True, help="directory of .exr panoramas")
    ap.add_argument("--out_dir", required=True, help="output directory for .pickle GT")
    ap.add_argument("--anchors", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--limit", type=int, default=0, help="process at most N files")
    ap.add_argument("--preview_dir", default=None, help="optional splat-render previews")
    args = ap.parse_args(argv)

    import queue
    import threading

    import jax
    import jax.numpy as jnp

    from ..core.hdr import TONEMAP_VIZ, read_hdr, resize_panorama
    from ..representation import extract_anchors_batch, render_anchor_params
    from ..train.data import prefetch

    names = sorted(n for n in os.listdir(args.hdr_dir) if n.endswith(".exr"))
    if args.limit:
        names = names[: args.limit]
    os.makedirs(args.out_dir, exist_ok=True)
    h, w = args.height, args.height * 2

    from .. import native

    def _load_python(chunk):
        imgs = []
        for nm in chunk:
            img = read_hdr(os.path.join(args.hdr_dir, nm))
            if img.shape[:2] != (h, w):
                img = resize_panorama(img, (w, h))
            imgs.append(img.astype(np.float32))
        return np.stack(imgs)

    if native.available():
        # threaded C++ decode + area resize straight into one batch buffer;
        # batches the native codec can't decode (e.g. compression schemes it
        # doesn't implement in a mixed-compression dir) fall back to the
        # pure-Python codec, which handles the full supported set
        def loader():
            for s in range(0, len(names), args.batch):
                chunk = names[s : s + args.batch]
                try:
                    imgs, _ = native.load_batch(
                        [os.path.join(args.hdr_dir, nm) for nm in chunk], (h, w)
                    )
                except OSError:
                    imgs = _load_python(chunk)
                yield chunk, imgs
    else:
        def loader():
            for s in range(0, len(names), args.batch):
                yield names[s : s + args.batch], _load_python(names[s : s + args.batch])

    def _preview(para, args, nm):
        from PIL import Image

        env = render_anchor_params(
            jnp.asarray(para["distribution"][None]),
            jnp.asarray(para["intensity"][None]),
            jnp.asarray(para["rgb_ratio"][None]),
            n=args.anchors,
        )
        tone, _ = TONEMAP_VIZ(np.asarray(env)[0])
        os.makedirs(args.preview_dir, exist_ok=True)
        Image.fromarray((tone * 255).astype(np.uint8)).save(
            os.path.join(args.preview_dir, nm.replace(".exr", "_rec.png"))
        )

    # pickle serialization off the dispatch thread
    wq: queue.Queue = queue.Queue(maxsize=8)
    done = 0
    werr: list[BaseException] = []

    def writer():
        nonlocal done
        while True:
            item = wq.get()
            if item is None:
                return
            if werr:  # previous item failed: drain without writing
                continue
            chunk, out = item
            try:
                for i, nm in enumerate(chunk):
                    para = {
                        "distribution": out["distribution"][i],
                        "intensity": np.asarray(out["intensity"][i]),
                        "rgb_ratio": out["rgb_ratio"][i],
                        "ambient": out["ambient"][i],
                    }
                    with open(
                        os.path.join(args.out_dir, nm.replace(".exr", ".pickle")), "wb"
                    ) as f:
                        pickle.dump(para, f, protocol=pickle.HIGHEST_PROTOCOL)
                    if args.preview_dir:
                        _preview(para, args, nm)
                done += len(chunk)
            except BaseException as e:  # noqa: BLE001 - reraised on main thread
                werr.append(e)

    wthread = threading.Thread(target=writer, daemon=True)
    wthread.start()

    t0 = time.perf_counter()
    pending = None  # (chunk, device outputs) — fetched one batch behind
    for chunk, imgs in prefetch(loader(), depth=4):
        dev = jax.device_put(imgs)  # async transfer overlaps pending compute
        out = extract_anchors_batch(dev, n=args.anchors)  # async dispatch
        if pending is not None:
            pchunk, pout = pending
            wq.put((pchunk, {k: np.asarray(v) for k, v in pout.items()}))
        pending = (chunk, out)
    if pending is not None:
        pchunk, pout = pending
        wq.put((pchunk, {k: np.asarray(v) for k, v in pout.items()}))
    wq.put(None)
    wthread.join()
    if werr:
        raise werr[0]
    dt = time.perf_counter() - t0
    print(f"extracted {done} panoramas in {dt:.2f}s ({done / max(dt, 1e-9):.1f} panoramas/sec)")


if __name__ == "__main__":
    main()
