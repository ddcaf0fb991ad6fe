"""Host-side data pipelines (Laval Indoor layout) + synthetic data for tests/bench.

Regression pairs (RegressionNetwork/data.py:20-87): {root}/pkl/*.pickle GT with
{root}/crop/*.exr crops; the crop is tonemapped (γ2.4/p50/0.5) and its alpha
rescales GT intensity (x alpha/500) and ambient (x alpha/(128*256)).

Projector samples (GenProjector/data.py:15-113): GT pickle + warped panorama;
the anchor GT is rasterized ON DEVICE here (render_anchor_params) instead of
inside __getitem__ with a .cuda() call — the loader only ships small tensors.

A background prefetch thread overlaps decode/tonemap with device compute
(the reference forces nThreads=0 because its dataset touches CUDA).
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from typing import Iterator

import numpy as np

from ..core.hdr import TONEMAP_INPUT, Tonemap, read_hdr, resize_panorama

__all__ = [
    "RegressionDataset",
    "ProjectorDataset",
    "batched",
    "prefetch",
    "synthetic_regression_batch",
    "synthetic_projector_batch",
]


class RegressionDataset:
    """Pairs of (crop exr, GT pickle). Mirrors ParameterDataset semantics."""

    def __init__(self, root: str, tone: Tonemap = TONEMAP_INPUT,
                 crop_hw: tuple[int, int] | None = (192, 256)):
        gt_dir = os.path.join(root, "pkl")
        crop_dir = os.path.join(root, "crop")
        self.pairs = []
        for nm in sorted(os.listdir(gt_dir)):
            if nm.endswith("pickle"):
                crop_path = os.path.join(crop_dir, nm.replace("pickle", "exr"))
                if os.path.exists(crop_path):
                    self.pairs.append((crop_path, os.path.join(gt_dir, nm)))
        self.tone = tone
        self.crop_hw = crop_hw

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int) -> dict:
        crop_path, gt_path = self.pairs[i]
        exr = read_hdr(crop_path)
        img, alpha = self.tone(exr)
        if self.crop_hw is not None and img.shape[:2] != self.crop_hw:
            img = resize_panorama(img, (self.crop_hw[1], self.crop_hw[0]))
        with open(gt_path, "rb") as f:
            gt = pickle.load(f)
        return {
            "crop": img.astype(np.float32),
            "distribution": np.asarray(gt["distribution"], np.float32),
            # alpha plumbing (RegressionNetwork/data.py:71-73)
            "intensity": np.float32(gt["intensity"] * alpha / 500.0),
            "rgb_ratio": np.asarray(gt["rgb_ratio"], np.float32),
            "ambient": np.asarray(gt["ambient"], np.float32) * alpha / (128 * 256),
            "name": os.path.basename(gt_path).split(".pickle")[0],
        }


class ProjectorDataset:
    """GT pickle + warped panorama + crop; env-map rasterization happens on device."""

    def __init__(self, root: str, tone: Tonemap = TONEMAP_INPUT, crop_size: int = 128,
                 env_hw: tuple[int, int] | None = None):
        pkl_dir = os.path.join(root, "pkl")
        self.samples = []
        for nm in sorted(os.listdir(pkl_dir)):
            if nm.endswith(".pickle"):
                warped = os.path.join(root, "warped", nm.replace("pickle", "exr"))
                crop = os.path.join(root, "crop", nm.replace("pickle", "exr"))
                if os.path.exists(warped) and os.path.exists(crop):
                    self.samples.append((os.path.join(pkl_dir, nm), warped, crop))
        self.tone = tone
        self.crop_size = crop_size
        # generator output is (crop_size, 2*crop_size); the warped target and
        # light mask must match (reference assumes 128x256 inputs throughout)
        self.env_hw = env_hw or (crop_size, crop_size * 2)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> dict:
        pkl_path, warped_path, crop_path = self.samples[i]
        with open(pkl_path, "rb") as f:
            gt = pickle.load(f)
        crop = read_hdr(crop_path)
        crop, alpha = self.tone(crop)
        crop = resize_panorama(crop, (self.crop_size, self.crop_size))
        hdr = read_hdr(warped_path)
        if hdr.shape[:2] != self.env_hw:
            hdr = resize_panorama(hdr, (self.env_hw[1], self.env_hw[0]))
        intensity = 0.3 * hdr[..., 0] + 0.59 * hdr[..., 1] + 0.11 * hdr[..., 2]
        light_map = (intensity > intensity.max() * 0.05).astype(np.float32)
        return {
            "crop": crop.astype(np.float32),
            "warped": (hdr * alpha).astype(np.float32),
            "map": light_map,
            "distribution": np.asarray(gt["distribution"], np.float32),
            "intensity": np.float32(gt["intensity"] * 0.01),  # GenProjector/data.py:87
            "rgb_ratio": np.asarray(gt["rgb_ratio"], np.float32),
            "ambient": np.asarray(gt["ambient"], np.float32) / (128 * 256),
            "alpha": np.float32(alpha),
            "name": os.path.basename(pkl_path).split(".")[0],
        }


def batched(dataset, batch_size: int, *, shuffle: bool = True, seed: int = 0,
            drop_last: bool = True, epochs: int | None = None) -> Iterator[dict]:
    """Collate dict samples into stacked numpy batches."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        for s in range(0, len(order) - (batch_size - 1 if drop_last else 0), batch_size):
            idx = order[s : s + batch_size]
            if drop_last and len(idx) < batch_size:
                continue
            samples = [dataset[int(i)] for i in idx]
            batch = {}
            for k in samples[0]:
                vals = [smp[k] for smp in samples]
                batch[k] = vals if isinstance(vals[0], str) else np.stack(vals)
            yield batch
        epoch += 1


def device_prefetch(it: Iterator, sharding=None) -> Iterator:
    """Overlap host->device transfer with compute: batch i+1 is device_put
    (async) while the consumer steps on batch i. `sharding` routes arrays to a
    mesh (dist.shard_batch semantics); None targets the default device."""
    import jax

    put = (
        (lambda x: jax.device_put(x, sharding))
        if sharding is not None
        else jax.device_put
    )
    pending = None
    for batch in it:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, (str, list))}
        rest = {k: v for k, v in batch.items() if isinstance(v, (str, list))}
        nxt = ({k: put(v) for k, v in arrays.items()}, rest)
        if pending is not None:
            yield pending
        pending = nxt
    if pending is not None:
        yield pending


def prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - reraised on the main thread
            err.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def synthetic_regression_batch(batch_size: int, n_anchors: int = 96,
                               crop_hw: tuple[int, int] = (192, 256), seed: int = 0) -> dict:
    """Statistically plausible fake batch (for tests, benchmarks, overfit runs)."""
    rng = np.random.default_rng(seed)
    dist = rng.gamma(0.3, 1.0, (batch_size, n_anchors)).astype(np.float32)
    dist /= dist.sum(1, keepdims=True)
    rgb = rng.uniform(0.4, 0.7, (batch_size, 3)).astype(np.float32)
    rgb /= np.linalg.norm(rgb, axis=1, keepdims=True)
    return {
        "crop": rng.random((batch_size, *crop_hw, 3), dtype=np.float32),
        "distribution": dist,
        "intensity": rng.uniform(0.2, 2.0, batch_size).astype(np.float32),
        "rgb_ratio": rgb,
        "ambient": rng.uniform(0, 0.05, (batch_size, 3)).astype(np.float32),
    }


def synthetic_projector_batch(batch_size: int, n_anchors: int = 128,
                              crop_size: int = 128, env_hw: tuple[int, int] = (128, 256),
                              seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    dist = rng.gamma(0.3, 1.0, (batch_size, n_anchors)).astype(np.float32)
    dist /= dist.sum(1, keepdims=True)
    rgb = rng.uniform(0.4, 0.7, (batch_size, 3)).astype(np.float32)
    rgb /= np.linalg.norm(rgb, axis=1, keepdims=True)
    return {
        "crop": rng.random((batch_size, crop_size, crop_size, 3), dtype=np.float32),
        "warped": rng.random((batch_size, *env_hw, 3), dtype=np.float32),
        "map": (rng.random((batch_size, *env_hw)) > 0.9).astype(np.float32),
        "distribution": dist,
        "intensity": rng.uniform(0.2, 2.0, batch_size).astype(np.float32),
        "rgb_ratio": rgb,
        "ambient": rng.uniform(0, 0.05, (batch_size, 3)).astype(np.float32),
        "alpha": rng.uniform(0.5, 2.0, batch_size).astype(np.float32),
    }
