"""Training-loop infrastructure: metrics, timing, failure detection, summaries.

Upgrades the reference's aux subsystems (SURVEY.md §5):
- print-based loss lines (RegressionNetwork/train.py:106-108,
  GenProjector/util.py:442-447)           -> structured CSV + stdout logger
- IterationCounter wall-clock bookkeeping
  (GenProjector/iter_counter.py:12-74)    -> IterationTimer with p50/p90 and
                                             resume via iter.json
- no failure detection (README.md:31's "reload weights and retrain by hand")
  -> NaNGuard: checks metrics every step, raises with the offending keys
- summary image dumps (train.py:110-145)  -> render_summary: crop | GT env |
                                             pred env strips via the shared
                                             rasterizer + viz tonemap
- jax.profiler trace capture helper (no profiler existed upstream)
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import numpy as np

from ..core.hdr import TONEMAP_VIZ

__all__ = ["MetricsLogger", "IterationTimer", "NaNGuard", "render_summary", "profile_trace"]


class MetricsLogger:
    """Append metric dicts to CSV and (optionally) stdout."""

    def __init__(self, out_dir: str, name: str = "metrics", echo_every: int = 10):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{name}.csv")
        self.echo_every = echo_every
        self._keys: list[str] | None = None
        self._n = 0

    def log(self, step: int, metrics: dict, extra: dict | None = None) -> None:
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if extra:
            row.update(extra)
        if self._keys is None:
            self._keys = list(row)
            if not os.path.exists(self.path):
                with open(self.path, "a") as f:
                    f.write(",".join(self._keys) + "\n")
        with open(self.path, "a") as f:
            f.write(",".join(str(row.get(k, "")) for k in self._keys) + "\n")
        self._n += 1
        if self.echo_every and self._n % self.echo_every == 0:
            parts = ", ".join(f"{k}: {v:.5g}" for k, v in row.items() if k != "step")
            print(f"step {step}: {parts}", flush=True)


class IterationTimer:
    """Tracks epoch/iteration and per-iteration wall time; persists a bookmark
    for --continue_train-style resume (iter_counter.py:20-30,62-65)."""

    def __init__(self, out_dir: str, batch_size: int = 1):
        self.path = os.path.join(out_dir, "iter.json")
        self.batch_size = batch_size
        self.epoch = 0
        self.step = 0
        self._times: list[float] = []
        self._t0: float | None = None

    def resume(self) -> "IterationTimer":
        if os.path.exists(self.path):
            with open(self.path) as f:
                state = json.load(f)
            self.epoch, self.step = state["epoch"], state["step"]
            print(f"resuming from epoch {self.epoch}, step {self.step}")
        return self

    def record(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w") as f:
            json.dump({"epoch": self.epoch, "step": self.step}, f)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)
        self.step += 1
        if len(self._times) > 200:
            self._times = self._times[-200:]

    def add(self, n: int, total_time: float) -> None:
        """Account n iterations that ran inside one dispatch (--scan_steps)."""
        self._times.extend([total_time / n] * n)
        self.step += n
        if len(self._times) > 200:
            self._times = self._times[-200:]

    def stats(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "time_per_iter": float(arr.mean()),
            "time_per_item": float(arr.mean() / self.batch_size),
            "iter_p50_s": float(np.percentile(arr, 50)),
            "iter_p90_s": float(np.percentile(arr, 90)),
        }


class NaNGuard:
    """Raises (with context) when any metric goes non-finite."""

    def __init__(self, patience: int = 0):
        self.patience = patience
        self._bad = 0

    def check(self, step: int, metrics: dict) -> None:
        bad = {k: float(v) for k, v in metrics.items() if not np.isfinite(float(v))}
        if bad:
            self._bad += 1
            if self._bad > self.patience:
                raise FloatingPointError(f"non-finite metrics at step {step}: {bad}")
        else:
            self._bad = 0


def render_summary(crop, dist_pred, dist_gt, intensity_pred, intensity_gt,
                   rgb_pred, rgb_gt, n_anchors: int, out_path: str,
                   intensity_scale: float = 500.0) -> None:
    """crop | GT env | pred env comparison strip (train.py:110-145)."""
    import jax.numpy as jnp
    from PIL import Image

    from ..representation.splat import render_anchor_params

    def env_of(dist, inten, rgb):
        env = render_anchor_params(
            jnp.asarray(dist[None]), jnp.asarray(np.atleast_1d(inten)),
            jnp.asarray(rgb[None]), n=n_anchors, intensity_scale=intensity_scale,
        )
        # untrained nets can predict negative energies; clip before the
        # gamma power (np.power(neg, 1/2.4) is NaN)
        tone, _ = TONEMAP_VIZ(np.maximum(np.asarray(env)[0], 0.0))
        return (tone * 255).astype(np.uint8)

    gt_img = Image.fromarray(env_of(dist_gt, intensity_gt, rgb_gt)).resize((256, 256))
    pred_img = Image.fromarray(env_of(dist_pred, intensity_pred, rgb_pred)).resize((256, 256))
    crop_u8 = Image.fromarray((np.clip(np.asarray(crop), 0, 1) * 255).astype(np.uint8)).resize(
        (256, 256)
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray(
        np.hstack([np.asarray(crop_u8), np.asarray(gt_img), np.asarray(pred_img)])
    ).save(out_path)


@contextlib.contextmanager
def profile_trace(out_dir: str | None):
    """jax.profiler trace context (no-op when out_dir is None)."""
    if out_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
