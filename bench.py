"""Headline benchmark: crop -> 128-anchor regression + env-map reconstruction.

Measures steady-state images/sec/chip and p50 single-image latency of the
flagship inference pipeline (BASELINE.json config #1 metric) on the available
accelerator, and compares against the reference-equivalent PyTorch pipeline
(same DenseNet architecture + per-light splat loop) executed on this host's
CPU — the only reference hardware present in this environment; the reference
repo publishes no GPU numbers (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: compiles through this image's remote
# compile service cost minutes; cache them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emlight_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


# bf16 matmul peak FLOP/s per chip, by jax device_kind. MFU is reported
# against the bf16 MXU ceiling regardless of compute dtype — it answers
# "distance to the hardware roofline", not "distance to a dtype-matched peak".
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # Trillium / v6e
}


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    return _PEAK_FLOPS.get(kind, 197e12), kind


def _compiled_flops(jitted, *args):
    """FLOPs of one call from XLA's compiled cost analysis (None if opaque)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def bench_tpu(batch_size: int = 128, iters: int = 30, warmup: int = 3):
    # throughput saturates at batch 128 on v5e (64 -> 175 img/s, 128 -> 292,
    # 256 -> 293.7): the DenseNet's small channel counts underfill the MXU
    # regardless of batch beyond 128
    import jax
    import jax.numpy as jnp

    from emlight_tpu.config import AnchorConfig, RegressionConfig
    from emlight_tpu.representation import render_anchor_params
    from emlight_tpu.train import regression as R

    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=128),
        dtype="bfloat16",  # inference compute dtype; params stay f32
    )
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    eval_apply = R.make_eval_apply(cfg)  # default concat-free buffer forward
    P, S = state.params, state.batch_stats

    # Weights as jaxpr CONSTANTS (train/regression.py::make_baked_infer, the
    # deployment/serving configuration): XLA folds BN affines + pre-lays-out
    # kernels. 585 vs 390 img/s measured against weights-as-arguments on a
    # v5e (1.5x) — the args variant is reported alongside.
    def fn_of(params, batch_stats, crop):
        pred = eval_apply({"params": params, "batch_stats": batch_stats}, crop, train=False)
        dist = jax.nn.softmax(pred["distribution"], axis=-1)
        env = render_anchor_params(
            dist, pred["intensity"][:, 0], pred["rgb_ratio"], pred["ambient"],
            n=128, intensity_scale=cfg.anchors.intensity_scale,
        )
        # device-side checksum: fetching this scalar is the only reliable
        # completion barrier through the tunneled runtime (block_until_ready
        # does not actually block on the axon plugin)
        return env, jnp.sum(env)

    def fn(params, batch_stats, crop):
        return fn_of(params, batch_stats, crop)

    def sync(out):
        return float(out[1])

    def make_loop(n):
        # host->device dispatch over the tunneled runtime costs ~0.5s/call, so
        # the measured loop runs ON DEVICE: n forwards chained through a
        # checksum accumulator (prevents elision), one dispatch, one fetch.
        @jax.jit
        def run_n(crop):
            def body(acc, _):
                # fold the accumulator into the input so iterations can't be CSE'd
                _, s = fn_of(P, S, crop + acc * 1e-30)
                return acc + s, None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return total
        return run_n

    rng = np.random.default_rng(0)
    crop = jnp.asarray(rng.random((batch_size, cfg.crop_h, cfg.crop_w, 3), dtype=np.float32))
    run = make_loop(iters)
    for _ in range(warmup):
        float(run(crop))
    t0 = time.perf_counter()
    float(run(crop))
    dt = time.perf_counter() - t0
    throughput = batch_size * iters / dt

    # weights-as-arguments variant (generic-checkpoint path): same graph, the
    # weights arrive as runtime buffers
    @jax.jit
    def run_args(params, batch_stats, crop):
        def body(acc, _):
            _, s = fn_of(params, batch_stats, crop + acc * 1e-30)
            return acc + s, None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return total

    args_throughput = None
    try:
        for _ in range(2):
            float(run_args(P, S, crop))
        t0 = time.perf_counter()
        float(run_args(P, S, crop))
        args_throughput = batch_size * iters / (time.perf_counter() - t0)
    except Exception as e:
        print(f"# args-mode flagship failed: {e!r}", file=sys.stderr)

    # reference-shaped DenseNet.apply (cli --eval_apply standard); reported
    # alongside the default concat-free path so regressions in either surface.
    # Demoted variants (BN fold, slab grouping) stayed slower on chip and live
    # only in scripts/ (BASELINE.md rounds 3-4).
    std_throughput = None
    try:
        std_apply = R.make_model(cfg).apply  # the reference-shaped flax graph

        def fn_std(params, batch_stats, crop):
            pred = std_apply({"params": params, "batch_stats": batch_stats}, crop, train=False)
            dist = jax.nn.softmax(pred["distribution"], axis=-1)
            env = render_anchor_params(
                dist, pred["intensity"][:, 0], pred["rgb_ratio"], pred["ambient"],
                n=128, intensity_scale=cfg.anchors.intensity_scale,
            )
            return env, jnp.sum(env)

        @jax.jit
        def run_std(params, batch_stats, crop):
            def body(acc, _):
                _, s = fn_std(params, batch_stats, crop + acc * 1e-30)
                return acc + s, None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return total

        for _ in range(2):
            float(run_std(state.params, state.batch_stats, crop))
        t0 = time.perf_counter()
        float(run_std(state.params, state.batch_stats, crop))
        std_throughput = batch_size * iters / (time.perf_counter() - t0)
    except Exception as e:
        print(f"# standard-apply inference variant failed: {e!r}", file=sys.stderr)

    # MFU: FLOPs of one forward (cost analysis of the single-step jit) over
    # measured step time, against the chip's bf16 MXU peak
    step_flops = _compiled_flops(jax.jit(fn), state.params, state.batch_stats, crop)
    peak, _kind = _peak_flops()
    mfu = (step_flops * iters / dt) / peak * 100 if step_flops else None

    # per-image latency, batch 1, on-device (tunnel RTT excluded)
    crop1 = crop[:1]
    run1 = make_loop(50)
    float(run1(crop1))
    t0 = time.perf_counter()
    float(run1(crop1))
    p50_ms = (time.perf_counter() - t0) / 50 * 1000
    return throughput, p50_ms, mfu, std_throughput, args_throughput


def bench_torch_reference(batch_size: int = 4, iters: int = 5):
    """Reference-equivalent pipeline in torch on the host CPU."""
    import torch

    from emlight_tpu.train.torch_ref import build_torch_densenet, randomize_densenet

    model = build_torch_densenet()
    randomize_densenet(model)
    model.eval()

    # reference splat (convert_to_panorama semantics): per-light loop
    ln, h, w = 128, 128, 256
    lat = (torch.arange(h, dtype=torch.float32) + 0.5) * (np.pi / h)
    lon = (torch.arange(w, dtype=torch.float32) + 0.5) * (np.pi / h)
    glat, glon = torch.meshgrid(lat, lon, indexing="ij")
    xyz = torch.stack(
        (torch.sin(glat) * torch.cos(glon), torch.sin(glat) * torch.sin(glon), torch.cos(glat))
    ).reshape(3, -1)
    from emlight_tpu.core.geometry import sphere_points

    dirs = torch.from_numpy(sphere_points(ln)).float()

    def splat(colors):  # (B, ln, 3) -> (B, 3, h, w)
        b = colors.shape[0]
        env = torch.zeros((b, 3, h, w))
        for i in range(ln):
            g = torch.exp((dirs[i : i + 1] @ xyz - 1.0) / 0.0025).reshape(1, 1, h, w)
            env = env + colors[:, i, :, None, None] * g
        return env

    x = torch.rand(batch_size, 3, 192, 256)
    with torch.no_grad():
        model.fwd(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            out = model.fwd(x)
            dist = torch.softmax(out["distribution"], dim=-1)
            # reference head is 96-d; pad to 128 anchors for a fair splat cost
            dist = torch.nn.functional.pad(dist, (0, 128 - dist.shape[-1]))
            colors = dist[:, :, None] * out["intensity"][:, :, None] * 500.0 \
                * out["rgb_ratio"][:, None, :]
            splat(colors)
        dt = time.perf_counter() - t0
    return batch_size * iters / dt


def bench_gt_extraction(batch: int = 64, reps: int = 20):
    """Secondary metric: panorama -> anchor-GT extraction, on-device rate and
    speedup vs the reference's per-anchor NumPy loop
    (distribution_representation.py:90-120)."""
    import jax
    import jax.numpy as jnp

    from emlight_tpu.core.geometry import nearest_anchor_index, steradian_map
    from emlight_tpu.representation.extract import _assignment_matrix, _extract

    rng = np.random.default_rng(0)
    hdrs_np = rng.random((batch, 128, 256, 3)).astype(np.float32) * 5
    hdrs_np[:, 40:44, 60:66] = 500.0

    def ref_extract(hdr, ln=128):
        h, w, _ = hdr.shape
        ster = np.sin((np.linspace(0, h, num=h, endpoint=False) + 0.5) / h * np.pi)
        hdr = hdr * ster[:, None, None]
        inten = 0.3 * hdr[..., 0] + 0.59 * hdr[..., 1] + 0.11 * hdr[..., 2]
        mask = (inten > inten.max() * 0.05)[..., None]
        light = hdr * mask
        idx = nearest_anchor_index(h, w, ln)
        anchors = np.zeros((ln, 3))
        for i in range(ln):
            anchors[i] = (light * (idx == i)[..., None]).sum((0, 1))
        e = 0.3 * anchors[:, 0] + 0.59 * anchors[:, 1] + 0.11 * anchors[:, 2]
        return e / e.sum()

    t0 = time.perf_counter()
    for i in range(4):
        ref_extract(hdrs_np[i])
    ref_rate = 4 / (time.perf_counter() - t0)

    hdrs = jnp.asarray(hdrs_np)
    assign = jnp.asarray(_assignment_matrix(128, 256, 128))
    ster = jnp.asarray(steradian_map(128, 256, multiply=False))

    @jax.jit
    def run_n(x):
        def body(acc, _):
            out = jax.vmap(lambda v: _extract(v, assign, ster, 0.05))(x + acc * 1e-30)
            return acc + out["distribution"].sum(), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return total

    float(run_n(hdrs))
    t0 = time.perf_counter()
    float(run_n(hdrs))
    rate = batch * reps / (time.perf_counter() - t0)
    return rate, ref_rate


def bench_gan(batch_size: int = 8, steps: int = 6):
    """GAN train-step (G and D) and generator-synthesis times at flagship
    size (128x256 env maps, ngf=ndf=64, the train_laval.sh architecture),
    measured as on-device scans of the real jitted step bodies with the fused
    Pallas sphere-conv path on, in the recommended production config
    (bf16 conv compute, f32 params/norms/accumulation — BASELINE.md records
    bf16 tracking f32 loss-for-loss through the same number of steps).
    Returns ({step name: ms}, mfu_dict)."""
    import jax
    import jax.numpy as jnp

    from emlight_tpu.config import ProjectorConfig
    from emlight_tpu.train import projector as P
    from emlight_tpu.train.data import synthetic_projector_batch

    cfg = dataclasses.replace(
        ProjectorConfig(), batch_size=batch_size, use_vgg_loss=False,
        dtype="bfloat16",
    )
    state = P.create_state(jax.random.PRNGKey(0), cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_projector_batch(
            batch_size, n_anchors=cfg.anchors.n_anchors,
            crop_size=cfg.crop_size // 2, env_hw=(cfg.crop_size // 2, cfg.crop_size),
        ).items()
    }
    use_pallas = jax.devices()[0].platform == "tpu"

    def scan_steps(body_out_state):
        def run_n(st, b):
            # the same trace-time contexts the trainers use: Pallas kernel
            # dispatch + bf16 conv compute (cfg.dtype), f32 accumulation
            with P.compute_ctx(cfg, use_pallas):
                def body(carry, _):
                    st2, metric = body_out_state(carry, b)
                    return st2, metric
                st, metrics = jax.lax.scan(body, st, None, length=steps)
            return st, metrics
        return run_n

    def g_body(st, b):
        st2, losses, _fake = P._generator_step_body(st, b, cfg, None, None)
        return st2, losses["loss_G"]

    def d_body(st, b):
        st2, metrics = P._discriminator_step_body(st, b, cfg)
        return st2, metrics["loss_D"]

    def fused_body(st, b):
        st2, metrics, _fake = P._fused_gan_step_body(st, b, cfg, None, None)
        return st2, metrics["loss_G"]

    # VGG x5 perceptual term ON (random-init weights: perf-identical to
    # pretrained, which don't exist in this image) — the FULL reference loss
    # (pix2pix_model.py:120); the vgg-less rows above match the production
    # default in this image
    from emlight_tpu.nn.vgg import VGG19Features, random_vgg19_params

    vgg_vars = random_vgg19_params()
    vgg_apply = VGG19Features().apply

    def g_body_vgg(st, b):
        st2, losses, _fake = P._generator_step_body(st, b, cfg, vgg_apply, vgg_vars)
        return st2, losses["loss_G"]

    def fused_body_vgg(st, b):
        st2, metrics, _fake = P._fused_gan_step_body(st, b, cfg, vgg_apply, vgg_vars)
        return st2, metrics["loss_G"]

    # eval-mode synthesis (GenProjector/test.py path), scanned on device
    from emlight_tpu.train.projector import make_guide

    def run_synth(st, b):
        with P.compute_ctx(cfg, use_pallas):
            guide = make_guide(b, cfg)
            variables = {"params": st.g_params, **st.g_stats}

            def body(acc, _):
                fake = st.g_apply(variables, guide + acc * 1e-30, b["crop"], train=False)
                return acc + jnp.sum(fake), None

            total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=steps)
        return total

    # XLA's compiled cost analysis reports 0 FLOPs inside lax.scan bodies and
    # Pallas kernels (both carry the hot ops here), so per-step conv FLOPs are
    # counted exactly at trace time instead (jax.eval_shape: no compile). The
    # scan body traces once -> the count is one step's forward conv FLOPs.
    from emlight_tpu.nn.sphere_conv import count_conv_flops

    def fwd_conv_flops(fn):
        with count_conv_flops() as flops:
            jax.eval_shape(fn, state, batch)
        return flops()

    def time_exec(fn, fetch):
        # compile EXACTLY once (remote compiles cost minutes) and reuse
        compiled = jax.jit(fn).lower(state, batch).compile()
        out = compiled(state, batch)
        float(fetch(out))  # fetch barrier (tunnel-safe completion)
        t0 = time.perf_counter()
        out = compiled(state, batch)
        float(fetch(out))
        return (time.perf_counter() - t0) / steps * 1000

    peak, _kind = _peak_flops()
    g_fwd = fwd_conv_flops(run_synth)  # one eval-mode G forward
    # g_step backprops through G and D (fwd:bwd ~1:2 -> x3 on everything);
    # d_step's G forward is detached, so only the D part costs x3
    step_flops = {
        "g_step": 3.0 * fwd_conv_flops(scan_steps(g_body)),
        "d_step": 3.0 * fwd_conv_flops(scan_steps(d_body)) - 2.0 * g_fwd,
        "synthesis": g_fwd,
    }
    # fused = one G update + one D update sharing the generator forward
    step_flops["fused_step"] = step_flops["g_step"] + step_flops["d_step"] - g_fwd

    # VGG19-to-relu5_1 conv FLOPs at the env-map resolution (count_conv_flops
    # sees only sphere convs; the VGG runs plain XLA convs): fake branch is
    # differentiated (x3), real branch forward-only -> x4 per loss call
    def vgg_fwd_flops(h, w):
        widths = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512, 512]
        pools_after = {2, 4, 8, 12}
        cin, fl = 3, 0.0
        for i, cout in enumerate(widths):
            fl += 2.0 * h * w * 9 * cin * cout
            cin = cout
            if (i + 1) in pools_after:
                h, w = h // 2, w // 2
        return fl

    vgg_call = 4.0 * batch_size * vgg_fwd_flops(cfg.crop_size // 2, cfg.crop_size)
    step_flops["g_step_vgg"] = step_flops["g_step"] + vgg_call
    step_flops["fused_step_vgg"] = step_flops["fused_step"] + vgg_call
    mfu = {}
    results = {}
    for name, fn, fetch in (
        ("g_step", scan_steps(g_body), lambda o: o[1][-1]),
        ("d_step", scan_steps(d_body), lambda o: o[1][-1]),
        ("fused_step", scan_steps(fused_body), lambda o: o[1][-1]),
        ("g_step_vgg", scan_steps(g_body_vgg), lambda o: o[1][-1]),
        ("fused_step_vgg", scan_steps(fused_body_vgg), lambda o: o[1][-1]),
        ("synthesis", run_synth, lambda o: o),
    ):
        ms = time_exec(fn, fetch)
        results[name] = ms
        if step_flops[name]:
            mfu[name] = round(step_flops[name] / (ms / 1000) / peak * 100, 1)
    return results, mfu


def bench_pipeline(batch_size: int = 8, steps: int = 6):
    """Fused end-to-end inference (crop -> regression -> on-device guide
    rasterization -> SPADE generator -> HDR env map) at flagship sizes, the
    train/pipeline.py one-program serving path. The reference has no such
    path at all (two scripts + hand-carried pickles); this measures the cost
    of the WHOLE user-facing pipeline as one device program. Returns ms/batch."""
    import jax
    import jax.numpy as jnp

    from emlight_tpu.config import ProjectorConfig, RegressionConfig
    from emlight_tpu.train import projector as P
    from emlight_tpu.train import regression as R
    from emlight_tpu.train.pipeline import pipeline_inference

    reg_cfg = RegressionConfig()
    proj_cfg = ProjectorConfig()
    reg_state = R.create_state(jax.random.PRNGKey(0), reg_cfg)
    proj_state = P.create_state(jax.random.PRNGKey(1), proj_cfg)
    use_pallas = jax.devices()[0].platform == "tpu"

    rng = np.random.default_rng(0)
    crop_reg = jnp.asarray(
        rng.random((batch_size, reg_cfg.crop_h, reg_cfg.crop_w, 3), dtype=np.float32)
    )
    pin = proj_cfg.crop_size // 2
    crop_proj = jnp.asarray(
        rng.random((batch_size, pin, pin, 3), dtype=np.float32)
    )

    def run_n(rs, ps, cr, cp):
        def body(acc, _):
            env, _pred = pipeline_inference(
                rs, ps, cr + acc * 1e-30, cp, reg_cfg, proj_cfg,
                use_pallas=use_pallas,
            )
            return acc + jnp.sum(env), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=steps)
        return total

    compiled = jax.jit(run_n).lower(reg_state, proj_state, crop_reg, crop_proj).compile()
    float(compiled(reg_state, proj_state, crop_reg, crop_proj))
    t0 = time.perf_counter()
    float(compiled(reg_state, proj_state, crop_reg, crop_proj))
    return (time.perf_counter() - t0) / steps * 1000


def bench_regression_train(batch_size: int = 16, steps: int = 10):
    """Full regression train step (Sinkhorn EMD + L2 losses + Adam) at the
    reference batch size 16 with remat+bf16 — the recommended full-size
    config (f32 bs16 without remat exceeds one 16GB chip, BASELINE.md).
    Returns ms/step."""
    import jax
    import jax.numpy as jnp

    from emlight_tpu.config import AnchorConfig, RegressionConfig
    from emlight_tpu.train import regression as R
    from emlight_tpu.train.data import synthetic_regression_batch

    cfg = dataclasses.replace(
        RegressionConfig(),
        anchors=AnchorConfig(regression_anchors=128),
        batch_size=batch_size, dtype="bfloat16", remat=True,
    )
    state = R.create_state(jax.random.PRNGKey(0), cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_regression_batch(
            batch_size, cfg.anchors.regression_anchors,
            (cfg.crop_h, cfg.crop_w),
        ).items()
    }

    def run_n(st, b):
        def body(carry, _):
            st2, metrics = R.train_step(carry, b, cfg)
            return st2, metrics["loss"]

        return jax.lax.scan(body, st, None, length=steps)

    compiled = jax.jit(run_n).lower(state, batch).compile()
    out = compiled(state, batch)
    float(out[1][-1])
    t0 = time.perf_counter()
    out = compiled(state, batch)
    float(out[1][-1])
    return (time.perf_counter() - t0) / steps * 1000


def bench_sinkhorn(batch: int = 16, n: int = 96, reps: int = 200):
    """Sinkhorn EMD value+grad per loss call (the regression loss at reference
    shapes: bs 16, 96 anchors), XLA scanned-loop backend. A fused Pallas loop
    was benchmarked here in round 2 and removed: 826 vs 305 us at this shape."""
    import jax
    import jax.numpy as jnp

    from emlight_tpu.losses.sinkhorn import SamplesLoss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.gamma(0.3, 1.0, (batch, n)).astype(np.float32))
    y = jnp.asarray(rng.gamma(0.3, 1.0, (batch, n)).astype(np.float32))
    x = x / x.sum(1, keepdims=True)
    y = y / y.sum(1, keepdims=True)
    loss = SamplesLoss("sinkhorn", p=2, blur=0.025, n_anchors=n)

    def run_n(x, y):
        def body(acc, _):
            v, g = jax.value_and_grad(lambda xx: loss(xx + acc * 1e-30, y).sum())(x)
            return acc + v + g.sum(), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return total

    compiled = jax.jit(run_n).lower(x, y).compile()
    float(compiled(x, y))
    t0 = time.perf_counter()
    float(compiled(x, y))
    return (time.perf_counter() - t0) / reps * 1e6


def main():
    throughput, p50_ms, mfu, std_throughput, args_throughput = bench_tpu()
    try:
        ref = bench_torch_reference()
    except Exception:
        ref = None
    try:
        gt_rate, gt_ref = bench_gt_extraction()
    except Exception:
        gt_rate = gt_ref = None
    gan = None
    pipe_ms = None
    if os.environ.get("EMLIGHT_BENCH_GAN", "1") != "0":
        try:
            gan = bench_gan()
        except Exception as e:
            print(f"# bench_gan failed: {e!r}", file=sys.stderr)
        try:
            pipe_ms = bench_pipeline()
        except Exception as e:
            print(f"# bench_pipeline failed: {e!r}", file=sys.stderr)
    try:
        sink_us = bench_sinkhorn()
    except Exception as e:
        print(f"# bench_sinkhorn failed: {e!r}", file=sys.stderr)
        sink_us = None
    reg_train_ms = None
    if os.environ.get("EMLIGHT_BENCH_GAN", "1") != "0":  # same budget knob
        try:
            reg_train_ms = bench_regression_train()
        except Exception as e:
            print(f"# bench_regression_train failed: {e!r}", file=sys.stderr)
    # full-size GSPMD dp x tp capability record (dist/fullsize_check.py):
    # compiled + executed on a virtual 8-device CPU mesh. Expensive (CPU
    # executes a full-size fused G+D step), so the default is to report the
    # committed artifact; EMLIGHT_BENCH_AUTO_FULL=live re-runs it here.
    auto_full = None
    try:
        if os.environ.get("EMLIGHT_BENCH_AUTO_FULL") == "live":
            from emlight_tpu.dist.fullsize_check import run as _auto_run

            auto_full = {**_auto_run(), "source": "live"}
        else:
            here = os.path.dirname(os.path.abspath(__file__))
            art = os.path.join(here, "docs", "AUTO_FULLSIZE.json")
            if os.path.exists(art):
                with open(art) as f:
                    auto_full = {**json.load(f), "source": "committed artifact "
                                 "(docs/AUTO_FULLSIZE.json; re-run with "
                                 "EMLIGHT_BENCH_AUTO_FULL=live)"}
                # staleness flag: any kernel/model/dist source newer than the
                # artifact means its numbers no longer describe this tree
                src_dirs = [os.path.join(here, "emlight_tpu", d)
                            for d in ("nn", "dist", "train")]
                newest = max(
                    (os.path.getmtime(os.path.join(d, f))
                     for d in src_dirs if os.path.isdir(d)
                     for f in os.listdir(d) if f.endswith(".py")),
                    default=0.0,
                )
                if newest > os.path.getmtime(art):
                    auto_full["stale"] = True
                    auto_full["stale_note"] = (
                        "kernel/model source newer than this artifact; "
                        "re-record with EMLIGHT_BENCH_AUTO_FULL=live"
                    )
    except Exception as e:
        print(f"# fullsize_check failed: {e!r}", file=sys.stderr)
    result = {
        "metric": "images/sec/chip (crop->128-anchor regression + env-map recon)",
        "value": round(throughput, 2),
        "unit": "images/sec",
        "vs_baseline": round(throughput / ref, 2) if ref else None,
        "p50_latency_ms_bs1": round(p50_ms, 2),
        "mfu_pct": round(mfu, 2) if mfu else None,
        "weights_as_args_images_per_sec": round(args_throughput, 2) if args_throughput else None,
        "standard_apply_images_per_sec": round(std_throughput, 2) if std_throughput else None,
        "baseline_note": "baseline = reference-equivalent torch pipeline on host CPU (no GPU/published numbers exist)",
        "baseline_images_per_sec": round(ref, 3) if ref else None,
        "gt_extraction_panoramas_per_sec": round(gt_rate, 1) if gt_rate else None,
        "gt_extraction_vs_reference_numpy": round(gt_rate / gt_ref, 1) if gt_rate else None,
    }
    if gan is not None:
        gan_ms, gan_mfu = gan
        result.update(
            gan_g_step_ms_bs8=round(gan_ms["g_step"], 1),
            gan_d_step_ms_bs8=round(gan_ms["d_step"], 1),
            gan_fused_step_ms_bs8=round(gan_ms["fused_step"], 1),
            gan_g_step_vgg_ms_bs8=round(gan_ms["g_step_vgg"], 1),
            gan_fused_step_vgg_ms_bs8=round(gan_ms["fused_step_vgg"], 1),
            gan_synthesis_ms_bs8=round(gan_ms["synthesis"], 1),
            gan_mfu_pct=gan_mfu or None,
            gan_dtype="bfloat16",
            gan_vgg="_vgg rows: VGG x5 term on (random-init weights, "
                    "perf-identical to pretrained); others: off",
        )
    if pipe_ms is not None:
        result["e2e_pipeline_ms_bs8"] = round(pipe_ms, 1)
        result["e2e_pipeline_images_per_sec"] = round(8 / (pipe_ms / 1000), 1)
    if sink_us is not None:
        result["sinkhorn_us_per_call"] = round(sink_us, 1)
    if reg_train_ms is not None:
        result["regression_train_step_ms_bs16"] = round(reg_train_ms, 1)
        result["regression_train_images_per_sec"] = round(16 / (reg_train_ms / 1000), 1)
    if auto_full is not None:
        result["gspmd_fullsize_dp_tp"] = auto_full
    print(json.dumps(result))


if __name__ == "__main__":
    main()
