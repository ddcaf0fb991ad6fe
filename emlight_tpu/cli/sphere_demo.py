"""Omnidirectional-digits demo (the vendored OmniMNIST capability).

Mirrors the reference demo main (GenProjector/models/networks/spherenet/
dataset.py:171-216): project digits onto the sphere with the same
augmentation flags and dump PNGs. Adds --train N: a small SphereCNN
classifier (SphereConv2D + SphereMaxPool2D, the modules the SPADE stack's
distortion-aware convs build on) trained on the projected digits — the
end-to-end exercise the reference's vendored spherenet never shipped.

  python -m emlight_tpu.cli.sphere_demo --idx 0 1 2 --out_dir /tmp/demo
  python -m emlight_tpu.cli.sphere_demo --train 300 --batch 32
  python -m emlight_tpu.cli.sphere_demo --mnist_root /data/mnist --train 300
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--idx", nargs="+", default=None, help="indices to dump as PNGs")
    ap.add_argument("--out_dir", default="/tmp/sphere_demo")
    ap.add_argument("--mnist_root", default=None,
                    help="directory with MNIST idx(.gz) files; synthetic "
                         "procedural digits when absent")
    ap.add_argument("--fov", type=float, default=120.0)
    ap.add_argument("--outshape", default="60,60")
    ap.add_argument("--flip", action="store_true")
    ap.add_argument("--h_rotate", action="store_true")
    ap.add_argument("--v_rotate", action="store_true")
    ap.add_argument("--fix_aug", action="store_true")
    ap.add_argument("--train", type=int, default=0, metavar="STEPS",
                    help="train the SphereCNN classifier this many steps")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n_synth", type=int, default=2048)
    args = ap.parse_args(argv)

    import numpy as np

    from ..nn.sphere_demo import OmniDigits, load_mnist_idx, synthetic_digits

    if args.mnist_root:
        images, labels = load_mnist_idx(args.mnist_root, train=True)
    else:
        images, labels = synthetic_digits(args.n_synth)
    oh, ow = (int(x) for x in args.outshape.split(","))
    ds = OmniDigits(images, labels, fov=args.fov, outshape=(oh, ow),
                    flip=args.flip, h_rotate=args.h_rotate,
                    v_rotate=args.v_rotate, fix_aug=args.fix_aug)

    if args.idx:
        import os

        from PIL import Image

        os.makedirs(args.out_dir, exist_ok=True)
        for i in (int(v) for v in args.idx):
            x, label = ds[i]
            path = os.path.join(args.out_dir, f"{i}.png")
            Image.fromarray(np.clip(x[..., 0], 0, 255).astype(np.uint8)).save(path)
            print(path, label)

    if args.train:
        import functools

        import flax.linen as nn
        import jax
        import jax.numpy as jnp
        import optax

        from ..nn.sphere_conv import SphereConv2D, SphereMaxPool2D

        class SphereNet(nn.Module):
            # the upstream sphere_cnn example stack: conv->pool x2, dense head
            @nn.compact
            def __call__(self, x):
                x = nn.relu(SphereConv2D(32, name="conv1")(x))
                x = SphereMaxPool2D(stride=2, name="pool1")(x)
                x = nn.relu(SphereConv2D(64, name="conv2")(x))
                x = SphereMaxPool2D(stride=2, name="pool2")(x)
                return nn.Dense(10, name="fc")(x.reshape(x.shape[0], -1))

        model = SphereNet()
        rng = np.random.default_rng(0)
        x0, _ = ds.batch(range(args.batch))
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x0 / 255.0))
        tx = optax.adam(args.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, y):
            def loss_fn(p):
                logits = model.apply(p, x)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
                return loss, (logits.argmax(-1) == y).mean()

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        for it in range(args.train):
            idx = rng.integers(0, len(ds), args.batch)
            x, y = ds.batch(idx)
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(x / 255.0), jnp.asarray(y))
            if it % 25 == 0 or it == args.train - 1:
                print(f"step {it}: loss {float(loss):.4f} acc {float(acc):.3f}",
                      flush=True)
        return float(acc)


if __name__ == "__main__":
    main()
