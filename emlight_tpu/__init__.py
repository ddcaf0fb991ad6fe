"""emlight_tpu — a TPU-native (JAX/XLA/Pallas/pjit) lighting-estimation framework.

Re-implements the full capability surface of fnzhan/EMLight (AAAI 2021 EMLight,
TIP 2022 GMLight, ICCV 2021 Sparse Needlets) as an idiomatic TPU framework:

- ``core``           geometry on the sphere, equirectangular grids, HDR I/O, tonemapping
- ``representation`` anchor GT extraction + Gaussian-splat rasterization (the shared
                     differentiable renderer)
- ``losses``         Sinkhorn spherical-transport divergence (jnp reference + fused
                     Pallas TPU kernel), GAN/feature-matching/perceptual losses
- ``nn``             Flax models: DenseNet-BC regressor, distortion-aware SphereConv,
                     SPADE generator, multiscale discriminator
- ``train``          jitted train/eval steps, checkpointing, metrics
- ``dist``           device-mesh construction and sharding helpers (replaces the
                     reference's DataParallel + vendored SyncBN)
- ``needlets``       spherical-harmonic / spherical-needlet frequency bases (healpy-free)
- ``cli``            entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
