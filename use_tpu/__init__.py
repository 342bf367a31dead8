"""use_tpu — universal speech enhancement, TPU-native.

A ground-up JAX/XLA/Pallas/pjit framework with the capabilities of
nanless/universal-speech-enhancement (reference mounted at /root/reference):
a universal monaural 24 kHz speech-enhancement system with two trainable
model families (SGMSE score-based diffusion on complex STFTs, and an LSGAN
predictive enhancer trained against a HiFi-GAN-style discriminator bank),
an on-the-fly distortion-simulation data pipeline, and a full train /
eval / predict CLI.

Layout:
    ops/       signal front-end + custom TPU kernels (STFT, upfirdn2d, ...)
    models/    NCSN++ backbone, SGMSE stack (SDEs, samplers), GAN stack
    parallel/  device mesh construction and sharding helpers
    engine/    TrainState, jitted train/eval steps, checkpointing
    data/      distortion-simulation dataset, perturbations, loaders
    utils/     registries, metrics, logging
    config/    dataclass configs + YAML overlay system
    cli/       train / eval / predict entry points
"""

__version__ = "0.1.0"
