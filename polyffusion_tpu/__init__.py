"""Polyffusion-TPU: a TPU-native (JAX/XLA/Pallas/pjit) polyphonic music diffusion framework.

A ground-up rebuild of the capabilities of the Polyffusion system (ISMIR 2023,
reference implementation at aik2mlj/polyffusion) designed TPU-first:

- pure-functional models (flax.linen) over NHWC piano-roll "images",
- whole denoising loops compiled on-device with ``lax.scan``,
- bf16 mixed precision on the MXU, fp32 master weights,
- data parallelism via ``jax.sharding.Mesh`` + jit shardings over ICI,
- host-side NumPy data pipeline with pitch-shift augmentation.

Subpackages
-----------
utils       representation codecs (nmat/prmat/prmat2c/pnotree/chord) + MIDI IO
data        npz song datasets, batching, augmentation, host->device feeding
chord       rule-based chord recognizer (template DP) + chord label codec
models      neural nets: SD-style UNet, plain DDPM UNet, GRU VAE encoders/decoders
diffusion   beta schedules, q/p processes, DDPM/DDIM samplers with CFG + RePaint
tasks       trainable task wrappers with the uniform ``loss_fn(params, batch, rng)`` contract
train       training runtime: optax/orbax, jitted steps, loops, schedulers
parallel    device mesh construction and sharding policies
ops         TPU kernels (fused attention; Pallas)
convert     PyTorch checkpoint -> JAX parameter converters
"""

__version__ = "0.1.0"
