"""Neural building blocks (flax.linen, NHWC, bf16-capable)."""

from .unet import UNetModel, nchw_to_nhwc, nhwc_to_nchw, timestep_embedding  # noqa: F401
