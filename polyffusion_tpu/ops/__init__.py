"""TPU kernels and fused ops."""

from .attention import multihead_attention  # noqa: F401
