"""Pallas kernel: fused RePaint step epilogue.

One inpainting step does, after the UNet eps call (reference semantics,
``sampler_sdf.py:80-171`` + ``:292-341``):

    x0        = a * x - b * eps
    mean      = c * x0 + d * x
    x_unknown = mean + e * p_noise
    x_known   = f * orig + g * q_noise
    out       = x_known * mask + x_unknown * (1 - mask)

That is 7 elementwise tensors flowing through ~9 ops.  XLA fuses this chain well
(measured neutral), but as an explicitly scheduled alternative this kernel does the
whole update in ONE VMEM pass per tile: 5 tensor reads, 1 write, zero intermediate
HBM traffic — the "fused mask re-noising" epilogue from the build plan.  Enable in
the DDPM paint loop with ``POLYFF_PALLAS_EPILOGUE=1``.

The kernel tiles over flattened (batch*time, pitch*channels) planes; scalars ride
in SMEM.  Tested against the jnp composition in interpreter mode (CPU) and usable
unchanged on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue_kernel(
    scalars_ref,  # SMEM (7,): a, b, c, d, e, f, g
    x_ref,
    eps_ref,
    p_noise_ref,
    orig_ref,
    q_noise_ref,
    mask_ref,
    out_ref,
):
    a = scalars_ref[0]
    b = scalars_ref[1]
    c = scalars_ref[2]
    d = scalars_ref[3]
    e = scalars_ref[4]
    f = scalars_ref[5]
    g = scalars_ref[6]

    x = x_ref[:]
    x0 = a * x - b * eps_ref[:]
    x_unknown = c * x0 + d * x + e * p_noise_ref[:]
    x_known = f * orig_ref[:] + g * q_noise_ref[:]
    m = mask_ref[:]
    out_ref[:] = x_known * m + x_unknown * (1.0 - m)


def fused_repaint_epilogue(
    x: jnp.ndarray,
    eps: jnp.ndarray,
    p_noise: jnp.ndarray,
    orig: jnp.ndarray,
    q_noise: jnp.ndarray,
    mask: jnp.ndarray,
    scalars: jnp.ndarray,  # (7,) float32: a,b,c,d,e,f,g
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply the fused RePaint update over NHWC tensors of identical shape."""
    shape = x.shape
    n = x.size
    # flatten to (rows, 128)-aligned planes for clean VPU tiling
    lane = 128
    assert n % lane == 0, shape
    rows = n // lane
    row_tile = min(rows, 512)
    while rows % row_tile:
        row_tile //= 2

    def flat(t):
        return t.reshape(rows, lane).astype(jnp.float32)

    tensor_spec = pl.BlockSpec(
        (row_tile, lane), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _epilogue_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, lane), jnp.float32),
        grid=(rows // row_tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [tensor_spec] * 6,
        out_specs=tensor_spec,
        interpret=interpret,
    )(
        scalars.astype(jnp.float32),
        flat(x),
        flat(eps),
        flat(p_noise),
        flat(orig),
        flat(q_noise),
        flat(mask),
    )
    return out.reshape(shape).astype(x.dtype)


def repaint_epilogue_reference(x, eps, p_noise, orig, q_noise, mask, scalars):
    """The plain-jnp composition the kernel must match (the sampler's default path)."""
    a, b, c, d, e, f, g = [scalars[i] for i in range(7)]
    x0 = a * x - b * eps
    x_unknown = c * x0 + d * x + e * p_noise
    x_known = f * orig + g * q_noise
    return x_known * mask + x_unknown * (1.0 - mask)


@functools.cache
def pallas_epilogue_enabled() -> bool:
    import os

    return os.environ.get("POLYFF_PALLAS_EPILOGUE") == "1"
