"""Attention dispatch: Pallas flash attention on TPU, einsum elsewhere.

The UNet's self-attention operates on 1024- and 256-token sequences.  The einsum
path materializes (B, heads, T, T) fp32 logits — at sampling batch sizes that is
gigabytes of HBM traffic per step.  The Pallas flash kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) tiles the softmax in VMEM and
never materializes the logits.

Cross-attention with short conditioning sequences (n_cond of 1..128) stays on the
einsum path — the logits are tiny and the flash kernel needs >=128 kv tokens.

The einsum path is the numerical reference (fp32 softmax); tests pin the flash
path against it on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.cache
def _flash_available() -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401

        return True
    except Exception:
        return False


def _einsum_attention(q, k, v, scale, compute_dtype):
    attn = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum(
        "bhij,bjhd->bihd",
        attn.astype(compute_dtype),
        v,
        preferred_element_type=jnp.float32,
    )


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    *,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """(B, Tq, H, D) x (B, Tk, H, D) -> (B, Tq, H, D).

    ``use_flash=None`` auto-selects: flash on TPU for sequences the kernel tiles
    well (Tq and Tk multiples of 128, D in {64, 128, 256}).
    """
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if use_flash is None:
        use_flash = (
            _flash_available()
            and tq % 128 == 0
            and tk % 128 == 0
            and d in (64, 128, 256)
        )

    if not use_flash:
        return _einsum_attention(q, k, v, scale, q.dtype).astype(q.dtype)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    # kernel layout is (B, H, T, D)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = fa.flash_attention(qt, kt, vt, causal=False, sm_scale=scale)
    return jnp.swapaxes(out, 1, 2)
