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

import contextlib
import contextvars
import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Thread-local (per-context) override of the fused-attention dispatch.  Used by
# callers that must trace a program without the Pallas kernel (e.g. the tp train
# step: GSPMD cannot partition it) without touching process-global state — an
# os.environ toggle would leak into any OTHER jit program tracing concurrently
# in another thread (eval/serve) and silently change its kernel choice.
_FUSED_ATTN_OVERRIDE: contextvars.ContextVar[Optional[bool]] = contextvars.ContextVar(
    "polyff_fused_attn_override", default=None
)


@contextlib.contextmanager
def fused_attention_override(enabled: Optional[bool]):
    """Scope a fused-attention on/off override to the current thread/context."""
    token = _FUSED_ATTN_OVERRIDE.set(enabled)
    try:
        yield
    finally:
        _FUSED_ATTN_OVERRIDE.reset(token)


def _fused_attn_enabled() -> bool:
    import os

    override = _FUSED_ATTN_OVERRIDE.get()
    if override is not None:
        return override
    return os.environ.get("POLYFF_FUSED_ATTN", "1") == "1"


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
    import os

    # bf16 models keep the (B, H, T, T) logits in bf16 — halves the largest
    # intermediate on a bandwidth-bound model (+5% sampling throughput measured);
    # softmax max-subtraction keeps it stable.  POLYFF_FP32_SOFTMAX=1 restores
    # fp32 logits.  fp32 models always use fp32 (the parity-tested path).
    fast = (
        compute_dtype == jnp.bfloat16
        and os.environ.get("POLYFF_FP32_SOFTMAX") != "1"
    )
    acc = jnp.bfloat16 if fast else jnp.float32
    # head-major layout throughout: both matmuls contract on the minor axes with
    # no mid-pipeline transposes (profiles showed (B,H,D,T) transpose fusions)
    qh = jnp.swapaxes(q, 1, 2)  # (B, H, Tq, D)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    attn = jnp.einsum("bhid,bhjd->bhij", qh, kh, preferred_element_type=acc)
    attn = jax.nn.softmax(attn.astype(acc) * jnp.asarray(scale, acc), axis=-1)
    out = jnp.einsum(
        "bhij,bhjd->bhid",
        attn.astype(compute_dtype),
        vh,
        preferred_element_type=acc if fast else jnp.float32,
    )
    return jnp.swapaxes(out, 1, 2)  # (B, Tq, H, D)


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

    # Fused whole-sequence Pallas kernel for the model's short self-attentions:
    # unlike the general flash kernel below (online-softmax tiling, measured
    # slower in round 1) this computes the entire softmax in VMEM and moves
    # only q/k/v/out through HBM.  Opt-out: POLYFF_FUSED_ATTN=0 (or a scoped
    # ``fused_attention_override``).
    if (
        use_flash is None
        and _fused_attn_enabled()
        and jax.default_backend() in ("tpu", "axon")
        and tq == tk
        and tq in (256, 512, 1024)
        and d in (64, 128)
        and tq % 128 == 0
    ):
        from .fused_attention import fused_self_attention_packed

        # (B, T, H, D) -> (B, T, H*D) is a free reshape (minor dims contiguous);
        # the kernel slices heads in VMEM, so no head transposes hit HBM
        out = fused_self_attention_packed(
            q.reshape(b, tq, h * d),
            k.reshape(b, tk, h * d),
            v.reshape(b, tk, h * d),
            scale,
            h,
        )
        return out.reshape(b, tq, h, d)

    if use_flash is None:
        # Measured on v5e: for this model's shapes (seq <= 1024, 4 heads, d 64)
        # XLA's fused einsum attention beats the Pallas flash kernel (10.0 vs 7.0
        # samples/s on the DDIM-50 benchmark, even with full-kv single-block
        # tiling).  Flash is therefore opt-in (POLYFF_FLASH_ATTENTION=1) and
        # only auto-considered for long sequences.
        import os

        force = os.environ.get("POLYFF_FLASH_ATTENTION")
        use_flash = (
            _flash_available()
            and tq % 128 == 0
            and tk % 128 == 0
            and d in (64, 128, 256)
            and (force == "1" or (force is None and tq >= 4096))
        )

    if not use_flash:
        return _einsum_attention(q, k, v, scale, q.dtype).astype(q.dtype)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    # kernel layout is (B, H, T, D); with kv <= 1024 a single full-kv block per
    # q-tile avoids the online-softmax rescaling passes entirely
    bq = min(tq, 512)
    bk = min(tk, 1024)
    blocks = fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = fa.flash_attention(
        qt, kt, vt, causal=False, sm_scale=scale, block_sizes=blocks
    )
    return jnp.swapaxes(out, 1, 2)
