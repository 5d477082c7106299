"""Quantized KV cache ops — the analogue of the reference's -ctk/-ctv q8_0 /
Q8_KV cache types (quantize-on-write into cache views, llm_build_kv_store,
llama-build-context.cpp:906-960).

Cache layout: int8 values (L, B, S, H, D) + f32 scales (L, B, S, H), one
scale per (token, head) row — the Q8_KV-style per-row codec
(iqk_quantize.h:288-292), which measured best for KV in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_kv_rows(x):
    """x: (B, T, H, D) float -> (int8 values, f32 scales (B, T, H))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q, scale):
    """q: (..., D) int8, scale: (...,) -> float32."""
    return q.astype(jnp.float32) * scale[..., None]


# ---------------------------------------------------------------------------
# 4-bit KV codec — the -ctk/-ctv q4_0 analogue, halving KV memory again.
# Codes are packed two-per-byte with the LOW nibble holding dims [0, D/2)
# and the HIGH nibble dims [D/2, D): kernels can then unpack with two
# half-width dots (no lane interleave), the same split-halves trick as the
# int4 weight kernel (ops/qmatmul.qmatmul4).
# ---------------------------------------------------------------------------

def quantize_kv_rows_q4(x):
    """x: (B, T, H, D) float -> (uint8 packed (B, T, H, D//2),
    f32 scales (B, T, H)). Per-(token, head) absmax over the row."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 7.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -8, 7).astype(jnp.int32) + 8
    lo, hi = q[..., :d // 2], q[..., d // 2:]
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def dequantize_kv_q4(packed, scale):
    """packed: (..., D//2) uint8, scale: (...,) -> float32 (..., D)."""
    p = packed.astype(jnp.int32)
    lo = (p & 0x0F) - 8
    hi = (p >> 4) - 8
    return (jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
            * scale[..., None])
