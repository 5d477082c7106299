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


# ---------------------------------------------------------------------------
# 6-bit KV codec — the -ctk/-ctv q6_0 analogue (the reference's preferred
# "nearly-q8 quality at 0.75 bytes" cache type, iqk_flash_attn.cpp:121-149).
# The reference packs 6-bit codes inside 32-element blocks; a TPU-native
# layout must keep full lane density, so the code is split BIT-WISE into two
# planes stored in ONE uint8 row of width 3D/4:
#   * bytes [0, D/2): the LOW 4 bits, packed exactly like the q4 codec
#     (low nibble = dims [0, D/2), high nibble = dims [D/2, D))
#   * bytes [D/2, 3D/4): the HIGH 2 bits, four dims per byte: byte j holds
#     dims j, j+D/4, j+D/2, j+3D/4 at bit pairs 0, 2, 4, 6
# code = (hi2 << 4 | lo4) - 32 in [-31, 31]; per-(token, head) absmax scale.
# Unpacking is all full-width shifts/masks on the VPU — no lane gathers —
# and the single-array layout reuses every q4 cache/kernel plumbing path
# (codecs are told apart by the stored width: D/2 = q4, 3D/4 = q6).
# ---------------------------------------------------------------------------

def quantize_kv_rows_q6(x):
    """x: (B, T, H, D) float -> (uint8 packed (B, T, H, 3*D//4),
    f32 scales (B, T, H)). D % 4 == 0."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 31.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -31, 31
                 ).astype(jnp.int32) + 32                 # [1, 63]
    lo = q & 0x0F
    hi = q >> 4                                           # [0, 3]
    plane4 = lo[..., :d // 2] | (lo[..., d // 2:] << 4)
    q4 = d // 4
    plane2 = (hi[..., 0 * q4:1 * q4]
              | (hi[..., 1 * q4:2 * q4] << 2)
              | (hi[..., 2 * q4:3 * q4] << 4)
              | (hi[..., 3 * q4:4 * q4] << 6))
    return jnp.concatenate([plane4, plane2], axis=-1).astype(jnp.uint8), scale


def unpack_kv_q6(packed):
    """(..., 3*D//4) uint8 -> int32 codes (..., D) in [-31, 31]."""
    w = packed.shape[-1]
    d = (w * 4) // 3
    p4 = packed[..., :d // 2].astype(jnp.int32)
    p2 = packed[..., d // 2:].astype(jnp.int32)
    lo = jnp.concatenate([p4 & 0x0F, p4 >> 4], axis=-1)           # (..., D)
    hi = jnp.concatenate([(p2 >> s) & 3 for s in (0, 2, 4, 6)], axis=-1)
    return (hi << 4 | lo) - 32


def dequantize_kv_q6(packed, scale):
    """Inverse of quantize_kv_rows_q6 -> float32 (..., D)."""
    return unpack_kv_q6(packed).astype(jnp.float32) * scale[..., None]


# ---------------------------------------------------------------------------
# nl4: IQ4_NL-class non-linear 4-bit KV codec — the tail of the reference's
# FA cache-type set (iqk_flash_attn.cpp:121-149 accepts IQ4_NL K/V behind
# GGML_IQK_FA_ALL_QUANTS). Same packed-nibble layout and per-(token, head)
# absmax scale as the q4 codec, but the 16 code points are the IQ4_NL
# value table instead of the uniform [-8, 7] grid: the non-uniform grid
# spends its levels where normally-distributed activations live, so nl4
# is strictly tighter than q4 at identical memory.
# Stored as **int8** of width D/2 (q4/q6 are uint8): every dispatch in the
# framework tells KV codecs apart purely by (dtype, stored width), so nl4
# needs a distinct signature — int8 @ D/2 vs q8's int8 @ D.
# ---------------------------------------------------------------------------

# the IQ4_NL level table — on-disk format constant (gguf spec,
# reference ggml/src/ggml-quants.c kvalues_iq4nl)
IQ4NL_VALUES = (-127, -104, -83, -65, -49, -35, -22, -10,
                1, 13, 25, 38, 53, 69, 89, 113)
# decision boundaries for nearest-value rounding (midpoints)
_IQ4NL_MIDS = tuple((IQ4NL_VALUES[i] + IQ4NL_VALUES[i + 1]) / 2.0
                    for i in range(15))


def lut16_select(codes, table=IQ4NL_VALUES):
    """codes int32 in [0, 16) -> float32 values via a binary select tree.

    TPU Pallas has no small-array gather; 15 full-width VPU selects are
    noise next to the HBM stream the FA kernel is bound by, and the same
    expression works identically under jit/XLA."""
    def rec(lo, hi):
        if hi - lo == 1:
            return jnp.float32(table[lo])
        mid = (lo + hi) // 2
        return jnp.where(codes < mid, rec(lo, mid), rec(mid, hi))
    return rec(0, len(table))


def quantize_kv_rows_nl4(x):
    """x: (B, T, H, D) float -> (int8 packed (B, T, H, D//2),
    f32 scales (B, T, H)). Nearest-IQ4_NL-value rounding; the scale is
    SIGNED so the largest-|x| element maps exactly onto kvalues[0] = -127
    (the reference's d = max/kvalues[0] trick, ggml-quants.c
    quantize_row_iq4_nl_impl) — the asymmetric grid tops out at +113, so
    an unsigned scale would waste up to 14 code units on the positive
    extreme."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    pos = jnp.max(xf, axis=-1)
    neg = jnp.min(xf, axis=-1)
    m = jnp.where(pos >= -neg, pos, neg)          # signed extreme
    scale = m / -127.0
    nz = scale != 0
    inv = jnp.where(nz, 1.0 / jnp.where(nz, scale, 1.0), 0.0)
    t = xf * inv[..., None]                       # extreme -> -127
    code = sum((t > m).astype(jnp.int32) for m in _IQ4NL_MIDS)
    lo, hi = code[..., :d // 2], code[..., d // 2:]
    packed = lo | (hi << 4)                       # [0, 255] bit pattern
    return (packed - (packed & 0x80) * 2).astype(jnp.int8), scale


def unpack_kv_nl4(packed):
    """(..., D//2) int8 -> float32 LUT values (..., D) in [-127, 113]."""
    p = packed.astype(jnp.int32) & 0xFF
    return jnp.concatenate([lut16_select(p & 0x0F),
                            lut16_select((p >> 4) & 0x0F)], axis=-1)


def dequantize_kv_nl4(packed, scale):
    """Inverse of quantize_kv_rows_nl4 -> float32 (..., D)."""
    return unpack_kv_nl4(packed) * scale[..., None]


# ---------------------------------------------------------------------------
# Codec registry — the single source of truth for telling KV codecs apart
# by their stored (dtype, width) signature. Every consumer (cache write,
# attention dequant, kshift requant, FA kernel mode pick) dispatches here.
# ---------------------------------------------------------------------------

KV_ENCODERS = {"q8": quantize_kv_rows, "q4": quantize_kv_rows_q4,
               "q6": quantize_kv_rows_q6, "nl4": quantize_kv_rows_nl4}
KV_DECODERS = {"q8": dequantize_kv, "q4": dequantize_kv_q4,
               "q6": dequantize_kv_q6, "nl4": dequantize_kv_nl4}


def kv_codec_of(codes, head_dim):
    """Identify the codec of a cache codes array by dtype + stored width.

    codes: (..., W) int8/uint8 cache array; head_dim: logical D."""
    w = codes.shape[-1]
    if codes.dtype == jnp.uint8:
        return "q6" if 4 * w == 3 * head_dim else "q4"
    return "nl4" if 2 * w == head_dim else "q8"


# ---------------------------------------------------------------------------
# K/V Hadamard rotation — the -khad/-vhad analogue (reference
# ggml-cuda/hadamard.cu, GGML_OP_HADAMARD): rotate K (and q, so scores are
# unchanged: Hq . Hk = q . k) and/or V (un-rotated after attention) by a
# normalized Sylvester-Hadamard matrix before quantize-on-write. The
# rotation spreads per-channel outliers across the whole head dim, taming
# the absmax scales of the row codecs above. H is symmetric orthogonal
# (H = H^T = H^-1), so the same matrix un-rotates.
# ---------------------------------------------------------------------------

_HADAMARD_CACHE: dict = {}


def hadamard_matrix(d):
    """Normalized d x d Sylvester-Hadamard (d must be a power of two)."""
    m = _HADAMARD_CACHE.get(d)
    if m is None:
        assert d > 0 and (d & (d - 1)) == 0, \
            f"Hadamard rotation needs a power-of-two head_dim, got {d}"
        import numpy as np
        h = np.array([[1.0]], dtype=np.float32)
        while h.shape[0] < d:
            h = np.block([[h, h], [h, -h]])
        # cached as a HOST constant: a jnp array created under jit would be
        # a leaked tracer when reused in a later trace
        m = (h / np.sqrt(d)).astype(np.float32)
        _HADAMARD_CACHE[d] = m
    return m


def hadamard_rotate(x):
    """Rotate the trailing head-dim axis: (..., D) @ H_D, f32 internally."""
    hm = hadamard_matrix(x.shape[-1])
    return (x.astype(jnp.float32) @ hm).astype(x.dtype)
