"""Fused dequant × matmul Pallas kernels — the TPU replacement for the
reference's iqk GEMM library (iqk_mul_mat.cpp) and CUDA MMQ/MMVQ kernels.

Design (TPU-first, not a translation):
  * weights live in HBM as planar int8 codes + f32 group scales (+bias),
    produced once at load time by quant/planar.py — the analogue of the
    reference's on-the-fly repack to Q8_K_R8 (iqk_mul_mat.cpp:246-308), but
    done once since TPU weights are immutable;
  * the kernel streams (TK, TN) int8 tiles into VMEM, dequantizes on the VPU
    (codes * scale, optionally + bias), feeds bf16 tiles to the MXU, and
    accumulates f32 — HBM traffic is 1 byte/weight + scales instead of 2;
  * grid is (M/TM, N/TN, K/TK) with K innermost so the f32 accumulator
    lives in VMEM scratch across the K sweep.

`qmatmul_ref` is the jnp oracle used by differential tests
(the analogue of test-backend-ops.cpp's CPU-vs-backend comparison).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def qmatmul_ref(x, codes, scale, bias=None, group=32):
    """jnp reference: x (M,K) @ dequant(codes (K,N), scale (K//G,N)) -> (M,N) f32.

    Matches the kernel's numerics: the whole dequant chain runs in bf16
    (int8 codes are exact in bf16; scale/bias rounded once) — measured 7x
    faster than an f32 VPU chain on v5e (160 -> 1100 GB/s weight streaming),
    at <=2^-9 relative weight error, far below the quantization error itself.
    Accumulation stays f32 on the MXU.
    """
    k, n = codes.shape
    w = codes.astype(jnp.bfloat16) * jnp.repeat(scale, group,
                                                axis=0).astype(jnp.bfloat16)
    if bias is not None:
        w = w + jnp.repeat(bias, group, axis=0).astype(jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)


def _make_kernel(group: int, has_bias: bool):
    if has_bias:
        def kernel(x_ref, w_ref, s_ref, b_ref, out_ref, acc_ref):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            tk, tn = w_ref.shape
            w = w_ref[:].astype(jnp.bfloat16).reshape(tk // group, group, tn)
            w = (w * s_ref[:].astype(jnp.bfloat16)[:, None, :]
                 + b_ref[:].astype(jnp.bfloat16)[:, None, :])
            w = w.reshape(tk, tn)
            acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

            @pl.when(k == pl.num_programs(2) - 1)
            def _():
                out_ref[:] = acc_ref[:]
    else:
        def kernel(x_ref, w_ref, s_ref, out_ref, acc_ref):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            tk, tn = w_ref.shape
            w = w_ref[:].astype(jnp.bfloat16).reshape(tk // group, group, tn)
            w = (w * s_ref[:].astype(jnp.bfloat16)[:, None, :]).reshape(tk, tn)
            acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

            @pl.when(k == pl.num_programs(2) - 1)
            def _():
                out_ref[:] = acc_ref[:]
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "block_k", "interpret"),
)
def qmatmul(
    x,
    codes,
    scale,
    bias=None,
    *,
    group: int = 32,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Fused dequant-matmul: (M, K) x int8 (K, N) -> f32 (M, N).

    scale: f32 (K//group, N); bias: optional f32 (K//group, N).
    Pads every dimension to tile multiples; shapes need not be aligned.
    """
    m, k = x.shape
    k2, n = codes.shape
    assert k == k2, (x.shape, codes.shape)
    assert scale.shape == (k // group, n), (scale.shape, (k // group, n))

    bm = min(block_m, _round_up(m, 16))
    bk = min(block_k, _round_up(k, 256))
    bn = min(block_n, _round_up(n, 128))
    mp, kp, np_ = _round_up(m, bm), _round_up(k, bk), _round_up(n, bn)

    x = x.astype(jnp.bfloat16)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        codes = jnp.pad(codes, ((0, kp - k), (0, np_ - n)))
        scale = jnp.pad(scale, ((0, (kp - k) // group), (0, np_ - n)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, (kp - k) // group), (0, np_ - n)))

    grid = (mp // bm, np_ // bn, kp // bk)
    sg = bk // group

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((sg, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
    ]
    args = [x, codes, scale]
    if bias is not None:
        in_specs.append(pl.BlockSpec((sg, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM))
        args.append(bias)

    out = pl.pallas_call(
        _make_kernel(group, bias is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + (kp // group) * np_ * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


# ---------------------------------------------------------------------------
# int4-packed fused dequant-matmul: 4-bit-class formats (Q4_0/Q4_K/IQ4_NL/
# IQ4_XS/...) whose planar codes take <= 16 distinct values are re-packed at
# load into 4-bit indices, two per byte along K — HALF the weight traffic of
# the int8 planar layout, which is the whole game for bandwidth-bound token
# generation (the analogue of the reference's native 4-bit MMVQ kernels,
# ggml-cuda/mmvq.cu).
#
# Layout: packed (K/2, N) uint8 with idx[2i] | idx[2i+1] << 4. The even/odd
# K columns of x are pre-split OUTSIDE the kernel (cheap: activations are
# tiny next to weights), so the in-kernel unpack needs no lane interleave:
#   acc += x_even @ deq(lo) + x_odd @ deq(hi)
# The 16-entry codebook is applied with a 4-level select tree on the VPU.
# ---------------------------------------------------------------------------

def _lut16_select(idx, lut16):
    """idx uint8 in [0,16) -> f32 values via a 4-level select tree (TPU has
    no cheap 16-entry vector gather)."""
    out = None
    # binary select tree over the 4 index bits
    v = [jnp.float32(x) for x in lut16]
    b0 = (idx & 1) != 0
    b1 = (idx & 2) != 0
    b2 = (idx & 4) != 0
    b3 = (idx & 8) != 0
    lvl0 = [jnp.where(b0, v[i + 1], v[i]) for i in range(0, 16, 2)]
    lvl1 = [jnp.where(b1, lvl0[i + 1], lvl0[i]) for i in range(0, 8, 2)]
    lvl2 = [jnp.where(b2, lvl1[i + 1], lvl1[i]) for i in range(0, 4, 2)]
    return jnp.where(b3, lvl2[1], lvl2[0])


def _make_kernel4(group: int, has_bias: bool, lut16):
    def kernel(*refs):
        if has_bias:
            xe_ref, xo_ref, w_ref, s_ref, b_ref, out_ref, acc_ref = refs
        else:
            xe_ref, xo_ref, w_ref, s_ref, out_ref, acc_ref = refs
            b_ref = None
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        tk2, tn = w_ref.shape
        g2 = group // 2
        # Mosaic prefers i32 for the bit plumbing; the narrow load is what
        # matters for HBM traffic
        packed = w_ref[:].astype(jnp.int32)
        s = s_ref[:].astype(jnp.bfloat16)[:, None, :]
        if b_ref is not None:
            b = b_ref[:].astype(jnp.bfloat16)[:, None, :]
        for half, shift in ((0, 0), (1, 4)):
            idx = (packed >> shift) & 0x0F
            if lut16 is None:
                w = (idx - 8).astype(jnp.bfloat16)
            else:
                w = _lut16_select(idx, lut16).astype(jnp.bfloat16)
            w = w.reshape(tk2 // g2, g2, tn) * s
            if b_ref is not None:
                w = w + b
            w = w.reshape(tk2, tn)
            x = (xe_ref if half == 0 else xo_ref)[:]
            acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:]
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("group", "lut16", "block_m", "block_n", "block_k",
                     "interpret"),
)
def qmatmul4(
    x,
    packed,
    scale,
    bias=None,
    *,
    group: int = 32,
    lut16: tuple | None = None,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
):
    """x (M, K) @ dequant(packed 4-bit (K//2, N)) -> f32 (M, N).

    lut16: 16 codebook values (tuple, static) or None for idx-8 (Q4_0-class).
    scale/bias: f32 (K//group, N) like qmatmul.
    """
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (x.shape, packed.shape)
    assert scale.shape == (k // group, n)
    assert group % 2 == 0

    bm = min(block_m, _round_up(m, 16))
    bk = min(block_k, _round_up(k, 512))
    bn = min(block_n, _round_up(n, 128))
    mp, kp, np_ = _round_up(m, bm), _round_up(k, bk), _round_up(n, bn)

    x = x.astype(jnp.bfloat16)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        packed = jnp.pad(packed, ((0, (kp - k) // 2), (0, np_ - n)))
        scale = jnp.pad(scale, ((0, (kp - k) // group), (0, np_ - n)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, (kp - k) // group), (0, np_ - n)))

    # split x into even/odd K columns once (matches packed nibble order)
    xe = x[:, 0::2]
    xo = x[:, 1::2]

    grid = (mp // bm, np_ // bn, kp // bk)
    bk2 = bk // 2
    sg = bk // group

    in_specs = [
        pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((sg, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
    ]
    args = [xe, xo, packed, scale]
    if bias is not None:
        in_specs.append(pl.BlockSpec((sg, bn), lambda i, j, kk: (kk, j),
                                     memory_space=pltpu.VMEM))
        args.append(bias)

    out = pl.pallas_call(
        _make_kernel4(group, bias is not None, lut16),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ // 2
            + (kp // group) * np_ * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def qmatmul4_ref(x, packed, scale, bias=None, *, group=32, lut16=None):
    """jnp oracle for qmatmul4 (same numerics contract as qmatmul_ref)."""
    k2, n = packed.shape
    lo = (packed & 0x0F).astype(np.uint8)
    hi = (packed >> 4).astype(np.uint8)
    idx = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
    if lut16 is None:
        w = (idx.astype(jnp.int8) - 8).astype(jnp.bfloat16)
    else:
        w = jnp.asarray(np.asarray(lut16, np.float32))[idx].astype(jnp.bfloat16)
    w = w * jnp.repeat(scale, group, axis=0).astype(jnp.bfloat16)
    if bias is not None:
        w = w + jnp.repeat(bias, group, axis=0).astype(jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)


def pack_int4(codes: np.ndarray):
    """Opportunistically pack planar int8 codes (K, N) into 4-bit indices.

    Returns (packed (K//2, N) uint8, lut16 tuple | None) or None when the
    tensor is not 4-bit-packable (more than 16 distinct code values, or odd
    K). lut16 None means values are idx-8 (Q4_0-class)."""
    k = codes.shape[0]
    if k % 2:
        return None
    vals = np.unique(codes)
    if vals.size > 16:
        return None
    if vals.min() >= -8 and vals.max() <= 7 and vals.size > 12:
        # dense [-8,7] range: store idx = code + 8, no codebook
        idx = (codes.astype(np.int16) + 8).astype(np.uint8)
        lut = None
    else:
        lut16 = np.full(16, float(vals[-1]), np.float32)
        lut16[:vals.size] = vals.astype(np.float32)
        idx = np.searchsorted(vals, codes).astype(np.uint8)
        lut = tuple(float(v) for v in lut16)
    packed = (idx[0::2] | (idx[1::2] << 4)).astype(np.uint8)
    return packed, lut


# ---------------------------------------------------------------------------
# int8 x int8 MXU matmul with supergroup scale correction
# ---------------------------------------------------------------------------
# The per-weight dequant chain (convert + scale-mul on the VPU) tops out at
# ~300-350 G weights/s on v5e (PERF_NOTES.md) — well under the 819 GB/s HBM
# stream. This path removes the per-weight VPU work entirely, the TPU
# analogue of the reference's Q8_K activation quantization + int8 SIMD dots
# (iqk_mul_mat.cpp:246-308):
#   * weights re-coded ONCE at load: per-(supergroup-256, column) scale
#     S (K/256, N) bf16 + int8 codes q8 = round(w / S * 127)
#   * activations quantized per (row, supergroup) to int8 on the fly
#   * kernel: int32 <- int8 @ int8 on the MXU (2x bf16 MXU rate), then
#     acc += (sx outer sw) * partial per supergroup — 2 VPU ops per OUTPUT
#     per supergroup instead of 2 per WEIGHT.
# Per-group-32 bias formats (Q4_1/Q5_1/...) add their bias term outside the
# kernel as groupsum(x) @ bias — a K/32-deep dense matmul, ~3% extra work.

SUPERGROUP = 256


def requant_supergroup(codes: np.ndarray, scale: np.ndarray,
                       group: int = 32):
    """Planar (int8 codes (K,N), f32/bf16 scales (K/G,N)) -> supergroup int8.

    Returns (q8 (K, N) int8, sw (K/SG, N) f32). Exact values w = s*q are
    re-quantized against the per-supergroup absmax; error <= S/254 — far
    below the 4/5/6-bit quantization step the codes came from."""
    k, n = codes.shape
    w = codes.astype(np.float32) * np.repeat(
        np.asarray(scale, np.float32), group, axis=0)
    wg = w.reshape(k // SUPERGROUP, SUPERGROUP, n)
    s = np.abs(wg).max(axis=1) / 127.0            # (K/SG, N)
    s_safe = np.where(s > 0, s, 1.0)
    q8 = np.rint(wg / s_safe[:, None, :]).astype(np.int8).reshape(k, n)
    return q8, s.astype(np.float32)


def quantize_activations(x, sg: int = SUPERGROUP):
    """x (M, K) -> (int8 (M, K), f32 (M, K/sg)) per-(row, supergroup)."""
    m, k = x.shape
    xf = x.astype(jnp.float32).reshape(m, k // sg, sg)
    s = jnp.max(jnp.abs(xf), axis=2) / 127.0
    s_safe = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(xf / s_safe[:, :, None]), -127, 127)
    return q.astype(jnp.int8).reshape(m, k), s


@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul_i8(x_q, x_s, codes, sw, *, interpret: bool = False):
    """int8 (M,K) @ int8 (K,N) -> f32 (M,N) with supergroup corrections.

    x_s: f32 (M, K/256); sw: f32 (K/256, N). K must be a multiple of 256.

    Pure XLA by design: the supergroup-batched native int8 dot_general
    streams weight codes at HBM peak on v5e (824 GB/s measured at M=16,
    tools/microbench_decode.py) — faster than any hand-written Pallas
    pipeline tried (535 GB/s) and 2x the MXU rate of bf16 for prefill.
    The (nsg, M, N) int32 partials are tiny next to the weight stream and
    XLA fuses the (sx outer sw) correction into the consumer."""
    m, k = x_q.shape
    k2, n = codes.shape
    assert k == k2 and k % SUPERGROUP == 0
    if m < 8:
        # M=1 (decode-scan) int8 dots collapse to ~80 GB/s on v5e (the MXU
        # needs >= 8 sublanes); zero-padding M to 8 restores the full
        # ~720 GB/s stream — 9x — for the cost of 7 dead rows
        # (tools/microbench_i8m.py)
        pad = 8 - m
        x_q = jnp.pad(x_q, ((0, pad), (0, 0)))
        x_s = jnp.pad(x_s, ((0, pad), (0, 0)))
        return qmatmul_i8(x_q, x_s, codes, sw, interpret=interpret)[:m]
    nsg = k // SUPERGROUP
    xg = x_q.reshape(m, nsg, SUPERGROUP).transpose(1, 0, 2)   # (G, M, SG)
    wg = codes.reshape(nsg, SUPERGROUP, n)                    # (G, SG, N)
    parts = jax.lax.dot_general(
        xg, wg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                     # (G, M, N)
    return jnp.einsum("gmn,mg,gn->mn", parts.astype(jnp.float32),
                      x_s.astype(jnp.float32), sw.astype(jnp.float32))


def _make_kernel_i8(nsg_blk: int):
    def kernel(xq_ref, xst_ref, w_ref, sw_ref, out_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # per-supergroup int8 MXU dots with rank-1 f32 scale correction:
        # 2 VPU ops per OUTPUT per supergroup, MXU at its doubled int8 rate
        for g in range(nsg_blk):
            part = jax.lax.dot_general(
                xq_ref[:, g * SUPERGROUP:(g + 1) * SUPERGROUP],
                w_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            corr = xst_ref[g, :][:, None] * sw_ref[g, :][None, :]
            acc_ref[:] += part.astype(jnp.float32) * corr

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = acc_ref[:]
    return kernel


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret"))
def qmatmul_i8_mxu(x_q, x_s_t, codes, sw, *, block_m: int = 512,
                   block_n: int = 512, block_k: int = 2048,
                   interpret: bool = False):
    """Pallas int8 (M,K) @ int8 (K,N) -> f32 (M,N), supergroup corrections.

    The LARGE-M (prefill) variant of qmatmul_i8: the XLA einsum formulation
    is fast standalone but collapses inside full model graphs at M >= 256
    (XLA materializes the (G, M, N) int32 partials when the consumer chain
    is non-trivial — PP512 8040 -> 3580 t/s measured). This kernel keeps
    the f32 accumulator in VMEM scratch across the K sweep, so partials
    never touch HBM, and runs the MXU at its doubled int8 rate — the TPU
    analogue of the reference's Q8_K int8 GEMM (iqk_mul_mat.cpp:246-308).

    x_s_t: f32 (K/256, M) — the activation scales TRANSPOSED so the
    per-supergroup slice lands on the sublane dim (lane-dim dynamic
    slicing is not supported by Mosaic). block_k must be a multiple of
    256 with block_k/256 >= 8 (scale-block sublane alignment).
    """
    m, k = x_q.shape
    k2, n = codes.shape
    assert k == k2 and k % SUPERGROUP == 0
    assert x_s_t.shape == (k // SUPERGROUP, m)

    bm = min(block_m, _round_up(m, 128))
    bk = min(block_k, _round_up(k, 2048))
    bn = min(block_n, _round_up(n, 128))
    mp, kp, np_ = _round_up(m, bm), _round_up(k, bk), _round_up(n, bn)
    nsg_blk = bk // SUPERGROUP

    if (mp, kp) != (m, k):
        x_q = jnp.pad(x_q, ((0, mp - m), (0, kp - k)))
    if x_s_t.shape != (kp // SUPERGROUP, mp):
        x_s_t = jnp.pad(x_s_t, ((0, kp // SUPERGROUP - k // SUPERGROUP),
                                (0, mp - m)))
    if (kp, np_) != (k, n):
        codes = jnp.pad(codes, ((0, kp - k), (0, np_ - n)))
        sw = jnp.pad(sw, ((0, (kp - k) // SUPERGROUP), (0, np_ - n)))

    grid = (mp // bm, np_ // bn, kp // bk)
    out = pl.pallas_call(
        _make_kernel_i8(nsg_blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsg_blk, bm), lambda i, j, kk: (kk, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsg_blk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_
            + (kp // SUPERGROUP) * (mp + np_) * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_q, x_s_t, codes, sw)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


# in-model prefill dispatch threshold: below this M the XLA einsum
# formulation streams weights at HBM peak (tools/microbench_i8m.py); at or
# above it the einsum's (G, M, N) int32 partials can materialize inside
# fused model graphs, so the Pallas MXU kernel takes over
I8_MXU_MIN_M = 256


def qmatmul_i8_ref(x_q, x_s, codes, sw):
    """jnp oracle for qmatmul_i8 (exact integer dot + f32 corrections)."""
    m, k = x_q.shape
    nsg = k // SUPERGROUP
    xg = x_q.astype(jnp.int32).reshape(m, nsg, SUPERGROUP)
    wg = codes.astype(jnp.int32).reshape(nsg, SUPERGROUP, -1)
    part = jnp.einsum("mgs,gsn->mgn", xg, wg).astype(jnp.float32)
    return jnp.einsum("mgn,mg,gn->mn", part, x_s.astype(jnp.float32),
                      sw.astype(jnp.float32))
