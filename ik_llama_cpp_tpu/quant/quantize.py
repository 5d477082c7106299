"""Quantizers: float32 rows -> GGUF quant bytes (numpy, vectorized).

Encode-side counterpart of dequant.py. Decoding is bit-exact by contract;
encoding matches the reference's *quality* contract (round-trip RMSE and
dot-product error thresholds from tests/test-quantize-fns.cpp:17-23) and, for
the simple formats (Q8_0/Q4_0/Q5_0/Q6_0/IQ4_NL/Q8_KV), the exact reference
algorithm (ggml-quants.c quantize_row_*_ref).

All functions take (nrows, n) float32 and return uint8 bytes in GGUF row
layout; optional `imatrix` is a per-column weight vector (n,) like the
reference's importance matrix.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, GEOMETRY, QK_K
from . import luts
from .dequant import dequantize


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """ggml's nearest_int: round-half-to-even (same as np.rint)."""
    return np.rint(x).astype(np.int32)


def _f16_bytes(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16).view(np.uint8)


# ---------------------------------------------------------------------------
# legacy formats
# ---------------------------------------------------------------------------

def quantize_q8_0(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(axis=1, keepdims=True)
    d = amax / 127.0
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    q = _nearest_int(x * id_).clip(-128, 127).astype(np.int8)
    out = np.empty((x.shape[0], 34), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d[:, 0]).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def quantize_q4_0(x: np.ndarray, imatrix=None) -> np.ndarray:
    """ggml-quants.c quantize_row_q4_0_ref: d = signed-max / -8, offset-8 nibbles."""
    x = x.reshape(-1, 32).astype(np.float32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]
    d = maxv / -8.0
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    xi = (x * id_[:, None] + 8.5).astype(np.int32).clip(0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d).reshape(-1, 2)
    out[:, 2:] = xi[:, :16] | (xi[:, 16:] << 4)
    return out.reshape(-1)


def quantize_q5_0(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]
    d = maxv / -16.0
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    xi = (x * id_[:, None] + 16.5).astype(np.int32).clip(0, 31).astype(np.uint32)
    lo = (xi & 0x0F).astype(np.uint8)
    out = np.empty((x.shape[0], 22), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d).reshape(-1, 2)
    qh = np.zeros((x.shape[0],), dtype=np.uint32)
    for j in range(16):
        qh |= ((xi[:, j] >> 4) & 1) << j
        qh |= ((xi[:, j + 16] >> 4) & 1) << (j + 16)
    out[:, 2:6] = qh[:, None].view(np.uint8).reshape(-1, 4)
    out[:, 6:] = lo[:, :16] | (lo[:, 16:] << 4)
    return out.reshape(-1)


def quantize_q6_0(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]
    d = maxv / -32.0
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    xi = (x * id_[:, None] + 32.5).astype(np.int32).clip(0, 63).astype(np.uint8)
    out = np.empty((x.shape[0], 26), dtype=np.uint8)
    out[:, :2] = _f16_bytes(d).reshape(-1, 2)
    # qh[j%8] packs bits 4..5 of xi[j] at 4*(j/8) for j in 0..15 (both halves)
    h0 = (xi[:, :16] >> 4) & 3     # elements 0..15
    h1 = (xi[:, 16:] >> 4) & 3     # elements 16..31
    hcat = np.concatenate([h0, h1], axis=1)  # "j" order 0..15 maps to (qs j), 16..31 not used directly
    # dequant reads: h = qh[j%8] >> 4*(j/8) for j in 0..15, giving bits for
    # (lo j) via (h<<4)&0x30 and (hi j) via (h<<2)&0x30 — i.e. qh[j%8] holds
    # lo-bits at nibble j/8*4 (bits 4-5 of lo) and hi-bits (bits 4-5 of hi)<<2?
    # Recheck: x0 = lo | ((h<<4)&0x30) -> h bits 0-1; x1 = hi | ((h<<2)&0x30) -> h bits 2-3.
    qh = np.zeros((x.shape[0], 8), dtype=np.uint8)
    for j in range(16):
        byte = j % 8
        sh = 4 * (j // 8)
        qh[:, byte] |= (h0[:, j] << sh) | (h1[:, j] << (sh + 2))
    out[:, 2:10] = qh
    out[:, 10:] = (xi[:, :16] & 0x0F) | ((xi[:, 16:] & 0x0F) << 4)
    return out.reshape(-1)


def quantize_iq4_nl(x: np.ndarray, imatrix=None) -> np.ndarray:
    """Non-linear 4-bit: per-32 block scale fitted to the kvalues LUT.

    Follows the reference search (iqk best_index + ntry scale refinement,
    ggml-quants.c quantize_row_iq4_nl_impl behavior): initial d = max/
    values[0], then a weighted least-squares re-fit.
    """
    x = x.reshape(-1, 32).astype(np.float32)
    vals = luts.KVALUES_IQ4NL.astype(np.float32)  # (16,)
    nb = x.shape[0]
    amax = np.abs(x).max(axis=1)
    signed_max = x[np.arange(nb), np.abs(x).argmax(axis=1)]
    d = np.where(amax > 0, signed_max / vals[0], 0.0)
    w = (x * x) if imatrix is None else np.broadcast_to(imatrix.reshape(-1, 32), x.shape)
    best_d = d.copy()
    # iterative refinement: quantize with candidate scale, re-fit scale by WLS
    for _ in range(7):
        id_ = np.where(best_d != 0, 1.0 / np.where(best_d != 0, best_d, 1), 0.0)
        q = np.abs(vals[None, None, :] - (x * id_[:, None])[:, :, None]).argmin(axis=2)
        v = vals[q]
        sumqx = (w * v * x).sum(axis=1)
        sumq2 = (w * v * v).sum(axis=1)
        new_d = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), best_d)
        if np.allclose(new_d, best_d):
            break
        best_d = new_d
    d16 = best_d.astype(np.float16)
    id_ = np.where(d16 != 0, 1.0 / np.where(d16 != 0, d16.astype(np.float32), 1), 0.0)
    q = np.abs(vals[None, None, :] - (x * id_[:, None])[:, :, None]).argmin(axis=2).astype(np.uint8)
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, :2] = d16.view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def quantize_q8_kv(x: np.ndarray, imatrix=None) -> np.ndarray:
    """Per-row int8 (iqk_quantize.cpp:8327 quantize_row_q8_KV): 8B header + int8."""
    x = np.atleast_2d(x).astype(np.float32)
    nrows, n = x.shape
    amax = np.abs(x).max(axis=1)
    d = np.where(amax > 0, amax / 127.0, 0.0).astype(np.float32)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    q = _nearest_int(x * id_[:, None]).clip(-128, 127).astype(np.int8)
    out = np.empty((nrows, 8 + n), dtype=np.uint8)
    out[:, 0:4] = d[:, None].view(np.uint8).reshape(-1, 4)
    # second header float: reference stores int32 sum of quants for fast dot
    s = q.astype(np.int32).sum(axis=1, dtype=np.int32)
    out[:, 4:8] = s[:, None].view(np.uint8).reshape(-1, 4)
    out[:, 8:] = q.view(np.uint8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# k-quants — weighted grid search equivalent to make_qx_quants /
# make_qkx2_quants (quality contract; see module docstring)
# ---------------------------------------------------------------------------

def _make_qx_quants(x: np.ndarray, nmax: int, w: np.ndarray):
    """Symmetric per-group scale fit: returns (scale, q) with q in [-nmax, nmax-1].

    Mirrors ggml-quants.c make_qx_quants (rmse_type=1): candidate scales
    swept around max/nmax, weighted-LS refined.
    """
    amax = np.abs(x).max(axis=-1)
    smax = np.take_along_axis(x, np.abs(x).argmax(axis=-1)[..., None], axis=-1)[..., 0]
    d0 = np.where(amax > 0, -smax / nmax, 0.0)
    best_d = d0.copy()
    best_err = np.full(x.shape[:-1], np.inf, dtype=np.float64)
    for is_ in range(-9, 10):
        d_try = np.where(amax > 0, -(nmax + 0.1 * is_) / np.where(smax != 0, smax, 1), 0.0)
        d_try = np.where(d_try != 0, 1.0 / d_try, 0.0)  # candidate scale
        id_ = np.where(d_try != 0, 1.0 / np.where(d_try != 0, d_try, 1), 0.0)
        q = _nearest_int(x * id_[..., None]).clip(-nmax, nmax - 1)
        sumqx = (w * q * x).sum(axis=-1)
        sumq2 = (w * q * q).sum(axis=-1)
        d_fit = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), d_try)
        err = (w * (x - d_fit[..., None] * q) ** 2).sum(axis=-1)
        upd = err < best_err
        best_err = np.where(upd, err, best_err)
        best_d = np.where(upd, d_fit, best_d)
    id_ = np.where(best_d != 0, 1.0 / np.where(best_d != 0, best_d, 1), 0.0)
    q = _nearest_int(x * id_[..., None]).clip(-nmax, nmax - 1)
    return best_d, q


def _make_qkx_quants(x: np.ndarray, nmax: int, w: np.ndarray):
    """Asymmetric fit x ~= d*q - m, q in [0, nmax]: returns (d, m, q)."""
    xmin = np.minimum(x.min(axis=-1), 0.0)
    xmax = np.maximum(x.max(axis=-1), 0.0)
    scale = (xmax - xmin) / nmax
    best_d = scale.copy()
    best_m = -xmin
    best_err = None
    for it in range(16):
        d = np.where(scale > 0, scale * (1.0 + 0.01 * (it - 8)), 0.0)
        id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
        q = _nearest_int((x - xmin[..., None]) * id_[..., None]).clip(0, nmax)
        # weighted LS for (d, m) jointly given q
        sw = w.sum(axis=-1)
        sx = (w * x).sum(axis=-1)
        sq = (w * q).sum(axis=-1)
        sqx = (w * q * x).sum(axis=-1)
        sq2 = (w * q * q).sum(axis=-1)
        det = sw * sq2 - sq * sq
        d_fit = np.where(det > 0, (sw * sqx - sx * sq) / np.where(det > 0, det, 1), d)
        m_fit = np.where(det > 0, (sq2 * sx - sq * sqx) / np.where(det > 0, det, 1), xmin)
        err = (w * (d_fit[..., None] * q + m_fit[..., None] - x) ** 2).sum(axis=-1)
        if best_err is None:
            best_err, best_d, best_m = err, d_fit, -m_fit
        else:
            upd = err < best_err
            best_err = np.where(upd, err, best_err)
            best_d = np.where(upd, d_fit, best_d)
            best_m = np.where(upd, -m_fit, best_m)
    id_ = np.where(best_d > 0, 1.0 / np.where(best_d > 0, best_d, 1), 0.0)
    q = _nearest_int((x + best_m[..., None]) * id_[..., None]).clip(0, nmax)
    return best_d, best_m, q


def _weights(x: np.ndarray, imatrix, group: int) -> np.ndarray:
    """Per-element weights like the reference: imatrix * (sigma2-regularized |x|).

    x: (nblocks, nsub, group) where consecutive blocks tile the rows;
    imatrix: per-row-column weights (n_per_row,) or None.
    """
    sigma2 = 2.0 * np.mean(np.square(x), axis=(-1, -2), keepdims=True)
    base = np.sqrt(sigma2 + x * x)
    if imatrix is not None:
        im = np.asarray(imatrix, np.float32).reshape(-1)
        per_block = x.shape[-1] * x.shape[-2]
        reps = (x.shape[0] * per_block) // im.size
        im_full = np.tile(im, reps).reshape(x.shape)
        base = base * im_full
    return base


def quantize_q4_K(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 8, 32)
    w = _weights(g, imatrix, 32)
    d_, m_, q = _make_qkx_quants(g, 15, w)  # (nb,8)
    dmax = d_.max(axis=1)
    mmax = m_.max(axis=1)
    inv_d = np.where(dmax > 0, 63.0 / dmax, 0.0)
    inv_m = np.where(mmax > 0, 63.0 / mmax, 0.0)
    ls = _nearest_int(inv_d[:, None] * d_).clip(0, 63).astype(np.uint8)
    lm = _nearest_int(inv_m[:, None] * m_).clip(0, 63).astype(np.uint8)
    d_super = (dmax / 63.0).astype(np.float16)
    m_super = (mmax / 63.0).astype(np.float16)
    # pack 6-bit scale/min pairs (inverse of get_scale_min_k4)
    scales = np.zeros((nb, 12), dtype=np.uint8)
    scales[:, 0:4] = ls[:, 0:4] & 63
    scales[:, 4:8] = lm[:, 0:4] & 63
    scales[:, 8:12] = (ls[:, 4:8] & 0x0F) | ((lm[:, 4:8] & 0x0F) << 4)
    scales[:, 0:4] |= (ls[:, 4:8] >> 4) << 6
    scales[:, 4:8] |= (lm[:, 4:8] >> 4) << 6
    # requantize with the coded scales
    dd = d_super.astype(np.float32)[:, None] * ls.astype(np.float32)
    mm = m_super.astype(np.float32)[:, None] * lm.astype(np.float32)
    id_ = np.where(dd > 0, 1.0 / np.where(dd > 0, dd, 1), 0.0)
    q = _nearest_int((g + mm[:, :, None]) * id_[:, :, None]).clip(0, 15).astype(np.uint8)
    out = np.empty((nb, 144), dtype=np.uint8)
    out[:, 0:2] = d_super.view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = m_super.view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = scales
    qs = out[:, 16:]
    for c in range(4):
        qs[:, c * 32:(c + 1) * 32] = q[:, 2 * c] | (q[:, 2 * c + 1] << 4)
    return out.reshape(-1)


def quantize_q5_K(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 8, 32)
    w = _weights(g, imatrix, 32)
    d_, m_, q = _make_qkx_quants(g, 31, w)
    dmax, mmax = d_.max(axis=1), m_.max(axis=1)
    inv_d = np.where(dmax > 0, 63.0 / dmax, 0.0)
    inv_m = np.where(mmax > 0, 63.0 / mmax, 0.0)
    ls = _nearest_int(inv_d[:, None] * d_).clip(0, 63).astype(np.uint8)
    lm = _nearest_int(inv_m[:, None] * m_).clip(0, 63).astype(np.uint8)
    d_super = (dmax / 63.0).astype(np.float16)
    m_super = (mmax / 63.0).astype(np.float16)
    scales = np.zeros((nb, 12), dtype=np.uint8)
    scales[:, 0:4] = ls[:, 0:4] & 63
    scales[:, 4:8] = lm[:, 0:4] & 63
    scales[:, 8:12] = (ls[:, 4:8] & 0x0F) | ((lm[:, 4:8] & 0x0F) << 4)
    scales[:, 0:4] |= (ls[:, 4:8] >> 4) << 6
    scales[:, 4:8] |= (lm[:, 4:8] >> 4) << 6
    dd = d_super.astype(np.float32)[:, None] * ls.astype(np.float32)
    mm = m_super.astype(np.float32)[:, None] * lm.astype(np.float32)
    id_ = np.where(dd > 0, 1.0 / np.where(dd > 0, dd, 1), 0.0)
    q = _nearest_int((g + mm[:, :, None]) * id_[:, :, None]).clip(0, 31).astype(np.uint8)
    out = np.zeros((nb, 176), dtype=np.uint8)
    out[:, 0:2] = d_super.view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = m_super.view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = scales
    qh = out[:, 16:48]
    qs = out[:, 48:]
    for c in range(4):
        lo1, lo2 = q[:, 2 * c] & 0x0F, q[:, 2 * c + 1] & 0x0F
        qs[:, c * 32:(c + 1) * 32] = lo1 | (lo2 << 4)
        qh[:, :] |= ((q[:, 2 * c] >> 4) << (2 * c)) | ((q[:, 2 * c + 1] >> 4) << (2 * c + 1))
    return out.reshape(-1)


def quantize_q6_K(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    w = _weights(g, imatrix, 16)
    d_, q = _make_qx_quants(g, 32, w)  # q in [-32,31]
    amax_scale = np.abs(d_).max(axis=1)
    iscale = np.where(amax_scale > 0, -128.0 / np.take_along_axis(
        d_, np.abs(d_).argmax(axis=1)[:, None], axis=1)[:, 0], 0.0)
    d_super = np.where(iscale != 0, 1.0 / np.where(iscale != 0, iscale, 1), 0.0).astype(np.float16)
    ls = _nearest_int(iscale[:, None] * d_).clip(-128, 127).astype(np.int8)
    dd = d_super.astype(np.float32)[:, None] * ls.astype(np.float32)
    id_ = np.where(dd != 0, 1.0 / np.where(dd != 0, dd, 1), 0.0)
    q = (_nearest_int(g * id_[:, :, None]).clip(-32, 31) + 32).astype(np.uint8)
    out = np.empty((nb, 210), dtype=np.uint8)
    qfull = q.reshape(nb, QK_K)
    ql = out[:, 0:128]
    qh = out[:, 128:192]
    for i128 in range(2):
        base = qfull[:, i128 * 128:(i128 + 1) * 128].reshape(nb, 4, 32)
        q1, q2, q3, q4 = base[:, 0], base[:, 1], base[:, 2], base[:, 3]
        ql[:, i128 * 64:i128 * 64 + 32] = (q1 & 0x0F) | ((q3 & 0x0F) << 4)
        ql[:, i128 * 64 + 32:i128 * 64 + 64] = (q2 & 0x0F) | ((q4 & 0x0F) << 4)
        qh[:, i128 * 32:(i128 + 1) * 32] = (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
    out[:, 192:208] = ls.view(np.uint8)
    out[:, 208:210] = d_super.view(np.uint8).reshape(-1, 2)
    return out.reshape(-1)


def quantize_iq4_xs(x: np.ndarray, imatrix=None) -> np.ndarray:
    """IQ4_XS: 8×32 blocks, 6-bit scales, shared fp16 super-scale, NL codebook."""
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 8, 32)
    vals = luts.KVALUES_IQ4NL.astype(np.float32)
    w = _weights(g, imatrix, 32)
    # per-block scale fit against NL codebook
    amax = np.abs(g).max(axis=-1)
    smax = np.take_along_axis(g, np.abs(g).argmax(axis=-1)[..., None], axis=-1)[..., 0]
    d = np.where(amax > 0, smax / vals[0], 0.0)
    for _ in range(5):
        id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
        q = np.abs(vals[None, None, None, :] - (g * id_[..., None])[..., None]).argmin(axis=-1)
        v = vals[q]
        sumqx = (w * v * g).sum(axis=-1)
        sumq2 = (w * v * v).sum(axis=-1)
        d = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), d)
    dmax = np.abs(d).max(axis=1)
    smax_d = np.take_along_axis(d, np.abs(d).argmax(axis=1)[:, None], axis=1)[:, 0]
    iscale = np.where(dmax > 0, -32.0 / np.where(smax_d != 0, smax_d, 1), 0.0)
    d_super = np.where(iscale != 0, 1.0 / iscale, 0.0).astype(np.float16)
    ls = (_nearest_int(iscale[:, None] * d).clip(-32, 31) + 32).astype(np.uint8)  # [0,63]
    dd = d_super.astype(np.float32)[:, None] * (ls.astype(np.float32) - 32.0)
    id_ = np.where(dd != 0, 1.0 / np.where(dd != 0, dd, 1), 0.0)
    q = np.abs(vals[None, None, None, :] - (g * id_[..., None])[..., None]).argmin(axis=-1).astype(np.uint8)
    out = np.zeros((nb, 136), dtype=np.uint8)
    out[:, 0:2] = d_super.view(np.uint8).reshape(-1, 2)
    sh = np.zeros((nb,), dtype=np.uint16)
    for ib in range(8):
        sh |= ((ls[:, ib].astype(np.uint16) >> 4) & 3) << (2 * ib)
        if ib % 2 == 0:
            out[:, 4 + ib // 2] |= ls[:, ib] & 0x0F
        else:
            out[:, 4 + ib // 2] |= (ls[:, ib] & 0x0F) << 4
    out[:, 2:4] = sh[:, None].view(np.uint8).reshape(-1, 2)
    qs = out[:, 8:]
    for ib in range(8):
        qs[:, 16 * ib:16 * (ib + 1)] = q[:, ib, :16] | (q[:, ib, 16:] << 4)
    return out.reshape(-1)


def quantize_f16(x: np.ndarray, imatrix=None) -> np.ndarray:
    return x.astype(np.float16).view(np.uint8).reshape(-1)


def quantize_bf16(x: np.ndarray, imatrix=None) -> np.ndarray:
    u = x.astype(np.float32).view(np.uint32)
    # round-to-nearest-even on the mantissa cut
    rounded = ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(np.uint16)
    return rounded.view(np.uint8).reshape(-1)


def quantize_f32(x: np.ndarray, imatrix=None) -> np.ndarray:
    return x.astype(np.float32).view(np.uint8).reshape(-1)


from .quantize_iqk import IQK_QUANTIZE_FNS  # noqa: E402  (cycle-free)
from .quantize_kt import KT_QUANTIZE_FNS  # noqa: E402
from .quantize_extra import EXTRA_QUANTIZE_FNS  # noqa: E402
from .quantize_iquants import IQUANT_QUANTIZE_FNS  # noqa: E402

QUANTIZE_FNS = {
    **IQK_QUANTIZE_FNS,
    **KT_QUANTIZE_FNS,
    **EXTRA_QUANTIZE_FNS,
    **IQUANT_QUANTIZE_FNS,
    GGMLType.F32: quantize_f32,
    GGMLType.F16: quantize_f16,
    GGMLType.BF16: quantize_bf16,
    GGMLType.Q4_0: quantize_q4_0,
    GGMLType.Q5_0: quantize_q5_0,
    GGMLType.Q6_0: quantize_q6_0,
    GGMLType.Q8_0: quantize_q8_0,
    GGMLType.Q4_K: quantize_q4_K,
    GGMLType.Q5_K: quantize_q5_K,
    GGMLType.Q6_K: quantize_q6_K,
    GGMLType.IQ4_NL: quantize_iq4_nl,
    GGMLType.IQ4_XS: quantize_iq4_xs,
    GGMLType.Q8_KV: quantize_q8_kv,
}


def quantize(x: np.ndarray, ggml_type: GGMLType, imatrix=None) -> np.ndarray:
    fn = QUANTIZE_FNS.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"quantize: unsupported ggml type {ggml_type!r}")
    n = x.shape[-1]
    out = fn(x, imatrix)
    expect = GEOMETRY[ggml_type].row_bytes(n) * (x.size // n)
    assert out.size == expect, (ggml_type, out.size, expect)
    return out


def roundtrip(x: np.ndarray, ggml_type: GGMLType, imatrix=None) -> np.ndarray:
    """quantize -> dequantize (for error measurement)."""
    n = x.shape[-1]
    return dequantize(quantize(x, ggml_type, imatrix), ggml_type, n).reshape(x.shape)


def quantize_iq2_bn(arr2d):
    """BitNet 2.0 bpw ternary encode (quantize_one_row_2bn): per row, scale =
    max |x|; trits by 0.5*max threshold; 4 bit-planes of 2-bit codes."""
    import numpy as np
    from ..gguf.constants import GEOMETRY, GGMLType
    rows, n = arr2d.shape
    geo = GEOMETRY[GGMLType.IQ2_BN]
    out = np.zeros((rows, geo.row_bytes(n)), np.uint8)
    for r in range(rows):
        x = arr2d[r]
        mx = float(np.abs(x).max())
        out[r, :4] = np.frombuffer(np.float32(mx).tobytes(), np.uint8)
        thresh = 0.5 * mx
        trits = np.where(x < -thresh, 0, np.where(x > thresh, 2, 1)).astype(np.uint8)
        tb = trits.reshape(-1, 4, 16)      # (NB, plane, 16)
        packed = (tb[:, 0] | (tb[:, 1] << 2) | (tb[:, 2] << 4) | (tb[:, 3] << 6))
        out[r, 4:] = packed.reshape(-1)
    return out


def quantize_iq1_bn(arr2d):
    """BitNet 1.625 bpw ternary encode (quantize_one_row_1bn): base-3 pack
    of 5 trits/byte (x3 per 16-group) + extra byte for the 16th trits."""
    import numpy as np
    from ..gguf.constants import GEOMETRY, GGMLType
    k_nb = [1, 3, 9, 27, 81]
    rows, n = arr2d.shape
    geo = GEOMETRY[GGMLType.IQ1_BN]
    out = np.zeros((rows, geo.row_bytes(n)), np.uint8)
    for r in range(rows):
        x = arr2d[r]
        mx = float(np.abs(x).max())
        out[r, :2] = np.frombuffer(np.float16(mx).tobytes(), np.uint8)
        thresh = 0.5 * mx
        trits = np.where(x < -thresh, 0, np.where(x > thresh, 2, 1)).astype(np.int64)
        tb = trits.reshape(-1, 4, 16)
        body = out[r, 2:].reshape(-1, 13)
        for ib in range(tb.shape[0]):
            extra = 0
            for i16 in range(4):
                grp = tb[ib, i16]
                for k in range(3):
                    idx = sum(int(grp[5 * k + j]) * k_nb[j] for j in range(5))
                    # encode so that decode's ((v+(v>>1))>>7) recovers trits:
                    # value stored = ceil(idx*256/243) per the reference L1
                    body[ib, 3 * i16 + k] = (idx * 256 + 242) // 243
                extra += int(grp[15]) * k_nb[i16]
            body[ib, 12] = (extra * 256 + 242) // 243
    return out
