"""Encoders for the remaining legacy/k-quant/IQK formats: Q4_1, Q5_1,
MXFP4, Q2_K, Q3_K, IQ4_KSS.

Quality contract (same as quantize.py / quantize_iqk.py): block-vectorized
numpy re-derivations of the reference search algorithms —
ggml-quants.c quantize_row_q4_1_impl (make_qkx3_quants), quantize_row_q2_K_impl
(make_qkx3 + make_qp_quants), quantize_row_q3_K_impl (make_qx_quants),
iqk_quantize.cpp quantize_row_mxfp4_impl and quantize_row_iq4_kss_impl
(IQ4_KS-style LUT scale search + the even-parity prune / xor-prefix packing).
Validated against libggml's ggml_quantize_chunk in tests/test_quantize_extra.py
(round-trip error within 3% of the reference encoder on the same data).
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, GEOMETRY, QK_K
from . import luts
from .quantize import _make_qkx_quants, _make_qx_quants, _nearest_int
from .quantize_iqk import _lut_scale_search, _nearest_idx, _sigma2

_POP16 = np.array([bin(i).count("1") for i in range(16)], np.int32)


def _make_qkx3(g, nmax: int, w, rmin=-0.9, rdelta=0.05, nstep=36):
    """Faithful vectorized make_qkx3_quants (ggml-quants.c:2198), minus the
    final coordinate-descent polish: asymmetric fit x ~ d*q + min with the
    candidate-iscale sweep and the weighted-LS (d, min) solve per step.
    g, w: (..., n). Returns (scale, the_min>=0, L)."""
    shape = g.shape[:-1]
    n = g.shape[-1]
    gd = g.reshape(-1, n).astype(np.float64)
    wd = w.reshape(-1, n).astype(np.float64)
    mn = np.minimum(gd.min(axis=1), 0.0)
    mx = gd.max(axis=1)
    dead = (mx - mn) < 1e-10
    rng = np.where(dead, 1.0, mx - mn)
    sum_w = wd.sum(axis=1)
    sum_x = (wd * gd).sum(axis=1)
    sum_x2 = (wd * gd * gd).sum(axis=1)

    iscale = nmax / rng
    L = _nearest_int(iscale[:, None] * (gd - mn[:, None])).clip(0, nmax)
    scale = 1.0 / iscale
    best_mad = (wd * (scale[:, None] * L + mn[:, None] - gd) ** 2).sum(axis=1)
    best_min = mn.copy()

    for is_ in range(nstep + 1):
        isc = (rmin + rdelta * is_ + nmax) / rng
        Laux = _nearest_int(isc[:, None] * (gd - mn[:, None])).clip(0, nmax)
        sum_l = (wd * Laux).sum(axis=1)
        sum_l2 = (wd * Laux * Laux).sum(axis=1)
        sum_xl = (wd * Laux * gd).sum(axis=1)
        D = sum_w * sum_l2 - sum_l * sum_l
        ok = D > 0
        Ds = np.where(ok, D, 1.0)
        t_scale = (sum_w * sum_xl - sum_x * sum_l) / Ds
        t_min = (sum_l2 * sum_x - sum_l * sum_xl) / Ds
        pos = t_min > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            t_scale = np.where(pos, sum_xl / np.where(sum_l2 > 0, sum_l2, 1),
                               t_scale)
        t_min = np.where(pos, 0.0, t_min)
        mad = (sum_x2 - 2 * t_scale * sum_xl - 2 * t_min * sum_x
               + 2 * t_scale * t_min * sum_l + t_scale * t_scale * sum_l2
               + t_min * t_min * sum_w)
        upd = ok & (mad < best_mad)
        best_mad = np.where(upd, mad, best_mad)
        scale = np.where(upd, t_scale, scale)
        best_min = np.where(upd, t_min, best_min)
        L = np.where(upd[:, None], Laux, L)

    scale = np.where(dead, 0.0, scale)
    best_min = np.where(dead, np.minimum(gd.min(axis=1), 0.0), best_min)
    L = np.where(dead[:, None], 0, L)
    return (scale.astype(np.float32).reshape(shape),
            (-best_min).astype(np.float32).reshape(shape),
            L.astype(np.int32).reshape(shape + (n,)))


def _f16b(a: np.ndarray) -> np.ndarray:
    """float32 array -> f16 little-endian byte pairs (..., 2)."""
    return a.astype(np.float16).view(np.uint8).reshape(a.shape + (2,))


def _row_weights(x_rows: np.ndarray, imatrix, group: int, sigma_mul: float):
    """Per-element weights per the reference impls: qw * sqrt(sigma2 + x^2)
    with sigma2 = sigma_mul * mean(x^2 over the row); |x|-flavor fallback
    when no imatrix. x_rows: (nrows, n)."""
    nrows, n = x_rows.shape
    g = x_rows.reshape(nrows, n // group, group)
    if imatrix is None:
        return None
    sigma2 = sigma_mul * np.mean(x_rows * x_rows, axis=1)[:, None, None]
    qw = np.broadcast_to(np.asarray(imatrix, np.float32).reshape(
        1, n // group, group), g.shape)
    return qw * np.sqrt(sigma2 + g * g)


# ---------------------------------------------------------------------------
# Q4_1 / Q5_1 (asymmetric legacy formats, 32-blocks, f16 d + f16 m)
# ---------------------------------------------------------------------------

def _pack_q41_like(d, m, L, nbits: int) -> np.ndarray:
    """d, m: (nb,) f32; L: (nb, 32) ints in [0, 2^nbits-1]."""
    nb = d.shape[0]
    lo = (L[:, :16] & 0x0F) | ((L[:, 16:] & 0x0F) << 4)
    if nbits == 4:
        out = np.empty((nb, 20), np.uint8)
        out[:, 0:2] = _f16b(d).reshape(nb, 2)
        out[:, 2:4] = _f16b(m).reshape(nb, 2)
        out[:, 4:] = lo.astype(np.uint8)
        return out
    # Q5_1: qh bit j = bit4 of L[j], bit j+16 = bit4 of L[j+16]
    qh = np.zeros(nb, np.uint32)
    for j in range(16):
        qh |= ((L[:, j] >> 4) & 1).astype(np.uint32) << j
        qh |= ((L[:, j + 16] >> 4) & 1).astype(np.uint32) << (j + 16)
    out = np.empty((nb, 24), np.uint8)
    out[:, 0:2] = _f16b(d).reshape(nb, 2)
    out[:, 2:4] = _f16b(m).reshape(nb, 2)
    out[:, 4:8] = qh[:, None].view(np.uint8).reshape(nb, 4)
    out[:, 8:] = lo.astype(np.uint8)
    return out


def _quantize_q41_like(x: np.ndarray, imatrix, nbits: int) -> np.ndarray:
    n = x.shape[-1]
    xr = x.reshape(-1, n).astype(np.float32)
    nmax = (1 << nbits) - 1
    g = xr.reshape(-1, 32)
    if imatrix is None:
        # quantize_row_q4_1_ref / q5_1_ref: plain min-max rounding
        mn = g.min(axis=1)
        mx = g.max(axis=1)
        d = (mx - mn) / nmax
        with np.errstate(divide="ignore", invalid="ignore"):
            idv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
        L = np.minimum(nmax, (((g - mn[:, None]) * idv[:, None])
                              + 0.5).astype(np.int32))
        return _pack_q41_like(d, mn, L, nbits).reshape(-1)
    # quantize_row_qX_1_impl: make_qkx3 weighted asymmetric fit
    w = _row_weights(xr, imatrix, 32, 1.0).reshape(-1, 32)
    d, the_min, L = _make_qkx3(g, nmax, w)
    return _pack_q41_like(d, -the_min, L, nbits).reshape(-1)


def quantize_q4_1(x: np.ndarray, imatrix=None) -> np.ndarray:
    return _quantize_q41_like(x, imatrix, 4)


def quantize_q5_1(x: np.ndarray, imatrix=None) -> np.ndarray:
    return _quantize_q41_like(x, imatrix, 5)


# ---------------------------------------------------------------------------
# MXFP4 (e8m0 power-of-two block scale + 16-entry fp4 codebook)
# ---------------------------------------------------------------------------

def quantize_mxfp4(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    g = x.reshape(-1, 32).astype(np.float32)
    nb = g.shape[0]
    amax = np.abs(g).max(axis=1)
    live = amax > 0
    safe = np.where(live, amax, 1.0)
    # the reference casts to uint8 BEFORE computing d (wraps mod 256)
    e = (np.floor(np.log2(safe)) - 2 + 127).astype(np.int64).astype(np.uint8)
    d = np.exp2(e.astype(np.float32) - 127.0) * 0.5
    vals = luts.KVALUES_MXFP4.astype(np.float32)        # (16,)
    # nearest by absolute difference, first index wins (best_index_mxfp4)
    diff = np.abs(g[:, :, None] - d[:, None, None] * vals[None, None, :])
    idx = diff.argmin(axis=2).astype(np.uint8)
    idx = np.where(live[:, None], idx, 0)
    e = np.where(live, e, 0).astype(np.uint8)
    out = np.empty((nb, 17), np.uint8)
    out[:, 0] = e
    out[:, 1:] = idx[:, :16] | (idx[:, 16:] << 4)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Q2_K (16x16 sub-blocks, 4-bit scales + 4-bit mins, f16 d/dmin)
# ---------------------------------------------------------------------------

def _make_qp_quants(v: np.ndarray, nmax: int, w: np.ndarray):
    """Non-negative weighted scale fit (ggml-quants.c make_qp_quants),
    vectorized minus the final exchange loop. v, w: (nb, S). Returns
    (scale (nb,), L (nb, S))."""
    mx = v.max(axis=1)
    live = mx > 1e-16
    safe = np.where(live, mx, 1.0)
    best_is = np.zeros(v.shape[0], np.float32)
    best_mse = None
    for is_ in range(-4, 5):
        iscale = (0.1 * is_ + nmax) / safe
        L = np.minimum(nmax, _nearest_int(iscale[:, None] * v))
        mse = (w * (v - L / iscale[:, None]) ** 2).sum(axis=1)
        if best_mse is None:
            best_mse, best_is = mse, np.full(v.shape[0], float(is_))
        else:
            upd = mse < best_mse
            best_mse = np.where(upd, mse, best_mse)
            best_is = np.where(upd, float(is_), best_is)
    iscale = (0.1 * best_is + nmax) / safe
    L = np.minimum(nmax, _nearest_int(iscale[:, None] * v)).astype(np.float64)
    wd = w.astype(np.float64)
    vd = v.astype(np.float64)
    sumlx = (wd * vd * L).sum(axis=1)
    suml2 = (wd * L * L).sum(axis=1)
    # the reference's coordinate-exchange refinement (5 sweeps), vectorized
    # over blocks, sequential over the S elements like the C loop
    for _ in range(5):
        for i in range(v.shape[1]):
            wi, vi, li = wd[:, i], vd[:, i], L[:, i]
            slx = sumlx - wi * vi * li
            sl2 = suml2 - wi * li * li
            ok = (slx > 0) & (sl2 > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                new_l = np.minimum(
                    nmax, _nearest_int(vi * sl2 / np.where(ok, slx, 1)))
            new_l = new_l.astype(np.float64)
            slx2 = slx + wi * vi * new_l
            sl22 = sl2 + wi * new_l * new_l
            accept = ok & (new_l != li) & (
                slx2 * slx2 * suml2 > sumlx * sumlx * sl22)
            L[:, i] = np.where(accept, new_l, li)
            sumlx = np.where(accept, slx2, sumlx)
            suml2 = np.where(accept, sl22, suml2)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(suml2 > 0, sumlx / np.where(suml2 > 0, suml2, 1), 0)
    scale = np.where(live, scale, 0.0)
    L = np.where(live[:, None], L, 0)
    return scale.astype(np.float32), L.astype(np.int32)


def _pack_2bit(L: np.ndarray) -> np.ndarray:
    """L: (nb, 256) in [0,3] -> qs (nb, 64) with the 128-stride layout."""
    nb = L.shape[0]
    q = L.reshape(nb, 2, 4, 32)
    qs = (q[:, :, 0] | (q[:, :, 1] << 2) | (q[:, :, 2] << 4)
          | (q[:, :, 3] << 6))
    return qs.reshape(nb, 64).astype(np.uint8)


def quantize_q2_K(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xr = x.reshape(-1, n).astype(np.float32)
    nrows = xr.shape[0]
    xb = xr.reshape(-1, QK_K)                       # (nb, 256)
    nb = xb.shape[0]
    g = xb.reshape(nb, 16, 16)
    if imatrix is None:
        w = np.abs(g)                                # q2_K_ref weights
    else:
        sigma2 = 0.75 * np.mean(xb * xb, axis=1)[:, None, None]
        im = np.asarray(imatrix, np.float32).reshape(1, n)
        im = np.broadcast_to(im, (nrows, n)).reshape(nb, 16, 16)
        w = im * np.sqrt(sigma2 + g * g)
    scales, mins, L0 = _make_qkx3(g, 3, w)           # (nb,16) each

    if imatrix is None:
        # q2_K_ref: 4-bit scale/min via max rescale
        q4 = 15.0
        max_scale = scales.max(axis=1)
        max_min = mins.max(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            isc = np.where(max_scale > 0, q4 / np.where(max_scale > 0,
                                                        max_scale, 1), 0.0)
            imn = np.where(max_min > 0, q4 / np.where(max_min > 0,
                                                      max_min, 1), 0.0)
        Ls = _nearest_int(isc[:, None] * scales).clip(0, 15)
        Lm = _nearest_int(imn[:, None] * mins).clip(0, 15)
        d = np.where(max_scale > 0, max_scale / q4, 0.0)
        dm = np.where(max_min > 0, max_min / q4, 0.0)
    else:
        # q2_K_impl: make_qp_quants on the 16 scales and mins
        sw = w.sum(axis=2)
        d, Ls = _make_qp_quants(scales, 15, sw)
        dm, Lm = _make_qp_quants(mins, 15, sw)

    d16 = np.float32(np.float16(d))
    dm16 = np.float32(np.float16(dm))
    d_eff = d16[:, None] * Ls                        # (nb, 16)
    m_eff = dm16[:, None] * Lm
    with np.errstate(divide="ignore", invalid="ignore"):
        idv = np.where(d_eff != 0, 1.0 / np.where(d_eff != 0, d_eff, 1), 0.0)
    L = _nearest_int((g + m_eff[:, :, None]) * idv[:, :, None]).clip(0, 3)
    L = np.where((d_eff == 0)[:, :, None], L0, L)

    out = np.empty((nb, 84), np.uint8)
    out[:, 0:16] = (Ls | (Lm << 4)).astype(np.uint8)
    out[:, 16:80] = _pack_2bit(L.reshape(nb, QK_K))
    out[:, 80:82] = _f16b(d.astype(np.float32)).reshape(nb, 2)
    out[:, 82:84] = _f16b(dm.astype(np.float32)).reshape(nb, 2)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Q3_K (16x16 sub-blocks, 6-bit two's-complement scales, f16 d, hmask)
# ---------------------------------------------------------------------------

def _pack_q3_scales(l6: np.ndarray) -> np.ndarray:
    """l6: (nb, 16) ints in [0, 63] -> 12-byte scale field."""
    nb = l6.shape[0]
    sc = np.zeros((nb, 12), np.uint8)
    lo = (l6 & 0x0F).astype(np.uint8)
    hi = (l6 >> 4).astype(np.uint8)
    sc[:, 0:8] = lo[:, 0:8] | (lo[:, 8:16] << 4)
    for j in range(16):
        sc[:, 8 + j % 4] |= hi[:, j] << (2 * (j // 4))
    return sc


def quantize_q3_K(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xr = x.reshape(-1, n).astype(np.float32)
    nrows = xr.shape[0]
    xb = xr.reshape(-1, QK_K)
    nb = xb.shape[0]
    g = xb.reshape(nb, 16, 16)
    if imatrix is None:
        w = g * g                                    # make_q3_quants flavor
    else:
        sigma2 = 2.0 * np.mean(xb * xb, axis=1)[:, None, None]
        im = np.asarray(imatrix, np.float32).reshape(1, n)
        im = np.broadcast_to(im, (nrows, n)).reshape(nb, 16, 16)
        w = im * np.sqrt(sigma2 + g * g)
    scales, _ = _make_qx_quants(g, 4, w)             # (nb, 16)

    if imatrix is None:
        # q3_K_ref scale quantization: iscale = -32/max|scale| rescale
        amax_pos = np.abs(scales).argmax(axis=1)
        max_scale = np.take_along_axis(scales, amax_pos[:, None], 1)[:, 0]
        live = max_scale != 0
        safe = np.where(live, max_scale, 1.0)
        isc = -32.0 / safe
        Ls = (_nearest_int(isc[:, None] * scales).clip(-32, 31) + 32)
        Ls = np.where(live[:, None], Ls, 32)
        d = np.where(live, 1.0 / isc, 0.0)
    else:
        sw = w.sum(axis=2)
        d, Lq = _make_qx_quants(scales, 32, sw)
        Ls = Lq + 32
    d16 = np.float32(np.float16(d))
    d_eff = d16[:, None] * (Ls - 32)
    with np.errstate(divide="ignore", invalid="ignore"):
        idv = np.where(d_eff != 0, 1.0 / np.where(d_eff != 0, d_eff, 1), 0.0)
    L = _nearest_int(g * idv[:, :, None]).clip(-4, 3) + 4   # [0, 7]
    L = np.where((d_eff == 0)[:, :, None], 4, L)
    Lf = L.reshape(nb, QK_K)

    # hmask: bit for the 1st 8 quants in bit 0 of hmask[0..31], next 8 bit 1…
    hbit = (Lf > 3).astype(np.uint8).reshape(nb, 8, 32)
    hmask = np.zeros((nb, 32), np.uint8)
    for b in range(8):
        hmask |= hbit[:, b] << b
    q2 = np.where(Lf > 3, Lf - 4, Lf)

    out = np.empty((nb, 110), np.uint8)
    out[:, 0:32] = hmask
    out[:, 32:96] = _pack_2bit(q2)
    out[:, 96:108] = _pack_q3_scales(Ls.astype(np.int32))
    out[:, 108:110] = _f16b(d.astype(np.float32)).reshape(nb, 2)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ4_KSS (IQ4_KS with 16-bit xor-prefix packed words, even-parity nibbles)
# ---------------------------------------------------------------------------

def _word_gather(a32: np.ndarray) -> np.ndarray:
    """(…, 32) block values -> (…, 8, 4) word layout: word k holds block
    positions (2k, 2k+16, 2k+1, 2k+17) (quantize_row_iq4_kss_impl xv order).
    """
    k = np.arange(8)
    pos = np.stack([2 * k, 2 * k + 16, 2 * k + 1, 2 * k + 17], axis=1)
    return a32[..., pos]


def _word_scatter(words: np.ndarray) -> np.ndarray:
    """inverse of _word_gather: (…, 8, 4) -> (…, 32)."""
    out = np.empty(words.shape[:-2] + (32,), dtype=words.dtype)
    k = np.arange(8)
    out[..., 2 * k] = words[..., 0]
    out[..., 2 * k + 16] = words[..., 1]
    out[..., 2 * k + 1] = words[..., 2]
    out[..., 2 * k + 17] = words[..., 3]
    return out


def _prune_even_parity(idx_w, g_w, w_w, dl, vals):
    """idx_w: (..., 8, 4) nibble indices. For words with odd total popcount,
    flip the single nibble (within ±2) that costs the least weighted mse and
    fixes the parity (prune_iq4ks)."""
    pc = _POP16[idx_w].sum(axis=-1)                        # (..., 8)
    odd = (pc & 1) == 1
    q = idx_w                                              # (..., 8, 4)
    offs = np.array([-2, -1, 1, 2], np.int32)
    cand = q[..., None] + offs                             # (..., 8, 4, 4c)
    valid = (cand >= 0) & (cand <= 15)
    cand_c = np.clip(cand, 0, 15)
    valid &= ((_POP16[cand_c] - _POP16[q][..., None]) & 1) == 1
    d0 = dl[..., None, None] * vals[q] - g_w               # (..., 8, 4)
    d1 = dl[..., None, None, None] * vals[cand_c] - g_w[..., None]
    score = w_w[..., None] * (d1 * d1 - d0[..., None] * d0[..., None])
    score = np.where(valid, score, np.inf)
    flat = score.reshape(score.shape[:-2] + (16,))         # (..., 8, 16)
    best = flat.argmin(axis=-1)                            # (..., 8)
    newq = np.take_along_axis(
        cand_c.reshape(flat.shape), best[..., None], axis=-1)[..., 0]
    mask = np.arange(4) == (best // 4)[..., None]          # (..., 8, 4)
    return np.where(odd[..., None] & mask, newq[..., None], q)


def _xor_prefix15(v: np.ndarray) -> np.ndarray:
    """16-bit even-parity word -> 15-bit xor-prefix encoding t such that the
    decode (t<<1) ^ t reproduces v (block_iq4_kss storage transform)."""
    p = v.astype(np.uint32)
    p ^= p << 1
    p ^= p << 2
    p ^= p << 4
    p ^= p << 8
    return (p & 0x7FFF).astype(np.uint32)


def quantize_iq4_kss(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xr = x.reshape(-1, n).astype(np.float32)
    nrows = xr.shape[0]
    nbl = n // QK_K
    xs = xr.reshape(nrows, nbl, QK_K)
    g = xs.reshape(nrows, nbl, 8, 32)
    sig = _sigma2(xs.reshape(-1, QK_K)).reshape(nrows, nbl, 1, 1)
    if imatrix is None:
        w = g * g
    else:
        qw = np.broadcast_to(np.asarray(imatrix, np.float32).reshape(
            1, nbl, 8, 32), g.shape)
        w = qw * np.sqrt(sig + g * g)

    vals = luts.IQ4K_VALUES[:16].astype(np.float32)
    sh_vals = luts.IQ4K_VALUES[16:].astype(np.float32)
    d_blk, _ = _lut_scale_search(g, w, vals, sh_vals, ntry=7)

    amax_scale = np.abs(d_blk).max(axis=(1, 2))
    d_row = amax_scale / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        id_row = np.where(d_row != 0, 1.0 / np.where(d_row != 0, d_row, 1), 0)
    l = _nearest_int(0.5 * (id_row[:, None, None] * d_blk + 127.0))
    l = (np.clip(l, 0, 127) << 1) - 127                   # odd, [-127,127]
    dl = d_row[:, None, None] * l                          # (nr, nbl, 8)

    gw = _word_gather(g)                                   # (nr,nbl,8,8,4)
    ww = _word_gather(w)
    with np.errstate(divide="ignore", invalid="ignore"):
        idl = np.where(dl != 0, 1.0 / np.where(dl != 0, dl, 1), 0.0)
    al = gw * idl[..., None, None]
    idx_p = _prune_even_parity(_nearest_idx(vals, al), gw, ww, dl, vals)
    idx_m = _prune_even_parity(_nearest_idx(sh_vals, al), gw, ww, dl, sh_vals)
    mse_p = (ww * (gw - dl[..., None, None] * vals[idx_p]) ** 2).sum((-1, -2))
    mse_m = (ww * (gw - dl[..., None, None] * sh_vals[idx_m]) ** 2).sum(
        (-1, -2))
    use_m = mse_m < mse_p                                  # per block
    idx = np.where(use_m[..., None, None], idx_m, idx_p)
    qv = np.where(use_m[..., None, None], sh_vals[idx_m], vals[idx_p])

    # global d refit, * 1.01 like the reference (l is always odd -> nonzero)
    ql = qv * l[..., None, None]
    sumqx = (ww * ql * gw).sum(axis=(1, 2, 3, 4))
    sumq2 = (ww * ql * ql).sum(axis=(1, 2, 3, 4))
    with np.errstate(divide="ignore", invalid="ignore"):
        d_final = np.where(sumq2 > 0,
                           sumqx / np.where(sumq2 > 0, sumq2, 1) * 1.01, 0.0)
    d_final = d_final.astype(np.float32)

    # pack: 4B f32 d + per superblock 64 uint16 words
    v16 = (idx[..., 0] | (idx[..., 1] << 4) | (idx[..., 2] << 8)
           | (idx[..., 3] << 12)).astype(np.uint32)        # (nr,nbl,8,8)
    t = _xor_prefix15(v16)
    ls = (l + 127).astype(np.uint32) | use_m.astype(np.uint32)  # 8-bit + flag
    kbits = (ls[..., None] >> np.arange(8)) & 1            # (nr,nbl,8,8)
    q16 = ((t << 1) | kbits).astype(np.uint16)

    out = np.zeros((nrows, 4 + nbl * 128), np.uint8)
    out[:, 0:4] = d_final.view(np.uint8).reshape(nrows, 4)
    out[:, 4:] = q16.reshape(nrows, nbl * 64).astype("<u2").view(
        np.uint8).reshape(nrows, nbl * 128)
    return out.reshape(-1)


EXTRA_QUANTIZE_FNS = {
    GGMLType.Q4_1: quantize_q4_1,
    GGMLType.Q5_1: quantize_q5_1,
    GGMLType.MXFP4: quantize_mxfp4,
    GGMLType.Q2_K: quantize_q2_K,
    GGMLType.Q3_K: quantize_q3_K,
    GGMLType.IQ4_KSS: quantize_iq4_kss,
}
