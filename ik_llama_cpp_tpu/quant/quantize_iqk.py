"""IQK-family quantizer encoders (imatrix-weighted), numpy-vectorized.

The encode-side counterpart of quant/dequant.py's IQK decoders — the
reference's iqk_quantize.cpp quantizers re-derived as block-vectorized
numpy: instead of per-block scalar loops, every candidate scale of the
reference's search grid is evaluated for ALL blocks at once.

Shared search core (mirrors quantize_row_iq4_k_impl_bs16 and siblings,
iqk_quantize.cpp:2918-3076, :4380-4530):
  * block weights w = qw * sqrt(sigma2 + x^2) (imatrix) or x^2,
    sigma2 = 2/256 * sum(x^2) over the superblock;
  * candidate inverse scales: the +-max seed plus (itry + values[0])/max
    for itry in [-ntry, ntry], each tried against the base LUT and the
    "shifted" LUT (values + table_size), each with both signs;
  * winner maximizes sumqx^2/sumq2 (weighted LSQ fit of d);
  * block scales are then quantized into the format's scale field and the
    row/super scale gets a final weighted-LSQ refit.

Quality contract: round-trip RMSE within a few percent of the reference
encoder on the same data (tests/test_quantize_iqk.py cross-checks via
ctypes against libggml's ggml_quantize_chunk) — not bit-identical, since
float associativity differs between the scalar C loops and numpy.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, GEOMETRY, QK_K
from . import luts


def _nearest_idx(vals: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Nearest index in an ascending-sorted LUT; ties resolve to the upper
    index, matching best_index_iq4nl (iqk_quantize.cpp: `x - values[mu-1]
    < values[mu] - x ? mu-1 : mu`)."""
    idx = np.searchsorted(vals, x)
    idx = np.clip(idx, 1, len(vals) - 1)
    left = vals[idx - 1]
    right = vals[idx]
    return np.where((x - left) < (right - x), idx - 1, idx)


def _nearest_int(x):
    return np.rint(x).astype(np.int32)


def _sigma2(x_sb: np.ndarray) -> np.ndarray:
    """x_sb: (NB, QK_K) superblocks -> (NB, 1, 1)."""
    return (2.0 / x_sb.shape[-1]) * (x_sb * x_sb).sum(-1)[:, None, None]


def _score_update(best, d, shifted_flag, g, w, vals, id_, use_shifted):
    """Evaluate candidate inverse-scale id_ (per block) against LUT vals for
    both signs; update (best, d, shifted_flag) in place semantics."""
    al = g * id_[..., None]
    for sgn in (1.0, -1.0):
        q = vals[_nearest_idx(vals, sgn * al)]
        sumqx = (w * q * g).sum(-1)
        sumq2 = (w * q * q).sum(-1)
        better = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
        with np.errstate(divide="ignore", invalid="ignore"):
            cand_d = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0)
        d = np.where(better, cand_d, d)
        best = np.where(better, cand_d * sumqx, best)
        shifted_flag = np.where(better, use_shifted, shifted_flag)
    return best, d, shifted_flag


def _lut_scale_search(g, w, values, shifted=None, ntry=7):
    """g, w: (..., BS). Returns (d, is_shifted) per block — the reference's
    per-block scale search, vectorized over every block at once."""
    vals = values.astype(np.float32)
    amax_pos = np.abs(g).argmax(-1)
    maxv = np.take_along_axis(g, amax_pos[..., None], -1)[..., 0]
    amax = np.abs(maxv)
    dead = amax < 1e-16
    safe_max = np.where(dead, 1.0, maxv)

    d0 = (-safe_max / vals[0]) if ntry > 0 else (safe_max / vals[0])
    id0 = 1.0 / d0
    # seed: evaluate id0 on the base LUT only, + then - (reference order)
    al = g * id0[..., None]
    q = vals[_nearest_idx(vals, al)]
    sumqx_p = (w * q * g).sum(-1)
    sumq2_p = (w * q * q).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        d = np.where(sumq2_p > 0, sumqx_p / np.where(sumq2_p > 0, sumq2_p, 1), 0)
    best = d * sumqx_p
    shifted_flag = np.zeros(d.shape, dtype=bool)
    q = vals[_nearest_idx(vals, -al)]
    sumqx_m = (w * q * g).sum(-1)
    sumq2_m = (w * q * q).sum(-1)
    better = (sumq2_m > 0) & (sumqx_m * sumqx_m > best * sumq2_m)
    with np.errstate(divide="ignore", invalid="ignore"):
        dm = np.where(sumq2_m > 0, sumqx_m / np.where(sumq2_m > 0, sumq2_m, 1), 0)
    d = np.where(better, dm, d)
    best = np.where(better, dm * sumqx_m, best)

    svals = None if shifted is None else shifted.astype(np.float32)
    for itry in range(-ntry, ntry + 1):
        id_ = (itry + vals[0]) / safe_max
        best, d, shifted_flag = _score_update(best, d, shifted_flag, g, w,
                                              vals, id_, False)
        if svals is not None:
            id_ = (itry + svals[0]) / safe_max
            best, d, shifted_flag = _score_update(best, d, shifted_flag, g, w,
                                                  svals, id_, True)
    d = np.where(dead, 0.0, d)
    shifted_flag = np.where(dead, False, shifted_flag)
    return d.astype(np.float32), shifted_flag


def _encode_with_tables(g, scales_eff, extra_bits, values, shifted):
    """Quantize g (NB, S, BS) to LUT indices with per-block effective scale
    scales_eff (NB, S) and per-block table choice extra_bits (NB, S) bool.
    Returns (idx uint8 (NB, S, BS), sumqx (NB,), sumq2 (NB,), q (NB,S,BS))."""
    vals = values.astype(np.float32)
    svals = shifted.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(scales_eff != 0, 1.0 / np.where(scales_eff != 0,
                                                       scales_eff, 1), 0.0)
    al = g * inv[..., None]
    idx_b = _nearest_idx(vals, al)
    idx_s = _nearest_idx(svals, al)
    idx = np.where(extra_bits[..., None], idx_s, idx_b)
    q = np.where(extra_bits[..., None], svals[idx_s], vals[idx_b])
    return idx.astype(np.uint8), q


def _final_refit(w, q, scales_int, g):
    """Weighted-LSQ refit of the row/super scale given quantized values.
    q: LUT values, scales_int: per-block integer scale l; model x ~ d*l*q."""
    ql = q * scales_int[..., None]
    sumqx = (w * ql * g).sum(axis=(-1, -2))
    sumq2 = (w * ql * ql).sum(axis=(-1, -2))
    return sumqx, sumq2


# ---------------------------------------------------------------------------
# IQ4_KS: row-level f32 d, 8x32 blocks, 7-bit scale + shift bit
# (iqk_quantize.cpp:4380-4530)
# ---------------------------------------------------------------------------

def quantize_iq4_ks(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, x.shape[-1]).astype(np.float32)
    nrows, n = x.shape
    nb = n // QK_K
    xs = x.reshape(nrows, nb, QK_K)                      # superblocks
    g = xs.reshape(nrows, nb, 8, 32)
    sig = _sigma2(xs.reshape(-1, QK_K)).reshape(nrows, nb, 1, 1)
    if imatrix is None:
        w = g * g
    else:
        qw = np.broadcast_to(imatrix.reshape(1, nb, 8, 32), g.shape)
        w = qw * np.sqrt(sig + g * g)

    vals = luts.IQ4K_VALUES[:16].astype(np.float32)
    sh_vals = luts.IQ4K_VALUES[16:].astype(np.float32)
    d_blk, is_shifted = _lut_scale_search(g, w, vals, sh_vals, ntry=7)

    amax_scale = np.abs(d_blk).max(axis=(1, 2))          # per row
    d_row = amax_scale / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        id_row = np.where(d_row != 0, 1.0 / np.where(d_row != 0, d_row, 1), 0)

    l = _nearest_int(0.5 * (id_row[:, None, None] * d_blk + 127.0))
    l = np.clip(l, 0, 127)
    scale_byte = (l << 1).astype(np.uint8) | is_shifted.astype(np.uint8)
    li = (l << 1) - 127                                  # effective int scale
    dl = d_row[:, None, None] * li
    idx, q = _encode_with_tables(g.reshape(nrows, nb * 8, 32),
                                 dl.reshape(nrows, nb * 8),
                                 is_shifted.reshape(nrows, nb * 8),
                                 vals, sh_vals)
    sumqx, sumq2 = _final_refit(w.reshape(nrows, nb * 8, 32), q,
                                li.reshape(nrows, nb * 8).astype(np.float32),
                                g.reshape(nrows, nb * 8, 32))
    d_final = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1),
                       d_row).astype(np.float32)
    d_final = np.where(d_row == 0, 0.0, d_final)

    # pack: 4B f32 d + nb * {scales[8], qs[128]}
    out = np.zeros((nrows, 4 + nb * 136), np.uint8)
    out[:, 0:4] = d_final.view(np.uint8).reshape(nrows, 4)
    body = out[:, 4:].reshape(nrows, nb, 136)
    body[:, :, 0:8] = scale_byte
    idx = idx.reshape(nrows, nb, 8, 32)
    body[:, :, 8:] = (idx[..., :16] | (idx[..., 16:] << 4)).reshape(
        nrows, nb, 128)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ4_K: f16 super d, 16x16 blocks, 6-bit scales (4 low + 2 high), 16-bit
# extra (iqk_quantize.cpp:2918-3076)
# ---------------------------------------------------------------------------

def quantize_iq4_k(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    sig = _sigma2(x)
    if imatrix is None:
        w = g * g
    else:
        # imatrix is per-column of the row: tile its superblocks down the
        # flattened (rows*superblocks) axis
        im = np.tile(imatrix.reshape(n // QK_K, 16, 16),
                     (nb // (n // QK_K), 1, 1))
        w = im * np.sqrt(sig + g * g)

    vals = luts.IQ4K_VALUES[:16].astype(np.float32)
    sh_vals = luts.IQ4K_VALUES[16:].astype(np.float32)
    d_blk, is_shifted = _lut_scale_search(g, w, vals, sh_vals, ntry=7)

    # super scale: -max|d|/32 in f16
    amax_pos = np.abs(d_blk).argmax(-1)
    max_scale = np.take_along_axis(d_blk, amax_pos[:, None], -1)[:, 0]
    d_super = (-max_scale / 32.0).astype(np.float16).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        id_s = np.where(d_super != 0, 1.0 / np.where(d_super != 0, d_super, 1), 0)
    l = np.clip(_nearest_int(id_s[:, None] * d_blk), -32, 31)
    dl = d_super[:, None] * l
    idx, q = _encode_with_tables(g, dl, is_shifted, vals, sh_vals)
    sumqx, sumq2 = _final_refit(w, q, l.astype(np.float32), g)
    d_final = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1),
                       d_super).astype(np.float16)

    ls = (l + 32).astype(np.uint8)
    out = np.zeros((nb, 144), np.uint8)
    out[:, 0:2] = d_final.view(np.uint8).reshape(nb, 2)
    extra = np.zeros(nb, np.uint16)
    for ib in range(16):
        extra |= (is_shifted[:, ib].astype(np.uint16) << ib)
    out[:, 2:4] = extra[:, None].view(np.uint8).reshape(nb, 2)
    # scales_h: uint16 words, 2 bits per block
    sh16 = np.zeros((nb, 2), np.uint16)
    for ib in range(16):
        sh16[:, ib // 8] |= ((ls[:, ib].astype(np.uint16) >> 4)
                             << (2 * (ib % 8)))
    out[:, 4:8] = sh16.view(np.uint8).reshape(nb, 4)
    for ib in range(16):
        nib = ls[:, ib] & 0x0F
        if ib % 2 == 0:
            out[:, 8 + ib // 2] |= nib
        else:
            out[:, 8 + ib // 2] |= nib << 4
    # qs: per 32 elems, low nibble = first 16, high = next 16
    idx32 = idx.reshape(nb, 8, 32)
    out[:, 16:] = (idx32[..., :16] | (idx32[..., 16:] << 4)).reshape(nb, 128)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ5_KS: row f32 d, 8x32 blocks, 7-bit scale + shift bit, 5-bit codes
# (iqk_quantize.cpp:4621-4792, ntry=5)
# ---------------------------------------------------------------------------

def quantize_iq5_ks(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, x.shape[-1]).astype(np.float32)
    nrows, n = x.shape
    nb = n // QK_K
    g = x.reshape(nrows, nb, 8, 32)
    sig = _sigma2(x.reshape(-1, QK_K)).reshape(nrows, nb, 1, 1)
    if imatrix is None:
        w = g * g
    else:
        qw = np.broadcast_to(imatrix.reshape(1, nb, 8, 32), g.shape)
        w = qw * np.sqrt(sig + g * g)

    vals = luts.IQ5NL_VALUES[:32].astype(np.float32)
    sh_vals = luts.IQ5NL_VALUES[32:].astype(np.float32)
    d_blk, is_shifted = _lut_scale_search(g, w, vals, sh_vals, ntry=5)

    amax_scale = np.abs(d_blk).max(axis=(1, 2))
    d_row = amax_scale / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        id_row = np.where(d_row != 0, 1.0 / np.where(d_row != 0, d_row, 1), 0)
    l = np.clip(_nearest_int(0.5 * (id_row[:, None, None] * d_blk + 127.0)),
                0, 127)
    scale_byte = (l << 1).astype(np.uint8) | is_shifted.astype(np.uint8)
    li = (l << 1) - 127
    dl = d_row[:, None, None] * li
    idx, q = _encode_with_tables(g.reshape(nrows, nb * 8, 32),
                                 dl.reshape(nrows, nb * 8),
                                 is_shifted.reshape(nrows, nb * 8),
                                 vals, sh_vals)
    sumqx, sumq2 = _final_refit(w.reshape(nrows, nb * 8, 32), q,
                                li.reshape(nrows, nb * 8).astype(np.float32),
                                g.reshape(nrows, nb * 8, 32))
    d_final = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1),
                       d_row).astype(np.float32)
    d_final = np.where(d_row == 0, 0.0, d_final)

    out = np.zeros((nrows, 4 + nb * 168), np.uint8)
    out[:, 0:4] = d_final.view(np.uint8).reshape(nrows, 4)
    body = out[:, 4:].reshape(nrows, nb, 168)
    body[:, :, 0:8] = scale_byte
    idx = idx.reshape(nrows, nb, 8, 32)
    qs = body[:, :, 8:136].reshape(nrows, nb, 4, 32)
    qh = body[:, :, 136:168]
    for ib in range(8):
        i4 = idx[:, :, ib] & 0x0F
        hi = (idx[:, :, ib] >> 4).astype(np.uint8)
        qs[:, :, ib // 2] |= (i4 << (4 * (ib % 2))).astype(np.uint8)
        qh |= hi << ib
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ5_K: f16 super d, 16x16 blocks, 6-bit scales, 16-bit extra
# (iqk_quantize.cpp:3236-3418; ntry=5, w=0.25*sigma2+x^2, per-block refit)
# ---------------------------------------------------------------------------

def _block_refit(g, w, d, is_shifted, vals, sh_vals):
    """Per-block refit of the winning scale (quantize once with 1/d, then
    weighted-LSQ re-fit) — the reference's `if (d) {...}` pass."""
    _, q = _encode_with_tables(g, d, is_shifted, vals, sh_vals)
    sumqx = (w * q * g).sum(-1)
    sumq2 = (w * q * q).sum(-1)
    return np.where((d != 0) & (sumq2 > 0),
                    sumqx / np.where(sumq2 > 0, sumq2, 1), d).astype(np.float32)


def quantize_iq5_k(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    sig = _sigma2(x)
    if imatrix is None:
        w = 0.25 * sig + g * g
    else:
        im = np.tile(imatrix.reshape(n // QK_K, 16, 16),
                     (nb // (n // QK_K), 1, 1))
        w = im * np.sqrt(sig + g * g)

    vals = luts.IQ5NL_VALUES[:32].astype(np.float32)
    sh_vals = luts.IQ5NL_VALUES[32:].astype(np.float32)
    d_blk, is_shifted = _lut_scale_search(g, w, vals, sh_vals, ntry=5)
    d_blk = _block_refit(g, w, d_blk, is_shifted, vals, sh_vals)

    amax_pos = np.abs(d_blk).argmax(-1)
    max_scale = np.take_along_axis(d_blk, amax_pos[:, None], -1)[:, 0]
    d_super = (-max_scale / 32.0).astype(np.float16).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        id_s = np.where(d_super != 0, 1.0 / np.where(d_super != 0, d_super, 1), 0)
    l = np.clip(_nearest_int(id_s[:, None] * d_blk), -32, 31)
    dl = d_super[:, None] * l
    idx, q = _encode_with_tables(g, dl, is_shifted, vals, sh_vals)
    sumqx, sumq2 = _final_refit(w, q, l.astype(np.float32), g)
    d_final = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1),
                       d_super).astype(np.float16)

    uls = (l + 32).astype(np.uint8)
    out = np.zeros((nb, 176), np.uint8)
    out[:, 0:2] = d_final.view(np.uint8).reshape(nb, 2)
    extra = np.zeros(nb, np.uint16)
    for ib in range(16):
        extra |= is_shifted[:, ib].astype(np.uint16) << ib
    out[:, 2:4] = extra[:, None].view(np.uint8).reshape(nb, 2)
    # scales: per ib64 pair of bytes (planar_iq5_k inverse)
    for ib in range(16):
        ib64, k = ib // 4, ib % 4
        out[:, 8 + 2 * ib64 + k // 2] |= (uls[:, ib] & 0x0F) << (4 * (k % 2))
        out[:, 4 + ib64] |= (uls[:, ib] >> 4) << (2 * k)
    qs = out[:, 16:144]
    qh = out[:, 144:176]
    idx16 = idx.reshape(nb, 16, 16)
    for ib in range(16):
        ib64, k = ib // 4, ib % 4
        col = 32 * ib64 + (16 if k in (1, 3) else 0)
        hcol = 16 if k in (1, 3) else 0
        iv = idx16[:, ib]
        if k < 2:
            qs[:, col:col + 16] |= iv & 0x0F
            qh[:, hcol:hcol + 16] |= (iv >> 4) << (2 * ib64)
        else:
            qs[:, col:col + 16] |= (iv & 0x0F) << 4
            qh[:, hcol:hcol + 16] |= (iv >> 4) << (2 * ib64 + 1)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ6_K: f16 super d, 16x16 blocks, int8 scales, 6-bit codes
# (iqk_quantize.cpp:3594-3770; ntry=5, w=0.25*sigma2+x^2)
# ---------------------------------------------------------------------------

def quantize_iq6_k(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    sig = _sigma2(x)
    if imatrix is None:
        w = 0.25 * sig + g * g
    else:
        im = np.tile(imatrix.reshape(n // QK_K, 16, 16),
                     (nb // (n // QK_K), 1, 1))
        w = im * np.sqrt(sig + g * g)

    vals = luts.IQ6NL_VALUES[:64].astype(np.float32)
    sh_vals = luts.IQ6NL_VALUES[64:].astype(np.float32)
    d_blk, is_shifted = _lut_scale_search(g, w, vals, sh_vals, ntry=5)
    d_blk = _block_refit(g, w, d_blk, is_shifted, vals, sh_vals)

    amax_pos = np.abs(d_blk).argmax(-1)
    max_scale = np.take_along_axis(d_blk, amax_pos[:, None], -1)[:, 0]
    d_super = (-max_scale / 127.0).astype(np.float16).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        id_s = np.where(d_super != 0, 1.0 / np.where(d_super != 0, d_super, 1), 0)
    l = np.clip(_nearest_int(id_s[:, None] * d_blk), -127, 127)
    dl = d_super[:, None] * l
    idx, q = _encode_with_tables(g, dl, is_shifted, vals, sh_vals)
    sumqx, sumq2 = _final_refit(w, q, l.astype(np.float32), g)
    d_final = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1),
                       d_super).astype(np.float16)

    out = np.zeros((nb, 212), np.uint8)
    out[:, 0:2] = d_final.view(np.uint8).reshape(nb, 2)
    extra = np.zeros(nb, np.uint16)
    for ib in range(16):
        extra |= is_shifted[:, ib].astype(np.uint16) << ib
    out[:, 2:4] = extra[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 4:20] = l.astype(np.int8).view(np.uint8)
    qs = out[:, 20:148]
    qh = out[:, 148:212]
    idx16 = idx.reshape(nb, 16, 16)
    for ib in range(16):
        ib64, k = ib // 4, ib % 4
        col = 32 * ib64 + (16 if k in (1, 3) else 0)
        hcol = 32 * (ib64 // 2) + (16 if k in (1, 3) else 0)
        shift = 4 * (ib64 % 2)
        iv = idx16[:, ib]
        if k < 2:
            qs[:, col:col + 16] |= iv & 0x0F
            qh[:, hcol:hcol + 16] |= ((iv >> 4) & 3) << shift
        else:
            qs[:, col:col + 16] |= (iv & 0x0F) << 4
            qh[:, hcol:hcol + 16] |= ((iv >> 4) & 3) << (shift + 2)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ3_K: f16 super d (positive), 16x16 blocks, odd magnitude scales (2l+1)
# with separate sign word (iqk_quantize.cpp:2295-2514; ntry=3, sigma2=1.5x)
# ---------------------------------------------------------------------------

def quantize_iq3_k(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    sig = 0.75 * _sigma2(x)        # 1.5 * sumx2 / QK_K
    if imatrix is None:
        w = 0.25 * sig + g * g
    else:
        im = np.tile(imatrix.reshape(n // QK_K, 16, 16),
                     (nb // (n // QK_K), 1, 1))
        w = im * np.sqrt(sig + g * g)

    vals = luts.IQ3NL_VALUES[:8].astype(np.float32)
    sh_vals = luts.IQ3NL_VALUES[8:].astype(np.float32)
    d_blk, is_shifted = _lut_scale_search(g, w, vals, sh_vals, ntry=3)
    d_blk = _block_refit(g, w, d_blk, is_shifted, vals, sh_vals)

    max_abs = np.abs(d_blk).max(-1)
    d_super = (max_abs / 31.0).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        id_s = np.where(d_super != 0, 1.0 / np.where(d_super != 0, d_super, 1), 0)
    ls = np.clip(_nearest_int(0.5 * (id_s[:, None] * np.abs(d_blk) - 1)), 0, 15)
    sign = d_blk < 0
    li = (2 * ls + 1) * np.where(sign, -1, 1)
    dl = d_super[:, None] * li
    idx, q = _encode_with_tables(g, dl, is_shifted, vals, sh_vals)
    sumqx, sumq2 = _final_refit(w, q, li.astype(np.float32), g)
    d_final = (1.01 * np.where(sumq2 > 0,
                               sumqx / np.where(sumq2 > 0, sumq2, 1),
                               d_super)).astype(np.float16)

    out = np.zeros((nb, 110), np.uint8)
    out[:, 0:2] = d_final.view(np.uint8).reshape(nb, 2)
    extra = np.zeros(nb, np.uint16)
    sh = np.zeros(nb, np.uint16)
    for ib in range(16):
        extra |= is_shifted[:, ib].astype(np.uint16) << ib
        sh |= sign[:, ib].astype(np.uint16) << ib
    out[:, 2:4] = extra[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 4:6] = sh[:, None].view(np.uint8).reshape(nb, 2)
    for ib in range(16):
        out[:, 6 + ib // 2] |= ls[:, ib].astype(np.uint8) << (4 * (ib % 2))
    qs = out[:, 14:78]
    qh = out[:, 78:110]
    idx16 = idx.reshape(nb, 16, 16)
    for ib in range(16):
        ib32 = ib // 2
        col = 32 * (ib32 // 4) + 16 * (ib % 2)
        hcol = 16 * (ib % 2)
        iv = idx16[:, ib]
        qs[:, col:col + 16] |= (iv & 3) << (2 * (ib32 % 4))
        qh[:, hcol:hcol + 16] |= (iv >> 2) << (ib32 % 8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ3_KS: f16 row d, 8x32 blocks, 5-bit scales (nibble + extra bit), shift
# flags in extra bits 8-15 (iqk_quantize.cpp:2588-2758; ntry=5)
# ---------------------------------------------------------------------------

def quantize_iq3_ks(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, x.shape[-1]).astype(np.float32)
    nrows, n = x.shape
    nb = n // QK_K
    g = x.reshape(nrows, nb, 8, 32)
    sig = _sigma2(x.reshape(-1, QK_K)).reshape(nrows, nb, 1, 1)
    if imatrix is None:
        w = g * g
    else:
        qw = np.broadcast_to(imatrix.reshape(1, nb, 8, 32), g.shape)
        w = qw * np.sqrt(sig + g * g)

    vals = luts.IQ3NL_VALUES[:8].astype(np.float32)
    sh_vals = luts.IQ3NL_VALUES[8:].astype(np.float32)
    d_blk, is_shifted = _lut_scale_search(g, w, vals, sh_vals, ntry=5)

    # per-ROW super scale d = -max_scale/16 (f16), signed max by |.|
    flat = d_blk.reshape(nrows, -1)
    amax_pos = np.abs(flat).argmax(-1)
    max_scale = np.take_along_axis(flat, amax_pos[:, None], -1)[:, 0]
    d_row = (-max_scale / 16.0).astype(np.float16).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        id_r = np.where(d_row != 0, 1.0 / np.where(d_row != 0, d_row, 1), 0)
    l = np.clip(_nearest_int(id_r[:, None, None] * d_blk), -16, 15)
    ul = (l + 16).astype(np.uint8)
    dl = d_row[:, None, None] * l
    idx, q = _encode_with_tables(g.reshape(nrows, nb * 8, 32),
                                 dl.reshape(nrows, nb * 8),
                                 is_shifted.reshape(nrows, nb * 8),
                                 vals, sh_vals)
    sumqx, sumq2 = _final_refit(w.reshape(nrows, nb * 8, 32), q,
                                l.reshape(nrows, nb * 8).astype(np.float32),
                                g.reshape(nrows, nb * 8, 32))
    d_final = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1),
                       d_row).astype(np.float16)
    d_final = np.where(d_row == 0, np.float16(0), d_final)

    out = np.zeros((nrows, 2 + nb * 102), np.uint8)
    out[:, 0:2] = d_final[:, None].view(np.uint8).reshape(nrows, 2)
    body = out[:, 2:].reshape(nrows, nb, 102)
    extra = np.zeros((nrows, nb), np.uint16)
    for ib in range(8):
        extra |= is_shifted[:, :, ib].astype(np.uint16) << (8 + ib)
        extra |= (ul[:, :, ib] >> 4).astype(np.uint16) << ib
        body[:, :, 2 + ib % 4] |= (ul[:, :, ib] & 0x0F) << (4 * (ib // 4))
    body[:, :, 0:2] = extra[:, :, None].view(np.uint8).reshape(nrows, nb, 2)
    qs = body[:, :, 6:70].reshape(nrows, nb, 2, 32)
    qh = body[:, :, 70:102]
    idx = idx.reshape(nrows, nb, 8, 32)
    for ib in range(8):
        iv = idx[:, :, ib]
        qs[:, :, ib // 4] |= (iv & 3) << (2 * (ib % 4))
        qh |= (iv >> 2) << (ib % 8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ2 family: exhaustive 3-split partition search over sorted blocks
# (quantize_row_iq2_k_impl iqk_quantize.cpp:1190; iq2_ks :1692)
# ---------------------------------------------------------------------------

_TRIPLES_CACHE: dict = {}


def _triples(bs: int, i1_max: int, i3_min: int):
    key = (bs, i1_max, i3_min)
    if key not in _TRIPLES_CACHE:
        t = [(i1, i2, i3)
             for i1 in range(i1_max)
             for i2 in range(i1, bs)
             for i3 in range(max(i2, i3_min), bs)]
        a = np.asarray(t, np.int64)
        _TRIPLES_CACHE[key] = (a[:, 0], a[:, 1], a[:, 2])
    return _TRIPLES_CACHE[key]


def _partition3_search(g, w, vals4, shifted4, i1_max=None, i3_min=0,
                       chunk=2048):
    """Exhaustive 3-threshold split of each sorted block onto a 4-value
    codebook (base/shifted, forward/reversed) — the reference's iq2 search.
    g, w: (NB, BS). Returns (d, is_shifted)."""
    NB, BS = g.shape
    i1_max = BS if i1_max is None else i1_max
    I1, I2, I3 = _triples(BS, i1_max, i3_min)
    variants = [(vals4, False), (shifted4, True),
                (vals4[::-1], False), (shifted4[::-1], True)]

    d_out = np.zeros(NB, np.float32)
    sh_out = np.zeros(NB, bool)
    for lo in range(0, NB, chunk):
        gs = g[lo:lo + chunk]
        ws = w[lo:lo + chunk]
        order = np.argsort(gs, axis=-1, kind="stable")
        xs = np.take_along_axis(gs, order, -1)
        wsrt = np.take_along_axis(ws, order, -1)
        z = np.zeros((gs.shape[0], 1), np.float32)
        sumx = np.concatenate([z, np.cumsum(wsrt * xs, -1)], -1)
        sumw = np.concatenate([z, np.cumsum(wsrt, -1)], -1)
        X1 = sumx[:, I1]
        X2 = sumx[:, I2] - X1
        X3 = sumx[:, I3] - sumx[:, I2]
        X4 = sumx[:, -1:] - sumx[:, I3]
        W1 = sumw[:, I1]
        W2 = sumw[:, I2] - W1
        W3 = sumw[:, I3] - sumw[:, I2]
        W4 = sumw[:, -1:] - sumw[:, I3]
        best = np.zeros(gs.shape[0], np.float32)
        d = np.zeros(gs.shape[0], np.float32)
        shf = np.zeros(gs.shape[0], bool)
        for v, is_sh in variants:
            v = v.astype(np.float32)
            sumqx = X1 * v[0] + X2 * v[1] + X3 * v[2] + X4 * v[3]
            sumq2 = (W1 * v[0] * v[0] + W2 * v[1] * v[1]
                     + W3 * v[2] * v[2] + W4 * v[3] * v[3])
            score = np.where(sumq2 > 0, sumqx * sumqx /
                             np.where(sumq2 > 0, sumq2, 1), 0.0)
            j = score.argmax(-1)
            sc = np.take_along_axis(score, j[:, None], -1)[:, 0]
            qx = np.take_along_axis(sumqx, j[:, None], -1)[:, 0]
            q2 = np.take_along_axis(sumq2, j[:, None], -1)[:, 0]
            better = sc > best
            with np.errstate(divide="ignore", invalid="ignore"):
                cand = np.where(q2 > 0, qx / np.where(q2 > 0, q2, 1), 0.0)
            d = np.where(better, cand, d)
            shf = np.where(better, is_sh, shf)
            best = np.where(better, sc, best)
        dead = np.abs(gs).max(-1) < 1e-16
        d_out[lo:lo + chunk] = np.where(dead, 0.0, d)
        sh_out[lo:lo + chunk] = np.where(dead, False, shf)
    return d_out, sh_out


def quantize_iq2_k(x: np.ndarray, imatrix=None) -> np.ndarray:
    from .quantize import _make_qx_quants
    n = x.shape[-1]
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    sig = 0.75 * _sigma2(x)        # 1.5 * sumx2 / QK_K
    if imatrix is None:
        w = 0.25 * sig + g * g
    else:
        im = np.tile(imatrix.reshape(n // QK_K, 16, 16),
                     (nb // (n // QK_K), 1, 1))
        w = im * np.sqrt(sig + g * g)

    vals = luts.IQ2NL_VALUES[:4]
    sh_vals = luts.IQ2NL_VALUES[4:]
    d_blk, is_shifted = _partition3_search(g.reshape(-1, 16),
                                           w.reshape(-1, 16), vals, sh_vals)
    d_blk = d_blk.reshape(nb, 16)
    is_shifted = is_shifted.reshape(nb, 16)

    sw = w.sum(-1)
    d_super, ls = _make_qx_quants(d_blk, 8, sw)
    ls = np.clip(ls, -8, 7)
    dl = d_super[:, None] * ls
    idx, q = _encode_with_tables(g, dl, is_shifted,
                                 vals.astype(np.float32),
                                 sh_vals.astype(np.float32))
    sumqx, sumq2 = _final_refit(w, q, ls.astype(np.float32), g)
    d_final = (1.030 * np.where(sumq2 > 0,
                                sumqx / np.where(sumq2 > 0, sumq2, 1),
                                d_super)).astype(np.float16)
    d_final = np.where(np.abs(d_blk).max(-1) == 0, np.float16(0), d_final)

    out = np.zeros((nb, 76), np.uint8)
    out[:, 0:2] = d_final.view(np.uint8).reshape(nb, 2)
    extra = np.zeros(nb, np.uint16)
    for ib in range(16):
        extra |= is_shifted[:, ib].astype(np.uint16) << ib
        out[:, 4 + ib // 2] |= (ls[:, ib] + 8).astype(np.uint8) << (4 * (ib % 2))
    out[:, 2:4] = extra[:, None].view(np.uint8).reshape(nb, 2)
    qs = out[:, 12:]
    idx16 = idx.reshape(nb, 16, 16)
    for ib in range(16):
        ib32 = ib // 2
        col = 32 * (ib32 // 4) + 16 * (ib % 2)
        qs[:, col:col + 16] |= idx16[:, ib] << (2 * (ib32 % 4))
    return out.reshape(-1)


def quantize_iq2_ks(x: np.ndarray, imatrix=None) -> np.ndarray:
    from .quantize import _make_qx_quants
    x = x.reshape(-1, x.shape[-1]).astype(np.float32)
    nrows, n = x.shape
    nb = n // QK_K
    g = x.reshape(nrows, nb, 8, 32)
    sig = 0.75 * _sigma2(x.reshape(-1, QK_K)).reshape(nrows, nb, 1, 1)
    if imatrix is None:
        w = 0.25 * sig + g * g
    else:
        qw = np.broadcast_to(imatrix.reshape(1, nb, 8, 32), g.shape)
        w = qw * np.sqrt(sig + g * g)

    vals = luts.IQ2NL_VALUES[:4]
    sh_vals = luts.IQ2NL_VALUES[4:]
    d_blk, is_shifted = _partition3_search(
        g.reshape(-1, 32), w.reshape(-1, 32), vals, sh_vals,
        i1_max=24, i3_min=8)
    d_blk = d_blk.reshape(nrows, nb * 8)
    is_shifted = is_shifted.reshape(nrows, nb, 8)

    sw = w.sum(-1).reshape(nrows, nb * 8)
    d_row, ls = _make_qx_quants(d_blk, 16, sw)          # ls in [-16, 15]
    ls = np.clip(ls, -16, 15)
    uls = (ls + 16).astype(np.uint8).reshape(nrows, nb, 8)
    dl = d_row[:, None] * ls
    idx, q = _encode_with_tables(g.reshape(nrows, nb * 8, 32), dl,
                                 is_shifted.reshape(nrows, nb * 8),
                                 vals.astype(np.float32),
                                 sh_vals.astype(np.float32))
    sumqx, sumq2 = _final_refit(w.reshape(nrows, nb * 8, 32), q,
                                ls.astype(np.float32),
                                g.reshape(nrows, nb * 8, 32))
    d_final = (1.030 * np.where(sumq2 > 0,
                                sumqx / np.where(sumq2 > 0, sumq2, 1),
                                d_row)).astype(np.float16)
    d_final = np.where(d_row == 0, np.float16(0), d_final)

    out = np.zeros((nrows, 2 + nb * 70), np.uint8)
    out[:, 0:2] = d_final[:, None].view(np.uint8).reshape(nrows, 2)
    body = out[:, 2:].reshape(nrows, nb, 70)
    extra = np.zeros((nrows, nb), np.uint16)
    for ib in range(8):
        extra |= is_shifted[:, :, ib].astype(np.uint16) << ib
        extra |= (uls[:, :, ib] >> 4).astype(np.uint16) << (8 + ib)
        body[:, :, 2 + ib // 2] |= (uls[:, :, ib] & 0x0F) << (4 * (ib % 2))
    body[:, :, 0:2] = extra[:, :, None].view(np.uint8).reshape(nrows, nb, 2)
    qs = body[:, :, 6:].reshape(nrows, nb, 2, 32)
    idx = idx.reshape(nrows, nb, 8, 32)
    for ib in range(8):
        qs[:, :, ib // 4] |= idx[:, :, ib] << (2 * (ib % 4))
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ2_KL: pair codebook (32 of the 64 iq3nl x iq3nl pairs)
# (iqk_quantize.cpp:1983-2216; ntry=5, w=|x|, sigma=2.25x, d=-max/32)
# ---------------------------------------------------------------------------

def _kl_best_pair(sx1, sx2, w1, w2):
    """Weighted nearest pair over the full 32-entry grid (exact version of
    the reference's LUT + 8-neighbour search)."""
    gridv = luts.IQ2KL_PAIRS.astype(np.float32)          # (32, 2)
    score = (w1[..., None] * (gridv[:, 0] - sx1[..., None]) ** 2
             + w2[..., None] * (gridv[:, 1] - sx2[..., None]) ** 2)
    return score.argmin(-1)


def quantize_iq2_kl(x: np.ndarray, imatrix=None) -> np.ndarray:
    x = x.reshape(-1, x.shape[-1]).astype(np.float32)
    nrows, n = x.shape
    x = x.reshape(-1, QK_K)
    nb = x.shape[0]
    g = x.reshape(nb, 8, 32)
    sig = 1.125 * _sigma2(x)       # 2.25 * sumx2 / QK_K
    if imatrix is None:
        w = np.abs(g)
    else:
        im = np.tile(imatrix.reshape(n // QK_K, 8, 32),
                     (nb // (n // QK_K), 1, 1))
        w = im * np.sqrt(sig + g * g)

    gridv = luts.IQ2KL_PAIRS.astype(np.float32)
    g1, g2 = g[..., 0::2], g[..., 1::2]                  # (nb, 8, 16)
    w1, w2 = w[..., 0::2], w[..., 1::2]
    v0 = float(luts.IQ3NL_VALUES[0])

    amax_pos = np.abs(g).argmax(-1)
    maxv = np.take_along_axis(g, amax_pos[..., None], -1)[..., 0]
    dead = np.abs(maxv) < 1e-16
    safe_max = np.where(dead, 1.0, maxv)

    def eval_id(id_):
        q = gridv[_kl_best_pair(g1 * id_[..., None], g2 * id_[..., None],
                                w1, w2)]               # (nb, 8, 16, 2)
        sumqx = (w1 * q[..., 0] * g1 + w2 * q[..., 1] * g2).sum(-1)
        sumq2 = (w1 * q[..., 0] ** 2 + w2 * q[..., 1] ** 2).sum(-1)
        return sumqx, sumq2

    best = np.zeros((nb, 8), np.float32)
    d_blk = np.zeros((nb, 8), np.float32)
    id0 = 1.0 / (-safe_max / v0)
    for id_ in (id0, -id0):
        sumqx, sumq2 = eval_id(id_)
        better = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
        with np.errstate(divide="ignore", invalid="ignore"):
            cand = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0)
        d_blk = np.where(better, cand, d_blk)
        best = np.where(better, cand * sumqx, best)
    for itry in range(-5, 6):
        id_ = (itry + v0) / safe_max
        for s in (1.0, -1.0):
            sumqx, sumq2 = eval_id(s * id_)
            better = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
            with np.errstate(divide="ignore", invalid="ignore"):
                cand = np.where(sumq2 > 0,
                                sumqx / np.where(sumq2 > 0, sumq2, 1), 0)
            d_blk = np.where(better, cand, d_blk)
            best = np.where(better, cand * sumqx, best)
    d_blk = np.where(dead, 0.0, d_blk)

    flat = d_blk.reshape(nrows, -1)
    amax_pos = np.abs(flat).argmax(-1)
    max_scale = np.take_along_axis(flat, amax_pos[:, None], -1)[:, 0]
    d_row = (-max_scale / 32.0).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        id_r = np.where(d_row != 0, 1.0 / np.where(d_row != 0, d_row, 1), 0)
    d_rb = np.repeat(d_row, nb // nrows)                 # per superblock
    ls = np.clip(_nearest_int(np.repeat(id_r, nb // nrows)[:, None] * d_blk),
                 -32, 31)
    dl = d_rb[:, None] * ls
    with np.errstate(divide="ignore", invalid="ignore"):
        idl = np.where(dl != 0, 1.0 / np.where(dl != 0, dl, 1), 0.0)
    pair_idx = _kl_best_pair(g1 * idl[..., None], g2 * idl[..., None], w1, w2)
    q = gridv[pair_idx]
    lsf = ls.astype(np.float32)[..., None]
    sumqx = ((w1 * (q[..., 0] * lsf) * g1
              + w2 * (q[..., 1] * lsf) * g2).sum((-1, -2))
             .reshape(nrows, -1).sum(-1))
    sumq2 = ((w1 * (q[..., 0] * lsf) ** 2
              + w2 * (q[..., 1] * lsf) ** 2).sum((-1, -2))
             .reshape(nrows, -1).sum(-1))
    d_final = (1.025 * np.where(sumq2 > 0,
                                sumqx / np.where(sumq2 > 0, sumq2, 1),
                                d_row)).astype(np.float16)
    d_final = np.where(d_row == 0, np.float16(0), d_final)

    nsb = nb // nrows
    out = np.zeros((nrows, 2 + nsb * 86), np.uint8)
    out[:, 0:2] = d_final[:, None].view(np.uint8).reshape(nrows, 2)
    # NOTE: (nrows, nsb, 86) keeps a writable VIEW of `out` (only the last
    # axis is split); merging to (nb, 86) would silently copy
    body = out[:, 2:].reshape(nrows, nsb, 86)
    uls = (ls + 32).astype(np.uint8).reshape(nrows, nsb, 8)
    sh16 = np.zeros((nrows, nsb), np.uint16)
    for ib in range(8):
        body[:, :, 2 + ib % 4] |= (uls[:, :, ib] & 0x0F) << (4 * (ib // 4))
        sh16 |= (uls[:, :, ib] >> 4).astype(np.uint16) << (2 * ib)
    body[:, :, 0:2] = sh16[:, :, None].view(np.uint8).reshape(nrows, nsb, 2)
    qs = body[:, :, 6:70]
    qh = body[:, :, 70:86]
    pi = pair_idx.astype(np.uint8).reshape(nrows, nsb, 8, 16)
    for ib in range(8):
        col = 16 * (ib // 2)
        qs[:, :, col:col + 16] |= (pi[:, :, ib] & 0x0F) << (4 * (ib % 2))
        qh |= (pi[:, :, ib] >> 4) << ib
    return out.reshape(-1)


IQK_QUANTIZE_FNS = {
    GGMLType.IQ4_KS: quantize_iq4_ks,
    GGMLType.IQ4_K: quantize_iq4_k,
    GGMLType.IQ5_KS: quantize_iq5_ks,
    GGMLType.IQ5_K: quantize_iq5_k,
    GGMLType.IQ6_K: quantize_iq6_k,
    GGMLType.IQ3_K: quantize_iq3_k,
    GGMLType.IQ3_KS: quantize_iq3_ks,
    GGMLType.IQ2_K: quantize_iq2_k,
    GGMLType.IQ2_KS: quantize_iq2_ks,
    GGMLType.IQ2_KL: quantize_iq2_kl,
}
