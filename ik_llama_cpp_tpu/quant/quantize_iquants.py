"""Codebook i-quant encoders: IQ2_XXS/XS/S, IQ3_XXS/S, IQ1_S/M.

Reference algorithms: quantize_row_iq2_xxs_impl / iq2_xs / iq2_s /
iq3_xxs / iq3_s / iq1_s / iq1_m in ggml-quants.c (:12979-15200).  The
reference rounds each 8- (or 4-) element group to a lattice level vector,
then repairs off-grid points via precomputed nearest-neighbour lists.  Our
re-derivation replaces the neighbour heuristic with an exact weighted
search over the WHOLE codebook, vectorized over every group at once:

    best g = argmax_g  s * (2*A[g] - s*B[g]),   A = sum_i w_i x_i c_gi,
                                                B = sum_i w_i c_gi^2

A and B are computed once per block as two matmuls against the grid, so a
candidate-scale sweep costs only an elementwise argmax per step.  This is
never worse than the reference's restricted neighbour search at equal
scale, and the same weighted-LS scale refit / 4-bit (2l+1) scale
quantization / fudge factors are kept, so quality lands at-or-above the
reference encoder (validated in tests/test_quantize_iquants.py).

Sign handling mirrors the reference: XXS-family formats store 7-bit sign
masks with even parity (the lowest-importance element is flipped when the
negative count is odd, ksigns_iq2xs), S-formats store free 8-bit masks,
and the IQ1 grids carry signed values with the per-block +/-IQ1S_DELTA
shift.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, QK_K
from .iquants import (GRID_IQ1S, GRID_IQ2S, GRID_IQ2XS, GRID_IQ2XXS,
                      GRID_IQ3S, GRID_IQ3XXS, IQ1S_DELTA)
from .quantize import _nearest_int


def _f16b(a: np.ndarray) -> np.ndarray:
    return a.astype(np.float16).view(np.uint8).reshape(a.shape + (2,))


def _expand_imatrix(imatrix, nrows: int, n: int):
    """Per-row-position imatrix (n,) -> per-superblock (nsb, QK_K)."""
    if imatrix is None:
        return None
    return np.ascontiguousarray(np.broadcast_to(
        np.asarray(imatrix, np.float32).reshape(1, n),
        (nrows, n))).reshape(-1, QK_K)


def _weights(xb, im_sb, sigma_mult: float, plain: str):
    """xb: (nsb, QK_K) superblocks; im_sb: (nsb, QK_K) or None.

    No-imatrix mode uses the all-ones imatrix weighting sqrt(sigma2 + x^2)
    rather than the reference's plain x^2 / 0.25*sigma2+x^2 heuristics: the
    whole-codebook argmax needs positive weight on near-zero elements (the
    reference's elementwise rounding keeps them small implicitly), and the
    flatter weighting measurably BEATS the reference's plain-mode
    reconstruction error on its own synthetic data (see
    tests/test_quantize_iquants.py) — matching how ggml_quantize_chunk
    behaves anyway for the imatrix-required types (ones substituted)."""
    del plain
    sigma2 = sigma_mult * np.mean(xb * xb, axis=1, keepdims=True)
    if im_sb is None:
        return np.sqrt(sigma2 + xb * xb)
    return im_sb * np.sqrt(sigma2 + xb * xb)


def _parity_signs(xb, w):
    """xb, w: (..., 8). Even-parity sign handling: returns (xval, sbits)
    where sbits is the full 8-bit negative mask (even popcount) and xval is
    |x| except the flipped lowest-importance element, which goes negative."""
    neg = xb < 0
    xval = np.abs(xb)
    sbits = (neg << np.arange(8)).sum(-1).astype(np.uint8)
    odd = (neg.sum(-1) & 1) == 1
    imin = (w * xb * xb).argmin(-1)
    flip = odd[..., None] & (np.arange(8) == imin[..., None])
    xval = np.where(flip, -xval, xval)
    sbits ^= (flip << np.arange(8)).sum(-1).astype(np.uint8)
    return xval, sbits


def _codebook_fit(xval, w, C, id_candidates):
    """Exact weighted codebook search with a candidate-scale sweep.

    xval, w: (NB, nsub, gd); C: (G, gd) float32; id_candidates: (NB, K)
    candidate INVERSE scales. Returns (scale (NB,), gidx (NB, nsub) int32).
    """
    A = np.einsum("bsg,cg->bsc", xval * w, C, optimize=True)
    B = np.einsum("bsg,cg->bsc", w, C * C, optimize=True)

    nbk = xval.shape[0]
    best = np.zeros(nbk)
    scale = np.zeros(nbk)
    for k in range(id_candidates.shape[1]):
        idk = id_candidates[:, k]
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(idk != 0, 1.0 / np.where(idk != 0, idk, 1), 0.0)
        score = 2.0 * A - s[:, None, None] * B
        gi = score.argmax(axis=2)
        sumqx = np.take_along_axis(A, gi[:, :, None], 2)[:, :, 0].sum(1)
        sumq2 = np.take_along_axis(B, gi[:, :, None], 2)[:, :, 0].sum(1)
        ok = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
        with np.errstate(divide="ignore", invalid="ignore"):
            cand = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1),
                            0.0)
        scale = np.where(ok, cand, scale)
        best = np.where(ok, cand * sumqx, best)

    # final snap at the winning scale + LS refit
    score = 2.0 * A - scale[:, None, None] * B
    gidx = score.argmax(axis=2)
    sumqx = np.take_along_axis(A, gidx[:, :, None], 2)[:, :, 0].sum(1)
    sumq2 = np.take_along_axis(B, gidx[:, :, None], 2)[:, :, 0].sum(1)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1),
                         scale)
    return scale.astype(np.float64), gidx.astype(np.int32)


def _id_sweep(xval, qhi: float, lo: float, hi: float, steps: int):
    """Candidate inverse scales (NB, steps) spanning [lo, hi]*qhi/max."""
    mx = np.abs(xval).max(axis=(1, 2))
    dead = mx < 1e-14
    safe = np.where(dead, 1.0, mx)
    f = np.linspace(lo, hi, steps, dtype=np.float64)
    ids = (qhi * f)[None, :] / safe[:, None]
    return np.where(dead[:, None], 0.0, ids)


def _block_scale_4bit(scales, fudge: float):
    """Per-superblock d = max/31 (odd 2l+1 block scales, 4-bit l)."""
    max_scale = scales.max(axis=1)
    live = max_scale > 0
    d = np.where(live, max_scale / 31.0, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        idv = np.where(live, 1.0 / np.where(live, d, 1), 0.0)
    ls = _nearest_int(0.5 * (idv[:, None] * scales - 1)).clip(0, 15)
    return (d * fudge).astype(np.float32), ls.astype(np.uint32)


def _sign_flip_if_negative(scale, sbits, mask):
    neg = scale < 0
    sbits = np.where(neg[..., None], (~sbits) & mask, sbits)
    return np.abs(scale), sbits


# ---------------------------------------------------------------------------
# IQ2_XXS: 256-entry 8-dim grid (c = byte/8), parity signs, scale per 32
# ---------------------------------------------------------------------------

def quantize_iq2_xxs(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xb = x.reshape(-1, QK_K).astype(np.float32)
    nsb = xb.shape[0]
    w = _weights(xb, _expand_imatrix(imatrix, x.size // n, n), 1.0, "x2s").reshape(nsb, 8, 4, 8)
    g8 = xb.reshape(nsb, 8, 4, 8)
    xval, sbits = _parity_signs(g8, w)

    C = GRID_IQ2XXS.astype(np.float32) / 8.0
    xv = xval.reshape(nsb * 8, 4, 8)
    ids = _id_sweep(xv, 5.0, 0.7, 2.2, 31)
    scale, gidx = _codebook_fit(xv, w.reshape(nsb * 8, 4, 8), C, ids)
    scale = scale.reshape(nsb, 8)
    gidx = gidx.reshape(nsb, 8, 4)
    scale, sbits = _sign_flip_if_negative(scale, sbits, 0xFF)

    d, ls = _block_scale_4bit(scale, 1.0)
    s7 = (sbits & 127).astype(np.uint32)
    aux32 = (s7[..., 0] | (s7[..., 1] << 7) | (s7[..., 2] << 14)
             | (s7[..., 3] << 21) | (ls << 28)).astype(np.uint32)
    out = np.empty((nsb, 66), np.uint8)
    out[:, 0:2] = _f16b(d).reshape(nsb, 2)
    body = out[:, 2:].reshape(nsb, 8, 8)
    body[:, :, 0:4] = gidx.astype(np.uint8)
    body[:, :, 4:8] = aux32[:, :, None].view(np.uint8).reshape(nsb, 8, 4)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ2_XS: 512-entry grid, parity signs, scale per 16, LS-refit d * 1.05
# ---------------------------------------------------------------------------

def quantize_iq2_xs(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xb = x.reshape(-1, QK_K).astype(np.float32)
    nsb = xb.shape[0]
    w = _weights(xb, _expand_imatrix(imatrix, x.size // n, n), 2.0, "x2s").reshape(nsb, 16, 2, 8)
    g8 = xb.reshape(nsb, 16, 2, 8)
    xval, sbits = _parity_signs(g8, w)

    C = GRID_IQ2XS.astype(np.float32) / 8.0
    xv = xval.reshape(nsb * 16, 2, 8)
    ids = _id_sweep(xv, 5.0, 0.7, 2.2, 31)
    scale, gidx = _codebook_fit(xv, w.reshape(nsb * 16, 2, 8), C, ids)
    scale = scale.reshape(nsb, 16)
    gidx = gidx.reshape(nsb, 16, 2)
    scale, sbits = _sign_flip_if_negative(scale, sbits, 0xFF)

    d, ls = _block_scale_4bit(scale, 1.0)
    # re-quantized q for the global LS refit (d * 1.05 fudge)
    leff = (2 * ls + 1).astype(np.float64)                 # (nsb, 16)
    q = (GRID_IQ2XS.astype(np.float64)[gidx] / 8.0) * leff[:, :, None, None]
    sumqx = (w * q * xval).sum(axis=(1, 2, 3))
    sumq2 = (w * q * q).sum(axis=(1, 2, 3))
    with np.errstate(divide="ignore", invalid="ignore"):
        d = np.where(sumq2 > 0,
                     1.05 * sumqx / np.where(sumq2 > 0, sumq2, 1),
                     d).astype(np.float32)
    d = np.where(scale.max(axis=1) > 0, d, 0.0).astype(np.float32)

    q16 = (gidx.astype(np.uint32)
           | ((sbits & 127).astype(np.uint32) << 9)).astype(np.uint16)
    out = np.empty((nsb, 74), np.uint8)
    out[:, 0:2] = _f16b(d).reshape(nsb, 2)
    out[:, 2:66] = q16.reshape(nsb, 32).astype("<u2").view(np.uint8).reshape(
        nsb, 64)
    out[:, 66:74] = (ls[:, 0::2] | (ls[:, 1::2] << 4)).astype(np.uint8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ2_S: 1024-entry grid, FREE 8-bit signs, scale per 16, d * 0.9875
# ---------------------------------------------------------------------------

def quantize_iq2_s(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xb = x.reshape(-1, QK_K).astype(np.float32)
    nsb = xb.shape[0]
    w = _weights(xb, _expand_imatrix(imatrix, x.size // n, n), 2.0, "x2s").reshape(nsb, 16, 2, 8)
    g8 = xb.reshape(nsb, 16, 2, 8)
    xval = np.abs(g8)
    sbits = ((g8 < 0) << np.arange(8)).sum(-1).astype(np.uint8)

    C = GRID_IQ2S.astype(np.float32) / 8.0
    xv = xval.reshape(nsb * 16, 2, 8)
    ids = _id_sweep(xv, 5.0, 0.7, 2.2, 31)
    scale, gidx = _codebook_fit(xv, w.reshape(nsb * 16, 2, 8), C, ids)
    scale = scale.reshape(nsb, 16)
    gidx = gidx.reshape(nsb, 16, 2)
    scale, sbits = _sign_flip_if_negative(scale, sbits, 0xFF)

    d, ls = _block_scale_4bit(scale, 0.9875)
    out = np.zeros((nsb, 82), np.uint8)
    out[:, 0:2] = _f16b(d).reshape(nsb, 2)
    gi = gidx.reshape(nsb, 32)
    out[:, 2:34] = (gi & 255).astype(np.uint8)
    out[:, 34:66] = sbits.reshape(nsb, 32)
    hi = (gi >> 8).astype(np.uint8).reshape(nsb, 8, 4)
    out[:, 66:74] = (hi[:, :, 0] | (hi[:, :, 1] << 2) | (hi[:, :, 2] << 4)
                     | (hi[:, :, 3] << 6))
    out[:, 74:82] = (ls[:, 0::2] | (ls[:, 1::2] << 4)).astype(np.uint8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ3_XXS: 256-entry 4-dim grid (c = byte/4), parity signs per 8, d * 1.0125
# ---------------------------------------------------------------------------

def quantize_iq3_xxs(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xb = x.reshape(-1, QK_K).astype(np.float32)
    nsb = xb.shape[0]
    w = _weights(xb, _expand_imatrix(imatrix, x.size // n, n), 1.0, "x2").reshape(nsb, 8, 4, 8)
    g8 = xb.reshape(nsb, 8, 4, 8)
    xval, sbits = _parity_signs(g8, w)

    C = GRID_IQ3XXS.astype(np.float32) / 4.0
    xv = xval.reshape(nsb * 8, 8, 4)                 # 8 groups of 4
    ids = _id_sweep(xv, 15.0, 0.7, 2.2, 37)
    scale, gidx = _codebook_fit(xv, w.reshape(nsb * 8, 8, 4), C, ids)
    scale = scale.reshape(nsb, 8)
    gidx = gidx.reshape(nsb, 8, 8)
    scale, sbits = _sign_flip_if_negative(scale, sbits, 0xFF)

    d, ls = _block_scale_4bit(scale, 1.0125)
    s7 = (sbits & 127).astype(np.uint32)
    aux32 = (s7[..., 0] | (s7[..., 1] << 7) | (s7[..., 2] << 14)
             | (s7[..., 3] << 21) | (ls << 28)).astype(np.uint32)
    out = np.empty((nsb, 98), np.uint8)
    out[:, 0:2] = _f16b(d).reshape(nsb, 2)
    out[:, 2:66] = gidx.astype(np.uint8).reshape(nsb, 64)
    out[:, 66:98] = aux32.view(np.uint8).reshape(nsb, 32)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ3_S: 512-entry 4-dim grid (c = byte), free signs, d * 1.033
# ---------------------------------------------------------------------------

def quantize_iq3_s(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xb = x.reshape(-1, QK_K).astype(np.float32)
    nsb = xb.shape[0]
    w = _weights(xb, _expand_imatrix(imatrix, x.size // n, n), 2.0, "x2").reshape(nsb, 8, 4, 8)
    g8 = xb.reshape(nsb, 8, 4, 8)
    xval = np.abs(g8)
    sbits = ((g8 < 0) << np.arange(8)).sum(-1).astype(np.uint8)

    C = GRID_IQ3S.astype(np.float32)
    xv = xval.reshape(nsb * 8, 8, 4)
    ids = _id_sweep(xv, 15.0, 0.7, 2.2, 37)
    scale, gidx = _codebook_fit(xv, w.reshape(nsb * 8, 8, 4), C, ids)
    scale = scale.reshape(nsb, 8)
    gidx = gidx.reshape(nsb, 8, 8)
    scale, sbits = _sign_flip_if_negative(scale, sbits, 0xFF)

    d, ls = _block_scale_4bit(scale, 1.033)
    out = np.zeros((nsb, 110), np.uint8)
    out[:, 0:2] = _f16b(d).reshape(nsb, 2)
    out[:, 2:66] = (gidx & 255).astype(np.uint8).reshape(nsb, 64)
    hibits = (gidx >> 8).astype(np.uint8)            # (nsb, 8, 8)
    out[:, 66:74] = (hibits << np.arange(8)).sum(-1).astype(np.uint8)
    out[:, 74:106] = sbits.reshape(nsb, 32)
    out[:, 106:110] = (ls[:, 0::2] | (ls[:, 1::2] << 4)).astype(np.uint8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ1_S: 2048-entry signed grid + per-32 +/-delta shift, 3-bit scales
# ---------------------------------------------------------------------------

def _iq1_fit(xv, w, shift_group: bool):
    """xv, w: (NB, nsub, 8) SIGNED values (IQ1 grids carry signs).

    Returns (scale, gidx, use_m) — use_m per block (shift_group=False) or
    per group (True), choosing grid+delta vs grid-delta."""
    Cp = GRID_IQ1S.astype(np.float32) + IQ1S_DELTA
    Cm = GRID_IQ1S.astype(np.float32) - IQ1S_DELTA
    ids = _id_sweep(xv, 1.125, 0.7, 2.2, 31)
    sp, gp = _codebook_fit(xv, w, Cp, ids)
    sm, gm = _codebook_fit(xv, w, Cm, ids)

    def sse(C, g, s):
        q = C[g] * s[:, None, None]
        return (w * (xv - q) ** 2).sum(axis=(1, 2))

    if not shift_group:
        use_m = sse(Cm, gm, sm) < sse(Cp, gp, sp)
        gidx = np.where(use_m[:, None], gm, gp)
        scale = np.where(use_m, sm, sp)
        return scale, gidx, use_m
    # per-group choice with a shared block scale: pick the table per group
    # at the block's better scale, then refit
    use_block_m = sse(Cm, gm, sm) < sse(Cp, gp, sp)
    scale = np.where(use_block_m, sm, sp)
    Ap = np.einsum("bsg,cg->bsc", xv * w, Cp, optimize=True)
    Bp = np.einsum("bsg,cg->bsc", w, Cp * Cp, optimize=True)
    Am = np.einsum("bsg,cg->bsc", xv * w, Cm, optimize=True)
    Bm = np.einsum("bsg,cg->bsc", w, Cm * Cm, optimize=True)
    sc = scale[:, None, None]
    scp = 2.0 * Ap - sc * Bp
    scm = 2.0 * Am - sc * Bm
    gip = scp.argmax(axis=2)
    gim = scm.argmax(axis=2)
    vp = np.take_along_axis(scp, gip[:, :, None], 2)[:, :, 0]
    vm = np.take_along_axis(scm, gim[:, :, None], 2)[:, :, 0]
    use_m = vm > vp                                   # per group
    gidx = np.where(use_m, gim, gip)
    sumqx = np.where(use_m,
                     np.take_along_axis(Am, gim[:, :, None], 2)[:, :, 0],
                     np.take_along_axis(Ap, gip[:, :, None], 2)[:, :, 0])
    sumq2 = np.where(use_m,
                     np.take_along_axis(Bm, gim[:, :, None], 2)[:, :, 0],
                     np.take_along_axis(Bp, gip[:, :, None], 2)[:, :, 0])
    sx, s2 = sumqx.sum(1), sumq2.sum(1)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(s2 > 0, sx / np.where(s2 > 0, s2, 1), scale)
    return scale, gidx, use_m


def quantize_iq1_s(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xb = x.reshape(-1, QK_K).astype(np.float32)
    nsb = xb.shape[0]
    if imatrix is None:
        imatrix = np.ones(n, np.float32)   # quantize_row_iq1_m_ref style
    w = _weights(xb, _expand_imatrix(imatrix, x.size // n, n), 2.0,
                 "x2").reshape(nsb * 8, 4, 8)
    xv = xb.reshape(nsb * 8, 4, 8)

    scale, gidx, use_m = _iq1_fit(xv, w, shift_group=False)
    scale = np.abs(scale).reshape(nsb, 8)
    gidx = gidx.reshape(nsb, 8, 4).astype(np.uint32)
    use_m = use_m.reshape(nsb, 8)

    max_scale = scale.max(axis=1)
    live = max_scale > 0
    d = np.where(live, max_scale / 15.0, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        idv = np.where(live, 1.0 / np.where(live, d, 1), 0.0)
    ls = _nearest_int(0.5 * (idv[:, None] * scale - 1)).clip(0, 7)

    h = (gidx[..., 0] >> 8) | ((gidx[..., 1] >> 8) << 3) \
        | ((gidx[..., 2] >> 8) << 6) | ((gidx[..., 3] >> 8) << 9) \
        | (ls.astype(np.uint32) << 12) | (use_m.astype(np.uint32) << 15)
    out = np.empty((nsb, 50), np.uint8)
    out[:, 0:2] = _f16b((d * 1.125).astype(np.float32)).reshape(nsb, 2)
    out[:, 2:34] = (gidx & 255).astype(np.uint8).reshape(nsb, 32)
    out[:, 34:50] = h.astype("<u2").view(np.uint8).reshape(nsb, 16)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# IQ1_M: per-16 blocks, per-8-group delta shift, 3-bit scales, f16 d in
# the scale words' top nibbles, LS-refit d * 1.085
# ---------------------------------------------------------------------------

def quantize_iq1_m(x: np.ndarray, imatrix=None) -> np.ndarray:
    n = x.shape[-1]
    xb = x.reshape(-1, QK_K).astype(np.float32)
    nsb = xb.shape[0]
    if imatrix is None:
        imatrix = np.ones(n, np.float32)
    # sigma2 per 32-elem pair of blocks (all_sigma2[ib/2], 1.5 * mean)
    x32 = xb.reshape(nsb, 8, 32)
    sigma2 = 1.5 * np.mean(x32 * x32, axis=2)        # (nsb, 8)
    sigma2 = np.repeat(sigma2, 2, axis=1)            # per 16-block
    g16 = xb.reshape(nsb, 16, 16)
    qw = _expand_imatrix(imatrix, x.size // n, n).reshape(nsb, 16, 16)
    w = qw * np.sqrt(sigma2[:, :, None] + g16 * g16)

    xv = g16.reshape(nsb * 16, 2, 8)
    scale, gidx, use_m = _iq1_fit(xv, w.reshape(nsb * 16, 2, 8),
                                  shift_group=True)
    scale = np.abs(scale).reshape(nsb, 16)
    gidx = gidx.reshape(nsb, 16, 2).astype(np.uint32)
    use_m = use_m.reshape(nsb, 16, 2)

    max_scale = scale.max(axis=1)
    live = max_scale > 0
    d = np.where(live, max_scale / 15.0, 1.0)
    ls = _nearest_int(0.5 * (scale / d[:, None] - 1)).clip(0, 7)
    ls = np.where(live[:, None], ls, 0)

    # global weighted-LS refit of d with the final quantized values
    leff = (2 * ls + 1).astype(np.float64)           # (nsb, 16)
    delta = np.where(use_m, -IQ1S_DELTA, IQ1S_DELTA)  # (nsb, 16, 2)
    q = ((GRID_IQ1S.astype(np.float64)[gidx] + delta[..., None])
         * leff[:, :, None, None])
    w4 = w.reshape(nsb, 16, 2, 8)
    x4 = g16.reshape(nsb, 16, 2, 8)
    sumqx = (w4 * q * x4).sum(axis=(1, 2, 3))
    sumq2 = (w4 * q * q).sum(axis=(1, 2, 3))
    with np.errstate(divide="ignore", invalid="ignore"):
        dfit = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), d)
    d16 = (dfit * 1.085).astype(np.float32).astype(np.float16)
    dbits = d16.view(np.uint16).astype(np.uint32)

    qh = ((gidx[..., 0] >> 8) | ((gidx[..., 1] >> 8) << 4)
          | (use_m[..., 0] << 3) | (use_m[..., 1] << 7)).astype(np.uint8)
    sc = np.zeros((nsb, 4), np.uint32)
    lsq = ls.astype(np.uint32).reshape(nsb, 4, 4)
    for j in range(4):
        sc |= lsq[:, :, j] << (3 * j)
    sc[:, 0] |= (dbits & 0x000F) << 12
    sc[:, 1] |= (dbits & 0x00F0) << 8
    sc[:, 2] |= (dbits & 0x0F00) << 4
    sc[:, 3] |= (dbits & 0xF000)
    out = np.empty((nsb, 56), np.uint8)
    out[:, 0:32] = (gidx & 255).astype(np.uint8).reshape(nsb, 32)
    out[:, 32:48] = qh
    out[:, 48:56] = sc.astype("<u2").view(np.uint8)
    return out.reshape(-1)


IQUANT_QUANTIZE_FNS = {
    GGMLType.IQ2_XXS: quantize_iq2_xxs,
    GGMLType.IQ2_XS: quantize_iq2_xs,
    GGMLType.IQ2_S: quantize_iq2_s,
    GGMLType.IQ3_XXS: quantize_iq3_xxs,
    GGMLType.IQ3_S: quantize_iq3_s,
    GGMLType.IQ1_S: quantize_iq1_s,
    GGMLType.IQ1_M: quantize_iq1_m,
}
