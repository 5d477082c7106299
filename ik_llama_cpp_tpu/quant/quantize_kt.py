"""KT (trellis) quantizer encoders: IQ1_KT / IQ2_KT / IQ3_KT / IQ4_KT.

The encode-side counterpart of dequant.py's trellis decoders. The codebook
is the integer "3INST" generator (x_{k+1} = 0xCBAC1FED * x_k; value = sum of
4 bytes of (x & 0x3f3f3f3f) - 126), giving 2^13..2^16 codewords per group
of 8 (4 for IQ4_KT) weights.

Search (mirrors quantize_row_iq2_kt_impl and siblings,
iqk_quantize.cpp:9240-10260): per 32-weight block, seed scales from
amax/max(90, 124*amax/amax_row), pick the best codeword per group under a
weighted L2 objective, LSQ-refit the block scale, quantize block scales
(IQ4K LUT for iq1/iq2, plain 4-bit for iq3, 7-bit for iq4), grid-refit the
row scale, then one re-match pass at the final effective scales.

One deliberate improvement over the reference: codeword search is an EXACT
weighted argmin over the whole codebook (dense (groups, V) score matrix,
chunked) instead of the reference's k-means-cluster pruning — numpy BLAS
handles the (G,8)x(8,V) GEMMs, so we trade compute for better fidelity.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, QK_K
from . import luts
from .dequant import _kt_values


_CODEBOOKS: dict = {}


def _codebook(num_bits: int, gs: int, offset: int = 4096) -> np.ndarray:
    key = (num_bits, gs, offset)
    if key not in _CODEBOOKS:
        v = 1 << num_bits
        _CODEBOOKS[key] = _kt_values(
            np.arange(v, dtype=np.int64) + offset, gs).astype(np.float32)
    return _CODEBOOKS[key]


def _set_weights(x_sb: np.ndarray, imatrix, sigma_scale: float, bs: int):
    """x_sb: (NB, QK_K). Returns weights (NB, QK_K) per set_weights
    (iqk_quantize.cpp:8674-8712)."""
    nb = x_sb.shape[0]
    sumx2 = (x_sb * x_sb).sum(-1)
    sigma2 = sigma_scale * sumx2 / QK_K
    if imatrix is None:
        w = 0.25 * sigma2[:, None] + x_sb * x_sb
    else:
        n_sb = imatrix.size // QK_K
        qw = np.tile(imatrix.reshape(n_sb, QK_K), (nb // n_sb, 1))
        w = qw * np.sqrt(sigma2[:, None] + x_sb * x_sb)
    w = np.where(sumx2[:, None] < 1e-14 * QK_K, 1e-4, w)
    return w.astype(np.float32)


def _best_match(dl, xg, wg, C, chunk: int = 1024) -> np.ndarray:
    """Exact weighted nearest codeword: minimize sum_j w (x - dl*c)^2.

    dl: (G,) per-group effective scale; xg, wg: (G, gs); C: (V, gs).
    Returns int32 indices (G,)."""
    G = xg.shape[0]
    out = np.empty(G, np.int32)
    C2 = (C * C).T                                        # (gs, V)
    Ct = C.T                                              # (gs, V)
    for lo in range(0, G, chunk):
        xs = xg[lo:lo + chunk]
        ws = wg[lo:lo + chunk]
        d = dl[lo:lo + chunk][:, None]
        a = (ws * xs) @ Ct                                # (g, V)
        b = ws @ C2                                       # (g, V)
        score = (d * d) * b - (2.0 * d) * a
        out[lo:lo + chunk] = score.argmin(-1)
    return out


def _block_scale_score(xb, wb, q):
    """LSQ block scale + score given chosen codewords.
    xb, wb, q: (B, bs). Returns (d (B,), score (B,))."""
    sumqx = (wb * q * xb).sum(-1)
    sumq2 = (wb * q * q).sum(-1)
    ok = sumq2 > 0
    d = np.where(ok, sumqx / np.where(ok, sumq2, 1), 0.0)
    return d.astype(np.float32), np.where(ok, d * sumqx, 0.0).astype(np.float32)


def _match_and_score(dl_blk, xb, wb, C, ng, gs):
    """Per-block match at scale dl_blk: returns (idx (B, ng), d, score)."""
    B = xb.shape[0]
    xg = xb.reshape(B * ng, gs)
    wg = wb.reshape(B * ng, gs)
    dl = np.repeat(dl_blk, ng)
    idx = _best_match(dl, xg, wg, C)
    q = C[idx].reshape(B, ng * gs)
    d, score = _block_scale_score(xb, wb, q)
    return idx.reshape(B, ng), d, score


def _search_block_scales(xb, wb, C, seeds, ng, gs):
    """Try each seed scale (list of (B,) arrays), keep the best
    (idx, d) per block by LSQ score."""
    B = xb.shape[0]
    best_idx = np.zeros((B, ng), np.int32)
    best_d = np.zeros(B, np.float32)
    best_s = np.full(B, -1.0, np.float32)
    for dl in seeds:
        idx, d, s = _match_and_score(dl, xb, wb, C, ng, gs)
        better = s > best_s
        best_idx = np.where(better[:, None], idx, best_idx)
        best_d = np.where(better, d, best_d)
        best_s = np.where(better, s, best_s)
    return best_idx, best_d, best_s


def _row_d_grid(x, w, qvals, scales, trials):
    """Row-scale grid refit: for each candidate id, quantize block scales,
    compute weighted LSQ d over the whole row.
    x, w: (nrows, NBLK, bs); qvals: (nrows, NBLK, bs) codeword values;
    scales: (nrows, NBLK); trials yields (id (nrows,), ls_fn)."""
    best_d = None
    best = np.zeros(x.shape[0], np.float32)
    for id_, ls_fn in trials:
        ls = ls_fn(id_[:, None] * scales)                # (nrows, NBLK)
        q = qvals * ls[..., None]
        sumqx = (w * q * x).sum((-1, -2))
        sumq2 = (w * q * q).sum((-1, -2))
        ok = sumq2 > 0
        cand = np.where(ok, sumqx / np.where(ok, sumq2, 1), 0.0)
        sc = np.where(ok, cand * sumqx, -1.0)
        if best_d is None:
            best_d = cand.astype(np.float32)
            best = sc.astype(np.float32)
        else:
            better = sc > best
            best_d = np.where(better, cand, best_d)
            best = np.where(better, sc, best)
    return best_d


def _kt_common(x, imatrix, *, num_bits, gs, use_abs=False):
    """Shared setup: returns (nrows, n, x_sb, w, amax_row)."""
    x = x.reshape(-1, x.shape[-1]).astype(np.float32)
    nrows, n = x.shape
    x_sb = x.reshape(-1, QK_K)
    w = _set_weights(x_sb, imatrix, 2.0, 32)
    amax_row = np.abs(x).max(-1)
    return x, nrows, n, x_sb, w, amax_row


def _iq4k_nearest(vals, x):
    """Nearest index in the (unsorted!) 16-entry iq4k LUT."""
    return np.abs(vals[None, :] - x[..., None]).argmin(-1)


def quantize_iq2_kt(x: np.ndarray, imatrix=None) -> np.ndarray:
    return _quantize_kt_12(x, imatrix, extra_seed=False)


def quantize_iq1_kt(x: np.ndarray, imatrix=None) -> np.ndarray:
    return _quantize_kt_12(x, imatrix, extra_seed=True)


def _quantize_kt_12(x, imatrix, *, extra_seed: bool) -> np.ndarray:
    """IQ1_KT (13-bit)/IQ2_KT (16-bit): groups of 8, IQ4K-LUT block scales,
    f32 row scale."""
    num_bits = 13 if extra_seed else 16
    gs, bs, ng = 8, 32, 4
    C = _codebook(num_bits, gs)
    x, nrows, n, x_sb, w, amax_row = _kt_common(x, imatrix, num_bits=num_bits,
                                                gs=gs)
    nsb = n // QK_K
    NBLK = 8 * nsb                                       # blocks per row
    xb = x.reshape(-1, bs)                               # (nrows*NBLK, bs)
    wb = w.reshape(-1, bs)
    amax = np.abs(xb).max(-1)
    arow = np.repeat(amax_row, NBLK)
    scale_0 = np.maximum(90.0, 124.0 * amax / np.where(arow > 0, arow, 1))
    seeds = [amax / scale_0, -amax / scale_0]
    if extra_seed:
        seeds += [amax / (scale_0 - 8), -amax / (scale_0 - 8)]
    idx, d_blk, _ = _search_block_scales(xb, wb, C, seeds, ng, gs)
    dead = amax < 1e-16
    d_blk = np.where(dead, 0.0, d_blk)
    idx[dead] = 0

    # row scale over IQ4K-LUT quantized block scales
    iq4k = luts.IQ4K_VALUES[:16].astype(np.float32)
    scales = d_blk.reshape(nrows, NBLK)
    flat = np.abs(scales)
    pos = flat.argmax(-1)
    max_scale = np.take_along_axis(scales, pos[:, None], -1)[:, 0]
    safe_ms = np.where(max_scale == 0, 1.0, max_scale)
    qvals = C[idx].reshape(nrows, NBLK, bs)
    xrb = x.reshape(nrows, NBLK, bs)
    wrb = w.reshape(nrows, NBLK, bs)
    trials = [((it + iq4k[0]) / safe_ms,
               lambda s: iq4k[_iq4k_nearest(iq4k, s)]) for it in range(-9, 10)]
    d_row = _row_d_grid(xrb, wrb, qvals, scales, trials)
    d_row = np.where(max_scale == 0, 0.0, d_row)

    with np.errstate(divide="ignore", invalid="ignore"):
        id_r = np.where(d_row != 0, 1.0 / np.where(d_row != 0, d_row, 1), 0.0)
    ls_idx = _iq4k_nearest(iq4k, id_r[:, None] * scales)  # (nrows, NBLK)
    ls = iq4k[ls_idx]

    # re-match at the final effective scales, keep better per block
    dl = (d_row[:, None] * ls).reshape(-1)
    idx2, _, _ = _match_and_score(dl, xb, wb, C, ng, gs)
    q1 = C[idx].reshape(-1, bs)
    q2 = C[idx2].reshape(-1, bs)
    e1 = (wb * (xb - dl[:, None] * q1) ** 2).sum(-1)
    e2 = (wb * (xb - dl[:, None] * q2) ** 2).sum(-1)
    idx = np.where((e2 < e1)[:, None], idx2, idx)
    # final d refit with chosen codes
    qf = C[idx].reshape(nrows, NBLK, bs) * ls[..., None]
    sumqx = (wrb * qf * xrb).sum((-1, -2))
    sumq2 = (wrb * qf * qf).sum((-1, -2))
    d_row = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), d_row
                     ).astype(np.float32)

    idx = idx.reshape(nrows, nsb, 8, ng)
    lsi = ls_idx.reshape(nrows, nsb, 8).astype(np.uint8)
    if extra_seed:     # IQ1_KT packing: 13-bit indices
        out = np.zeros((nrows, 4 + nsb * 56), np.uint8)
        out[:, 0:4] = d_row.view(np.uint8).reshape(nrows, 4)
        body = out[:, 4:].reshape(nrows, nsb, 56)
        sh = body[:, :, 0:8]
        ql = body[:, :, 8:40]
        qh = body[:, :, 40:56]
        sh |= lsi
        for ib in range(8):
            for ig in range(4):
                iv = idx[:, :, ib, ig]
                ql[:, :, ib * 4 + ig] = (iv & 0xFF).astype(np.uint8)
                qh[:, :, (ib % 4) * 4 + ig] |= (
                    ((iv >> 8) & 0xF) << (4 * (ib // 4))).astype(np.uint8)
                sh[:, :, ib] |= (((iv >> 12) & 1) << (4 + ig)).astype(np.uint8)
        return out.reshape(-1)
    # IQ2_KT packing: 16-bit indices
    out = np.zeros((nrows, 4 + nsb * 68), np.uint8)
    out[:, 0:4] = d_row.view(np.uint8).reshape(nrows, 4)
    body = out[:, 4:].reshape(nrows, nsb, 68)
    body[:, :, 0:4] = lsi[:, :, 0:4] | (lsi[:, :, 4:8] << 4)
    qlv = body[:, :, 4:68].view(np.uint16).reshape(nrows, nsb, 32)
    for ib in range(8):
        base = (ib % 4) * 4 + (16 if ib >= 4 else 0)
        for ig in range(4):
            qlv[:, :, base + ig] = idx[:, :, ib, ig].astype(np.uint16)
    return out.reshape(-1)


def quantize_iq3_kt(x: np.ndarray, imatrix=None) -> np.ndarray:
    """IQ3_KT: abs-value trellis + separate sign bits, plain 4-bit scales."""
    gs, bs, ng = 8, 32, 4
    C = _codebook(16, gs)
    Ca = np.abs(C)
    x, nrows, n, x_sb, w, amax_row = _kt_common(x, imatrix, num_bits=16, gs=gs)
    nsb = n // QK_K
    NBLK = 8 * nsb
    xb = np.abs(x).reshape(-1, bs)                        # |x|
    wb = w.reshape(-1, bs)
    amax = xb.max(-1)
    arow = np.repeat(amax_row, NBLK)
    scale_0 = np.maximum(84.0, 123.0 * amax / np.where(arow > 0, arow, 1))
    seeds = [amax / (scale_0 + 8.0 * it) for it in range(-3, 4)]
    idx, d_blk, _ = _search_block_scales(xb, wb, Ca, seeds, ng, gs)
    dead = amax < 1e-16
    d_blk = np.where(dead, 0.0, d_blk)
    idx[dead] = 0

    scales = d_blk.reshape(nrows, NBLK)
    max_scale = scales.max(-1)                            # d >= 0
    safe_ms = np.where(max_scale == 0, 1.0, max_scale)
    qvals = Ca[idx].reshape(nrows, NBLK, bs)
    xrb = np.abs(x).reshape(nrows, NBLK, bs)
    wrb = w.reshape(nrows, NBLK, bs)

    def clip15(v):
        return np.clip(np.rint(v), 0, 15).astype(np.float32)

    trials = [((it * 0.2 + 15.0) / safe_ms, clip15) for it in range(-9, 10)]
    d_row = _row_d_grid(xrb, wrb, qvals, scales, trials)
    d_row = np.where(max_scale == 0, 0.0, d_row)

    with np.errstate(divide="ignore", invalid="ignore"):
        id_r = np.where(d_row != 0, 1.0 / np.where(d_row != 0, d_row, 1), 0.0)
    ls = clip15(id_r[:, None] * scales)                   # (nrows, NBLK)

    dl = (d_row[:, None] * ls).reshape(-1)
    idx2, _, _ = _match_and_score(dl, xb, wb, Ca, ng, gs)
    q1 = Ca[idx].reshape(-1, bs)
    q2 = Ca[idx2].reshape(-1, bs)
    e1 = (wb * (xb - dl[:, None] * q1) ** 2).sum(-1)
    e2 = (wb * (xb - dl[:, None] * q2) ** 2).sum(-1)
    idx = np.where((e2 < e1)[:, None], idx2, idx)
    qf = Ca[idx].reshape(nrows, NBLK, bs) * ls[..., None]
    sumqx = (wrb * qf * xrb).sum((-1, -2))
    sumq2 = (wrb * qf * qf).sum((-1, -2))
    d_row = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), d_row
                     ).astype(np.float32)

    idx = idx.reshape(nrows, nsb, 8, ng)
    lsu = ls.astype(np.uint8).reshape(nrows, nsb, 8)
    out = np.zeros((nrows, 4 + nsb * 100), np.uint8)
    out[:, 0:4] = d_row.view(np.uint8).reshape(nrows, 4)
    body = out[:, 4:].reshape(nrows, nsb, 100)
    body[:, :, 0:4] = lsu[:, :, 0:4] | (lsu[:, :, 4:8] << 4)
    qlv = body[:, :, 4:68].view(np.uint16).reshape(nrows, nsb, 32)
    qh = body[:, :, 68:100]
    for ib in range(8):
        base = (ib % 4) * 4 + (16 if ib >= 4 else 0)
        for ig in range(4):
            qlv[:, :, base + ig] = idx[:, :, ib, ig].astype(np.uint16)
    neg = (x < 0).reshape(nrows, nsb, 8, 32)
    for ib in range(8):
        qh |= (neg[:, :, ib].astype(np.uint8) << ib)
    return out.reshape(-1)


def quantize_iq4_kt(x: np.ndarray, imatrix=None) -> np.ndarray:
    """IQ4_KT: groups of 4, 15-bit indices in two offset halves (per-block
    choice), 7-bit block scales packed with the high index bits in a u32."""
    gs, bs, ng = 4, 32, 8
    C1 = _codebook(15, gs, offset=4096)
    C2 = _codebook(15, gs, offset=4096 + 32768)
    x, nrows, n, x_sb, w, amax_row = _kt_common(x, imatrix, num_bits=15, gs=gs)
    nsb = n // QK_K
    NBLK = 8 * nsb
    xb = x.reshape(-1, bs)
    wb = w.reshape(-1, bs)
    amax = np.abs(xb).max(-1)
    arow = np.repeat(amax_row, NBLK)
    scale_0 = np.maximum(90.0, 124.0 * amax / np.where(arow > 0, arow, 1))
    seeds = []
    for it in range(-2, 3):
        s = 8.0 * it + scale_0
        seeds += [amax / s, -amax / s]
    idx1, d1, s1 = _search_block_scales(xb, wb, C1, seeds, ng, gs)
    # quantizer2 seeded from quantizer1's winner, then its own grid
    idxa, da, sa = _match_and_score(d1, xb, wb, C2, ng, gs)
    idx2, d2, s2 = _search_block_scales(xb, wb, C2, seeds, ng, gs)
    use_a = sa > s2
    idx2 = np.where(use_a[:, None], idxa, idx2)
    d2 = np.where(use_a, da, d2)
    s2 = np.where(use_a, sa, s2)
    with_offset = s2 > s1
    idx = np.where(with_offset[:, None], idx2, idx1)
    d_blk = np.where(with_offset, d2, d1)
    dead = amax < 1e-16
    d_blk = np.where(dead, 0.0, d_blk)
    with_offset = np.where(dead, False, with_offset)
    idx[dead] = 0

    scales = d_blk.reshape(nrows, NBLK)
    pos = np.abs(scales).argmax(-1)
    max_scale = np.take_along_axis(scales, pos[:, None], -1)[:, 0]
    d_row = (-max_scale / 64.0).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        id_r = np.where(d_row != 0, 1.0 / np.where(d_row != 0, d_row, 1), 0.0)
    ls = np.minimum(np.rint(id_r[:, None] * scales), 63).astype(np.int32)
    ls = np.maximum(ls, -64)

    # re-match at final effective scale with each block's codebook
    dl = (d_row[:, None] * ls).reshape(-1)
    xg = xb.reshape(-1, gs)
    wg = wb.reshape(-1, gs)
    dlg = np.repeat(dl, ng)
    i_lo = _best_match(dlg, xg, wg, C1).reshape(-1, ng)
    i_hi = _best_match(dlg, xg, wg, C2).reshape(-1, ng)
    idx = np.where(with_offset[:, None], i_hi, i_lo)
    qf = np.where(with_offset[:, None, None], C2[idx], C1[idx])
    qf = qf.reshape(nrows, NBLK, bs) * ls.astype(np.float32).reshape(
        nrows, NBLK, 1)
    xrb = x.reshape(nrows, NBLK, bs)
    wrb = w.reshape(nrows, NBLK, bs)
    sumqx = (wrb * qf * xrb).sum((-1, -2))
    sumq2 = (wrb * qf * qf).sum((-1, -2))
    d_row = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), d_row
                     ).astype(np.float32)

    idx = idx.reshape(nrows, nsb, 8, ng)
    out = np.zeros((nrows, 4 + nsb * 128), np.uint8)
    out[:, 0:4] = d_row.view(np.uint8).reshape(nrows, 4)
    body = out[:, 4:].reshape(nrows, nsb, 128)
    shb = body[:, :, 0:32].view(np.uint32).reshape(nrows, nsb, 8)
    ql = body[:, :, 32:96]
    qh = body[:, :, 96:128]
    lsu = (ls + 64).astype(np.uint32).reshape(nrows, nsb, 8)
    wo = with_offset.reshape(nrows, nsb, 8)
    shb |= (lsu << 1) | wo.astype(np.uint32)
    for ib in range(8):
        for ig in range(ng):
            iv = idx[:, :, ib, ig]
            jj = ib * ng + ig
            shb[:, :, ib] |= ((iv >> 12).astype(np.uint32) & 7) << (8 + 3 * ig)
            ql[:, :, jj] = (iv & 0xFF).astype(np.uint8)
            qh[:, :, jj % 32] |= (((iv >> 8) & 0xF)
                                  << (4 * (jj // 32))).astype(np.uint8)
    return out.reshape(-1)


KT_QUANTIZE_FNS = {
    GGMLType.IQ1_KT: quantize_iq1_kt,
    GGMLType.IQ2_KT: quantize_iq2_kt,
    GGMLType.IQ3_KT: quantize_iq3_kt,
    GGMLType.IQ4_KT: quantize_iq4_kt,
}
