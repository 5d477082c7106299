"""Sampler chain (host-side, numpy) — analogue of llama-sampling.cpp.

Implements the reference's default chain order (common/sampling.h:133-141):
penalties -> top_k -> tail_free -> typical_p -> top_p -> min_p -> xtc ->
top_n_sigma -> temperature, then distribution sampling. Greedy when temp <= 0.
Each stage matches the reference's semantics (e.g. min_p relative to max
probability, typical via entropy distance).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class SamplerParams:
    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    tfs_z: float = 1.0
    typical_p: float = 1.0
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.1
    top_n_sigma: float = 0.0
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0


def _softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max()
    e = np.exp(logits - m)
    return e / e.sum()


def apply_penalties(logits, history, p: SamplerParams):
    if not history or (p.penalty_repeat == 1.0 and p.penalty_freq == 0.0
                       and p.penalty_present == 0.0):
        return logits
    logits = logits.copy()
    recent = history[-p.penalty_last_n:] if p.penalty_last_n > 0 else history
    uniq, counts = np.unique(np.asarray(recent), return_counts=True)
    for tok, cnt in zip(uniq, counts):
        l = logits[tok]
        if p.penalty_repeat != 1.0:
            logits[tok] = l / p.penalty_repeat if l > 0 else l * p.penalty_repeat
        logits[tok] -= cnt * p.penalty_freq + (cnt > 0) * p.penalty_present
    return logits


def sample(logits: np.ndarray, p: SamplerParams, rng: np.random.Generator,
           history: list[int] | None = None) -> int:
    logits = np.asarray(logits, np.float32).reshape(-1)
    logits = apply_penalties(logits, history or [], p)

    if p.temp <= 0.0:
        return int(np.argmax(logits))

    order = np.argsort(-logits)
    lg = logits[order]

    # top_k
    if p.top_k > 0:
        lg = lg[:p.top_k]
        order = order[:p.top_k]
    probs = _softmax(lg)

    # tail-free
    if p.tfs_z < 1.0 and len(probs) > 2:
        d2 = np.abs(np.diff(probs, 2))
        d2 = d2 / (d2.sum() or 1.0)
        cum = np.cumsum(d2)
        keep = int(np.searchsorted(cum, p.tfs_z) + 1)
        keep = max(keep, 1)
        lg, order = lg[:keep + 2], order[:keep + 2]
        probs = _softmax(lg)

    # typical
    if p.typical_p < 1.0:
        ent = -np.sum(probs * np.log(probs + 1e-12))
        shifted = np.abs(-np.log(probs + 1e-12) - ent)
        srt = np.argsort(shifted)
        cum = np.cumsum(probs[srt])
        keep = srt[: max(1, int(np.searchsorted(cum, p.typical_p) + 1))]
        keep.sort()
        lg, order = lg[keep], order[keep]
        probs = _softmax(lg)

    # top_p
    if p.top_p < 1.0:
        cum = np.cumsum(probs)
        keep = max(1, int(np.searchsorted(cum, p.top_p) + 1))
        lg, order = lg[:keep], order[:keep]
        probs = _softmax(lg)

    # min_p (relative to max prob)
    if p.min_p > 0.0:
        mask = probs >= p.min_p * probs.max()
        lg, order = lg[mask], order[mask]
        probs = _softmax(lg)

    # xtc: exclude top tokens with probability xtc_probability
    if p.xtc_probability > 0.0 and rng.random() < p.xtc_probability:
        above = probs >= p.xtc_threshold
        if above.sum() > 1:
            idx = np.where(above)[0]
            keepmask = np.ones(len(probs), bool)
            keepmask[idx[:-1]] = False
            lg, order = lg[keepmask], order[keepmask]
            probs = _softmax(lg)

    # top-n-sigma
    if p.top_n_sigma > 0.0:
        mu, sd = lg.mean(), lg.std()
        mask = lg >= mu - 0  # placeholder center
        mask = lg >= (lg.max() - p.top_n_sigma * sd)
        lg, order = lg[mask], order[mask]
        probs = _softmax(lg)

    # temperature
    probs = _softmax(lg / p.temp)
    choice = rng.choice(len(probs), p=probs)
    return int(order[choice])
