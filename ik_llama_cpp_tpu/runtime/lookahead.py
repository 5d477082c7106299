"""Lookahead decoding (lmsys Jacobi lookahead) — examples/lookahead analogue.

Maintains a W-column x (N-1)-level 2D Jacobi window plus a per-first-token
pool of up to G observed (N-1)-grams (ngram_container,
examples/lookahead/lookahead.cpp:20-34).  Each round evaluates ONE
fixed-shape probe block — current token, G verification grams, the window
levels — through ``Runtime.eval_probe`` with explicit positions and the
lmsys visibility mask (lookahead.cpp:182-259 builds the same structure from
multi-seq-id llama_batch entries; here it is a static (T, T) bool mask, so
XLA compiles a single shape).  Accepted tokens are then re-evaluated as a
plain causal chunk to commit the KV cache: jax array immutability makes the
probe side-effect free, replacing the reference's llama_kv_cache_seq_keep
cell surgery (lookahead.cpp:373-380) with a cheap <=N-token causal step.

Verification walk, Jacobi shift, and n-gram harvesting mirror
lookahead.cpp:263-434: the window's new last level is greedily sampled from
the probe logits at v==0 and copied from the shifted level otherwise; W
n-grams (first token = previous level-0) enter the pool each round.
"""
from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np

from .sampling import SamplerParams, sample as sample_token


@dataclass
class LookaheadStats:
    n_rounds: int = 0
    n_predict: int = 0
    n_accept: int = 0          # tokens accepted from verification grams

    @property
    def accept_rate(self):
        return self.n_accept / max(1, self.n_predict)


@dataclass
class _Layout:
    """Static probe-block layout + visibility mask for (W, N, G)."""
    W: int
    N: int
    G: int
    T: int = 0
    rel_pos: np.ndarray = field(default=None)   # (T,) position - n_past
    mask: np.ndarray = field(default=None)      # (T, T) bool

    def __post_init__(self):
        W, N, G = self.W, self.N, self.G
        self.T = 1 + G * (N - 1) + (W - 1) + W * (N - 2)
        pos = np.zeros(self.T, np.int32)
        mask = np.zeros((self.T, self.T), bool)
        np.fill_diagonal(mask, True)     # self (pos_k <= pos_q in llama.cpp)
        mask[:, 0] = True                # the input token joins every seq
        # verification grams: gram g occupies [gbase, gbase + N-1), token j
        # at position n_past + 1 + j, visible to later tokens of the same g
        for g in range(G):
            base = 1 + g * (N - 1)
            for j in range(N - 1):
                pos[base + j] = 1 + j
                mask[base + j, base: base + j] = True
        # level-0 columns 1..W-1 (column 0's level-0 token IS the input):
        # column i belongs to seqs {i+1..W}, so queries of column i see
        # level-0 columns 1..i (lookahead.cpp:246-252)
        l0 = 1 + G * (N - 1)
        for i in range(1, W):
            pos[l0 + i - 1] = i
            mask[l0 + i - 1, l0: l0 + i] = True
        # levels 1..N-2: token (j, i) at position n_past + j + i, seq {i+1}:
        # sees level-0 columns 1..i and its own column's earlier levels
        lv = l0 + (W - 1)
        for j in range(1, N - 1):
            for i in range(W):
                r = lv + (j - 1) * W + i
                pos[r] = j + i
                if i >= 1:
                    mask[r, l0: l0 + i] = True
                for j2 in range(1, j):
                    mask[r, lv + (j2 - 1) * W + i] = True
        self.rel_pos = pos
        self.mask = mask

    def level_row(self, j: int, i: int) -> int:
        """Row of window token (level j, column i); level 0 valid for i>=1."""
        l0 = 1 + self.G * (self.N - 1)
        if j == 0:
            return l0 + i - 1
        return l0 + (self.W - 1) + (j - 1) * self.W + i


def generate_lookahead(
    target,
    prompt,
    max_new_tokens: int = 64,
    *,
    W: int = 8,
    N: int = 4,
    G: int = 8,
    sampler: SamplerParams | None = None,
    seed: int = 0,
    capacity: int = 1024,
    stop_at_eos: bool = True,
):
    """Returns (prompt_ids, generated_ids, LookaheadStats).

    Greedy (temp=0) output is exactly the plain decode-loop output — every
    emitted token is sampled from true-model logits; the window and grams
    only decide how many logit rows each probe yields."""
    sampler = sampler or SamplerParams(temp=0.0)
    ids = (target.tokenizer.encode(prompt) if isinstance(prompt, str)
           else list(prompt))
    lay = _Layout(W, N, G)
    rng = np.random.default_rng(seed)
    stats = LookaheadStats()

    kv = target.new_cache(1, capacity)
    logits, kv, n_past = target.eval_tokens(ids, kv, 0)
    out: list[int] = []

    def next_token(lg):
        return int(sample_token(lg, sampler, rng, history=ids + out))

    # Jacobi window init: "sequence of increasing numbers"
    # (lookahead.cpp:139), clipped to the vocab
    n_vocab = logits.shape[-1]
    tokens_j = [[min(100 + i, n_vocab - 1) for i in range(W)]
                for _ in range(N - 1)]
    # n-gram pool: first token -> ring of (N-1)-token bodies
    pool: dict[int, deque] = {}

    cur = next_token(logits[-1])
    out.append(cur)
    stats.n_predict += 1

    eos = target.tokenizer.eos_id if target.tokenizer is not None else -1

    while len(out) < max_new_tokens and not (stop_at_eos and cur == eos):
        # ---- assemble the probe block
        toks = np.zeros(lay.T, np.int32)
        toks[0] = cur
        grams = list(pool.get(cur, ()))[:G]
        for g, body in enumerate(grams):
            toks[1 + g * (N - 1): 1 + (g + 1) * (N - 1)] = body
        l0 = 1 + G * (N - 1)
        toks[l0: l0 + W - 1] = tokens_j[0][1:]
        lv = l0 + (W - 1)
        for j in range(1, N - 1):
            toks[lv + (j - 1) * W: lv + j * W] = tokens_j[j]
        logits_all = target.eval_probe(toks, n_past + lay.rel_pos, lay.mask,
                                       kv, n_past)
        stats.n_rounds += 1

        # ---- verification walk (lookahead.cpp:263-329)
        active = [g for g in range(len(grams))]
        accepted: list[int] = []           # tokens emitted this round
        row = 0                            # probe row to sample from
        tid = cur
        for v in range(N):
            if v > 0:
                if not active:
                    break
                g = active[0]
                row = 1 + g * (N - 1) + (v - 1)
                stats.n_accept += 1
            tid = next_token(logits_all[row])
            accepted.append(tid)
            out.append(tid)
            stats.n_predict += 1
            if len(out) >= max_new_tokens or (stop_at_eos and tid == eos):
                break
            # deactivate grams that disagree with the sampled token
            if v < N - 1:
                active = [g for g in active if grams[g][v] == tid]
            else:
                active = []

            # ---- Jacobi window update (lookahead.cpp:352-377)
            tokens_j_prev = list(tokens_j[0])
            for j in range(N - 2):
                tokens_j[j] = tokens_j[j + 1]
            if v == 0:
                # new deepest level: argmax at each column of the current
                # deepest level.  For N == 2 that level is level 0, whose
                # column-0 token is the probe input itself (row 0) —
                # level_row(0, 0) is undefined.
                if N == 2:
                    rows = [0] + [lay.level_row(0, i) for i in range(1, W)]
                else:
                    rows = [lay.level_row(N - 2, i) for i in range(W)]
                tokens_j[N - 2] = [int(np.argmax(logits_all[r]))
                                   for r in rows]
            else:
                tokens_j[N - 2] = list(tokens_j[0])

            # ---- harvest observed n-grams (lookahead.cpp:380-434)
            if v == 0:
                for f in range(W):
                    ft = tokens_j_prev[f]
                    body = tuple(tokens_j[j][f] for j in range(N - 1))
                    ring = pool.setdefault(ft, deque(maxlen=G))
                    if body not in ring:
                        ring.append(body)

        # ---- commit: re-evaluate the consumed tokens causally (the probe
        # cache is discarded; this is the TPU-shaped replacement for
        # kv_cache_seq_keep).  The cache slot at n_past belongs to `cur`
        # (the probe's row 0); the newly accepted tokens follow it, and the
        # LAST accepted token becomes next round's probe input.
        _, kv, n_past = target.eval_tokens([cur] + accepted[:-1], kv, n_past)
        cur = accepted[-1]

    return ids, out[:max_new_tokens], stats
