"""Speculative decoding — analogue of common/speculative.cpp.

Stages implemented (common.h:149-161 stage types):
  * ngram  — prompt-lookup self-speculation (the reference's ngram-simple /
    lookup example): propose the continuation that followed the most recent
    occurrence of the current n-gram suffix
  * draft  — classic two-model speculation: a small draft model proposes
    n_max tokens, the target verifies them in ONE batched decode step
    (the big win on TPU: verification is a parallel prefill-like step)

Acceptance: greedy token-match against the target's argmax (the reference's
default for temp<=0; sampled acceptance is a planned extension).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .generate import PREFILL_BUCKETS, Runtime
from .sampling import SamplerParams, sample as sample_token


@dataclass
class SpecStats:
    n_draft: int = 0
    n_accept: int = 0
    n_rounds: int = 0

    @property
    def accept_rate(self):
        return self.n_accept / max(self.n_draft, 1)


class NgramDraft:
    """Prompt-lookup drafting (ngram cache over the current sequence)."""

    def __init__(self, n_min: int = 2, n_max_ngram: int = 4):
        self.n_min = n_min
        self.n_max_ngram = n_max_ngram

    def propose(self, tokens: list[int], n_draft: int) -> list[int]:
        seq = tokens
        for ng in range(self.n_max_ngram, self.n_min - 1, -1):
            if len(seq) < ng + 1:
                continue
            suffix = tuple(seq[-ng:])
            # search most recent earlier occurrence
            for start in range(len(seq) - ng - 1, -1, -1):
                if tuple(seq[start:start + ng]) == suffix:
                    cont = seq[start + ng:start + ng + n_draft]
                    if cont:
                        return list(cont)
                    break
        return []


class SuffixDraft:
    """Longest-suffix-match drafting — the reference's suffix-tree stage
    (common/suffix-tree.cpp): find the earlier position whose preceding
    context shares the LONGEST suffix with the current position, propose
    what followed it. Unbounded match length (vs NgramDraft's fixed n)."""

    def __init__(self, n_min: int = 1, max_scan: int = 4096):
        self.n_min = n_min
        self.max_scan = max_scan
        # last occurrence positions per token for fast candidate lookup
        self._pos: dict[int, list[int]] = {}
        self._fed = 0

    def _feed(self, tokens: list[int]):
        for i in range(self._fed, len(tokens)):
            self._pos.setdefault(tokens[i], []).append(i)
        self._fed = len(tokens)

    def propose(self, tokens: list[int], n_draft: int) -> list[int]:
        self._feed(tokens)
        n = len(tokens)
        if n < self.n_min + 1:
            return []
        last = tokens[-1]
        best_len, best_j = 0, -1
        cands = self._pos.get(last, [])
        for j in reversed(cands[-self.max_scan:]):
            if j == n - 1:
                continue
            # match length of suffix ending at j vs suffix ending at n-1
            m = 1
            while m <= j and tokens[j - m] == tokens[n - 1 - m]:
                m += 1
            if m > best_len:
                best_len, best_j = m, j
        if best_len < self.n_min or best_j < 0:
            return []
        return tokens[best_j + 1: best_j + 1 + n_draft]


class NgramMapDraft:
    """Frequency-weighted n-gram map drafting — the reference's ngram-map-k
    stage (common/ngram-map.cpp): maintains counts of what followed each
    n-gram and proposes the historically most frequent continuation chain."""

    def __init__(self, n: int = 3):
        self.n = n
        self.counts: dict[tuple, dict[int, int]] = {}
        self._fed = 0

    def update(self, tokens: list[int]):
        n = self.n
        for i in range(max(self._fed - n, 0), len(tokens) - n):
            key = tuple(tokens[i:i + n])
            nxt = tokens[i + n]
            d = self.counts.setdefault(key, {})
            d[nxt] = d.get(nxt, 0) + 1
        self._fed = len(tokens)

    def propose(self, tokens: list[int], n_draft: int) -> list[int]:
        self.update(tokens)
        out: list[int] = []
        seq = list(tokens)
        for _ in range(n_draft):
            key = tuple(seq[-self.n:])
            d = self.counts.get(key)
            if not d:
                break
            nxt = max(d, key=d.get)
            out.append(nxt)
            seq.append(nxt)
        return out


class NgramModDraft:
    """Fixed-size modular-hash n-gram table — the reference's ngram_mod
    stage (common/ngram-mod.cpp + speculative.cpp
    common_speculative_state_ngram_mod): a single open-addressed array
    indexed by the 6364136223846793005 multiplicative hash of the last n
    tokens, storing the following token.  Includes the reference's
    occupancy reset (>25% after prompt feed) and low-acceptance streak
    reset (3 rounds under 50%)."""

    EMPTY = -1
    MUL = 6364136223846793005

    def __init__(self, n: int = 4, size: int = 1 << 16, n_min: int = 1):
        self.n = n
        self.n_min = n_min
        self.entries = [self.EMPTY] * size
        self.used = 0
        self._i_last = 0
        self._n_draft_last = 0
        self._n_low = 0

    def _idx(self, toks) -> int:
        res = 0
        for t in toks:
            res = (res * self.MUL + t) & 0xFFFFFFFFFFFFFFFF
        return res % len(self.entries)

    def _add(self, window):
        i = self._idx(window[:self.n])
        if self.entries[i] == self.EMPTY:
            self.used += 1
        self.entries[i] = window[self.n]

    def reset(self):
        self.entries = [self.EMPTY] * len(self.entries)
        self.used = 0
        self._i_last = 0
        self._n_low = 0

    def begin(self, prompt: list[int]):
        self._i_last = 0
        self._n_draft_last = 0
        self._n_low = 0
        if len(prompt) < self.n:
            return
        for i in range(len(prompt) - self.n):
            self._add(prompt[i:i + self.n + 1])
        self._i_last = len(prompt) - self.n
        if self.used > 0.25 * len(self.entries):
            self.reset()

    def propose(self, tokens: list[int], n_draft: int) -> list[int]:
        self._n_draft_last = 0
        cur_len = len(tokens)
        if cur_len < self.n:
            return []
        # add new ngrams in chunks of >= 32 (speculative.cpp:815-821)
        if self._i_last + 32 < cur_len:
            for i in range(self._i_last, cur_len - self.n):
                self._add(tokens[i:i + self.n + 1])
            self._i_last = cur_len - self.n
        seq = list(tokens[-self.n:])
        out: list[int] = []
        for i in range(n_draft):
            t = self.entries[self._idx(seq[-self.n:])]
            if t == self.EMPTY:
                if i < self.n_min:
                    return []
                break
            out.append(t)
            seq.append(t)
        self._n_draft_last = len(out)
        return out

    def accept(self, n_accepted: int):
        if self._n_draft_last > 0:
            if n_accepted < 0.5 * self._n_draft_last:
                self._n_low += 1
                if self._n_low >= 3:
                    self.reset()
            else:
                self._n_low = 0


class NgramCacheDraft:
    """3-tier validated n-gram cache — the reference's ngram_cache stage
    (common/ngram-cache.cpp common_ngram_cache_draft): a context cache
    built from the live sequence, an optional dynamic cache persisted
    across requests, and an optional static corpus cache.  Context drafts
    use strict sample-size/percent thresholds validated against the static
    part; dynamic drafts use the lax thresholds; static-only fallback
    drafts the majority token."""

    NGRAM_MIN, NGRAM_MAX, NGRAM_STATIC = 1, 4, 2
    MIN_SIZE_LAX = [2, 2, 1, 1]
    MIN_PCT_LAX = [66, 50, 50, 50]
    MIN_SIZE_STRICT = [4, 3, 2, 2]
    MIN_PCT_STRICT = [75, 66, 66, 66]

    def __init__(self, static_cache=None, dynamic_cache=None):
        self.ctx: dict[tuple, dict[int, int]] = {}
        self.dyn: dict[tuple, dict[int, int]] = dynamic_cache or {}
        self.static: dict[tuple, dict[int, int]] = static_cache or {}
        self._fed = 0

    @staticmethod
    def update_cache(cache, tokens, ngram_min, ngram_max, nnew):
        size = len(tokens)
        for ng in range(ngram_min, ngram_max + 1):
            for i in range(max(size - nnew, ng), size):
                key = tuple(tokens[i - ng:i])
                part = cache.setdefault(key, {})
                part[tokens[i]] = part.get(tokens[i], 0) + 1

    def _try_static(self, ngram):
        part = self.static.get(ngram)
        if not part:
            return None
        tot = sum(part.values())
        tok, cnt = max(part.items(), key=lambda kv: kv[1])
        if tot < self.MIN_SIZE_LAX[self.NGRAM_STATIC - 1]:
            return None
        if 100 * cnt < self.MIN_PCT_LAX[self.NGRAM_STATIC - 1] * tot:
            return None
        return tok

    def _try_primary(self, cache, ngrams, part_static, min_size, min_pct):
        for i in reversed(range(len(ngrams))):
            part = cache.get(ngrams[i])
            if not part:
                continue
            best_tok, best_p, best_s, total = None, 0, 0, 0
            for tok, cp in part.items():
                cs = 100 * part_static.get(tok, 0) or 1
                if cp * cs > best_p * best_s:
                    best_tok, best_p, best_s = tok, cp, cs
                total += cp
            if total < min_size[i]:
                continue
            if 100 * best_p < min_pct[i] * total:
                continue
            return best_tok
        return None

    def propose(self, tokens: list[int], n_draft: int) -> list[int]:
        self.update_cache(self.ctx, tokens, self.NGRAM_MIN, self.NGRAM_MAX,
                          len(tokens) - self._fed)
        self._fed = len(tokens)
        if len(tokens) < self.NGRAM_STATIC:
            return []
        seq = list(tokens)
        out: list[int] = []
        while len(out) < n_draft:
            ng_static = tuple(seq[-self.NGRAM_STATIC:])
            part_static = self.static.get(ng_static, {})
            ngrams = [tuple(seq[-n:]) for n in
                      range(self.NGRAM_MIN, self.NGRAM_MAX + 1)
                      if len(seq) >= n]
            tok = self._try_primary(self.ctx, ngrams, part_static,
                                    self.MIN_SIZE_STRICT,
                                    self.MIN_PCT_STRICT)
            if tok is None:
                tok = self._try_primary(self.dyn, ngrams, part_static,
                                        self.MIN_SIZE_LAX, self.MIN_PCT_LAX)
            if tok is None:
                tok = self._try_static(ng_static)
            if tok is None:
                break
            out.append(tok)
            seq.append(tok)
        return out

    def accept(self, n_accepted: int):
        """Round feedback hook (uniform drafter protocol); the dynamic
        cache persists via feed_dynamic, mirroring the reference server's
        common_ngram_cache_update-on-accept path."""

    def feed_dynamic(self, accepted_tokens: list[int]):
        """Fold an accepted continuation into the dynamic cache."""
        self.update_cache(self.dyn, accepted_tokens, self.NGRAM_MIN,
                          self.NGRAM_MAX, len(accepted_tokens))


class Eagle3Draft:
    """EAGLE3 stage placeholder — faithful to the reference, whose
    common_speculative_state_eagle3::draft is literally `// TODO:
    implement` (common/speculative.cpp:668-692): the stage is selectable
    and never proposes tokens."""

    def propose(self, tokens: list[int], n_draft: int) -> list[int]:
        return []


class DFlashDraft:
    """DFlash block-diffusion drafting (the reference's dflash stage,
    common/speculative-dflash-impl.h + src/llama-dflash.cpp).

    Captures the TARGET's layer hiddens at dflash.target_layer_ids, builds
    the draft's cross-context KV from them, and proposes a whole block of
    tokens in ONE bidirectional draft pass: batch = [id_last at the last
    context position, mask_id x n] (speculative-dflash-impl.h:282-300).

    This correctness-first version recomputes the feature window from
    scratch each round via Runtime.layer_hiddens; an incremental
    capture-on-decode path is the planned optimization."""

    def __init__(self, draft_path, target: Runtime):
        from .generate import Runtime as _R
        from ..gguf.reader import load_gguf
        from ..models.config import config_from_gguf
        from ..models import dflash as _df
        import jax
        gg = load_gguf(draft_path)
        self.cfg = config_from_gguf(gg.metadata)
        assert self.cfg.arch == "dflash-draft", self.cfg.arch
        self.params = _df.load_dflash_params(gg, self.cfg)
        self.target = target
        ex = self.cfg.extra
        self.mask_id = int(ex["mask_token_id"])
        self.block_size = int(ex["block_size"])
        self.layer_ids = [int(i) for i in ex["target_layer_ids"]]
        self._df = _df
        self._jit_kv = jax.jit(lambda f, p: _df.build_cross_kv(
            self.params, self.cfg, f, p))
        self._cached = (None, None, 0)          # (ck, cv, n_rows)

    def _features(self, ctx_tokens):
        import numpy as np
        hs = self.target.layer_hiddens(ctx_tokens)      # (L, T, E)
        return np.concatenate([hs[i] for i in self.layer_ids], axis=-1)

    def propose(self, tokens: list[int], n_draft: int) -> list[int]:
        import jax.numpy as jnp
        import numpy as np
        if len(tokens) < 2:
            return []
        n_draft = min(n_draft, self.block_size - 1)
        ctx, id_last = tokens[:-1], tokens[-1]
        feats = self._features(ctx)
        rows = feats.shape[0]
        ck, cv = self._jit_kv(jnp.asarray(feats),
                              jnp.arange(rows, dtype=jnp.int32))
        toks = jnp.asarray([id_last] + [self.mask_id] * n_draft, jnp.int32)
        pos = jnp.asarray([rows - 1] + list(range(rows, rows + n_draft)),
                          jnp.int32)
        lg = self._df.draft_block(self.params, self.cfg, toks, pos, ck, cv,
                                  jnp.ones(rows, bool),
                                  interpret=self.target.interpret)
        return [int(i) for i in np.asarray(lg).argmax(-1)[1:]]


class ReplayDraft:
    """Oracle/replay drafter: proposes a KNOWN continuation (e.g. the
    model's own greedy output captured beforehand, or a forced script).
    Used by spec-bench to measure the verify machinery's ceiling — with a
    perfect draft the accept rate MUST be 100%, which doubles as a
    correctness gate on the accept comparison — and by tests."""

    def __init__(self, prompt_len: int, continuation: list[int]):
        self.prompt_len = prompt_len
        self.continuation = list(continuation)

    def propose(self, tokens: list[int], n_draft: int) -> list[int]:
        pos = len(tokens) - self.prompt_len
        if pos < 0:
            return []
        return self.continuation[pos:pos + n_draft]


def _greedy_sampler(sp: SamplerParams) -> bool:
    """True when sampling is exactly argmax(raw logits): temperature 0 and
    no stage that can displace the top-1 candidate."""
    return (sp.temp <= 0.0 and sp.penalty_repeat == 1.0
            and sp.penalty_freq == 0.0 and sp.penalty_present == 0.0
            and sp.dry_multiplier == 0.0 and not sp.logit_bias
            and sp.mirostat == 0 and sp.xtc_probability == 0.0
            and sp.adaptive_target < 0)


def _generate_spec_greedy(target: Runtime, ids, max_new_tokens, *, drafter,
                          n_draft, capacity, stop_at_eos, stats,
                          draft: Optional[Runtime] = None):
    """Greedy speculative loop with the ON-DEVICE verify step: one device
    call per round, W-int readback (runtime/generate.py _spec_verify)."""
    eos = target.tokenizer.eos_id if target.tokenizer is not None else -1
    w = 1 + n_draft
    kv = target.new_cache(1, capacity + w + PREFILL_BUCKETS[0])
    logits, kv, n_past = target.eval_tokens(ids, kv, 0)
    out = [int(np.argmax(logits[-1]))]
    step = target._spec_verify(w)

    d_kv = d_n_past = d_loop = None
    if draft is not None:
        d_kv = draft.new_cache(1, capacity + w + PREFILL_BUCKETS[0])
        _, d_kv, d_n_past = draft.eval_tokens(ids, d_kv, 0)
        # scan length n_draft: the draft cache must hold a row for EVERY
        # proposed token (incl. the last) so a fully-accepted round leaves
        # the cache aligned with the history — the last emitted token of
        # the scan is discarded below
        d_loop = draft._decode_loop(n_draft)

    block = np.zeros((1, w), np.int32)
    while len(out) < max_new_tokens:
        cur = out[-1]
        if stop_at_eos and cur == eos:
            break
        if n_past + w >= kv.capacity:
            break                       # caller re-enters with a shift
        if draft is not None:
            # draft proposes via ITS on-device decode scan: 2 device calls
            # (catch-up eval + scan) instead of n_draft round trips
            dl, d_kv, d_n_past = draft.eval_tokens([cur], d_kv, d_n_past)
            first = int(np.argmax(dl[-1]))
            toks, d_kv, _ = d_loop(draft.params,
                                   jnp.asarray([[first]], jnp.int32),
                                   d_kv, jnp.int32(d_n_past))
            proposal = ([first]
                        + [int(t) for t in np.asarray(toks[0])])[:n_draft]
            d_n_past += n_draft
        else:
            proposal = list(drafter.propose(ids + out, n_draft))[:n_draft]
        stats.n_rounds += 1
        stats.n_draft += len(proposal)

        block[0, 0] = cur
        block[0, 1:] = 0
        if proposal:
            block[0, 1:1 + len(proposal)] = proposal
        preds, kv = step(target.params, jnp.asarray(block), kv,
                         jnp.int32(n_past))
        preds = np.asarray(preds[0])    # W ints — the whole readback
        n_acc = 0
        while (n_acc < len(proposal) and preds[n_acc] == proposal[n_acc]
               and (not stop_at_eos or proposal[n_acc] != eos)):
            n_acc += 1
        stats.n_accept += n_acc
        if hasattr(drafter, "accept"):
            drafter.accept(n_acc)
        emitted = list(proposal[:n_acc]) + [int(preds[n_acc])]
        out.extend(emitted)
        n_past += 1 + n_acc
        if draft is not None:
            d_n_past -= len(proposal) - n_acc
        if stop_at_eos and eos in emitted:
            break

    out = out[:max_new_tokens]
    if stop_at_eos and eos in out:
        out = out[:out.index(eos) + 1]
    return ids, out, stats


def _ngram_mod_prefeed(tokens, *, n: int, table_bits: int) -> np.ndarray:
    """Host-side table prefeed for the DEVICE ngram drafter: insert every
    (n-gram -> next token) of the prompt with the same FNV-1a/uint32 hash
    the device kernel uses (Runtime._spec_loop _hash)."""
    size = 1 << table_bits
    table = np.full((size,), -1, np.int32)
    for p in range(n, len(tokens)):
        h = 2166136261
        for t in tokens[p - n:p]:
            h = ((h ^ int(t)) * 16777619) & 0xFFFFFFFF
        table[h & (size - 1)] = tokens[p]
    return table


def generate_speculative_device(
    target: Runtime,
    prompt,
    max_new_tokens: int = 64,
    *,
    n_draft: int = 8,
    rounds_per_call: int = 8,
    capacity: int = 1024,
    stop_at_eos: bool = True,
    replay: Optional[list[int]] = None,
    ngram_n: int = 4,
    table_bits: int = 16,
):
    """Greedy speculative decoding with the WHOLE draft+verify loop on
    device: ``rounds_per_call`` rounds run inside one jit scan per device
    call (Runtime._spec_loop), so a generation pays ~max_new/(rounds*accepted)
    host round-trips instead of one per round. Drafting is the device
    ngram-mod table, or a replay oracle when ``replay`` (a known greedy
    continuation, including its first token) is given.

    Returns (prompt_ids, generated_ids, SpecStats) like generate_speculative.
    """
    ids = (target.tokenizer.encode(prompt) if isinstance(prompt, str)
           else list(prompt))
    stats = SpecStats()
    eos = target.tokenizer.eos_id if target.tokenizer is not None else -1
    W = 1 + n_draft
    chunk_adv = rounds_per_call * W
    kv = target.new_cache(1, capacity + chunk_adv + PREFILL_BUCKETS[0])
    logits, kv, n_past = target.eval_tokens(ids, kv, 0)
    cur_t = int(np.argmax(logits[-1]))
    out = [cur_t]
    kind = "replay" if replay is not None else "ngram"
    loop = target._spec_loop(W, rounds_per_call, draft=kind,
                             ngram_n=ngram_n, table_bits=table_bits)

    cur = jnp.int32(cur_t)
    if kind == "replay":
        # replay[0] is the first generated token (== cur); pad the tail so
        # in-scan slices past the end propose -1 (always rejected)
        pad = np.full((len(replay) + chunk_adv + W,), -1, np.int32)
        pad[:len(replay)] = replay
        rbuf = jnp.asarray(pad)
        pos = jnp.int32(1)
    else:
        seq = ids + [cur_t]
        table = jnp.asarray(_ngram_mod_prefeed(seq, n=ngram_n,
                                               table_bits=table_bits))
        win = np.zeros((ngram_n,), np.int32)
        tailn = min(ngram_n, len(seq))
        win[ngram_n - tailn:] = seq[-tailn:]
        win = jnp.asarray(win)

    while (len(out) < max_new_tokens
           and n_past + chunk_adv <= kv.capacity
           and not (stop_at_eos and eos in out)):
        need = max_new_tokens - len(out)
        if kind == "replay":
            buf, cs, pos, cur, kv, _ = loop(
                target.params, rbuf, pos, cur, kv, jnp.int32(n_past))
        else:
            buf, cs, table, win, cur, kv, _ = loop(
                target.params, table, win, cur, kv, jnp.int32(n_past))
        cs = np.asarray(cs)
        total = int(cs.sum())
        toks = [int(t) for t in np.asarray(buf[:total])]
        out.extend(toks)
        n_past += total
        # stats: only rounds up to the caller's budget count — rounds past
        # it still emit valid greedy tokens (truncated below) but with a
        # replay buffer they run on exhausted (-1) proposals and would
        # dilute the accept rate without being machinery failures
        got = 0
        for c in cs:
            stats.n_rounds += 1
            stats.n_draft += n_draft
            stats.n_accept += int(c) - 1
            got += int(c)
            if got >= need:
                break

    out = out[:max_new_tokens]
    if stop_at_eos and eos in out:
        out = out[:out.index(eos) + 1]
    return ids, out, stats


def autotune_n_draft(target: Runtime, prompt, *, candidates=(4, 8, 16),
                     n_tokens: int = 32, draft: Optional[Runtime] = None,
                     seed: int = 0):
    """--spec-autotune analogue (common/spec-tuner.cpp): time each n_draft
    on a short probe generation and return (best_n, {n: tok_per_s})."""
    import time
    results = {}
    for n in candidates:
        t0 = time.perf_counter()
        _, out, _ = generate_speculative(target, prompt, n_tokens, draft=draft,
                                         n_draft=n, seed=seed,
                                         stop_at_eos=False)
        dt = time.perf_counter() - t0
        results[n] = len(out) / dt
    best = max(results, key=results.get)
    return best, results


def generate_speculative(
    target: Runtime,
    prompt,
    max_new_tokens: int = 64,
    *,
    draft: Optional[Runtime] = None,
    n_draft: int = 8,
    sampler: SamplerParams | None = None,
    seed: int = 0,
    capacity: int = 1024,
    stop_at_eos: bool = True,
    stage: str = "ngram",      # self-spec stage when draft is None: ngram | ngram-map
):
    """Returns (prompt_ids, generated_ids, SpecStats)."""
    sampler = sampler or SamplerParams(temp=0.0)
    ids = target.tokenizer.encode(prompt) if isinstance(prompt, str) else list(prompt)
    stats = SpecStats()
    rng = np.random.default_rng(seed)

    if stage == "mtp":
        return _generate_mtp(target, ids, max_new_tokens, n_draft=n_draft,
                             sampler=sampler, rng=rng, capacity=capacity,
                             stop_at_eos=stop_at_eos, stats=stats)

    if (_greedy_sampler(sampler) and not target.recurrent
            and target.pp_runner is None and target.mesh is None):
        # greedy fast path: on-device verify, W-int readback per round
        if not isinstance(stage, str):
            drafter = stage
        else:
            drafter = {"ngram-map": NgramMapDraft, "suffix": SuffixDraft,
                       "ngram-mod": NgramModDraft,
                       "ngram-cache": NgramCacheDraft, "eagle3": Eagle3Draft,
                       "ngram": NgramDraft}.get(stage, NgramDraft)()
        return _generate_spec_greedy(
            target, ids, max_new_tokens, drafter=drafter, n_draft=n_draft,
            capacity=capacity, stop_at_eos=stop_at_eos, stats=stats,
            draft=draft)

    kv = target.new_cache(1, capacity)
    logits, kv, n_past = target.eval_tokens(ids, kv, 0)
    if not isinstance(stage, str) and hasattr(stage, "propose"):
        # pre-built drafter instance (DFlashDraft, a NgramCacheDraft primed
        # with static/dynamic caches from tools/lookup.py, ...)
        ngram = stage
    else:
        ngram = {"ngram-map": NgramMapDraft, "suffix": SuffixDraft,
                 "ngram-mod": NgramModDraft, "ngram-cache": NgramCacheDraft,
                 "eagle3": Eagle3Draft,
                 "ngram": NgramDraft}.get(stage, NgramDraft)()

    d_kv = d_n_past = None
    if draft is not None:
        d_kv = draft.new_cache(1, capacity)
        _, d_kv, d_n_past = draft.eval_tokens(ids, d_kv, 0)

    out: list[int] = []

    def next_token(lg):
        return int(sample_token(lg, sampler, rng, history=ids + out))

    cur = next_token(logits[-1])
    out.append(cur)

    while len(out) < max_new_tokens:
        if stop_at_eos and cur == target.tokenizer.eos_id:
            break
        # ---- propose
        if draft is not None:
            proposal = []
            dl, d_kv, d_n_past = draft.eval_tokens([cur], d_kv, d_n_past)
            for _ in range(n_draft):
                t = int(dl[-1].argmax())
                proposal.append(t)
                dl, d_kv, d_n_past = draft.eval_tokens([t], d_kv, d_n_past)
        else:
            proposal = ngram.propose(ids + out, n_draft)
        stats.n_rounds += 1
        stats.n_draft += len(proposal)

        # ---- verify: evaluate [cur] + proposal in ONE chunk
        block = [cur] + proposal
        # recurrent-state checkpoint: SSM/hybrid caches cannot rewind by
        # pointer, so keep the pre-verify state (jax arrays are immutable
        # -> a reference IS a checkpoint) and replay the accepted prefix
        # on partial acceptance — the analogue of the reference's
        # recurrent state checkpoint ring for speculative decode
        kv_ckpt, np_ckpt = (kv, n_past) if target.recurrent else (None, None)
        logits_all, kv, n_past = target.eval_tokens(block, kv, n_past,
                                                    all_logits=True)
        # position j of logits_all predicts block[j+1]
        n_acc = 0
        for j, prop in enumerate(proposal):
            pred = next_token(logits_all[j])
            if pred != prop or len(out) >= max_new_tokens:
                out.append(pred)
                cur = pred
                break
            out.append(prop)
            n_acc += 1
            cur = prop
            if stop_at_eos and prop == target.tokenizer.eos_id:
                break
        else:
            # all accepted: sample one more from the last position
            if proposal:
                pred = next_token(logits_all[len(proposal)])
                out.append(pred)
                cur = pred
            else:
                pred = next_token(logits_all[0])
                out.append(pred)
                cur = pred
        stats.n_accept += n_acc
        if hasattr(ngram, "accept"):
            # acceptance feedback (ngram_mod low-acceptance reset etc.)
            ngram.accept(n_acc)

        # rewind target cache past the rejected tail: keep n_past at the
        # position after the last ACCEPTED token
        consumed = 1 + n_acc  # cur + accepted
        if target.recurrent and consumed != len(block):
            # rebuild the recurrent state from the checkpoint over the
            # accepted prefix only (positional rewind is not enough)
            _, kv, n_past = target.eval_tokens(block[:consumed], kv_ckpt,
                                               np_ckpt)
        else:
            n_past = n_past - (len(block) - consumed)
        if draft is not None:
            # rewind draft cache likewise (it advanced len(proposal)+1)
            d_n_past = d_n_past - (len(proposal) - n_acc)

    return ids, out[:max_new_tokens], stats


def _generate_mtp(target, ids, max_new_tokens, *, n_draft, sampler, rng,
                  capacity, stop_at_eos, stats):
    """In-graph MTP (NextN) self-speculation — the reference's MTP stage
    (common/speculative.cpp mtp_speculative_gen_draft / mtp_update_kv_cache):
    the trailing nextn layer drafts from the MAIN model's pre-output-norm
    hidden states; drafts are verified in the main decode; accepted rows of
    the MTP cache are refreshed with the main hidden states.

    Row convention: MTP row p holds (main hidden h_p, token t_{p+1}) and
    predicts t_{p+2}."""
    assert target.has_mtp, "model has no nextn/MTP layer"
    import jax.numpy as jnp

    out: list[int] = []

    def next_token(lg):
        return int(sample_token(lg, sampler, rng, history=ids + out))

    kv = target.new_cache(1, capacity)
    logits_all, hid_all, kv, n_past = target.eval_tokens_hidden(ids, kv, 0)
    mtp_kv = target.new_mtp_cache(1, capacity)
    # warmup rows 0..n-2: (h_p, t_{p+1})
    _, _, mtp_kv, mtp_n_past = target.mtp_eval(ids[1:], hid_all[:-1],
                                               mtp_kv, 0)
    last_hidden = hid_all[-1]
    cur = next_token(logits_all[-1])
    out.append(cur)
    step1 = target._mtp_step(PREFILL_BUCKETS[0])

    while len(out) < max_new_tokens:
        if stop_at_eos and cur == target.tokenizer.eos_id:
            break
        # ---- draft: chain the MTP layer, feeding its own output stream
        proposal = []
        tok_j, hid_j = cur, last_hidden
        mtp_pos = mtp_n_past
        b0 = PREFILL_BUCKETS[0]
        for _ in range(n_draft):
            padded = np.zeros((1, b0), np.int32)
            padded[0, 0] = tok_j
            hid_in = np.zeros((1, b0, hid_j.shape[-1]), np.float32)
            hid_in[0, 0] = hid_j
            lg, mtp_kv, h_m = step1(target.params, jnp.asarray(padded),
                                    jnp.asarray(hid_in), mtp_kv,
                                    jnp.int32(mtp_pos))
            tok_j = int(np.asarray(lg[0, 0]).argmax())
            hid_j = np.asarray(h_m[0, 0])
            proposal.append(tok_j)
            mtp_pos += 1
        stats.n_rounds += 1
        stats.n_draft += len(proposal)

        # ---- verify in the main model
        block = [cur] + proposal
        p0 = n_past
        logits_blk, hid_blk, kv, n_past = target.eval_tokens_hidden(
            block, kv, n_past)
        n_acc = 0
        for j, prop in enumerate(proposal):
            pred = next_token(logits_blk[j])
            if pred != prop or len(out) >= max_new_tokens:
                out.append(pred)
                cur = pred
                break
            out.append(prop)
            n_acc += 1
            cur = prop
            if stop_at_eos and prop == target.tokenizer.eos_id:
                break
        else:
            pred = next_token(logits_blk[len(proposal)])
            out.append(pred)
            cur = pred
        stats.n_accept += n_acc

        consumed = 1 + n_acc
        n_past = p0 + consumed
        # ---- refresh MTP rows p0-1..p0+consumed-2 with MAIN hiddens
        upd_tokens = block[:consumed]            # t at positions p0..
        upd_hidden = np.concatenate([last_hidden[None],
                                     hid_blk[:consumed - 1]], axis=0)
        _, _, mtp_kv, mtp_n_past = target.mtp_eval(upd_tokens, upd_hidden,
                                                   mtp_kv, p0 - 1)
        last_hidden = hid_blk[consumed - 1]

    return ids, out[:max_new_tokens], stats
