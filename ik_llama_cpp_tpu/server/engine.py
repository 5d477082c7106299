"""Continuous-batching slot engine — the analogue of the reference server's
update_slots loop (examples/server/server-context.cpp:4859).

Design: a fixed-capacity slot array shares one batched KV cache
(B = n_parallel rows). New prompts are prefilled chunk-by-chunk into their
slot's cache row; all generating slots then advance together with ONE jitted
decode step over the whole batch (per-row n_past). Sampling, stop conditions,
and streaming happen host-side per slot, like the reference.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import KVCache
from ..runtime.generate import Runtime, PREFILL_BUCKETS, _bucket, FORWARDS
from ..runtime.sampling import (SamplerParams, SamplerState,
                                sample as sample_token, sample_topk,
                                topk_chain_compatible)


class SlotState(Enum):
    IDLE = 0
    QUEUED = 1
    PREFILL = 2
    GENERATING = 3


@dataclass
class Request:
    prompt_ids: list[int]
    n_predict: int = 128
    sampler: SamplerParams = field(default_factory=lambda: SamplerParams(temp=0.8))
    seed: int = 0
    stop: list[str] = field(default_factory=list)
    grammar: str | None = None         # grammar text (constrained decoding)
    # grammar_data dialect — the reference's optional llguidance adapter
    # (common/llguidance.cpp) accepts gbnf/regex/json-schema/lark; non-gbnf
    # kinds compile through runtime/llg.py (or an external registered
    # backend when one is importable)
    grammar_kind: str = "gbnf"
    # lazy grammar: dormant until a trigger word appears in the generated
    # text, then enforced from the trigger onward (grammar_lazy +
    # grammar_triggers request fields; common_grammar_trigger WORD type)
    grammar_lazy: bool = False
    grammar_triggers: list = field(default_factory=list)
    stream_queue: Optional[queue.Queue] = None  # receives (token_id, text|None, done)
    id: int = 0
    cancelled: bool = False       # client disconnect -> slot release
    # max tokens inside <think>...</think> before a forced close
    # (common/reasoning-budget.cpp semantics; -1 = unlimited)
    reasoning_budget: int = -1
    # n_probs > 0: per emitted token append {"id", "logprob", "top":
    # [(id, logprob) x n_probs]} to probs_out, index-aligned with the
    # stream queue's token entries (server n_probs / OpenAI logprobs)
    n_probs: int = 0
    post_sampling_probs: bool = False   # probs from the post-chain candidates
    probs_out: list = field(default_factory=list)
    # context-shift tuning (server n_keep / n_discard request fields);
    # -1 = engine defaults (prompt head capped at capacity/4, half the rest)
    n_keep: int = -1
    n_discard: int = -1
    # banned-phrase rewind (reference banned_strings/banned_regex[_ci]/
    # banned_bias/banned_n/banbuffer_size/rewind_count_max fields,
    # server-context.cpp:4508 rewind_context): when a banned pattern
    # appears in the held-back text, the slot rewinds to the token where
    # the match starts, bans/biases that position's token(s), and resamples
    banned_strings: list = field(default_factory=list)   # lowercased
    banned_regex: list = field(default_factory=list)
    banned_regex_ci: list = field(default_factory=list)
    banned_bias: float = -999.0
    banned_n: int = 1
    banbuffer: int = 0            # chars held from the stream (0 = auto)
    rewind_count_max: int = -1    # -1 heuristic, 0 unlimited, >0 strict
    # rewound tokens don't consume the n_predict budget when set
    # (reference saturate_predict, server-context.cpp:4561)
    saturate_predict: bool = False
    # reasoning-budget tag customization (reasoning_budget_start_tag /
    # _end_tag / _message request fields)
    reasoning_start_tag: str = "<think>"
    reasoning_end_tag: str = "</think>"
    reasoning_message: str = "\n"
    cache_prompt: bool = True     # false disables prefix/KV reuse
    # unicode-script allowlist biasing (--allowlist-unicode-rule /
    # --allowlist-pieces / --allowlist-keyword[-delay] + the request's
    # allowlist_piece_array/allowlist_keyword_delay fields;
    # server-context.cpp:1696-1793): allow_rules is a list of rulesets of
    # (lower_cpt, upper_cpt, script, bias) tuples; keywords found in the
    # generated text expire rulesets in order
    allow_rules: list = field(default_factory=list)
    allow_pieces: list = field(default_factory=list)
    allow_kws: list = field(default_factory=list)
    allow_kw_delay: int = 0
    # expiring logit bias rule text (string or array of lines; the
    # reference's --expiring-logit-bias-file / expiring_logit_bias request
    # field, PR #1731 — runtime/expiring_bias.py)
    expiring_logit_bias: Any = None


@dataclass
class Slot:
    idx: int
    state: SlotState = SlotState.IDLE
    req: Optional[Request] = None
    tokens: list[int] = field(default_factory=list)   # prompt + generated
    cache_tokens: list[int] = field(default_factory=list)  # tokens with valid KV rows
    n_prompt: int = 0
    n_past: int = 0
    n_decoded: int = 0
    n_shifts: int = 0
    rng: Any = None
    sampler_state: Any = None
    text: str = ""
    n_streamed: int = 0         # chars of .text already sent to the stream
    forced: list = field(default_factory=list)   # forced next tokens
    n_think: int = 0
    pending: bytes = b""        # partial UTF-8 tail awaiting continuation
    grammar: Any = None         # per-request GrammarSampler (stateful)
    gen_pieces: list = field(default_factory=list)  # text piece per gen token
    pos_bans: dict = field(default_factory=dict)    # token index -> {ids}
    rewind_count: int = 0
    allowlist: Any = None       # runtime.allowlist.AllowlistState | None
    elb: Any = None             # runtime.expiring_bias.ElbRuntime | None
    lazy_grammar: Any = None    # (gbnf_text, [trigger words]) while dormant
    t_start: float = 0.0
    t_first_token: float = 0.0
    drafter: Any = None         # per-slot self-speculation lookup structure


def _partial_stop_holdback(text: str, stops) -> int:
    """Length of the longest suffix of ``text`` that is a proper prefix of
    any stop string (the reference's find_partial_stop_string) — that many
    chars must be withheld from the stream until disambiguated."""
    hb = 0
    for s in stops:
        if not s:
            continue
        for ln in range(min(len(s) - 1, len(text)), hb, -1):
            if text.endswith(s[:ln]):
                hb = ln
                break
    return hb


class HostPromptCache:
    """RAM tier of evicted slot KV states — the ``--cache-ram`` (-cram)
    analogue (server_prompt_cache, reference server-task.h:431,
    server-task.cpp:1084 similarity-matched load). Evicted/replaced slot
    rows are parked in host RAM; at slot admission the store is searched
    for the entry with the longest reusable prefix of the new prompt.
    Bounded by MiB and/or tokens with oldest-first eviction."""

    def __init__(self, limit_mib: int = 2048, limit_tokens: int = 0,
                 min_reusable_fraction: float = 0.1):
        self.limit_bytes = 0 if limit_mib < 0 else limit_mib * (1 << 20)
        self.limit_tokens = limit_tokens
        self.min_frac = min_reusable_fraction
        self.entries: list[dict] = []           # oldest first
        self.n_hits = 0
        self.n_saves = 0

    @property
    def size_bytes(self) -> int:
        return sum(e["bytes"] for e in self.entries)

    @property
    def n_tokens(self) -> int:
        return sum(len(e["tokens"]) for e in self.entries)

    def save(self, tokens: list[int], arrays: dict) -> None:
        """Park a slot state (host numpy arrays, trimmed to len(tokens))."""
        if not tokens:
            return
        nbytes = sum(a.nbytes for a in arrays.values() if a is not None)
        self.entries.append({"tokens": list(tokens), "arrays": arrays,
                             "bytes": nbytes})
        self.n_saves += 1
        self.update()

    def best_match(self, new_tokens: list[int], beat: int = 0):
        """Entry with the longest common prefix vs ``new_tokens`` that (a)
        reuses at least min_frac of the cached prompt (reference f_keep
        test) and (b) beats ``beat`` (the slot's own local prefix).
        Returns (entry, lcp) or (None, 0); a hit REMOVES the entry."""
        best, best_lcp = None, beat
        for e in self.entries:
            lcp = 0
            for a, b in zip(e["tokens"], new_tokens):
                if a != b:
                    break
                lcp += 1
            if lcp <= best_lcp:
                continue
            if lcp / max(1, len(e["tokens"])) < self.min_frac:
                continue
            best, best_lcp = e, lcp
        if best is None:
            return None, 0
        self.entries.remove(best)
        self.n_hits += 1
        return best, best_lcp

    def update(self) -> None:
        """Evict oldest entries until within the size/token limits."""
        while self.entries and (
                (self.limit_bytes and self.size_bytes > self.limit_bytes)
                or (self.limit_tokens and self.n_tokens > self.limit_tokens)):
            self.entries.pop(0)


class BatchEngine:
    """Owns the model + shared KV cache; runs the slot loop in a thread."""

    def __init__(self, runtime: Runtime, n_slots: int = 4, capacity: int = 2048,
                 spec: str | None = None, spec_n: int = 8,
                 cache_ram_mib: int = 0):
        """``spec``: self-speculation stage for the decode loop — 'ngram',
        'suffix' or None. Draft tokens of every GENERATING slot are
        verified inside the shared batched decode step, the reference's
        update_slots drafting (server-context.cpp:3564-3599)."""
        self.rt = runtime
        self.cfg = runtime.cfg
        self.n_slots = n_slots
        self.capacity = capacity
        self.spec = spec
        self.spec_n = spec_n
        self.kv = runtime.new_cache(n_slots, capacity)
        # -sm layer: per-stage jits replace the single-graph jits; self.kv
        # is then the LIST of per-stage caches on the stage devices
        self._pp_fwd = None
        if getattr(runtime, "pp_runner", None) is not None:
            from ..parallel.pp import PipelineBatchFwd
            self._pp_fwd = PipelineBatchFwd(runtime.pp_runner)
        # RAM prompt-cache tier (0 = disabled, -1 = unlimited, else MiB)
        self.prompt_cache = (HostPromptCache(cache_ram_mib)
                             if cache_ram_mib != 0 else None)
        self.slots = [Slot(i) for i in range(n_slots)]
        self._allow_cache: dict = {}   # shared vocab flattening + bias vecs
        self.requests: queue.Queue[Request] = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._prefill_fns: dict[int, Any] = {}
        self._decode_fn = None
        self._decode_topk_fn = None
        self._spec_decode_fn = None
        self._spec_topk_fn = None
        self._jits: dict[Any, Any] = {}
        # metrics
        self.n_prompt_tokens_processed = 0
        self.n_prompt_tokens_cached = 0
        self.n_tokens_predicted = 0
        self.n_rewinds = 0
        self.n_topk_steps = 0
        self.n_requests = 0
        self.n_draft_proposed = 0
        self.n_draft_accepted = 0

    def _new_drafter(self):
        if self.spec == "ngram":
            from ..runtime.speculative import NgramDraft
            return NgramDraft()
        if self.spec == "suffix":
            from ..runtime.speculative import SuffixDraft
            return SuffixDraft()
        if self.spec == "ngram-mod":
            from ..runtime.speculative import NgramModDraft
            return NgramModDraft()
        if self.spec == "ngram-cache":
            from ..runtime.speculative import NgramCacheDraft
            return NgramCacheDraft()
        if self.spec == "eagle3":
            from ..runtime.speculative import Eagle3Draft
            return Eagle3Draft()
        if self.spec and self.spec.startswith("dflash:"):
            from ..runtime.speculative import DFlashDraft
            return DFlashDraft(self.spec.split(":", 1)[1], self.rt)
        return None

    # ---------------------------------------------------------------- jits
    def _engine_fwd(self):
        """Forward used inside the engine's jits: the plain single-chip
        forward, or the shard_map tensor-parallel forward when the runtime
        carries a mesh (pallas kernels cannot be auto-partitioned by GSPMD,
        so TP serving must route through parallel/tp.py exactly like
        Runtime._step does). The TP path also leaves logits replicated over
        the model axis, so host 0 can fetch them in multi-host serving."""
        if self.rt.mesh is None:
            return FORWARDS[self.cfg.arch]
        if self.rt.kv_quant:
            raise NotImplementedError(
                "tensor-parallel serving with a quantized KV cache is not "
                "supported yet (shard_map cache specs are bf16-only)")
        if getattr(self, "_tp_fwd", None) is None:
            from ..parallel.tp import make_tp_forward
            tp = make_tp_forward(self.cfg, self.rt.mesh, self.rt.params,
                                 fwd=FORWARDS[self.cfg.arch],
                                 logits_last_only=False)
            def fwd(params, cfg, tokens, kv, n_past, logits_last_only=False):
                return tp(params, tokens, kv, n_past)
            self._tp_fwd = fwd
        return self._tp_fwd

    def _prefill_many(self, n_rows: int, bucket: int):
        """Batched prefill: n_rows slots' chunks (same bucket) in ONE forward
        — the analogue of update_slots packing all prompt chunks into a
        single llama_batch (server-context.cpp:4131-4206). Returns only each
        row's last-valid-position logits (last_ix), so the host transfer is
        (rows, vocab) instead of (rows, bucket, vocab)."""
        key = ("many", n_rows, bucket)
        if key not in self._prefill_fns:
            if self._pp_fwd is not None:
                pp = self._pp_fwd

                def prefill_rows_pp(params, tokens, kv, slot_idx, n_past,
                                    last_ix):
                    return pp.prefill_rows(tokens, kv, slot_idx, n_past,
                                           last_ix)

                self._prefill_fns[key] = prefill_rows_pp
                return self._prefill_fns[key]
            cfg = self.cfg
            fwd = self._engine_fwd()

            @jax.jit
            def prefill_rows(params, tokens, kv, slot_idx, n_past, last_ix):
                # gather the slots' cache rows (batch axis 1 on every cache
                # leaf — KV, quant scales, SSM conv/state alike)
                kv_rows = jax.tree_util.tree_map(
                    lambda a: jnp.take(a, slot_idx, axis=1), kv)
                logits, kv_rows = fwd(params, cfg, tokens, kv_rows, n_past,
                                      logits_last_only=False)
                kv2 = jax.tree_util.tree_map(
                    lambda a, r: a.at[:, slot_idx].set(r.astype(a.dtype)),
                    kv, kv_rows)
                last = jnp.take_along_axis(
                    logits, last_ix[:, None, None], axis=1)[:, 0]
                return last, kv2

            self._prefill_fns[key] = prefill_rows
        return self._prefill_fns[key]

    def _prefill(self, bucket: int):
        if bucket not in self._prefill_fns:
            if self._pp_fwd is not None:
                pp = self._pp_fwd

                def prefill_slot_pp(params, tokens, kv, slot_idx, n_past,
                                    last_ix):
                    return pp.prefill_rows(
                        tokens, kv, jnp.reshape(slot_idx, (1,)),
                        jnp.reshape(n_past, (1,)),
                        jnp.reshape(last_ix, (1,)))

                self._prefill_fns[bucket] = prefill_slot_pp
                return self._prefill_fns[bucket]
            cfg = self.cfg
            fwd = self._engine_fwd()

            @jax.jit
            def prefill_slot(params, tokens, kv, slot_idx, n_past, last_ix):
                kv_row = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, slot_idx, 1,
                                                           axis=1), kv)
                logits, kv_row = fwd(params, cfg, tokens, kv_row, n_past,
                                     logits_last_only=False)
                kv2 = jax.tree_util.tree_map(
                    lambda a, r: jax.lax.dynamic_update_slice_in_dim(
                        a, r.astype(a.dtype), slot_idx, axis=1), kv, kv_row)
                last = jax.lax.dynamic_index_in_dim(
                    logits[0], last_ix, axis=0, keepdims=False)
                return last, kv2

            self._prefill_fns[bucket] = prefill_slot
        return self._prefill_fns[bucket]

    def _decode(self):
        if self._decode_fn is None:
            if self._pp_fwd is not None:
                pp = self._pp_fwd
                self._decode_fn = (
                    lambda params, tokens, kv, n_past:
                        pp.decode(tokens, kv, n_past))
                return self._decode_fn
            cfg = self.cfg
            fwd = self._engine_fwd()

            @jax.jit
            def decode_all(params, tokens, kv, n_past):
                return fwd(params, cfg, tokens, kv, n_past, logits_last_only=False)

            self._decode_fn = decode_all
        return self._decode_fn

    TOPK_FETCH = 128   # device-side prefetch width (>= top_k + penalty win)

    def _decode_topk(self):
        """Decode step returning only (top-K vals, ids, logsumexp) per row —
        the device->host readback drops from B x V floats to B x (K+1),
        exact for topk_chain_compatible samplers (the host-side sampler's
        candidate set is fully contained in the prefetch)."""
        if self._decode_topk_fn is None:
            if self._pp_fwd is not None:
                return None      # -sm layer path returns host logits already
            cfg = self.cfg
            fwd = self._engine_fwd()
            K = min(self.TOPK_FETCH, cfg.n_vocab)

            @jax.jit
            def decode_topk(params, tokens, kv, n_past):
                logits, kv = fwd(params, cfg, tokens, kv, n_past,
                                 logits_last_only=False)
                row = logits[:, -1].astype(jnp.float32)
                vals, idx = jax.lax.top_k(row, K)
                lse = jax.scipy.special.logsumexp(row, axis=-1)
                return vals, idx, lse, kv

            self._decode_topk_fn = decode_topk
        return self._decode_topk_fn

    def _spec_decode(self):
        """Batched verify step: (n_slots, 1+spec_n) tokens per row (last
        sampled token + draft), logits at every position."""
        if self._spec_decode_fn is None:
            if self._pp_fwd is not None:
                pp = self._pp_fwd
                self._spec_decode_fn = (
                    lambda params, tokens, kv, n_past:
                        pp.decode(tokens, kv, n_past))
                return self._spec_decode_fn
            cfg = self.cfg
            fwd = self._engine_fwd()

            @jax.jit
            def decode_spec(params, tokens, kv, n_past):
                return fwd(params, cfg, tokens, kv, n_past, logits_last_only=False)

            self._spec_decode_fn = decode_spec
        return self._spec_decode_fn

    def _spec_decode_topk(self):
        """Verify step returning only (top-K vals, ids, logsumexp) per
        POSITION — B x (1+spec_n) x (K+1) floats instead of B x (1+spec_n)
        x V: the same readback diet as _decode_topk, applied to the
        speculative batch (the reference verifies drafts in-batch and reads
        only sampled rows, server-context.cpp:3564-3599)."""
        if self._spec_topk_fn is None:
            if self._pp_fwd is not None:
                return None
            cfg = self.cfg
            fwd = self._engine_fwd()
            K = min(self.TOPK_FETCH, cfg.n_vocab)

            @jax.jit
            def decode_spec_topk(params, tokens, kv, n_past):
                logits, kv = fwd(params, cfg, tokens, kv, n_past,
                                 logits_last_only=False)
                lg = logits.astype(jnp.float32)          # (B, W, V)
                vals, idx = jax.lax.top_k(lg, K)
                lse = jax.scipy.special.logsumexp(lg, axis=-1)
                return vals, idx, lse, kv

            self._spec_topk_fn = decode_spec_topk
        return self._spec_topk_fn

    # ---------------------------------------------------------------- loop
    def start(self):
        self._thread = threading.Thread(target=self.run_loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)

    def submit(self, req: Request):
        self.requests.put(req)
        self.n_requests += 1

    def _slot_state_to_host(self, slot) -> dict | None:
        """Fetch one slot's filled KV rows to host numpy (RAM-cache save)."""
        n = len(slot.cache_tokens)
        if n == 0 or not isinstance(self.kv, KVCache):
            return None
        out = {"k": np.asarray(self.kv.k[:, slot.idx, :n]),
               "v": np.asarray(self.kv.v[:, slot.idx, :n])}
        if self.kv.k_scale is not None:
            out["ks"] = np.asarray(self.kv.k_scale[:, slot.idx, :n])
            out["vs"] = np.asarray(self.kv.v_scale[:, slot.idx, :n])
        return out

    def _restore_slot_state(self, slot, entry) -> None:
        a = entry["arrays"]
        n = min(len(entry["tokens"]), self.capacity - 1)
        k = self.kv.k.at[:, slot.idx, :n].set(
            jnp.asarray(a["k"][:, :n], self.kv.k.dtype))
        v = self.kv.v.at[:, slot.idx, :n].set(
            jnp.asarray(a["v"][:, :n], self.kv.v.dtype))
        ks, vs = self.kv.k_scale, self.kv.v_scale
        if ks is not None and "ks" in a:
            ks = ks.at[:, slot.idx, :n].set(jnp.asarray(a["ks"][:, :n]))
            vs = vs.at[:, slot.idx, :n].set(jnp.asarray(a["vs"][:, :n]))
        self.kv = KVCache(k, v, ks, vs)
        slot.cache_tokens = entry["tokens"][:n]

    def _admit(self):
        for slot in self.slots:
            if slot.state != SlotState.IDLE:
                continue
            try:
                req = self.requests.get_nowait()
            except queue.Empty:
                return
            slot.req = req
            slot.tokens = list(req.prompt_ids)[-(self.capacity - req.n_predict - 1):]
            slot.n_prompt = len(slot.tokens)
            # prompt-cache reuse: skip the common prefix with the slot's
            # previous contents (update_slots' cache_tokens matching,
            # server-context.cpp) — at least one token must be re-evaluated
            prefix = 0
            if req.cache_prompt:
                for a, b in zip(slot.cache_tokens, slot.tokens):
                    if a != b:
                        break
                    prefix += 1
            if self.prompt_cache is not None and req.cache_prompt:
                # RAM tier: look for a cached state with a longer reusable
                # prefix than the slot's own rows; park the current occupant
                # before its rows are overwritten (reference prompt_save /
                # prompt_load at slot allocation, server-context.cpp:1056)
                entry, lcp = self.prompt_cache.best_match(slot.tokens,
                                                          beat=prefix)
                diverges = prefix < len(slot.cache_tokens)
                if entry is not None or diverges:
                    state = self._slot_state_to_host(slot)
                    if state is not None:
                        self.prompt_cache.save(slot.cache_tokens, state)
                if entry is not None:
                    self._restore_slot_state(slot, entry)
                    prefix = lcp
            slot.n_past = min(prefix, slot.n_prompt - 1)
            self.n_prompt_tokens_cached += slot.n_past
            slot.n_decoded = 0
            slot.n_shifts = 0
            slot.text = ""
            slot.n_streamed = 0
            slot.forced = []
            slot.n_think = 0
            slot.pending = b""
            slot.rng = np.random.default_rng(req.seed)
            slot.sampler_state = SamplerState()
            slot.grammar = None
            slot.lazy_grammar = None
            g_text = req.grammar
            if g_text and req.grammar_kind not in ("gbnf", "grammar"):
                from ..runtime import llg
                if req.grammar_kind in llg._BACKENDS:
                    # externally registered engine: stateful sampler object
                    slot.grammar = llg.constraint_from(
                        req.grammar_kind, g_text, self.rt.tokenizer,
                        backend=req.grammar_kind)
                    g_text = None
                else:
                    g_text = llg.to_gbnf(req.grammar_kind, g_text)
            if g_text and req.grammar_lazy and req.grammar_triggers:
                slot.lazy_grammar = (g_text,
                                     [str(t) for t in req.grammar_triggers])
            elif g_text:
                from ..runtime.grammar import Grammar, GrammarSampler
                slot.grammar = GrammarSampler(Grammar(g_text),
                                              self.rt.tokenizer)
            slot.gen_pieces = []
            slot.pos_bans = {}
            slot.rewind_count = 0
            slot.allowlist = None
            if req.allow_rules:
                from ..runtime.allowlist import build_allowlist
                slot.allowlist = build_allowlist(
                    self.rt.tokenizer, req.allow_rules, req.allow_kws,
                    pieces=req.allow_pieces, kw_delay=req.allow_kw_delay,
                    vocab_cache=self._allow_cache)
            slot.elb = None
            if req.expiring_logit_bias is not None:
                from ..runtime.expiring_bias import build_elb_runtime
                slot.elb = build_elb_runtime(
                    self.rt.tokenizer, req.expiring_logit_bias, req.sampler)
            if self.rt.recurrent and (req.banned_strings or req.banned_regex
                                      or req.banned_regex_ci):
                # SSM/conv state cannot be rewound without the checkpoint
                # ring; disable the feature for recurrent models
                req.banned_strings = []
                req.banned_regex = []
                req.banned_regex_ci = []
                req.banbuffer = 0
            if req.banned_strings and req.banbuffer <= 0:
                # auto buffer: longest phrase + 1 chars (reference n_buffer)
                req.banbuffer = max(len(s) for s in req.banned_strings) + 1
            if (req.banned_regex or req.banned_regex_ci) \
                    and req.banbuffer <= 0:
                req.banbuffer = 64
            slot.state = SlotState.PREFILL
            slot.t_start = time.time()

    def _do_prefill(self, slot: Slot):
        """Chunked prefill of one slot's prompt; leaves last-token logits."""
        ids = slot.tokens[slot.n_past:slot.n_prompt]
        last_logits = None
        i = 0
        while i < len(ids):
            chunk = ids[i:i + PREFILL_BUCKETS[-1]]
            b = _bucket(len(chunk))
            padded = np.zeros((1, b), np.int32)
            padded[0, :len(chunk)] = chunk
            fn = self._prefill(b)
            logits, self.kv = fn(self.rt.params, jnp.asarray(padded), self.kv,
                                 jnp.int32(slot.idx), jnp.int32(slot.n_past),
                                 jnp.int32(len(chunk) - 1))
            last_logits = np.asarray(logits)
            slot.n_past += len(chunk)
            self.n_prompt_tokens_processed += len(chunk)
            i += len(chunk)
        slot.state = SlotState.GENERATING
        if slot.t_first_token == 0.0:
            slot.t_first_token = time.time()
        self._emit_token(slot, last_logits)

    def _emit_token(self, slot: Slot, logits: np.ndarray, topk=None):
        req = slot.req
        if slot.allowlist is not None and topk is None and logits is not None:
            # allowlist biases are added to the raw logits before any
            # sampler stage (common/sampling.cpp:640 server_biases) — -inf
            # entries ban the token outright
            srv_bias = slot.allowlist.active_bias()
            if srv_bias is not None and len(srv_bias) == len(logits):
                logits = np.asarray(logits, np.float32) + srv_bias
        if slot.elb is not None and topk is None and logits is not None:
            # expiring logit bias: state-machine token biases added to the
            # raw logits + sampler-param toggles (sampling.cpp:836 apply)
            logits = np.asarray(logits, np.float32).copy()
            slot.elb.apply(logits, slot.text)
        bans = slot.pos_bans.get(len(slot.tokens))
        if bans and topk is None:
            # positional bans from a banned-phrase rewind: bias the tokens
            # that produced the match at exactly this position
            # (server-context.cpp:4773)
            logits = np.asarray(logits, np.float32).copy()
            for t in bans:
                logits[t] += req.banned_bias
        post = None
        if slot.forced:
            tok = slot.forced.pop(0)
        elif topk is not None:
            # device-side top-K prefetch: only (vals, ids, lse) crossed the
            # PCIe/ICI boundary; _slot_topk_ok guaranteed exactness
            vals, tidx, lse = topk
            if bans:
                vals = vals.copy()
                for t in bans:
                    m = np.where(tidx == t)[0]
                    if len(m):
                        vals[m[0]] += req.banned_bias
            tok = sample_topk(vals, tidx, lse, req.sampler, slot.rng,
                              history=slot.tokens, state=slot.sampler_state)
        elif slot.grammar is not None:
            # constrained decoding: chain once, grammar-mask the surviving
            # candidates (the reference's lazy grammar sampler); the
            # sampler's state advances with the accepted text
            try:
                tok = slot.grammar.filter_and_pick(
                    logits, req.sampler, slot.rng, history=slot.tokens,
                    state=slot.sampler_state)
            except RuntimeError:
                # grammar dead-ends against the vocab: fail THIS request
                if req.stream_queue is not None:
                    req.stream_queue.put((-1, "", True))
                slot.state = SlotState.IDLE
                slot.req = None
                return
        elif req.n_probs > 0 and req.post_sampling_probs:
            tok, p_order, p_probs = sample_token(
                logits, req.sampler, slot.rng, history=slot.tokens,
                state=slot.sampler_state, return_probs=True)
            post = (np.asarray(p_order), np.asarray(p_probs))
        else:
            tok = sample_token(logits, req.sampler, slot.rng,
                               history=slot.tokens, state=slot.sampler_state)
        slot.tokens.append(int(tok))
        slot.n_decoded += 1
        self.n_tokens_predicted += 1
        if req.n_probs > 0 and post is not None:
            # post_sampling_probs: probabilities of the chain's surviving
            # candidate set (server post_sampling_probs semantics)
            p_order, p_probs = post
            n = min(req.n_probs, len(p_order))
            where = np.where(p_order == int(tok))[0]
            own = float(np.log(p_probs[where[0]] + 1e-30)) if len(where) \
                else 0.0
            req.probs_out.append({
                "id": int(tok), "logprob": own,
                "top": [(int(p_order[i]), float(np.log(p_probs[i] + 1e-30)))
                        for i in range(n)]})
        elif req.n_probs > 0:
            # log-softmax over the raw logits (pre-sampling probabilities,
            # the reference's default n_probs mode)
            lg = np.asarray(logits, np.float32).reshape(-1)
            lse = float(np.logaddexp.reduce(lg))
            n = min(req.n_probs, len(lg))
            top_ids = np.argpartition(-lg, n - 1)[:n]
            top_ids = top_ids[np.argsort(-lg[top_ids])]
            req.probs_out.append({
                "id": int(tok), "logprob": float(lg[int(tok)] - lse),
                "top": [(int(t), float(lg[t] - lse)) for t in top_ids]})
        # streaming-safe detok: buffer bytes until they form valid UTF-8
        raw = slot.pending + self.rt.tokenizer.decode_bytes([int(tok)])
        try:
            piece = raw.decode("utf-8")
            slot.pending = b""
        except UnicodeDecodeError as e:
            if e.reason.startswith("unexpected end") or e.start > 0 and \
                    len(raw) - e.start < 4:
                piece = raw[: e.start].decode("utf-8", errors="replace")
                slot.pending = raw[e.start:]
            else:
                piece = raw.decode("utf-8", errors="replace")
                slot.pending = b""
        done = False
        if tok == self.rt.tokenizer.eos_id:
            done = True
            piece = ""            # the eos token's own text is never emitted
        prev_text_len = len(slot.text)
        if slot.elb is not None:
            # countup + exit/jump-word scan over the text BEFORE this piece
            # is appended (sampling.cpp:941 accept semantics)
            slot.elb.accept(slot.text, piece)
        slot.text += piece
        if slot.allowlist is not None:
            # keyword scan over the newly appended text expires rulesets in
            # order (update_allowlist_state, server-context.cpp:4630)
            slot.allowlist.update(slot.text, prev_text_len, slot.n_decoded)
        slot.gen_pieces.append(piece)
        if req.cancelled:
            # checked BEFORE the rewind path: a disconnected client must be
            # releasable even under an unlimited rewind budget
            done = True
        if slot.lazy_grammar is not None and slot.grammar is None and piece:
            # lazy grammar: activate at the first trigger-word occurrence
            # and feed it the text from the trigger onward (the reference's
            # COMMON_GRAMMAR_TRIGGER_TYPE_WORD flow)
            g_text, triggers = slot.lazy_grammar
            hits = [slot.text.find(t) for t in triggers]
            hits = [h for h in hits if h >= 0]
            if hits:
                from ..runtime.grammar import Grammar, GrammarSampler
                gs = GrammarSampler(Grammar(g_text), self.rt.tokenizer)
                if gs.grammar.accept_text(slot.text[min(hits):]):
                    slot.grammar = gs
                slot.lazy_grammar = None
        if not done and slot.grammar is None and (
                req.banned_strings or req.banned_regex
                or req.banned_regex_ci):
            if self._check_bans(slot):
                return True       # rewound: nothing emitted this round
        if slot.n_decoded >= req.n_predict:
            done = True
        for stop_s in req.stop:
            if stop_s and stop_s in slot.text:
                slot.text = slot.text.split(stop_s)[0]
                done = True
        # thinking-token budget: force-close the <think> block when exceeded
        # (common/reasoning-budget.cpp)
        if req.reasoning_budget >= 0 and not slot.forced and not done:
            tail = slot.text.rsplit(req.reasoning_start_tag, 1)
            if len(tail) == 2 and req.reasoning_end_tag not in tail[1]:
                slot.n_think += 1
                if slot.n_think >= req.reasoning_budget:
                    slot.forced = self.rt.tokenizer.encode(
                        req.reasoning_message + req.reasoning_end_tag + "\n",
                        add_bos=False)
        if req.cancelled:
            done = True
        if req.stream_queue is not None:
            # stream from the (possibly stop-trimmed) accumulated text, and
            # hold back any suffix that could be the start of a stop string
            # (find_partial_stop_string, reference server.cpp) — otherwise a
            # stop string split across tokens leaks to streaming clients
            safe = len(slot.text)
            if not done:
                hb = _partial_stop_holdback(slot.text, req.stop)
                # ban buffer: the rewindable tail must never be streamed
                safe -= max(hb, req.banbuffer)
            out = slot.text[slot.n_streamed: safe] if safe > slot.n_streamed \
                else ""
            slot.n_streamed += len(out)
            req.stream_queue.put((int(tok), out, done))
        if done:
            slot.cache_tokens = list(slot.tokens)
            slot.state = SlotState.IDLE
            slot.req = None

    def _slot_topk_ok(self, s: Slot) -> bool:
        """Eligibility for the top-K readback decode: the sampler chain must
        be prefetch-exact and the fetch must cover top_k + every distinct
        penalized token (penalties only lower logits, so coverage implies
        identical candidate membership)."""
        req = s.req
        p = req.sampler
        if s.forced or s.grammar is not None or req.n_probs > 0:
            return False
        if s.allowlist is not None and s.allowlist.active_bias() is not None:
            return False      # full-vocab server bias needs the full row
        if s.elb is not None:
            return False      # expiring biases can promote arbitrary tokens
        if s.pos_bans and req.banned_bias > 0:
            return False
        if not topk_chain_compatible(p):
            return False
        if p.penalty_repeat != 1.0 or p.penalty_freq != 0.0 \
                or p.penalty_present != 0.0:
            # exactness relies on penalties only LOWERING logits; boosting
            # variants (repeat<1, negative freq/present) can promote a
            # token from outside the fetch into the true top-k
            if p.penalty_repeat < 1.0 or p.penalty_freq < 0.0 \
                    or p.penalty_present < 0.0:
                return False
            window = p.penalty_last_n if p.penalty_last_n > 0 \
                else len(s.tokens)
            need = max(p.top_k, p.min_keep) + min(window, len(s.tokens))
        else:
            need = max(p.top_k, p.min_keep)
        return need <= min(self.TOPK_FETCH, self.cfg.n_vocab)

    def _check_bans(self, slot: Slot) -> bool:
        """Banned-phrase rewind (rewind_context, server-context.cpp:4508):
        search the held-back tail of the generated text for banned
        strings/regexes; on a match, ban the matched position's token(s)
        and rewind the slot to regenerate from there. The KV rewind is
        free — rows past n_past are simply overwritten (same property the
        speculative verifier relies on). Returns True when rewound."""
        import re as _re
        req = slot.req
        W = req.banbuffer
        win = slot.text[-W:] if W > 0 else slot.text
        base = len(slot.text) - len(win)
        best = None
        low = win.lower()
        for ph in req.banned_strings:
            i = low.find(ph)
            if i >= 0 and (best is None or i < best):
                best = i
        for pats, flags in ((req.banned_regex, 0),
                            (req.banned_regex_ci, _re.IGNORECASE)):
            for pat in pats:
                try:
                    m = _re.search(pat, win, flags)
                except _re.error:
                    continue
                if m and (best is None or m.start() < best):
                    best = m.start()
        if best is None:
            return False
        # rewind budget (reference heuristic / strict / unlimited modes)
        total = (len(req.banned_strings) + len(req.banned_regex)
                 + len(req.banned_regex_ci))
        if req.rewind_count_max == -1:
            if slot.rewind_count >= 20 and slot.rewind_count > 2 * total:
                return False
        elif req.rewind_count_max > 0 and \
                slot.rewind_count >= req.rewind_count_max:
            return False
        # absolute backstop even in 'unlimited' mode: with saturate_predict
        # a pattern matching everything would otherwise never terminate
        if slot.rewind_count >= 100 + 20 * max(1, req.n_predict):
            return False
        # never retract text a streaming client has already received: if the
        # match's containing token started before the held-back window
        # (one token longer than banbuffer), skip the rewind
        # (computed below once the token index is known)
        # char offset of the match -> generated-token index g
        off = base + best
        cum = 0
        g = 0
        for g, p in enumerate(slot.gen_pieces):
            if cum + len(p) > off:
                break
            cum += len(p)
        ban_idx = slot.n_prompt + g
        if req.stream_queue is not None and cum < slot.n_streamed:
            # the containing token began before the stream holdback window
            # (a single long piece): its head already reached the client —
            # retracting it would garble the stream, so let it stand
            return False
        n = req.banned_n
        banned = (slot.tokens[ban_idx: ban_idx + n] if n > 0
                  else slot.tokens[ban_idx:] if n < 0 else [])
        if banned:
            slot.pos_bans.setdefault(ban_idx, set()).update(
                int(t) for t in banned)
        slot.rewind_count += 1
        self.n_rewinds += 1
        slot.tokens = slot.tokens[:ban_idx]
        slot.gen_pieces = slot.gen_pieces[:g]
        slot.text = slot.text[:cum]
        if req.saturate_predict:
            # rewound tokens refund the n_predict budget
            slot.n_decoded = g
        slot.n_past = ban_idx - 1
        slot.pending = b""
        slot.n_streamed = min(slot.n_streamed, cum)
        return True

    def _do_prefill_batch(self, slots: list):
        """One chunk step for several PREFILL slots sharing a bucket size."""
        bucket = None
        chunks = []
        for s in slots:
            chunk = s.tokens[s.n_past: min(s.n_prompt, s.n_past + PREFILL_BUCKETS[-1])]
            chunks.append(chunk)
        bucket = max(_bucket(len(c)) for c in chunks)
        toks = np.zeros((len(slots), bucket), np.int32)
        for r, c in enumerate(chunks):
            toks[r, :len(c)] = c
        idx = np.asarray([s.idx for s in slots], np.int32)
        n_past = np.asarray([s.n_past for s in slots], np.int32)
        last_ix = np.asarray([len(c) - 1 for c in chunks], np.int32)
        fn = self._prefill_many(len(slots), bucket)
        logits, self.kv = fn(self.rt.params, jnp.asarray(toks), self.kv,
                             jnp.asarray(idx), jnp.asarray(n_past),
                             jnp.asarray(last_ix))
        logits_np = np.asarray(logits)
        for r, s in enumerate(slots):
            s.n_past += len(chunks[r])
            self.n_prompt_tokens_processed += len(chunks[r])
            if s.n_past >= s.n_prompt:
                s.state = SlotState.GENERATING
                if s.t_first_token == 0.0:
                    s.t_first_token = time.time()
                self._emit_token(s, logits_np[r])

    def run_loop(self):
        """Engine loop wrapper: one bad request (e.g. a grammar that dead-
        ends against the vocab) must fail THAT request, not kill the
        engine thread and hang the server."""
        while not self._stop.is_set():
            try:
                self._run_loop_inner()
                return
            except Exception:
                import traceback
                traceback.print_exc()
                # fail every active request and keep serving
                for s in self.slots:
                    if s.req is not None:
                        if s.req.stream_queue is not None:
                            s.req.stream_queue.put((-1, "", True))
                        s.req = None
                        s.state = SlotState.IDLE

    def _run_loop_inner(self):
        decode = self._decode()
        pad_tokens = np.zeros((self.n_slots, 1), np.int32)
        while not self._stop.is_set():
            self._admit()
            prefills = [s for s in self.slots if s.state == SlotState.PREFILL]
            gen = [s for s in self.slots if s.state == SlotState.GENERATING]
            if prefills:
                if gen or len(prefills) > 1:
                    # ONE chunk round per loop iteration: ongoing decodes
                    # interleave between prompt chunks, so a long incoming
                    # prompt stalls streaming clients by at most one chunk
                    # (update_slots mixes prompt+gen tokens in one batch in
                    # the reference; chunk-interleaving is our equivalent)
                    self._do_prefill_batch(prefills)
                    self._admit()
                else:
                    # empty engine: sprint the sole prompt to completion
                    self._do_prefill(prefills[0])
                    self._admit()
            gen = [s for s in self.slots if s.state == SlotState.GENERATING]
            if not gen:
                time.sleep(0.002)
                continue
            drafts = {}
            if self.spec is not None:
                for s in gen:
                    if s.drafter is None:
                        s.drafter = self._new_drafter()
                    d = s.drafter.propose(s.tokens, self.spec_n) or []
                    if d:
                        drafts[s.idx] = list(d[:self.spec_n])
            if drafts and all(
                    s.n_past + self.spec_n + 2 < self.capacity for s in gen):
                self._decode_speculative(gen, drafts)
                continue
            toks = pad_tokens.copy()
            n_past = np.zeros((self.n_slots,), np.int32)
            for s in gen:
                toks[s.idx, 0] = s.tokens[-1]
                n_past[s.idx] = s.n_past
            topk_fn = (self._decode_topk()
                       if all(self._slot_topk_ok(s) for s in gen) else None)
            if topk_fn is not None:
                # readback is B x (K+1) floats instead of B x V
                self.n_topk_steps += 1
                vals, idx, lse, self.kv = topk_fn(
                    self.rt.params, jnp.asarray(toks), self.kv,
                    jnp.asarray(n_past))
                vals_np, idx_np = np.asarray(vals), np.asarray(idx)
                lse_np = np.asarray(lse)
                for s in gen:
                    s.n_past += 1
                    if s.n_past >= self.capacity - 1:
                        self._context_shift(s)
                        continue
                    self._emit_token(s, None,
                                     topk=(vals_np[s.idx], idx_np[s.idx],
                                           float(lse_np[s.idx])))
                continue
            logits, self.kv = decode(self.rt.params, jnp.asarray(toks), self.kv,
                                     jnp.asarray(n_past))
            logits_np = np.asarray(logits)[:, -1]
            for s in gen:
                s.n_past += 1
                if s.n_past >= self.capacity - 1:
                    self._context_shift(s)
                    continue
                self._emit_token(s, logits_np[s.idx])

    def _decode_speculative(self, gen: list, drafts: dict):
        """Verify drafts inside ONE batched decode: each generating row
        carries [last_token | draft...]; the sampled token at position j is
        accepted while it equals draft[j] (server-context.cpp:3564-3599).
        Rejected attention-cache rows need no rollback — n_past simply does
        not advance past them and they are overwritten by the next step.

        Recurrent/hybrid models additionally need their SSM state rolled
        back on partial acceptance (the analogue of the reference's
        recurrent per-step checkpoints, speculative.h:27-35): jax arrays
        are immutable, so the pre-verify cache reference IS the checkpoint;
        fully-accepting rows keep the verify's advanced state, and
        partially-accepting rows are replayed from the checkpoint over
        their accepted prefix only (grouped by consumed length) and merged
        back row-wise."""
        k = self.spec_n
        toks = np.zeros((self.n_slots, 1 + k), np.int32)
        n_past = np.zeros((self.n_slots,), np.int32)
        for s in gen:
            d = drafts.get(s.idx, [])
            toks[s.idx, 0] = s.tokens[-1]
            toks[s.idx, 1:1 + len(d)] = d
            n_past[s.idx] = s.n_past
        kv_before = self.kv if self.rt.recurrent else None
        topk_fn = (self._spec_decode_topk()
                   if all(self._slot_topk_ok(s) for s in gen) else None)
        vals_np = idx_np = lse_np = logits_np = None
        if topk_fn is not None:
            # readback: B x (1+k) x (K+1) floats instead of B x (1+k) x V
            self.n_topk_steps += 1
            vals, idx, lse, self.kv = topk_fn(
                self.rt.params, jnp.asarray(toks), self.kv,
                jnp.asarray(n_past))
            vals_np, idx_np = np.asarray(vals), np.asarray(idx)
            lse_np = np.asarray(lse)
        else:
            fn = self._spec_decode()
            logits, self.kv = fn(self.rt.params, jnp.asarray(toks), self.kv,
                                 jnp.asarray(n_past))
            logits_np = np.asarray(logits)
        consumed: dict[int, int] = {}
        for s in gen:
            d = drafts.get(s.idx, [])
            self.n_draft_proposed += len(d)
            pos = 0
            acc = 0
            while s.state == SlotState.GENERATING:
                prev_len = len(s.tokens)
                if topk_fn is not None:
                    emitted = self._emit_token(
                        s, None, topk=(vals_np[s.idx, pos],
                                       idx_np[s.idx, pos],
                                       float(lse_np[s.idx, pos])))
                else:
                    emitted = self._emit_token(s, logits_np[s.idx, pos])
                if emitted:
                    break        # banned-phrase rewind: n_past already reset
                tok = s.tokens[prev_len] if len(s.tokens) > prev_len else None
                s.n_past += 1
                if s.n_past >= self.capacity - 1:
                    self._context_shift(s)
                    break
                if pos >= len(d) or tok != d[pos]:
                    break
                self.n_draft_accepted += 1
                acc += 1
                pos += 1
            if hasattr(s.drafter, "accept"):
                s.drafter.accept(acc)
            consumed[s.idx] = 1 + acc
        if self.rt.recurrent:
            self._fix_recurrent_state(kv_before, toks, n_past, consumed, k)

    def _fix_recurrent_state(self, kv_before, toks, n_past, consumed, k):
        """Replay partially-accepting rows' accepted prefixes from the
        pre-verify checkpoint and merge them into the current cache."""
        partial: dict[int, list[int]] = {}
        for idx, c in consumed.items():
            if c < 1 + k:
                partial.setdefault(c, []).append(idx)
        for c, rows in sorted(partial.items()):
            replayed = self._replay(c)(self.rt.params,
                                       jnp.asarray(toks[:, :c]), kv_before,
                                       jnp.asarray(n_past))
            mask = np.zeros((self.n_slots,), bool)
            mask[rows] = True
            self.kv = self._merge_rows()(replayed, self.kv,
                                         jnp.asarray(mask))

    def _replay(self, width: int):
        """Jitted state-only re-decode of ``width`` tokens (logits unused)."""
        key = ("replay", width)
        if key not in self._jits:
            from ..runtime.generate import FORWARDS
            fwd = FORWARDS[self.rt.cfg.arch]
            cfg = self.rt.cfg

            @jax.jit
            def replay(params, tokens, kv, n_past):
                _, kv2 = fwd(params, cfg, tokens, kv, n_past,
                             logits_last_only=True)
                return kv2

            self._jits[key] = replay
        return self._jits[key]

    def _merge_rows(self):
        """Jitted per-row cache merge: rows where mask -> a, else b (batch
        axis is axis 1 on every cache leaf)."""
        key = ("merge_rows",)
        if key not in self._jits:
            @jax.jit
            def merge(a, b, mask):
                def sel(x, y):
                    m = mask.reshape((1, -1) + (1,) * (x.ndim - 2))
                    return jnp.where(m, x, y)
                return jax.tree_util.tree_map(sel, a, b)

            self._jits[key] = merge
        return self._jits[key]

    def _context_shift(self, slot: Slot):
        """Out of cache: keep the prompt head, discard the oldest half of
        the rest, continue. Shiftable models K-SHIFT in place (cache rows
        moved + roped dims delta-rotated — build_k_shift,
        llama-build-context.cpp:153); others fall back to a re-prefill."""
        from ..runtime.kshift import can_shift, k_shift
        import jax.numpy as jnp
        req = slot.req
        n_keep = min(slot.n_prompt, self.capacity // 4)
        if req is not None and req.n_keep >= 0:
            # clamp so at least one token is always discarded — otherwise
            # the shift is a no-op and the engine livelocks re-prefilling
            # the same full context (reference clamps n_keep to n_ctx - 4)
            n_keep = max(0, min(req.n_keep, slot.n_past - 4))
        n_rest = slot.n_past - n_keep
        n_discard = max(1, n_rest // 2)
        if req is not None and req.n_discard > 0:
            n_discard = max(1, min(req.n_discard, n_rest))
        kept = (slot.tokens[:n_keep]
                + slot.tokens[n_keep + n_discard:])
        slot.n_shifts += 1
        if slot.req is not None and slot.pos_bans is not None:
            # a shift renumbers token positions; absolute-position bans and
            # the piece<->token alignment no longer hold — disable rewind
            slot.pos_bans = {}
            slot.req.banned_strings = []
            slot.req.banned_regex = []
            slot.req.banned_regex_ci = []
        if can_shift(self.rt.cfg) and n_discard > 0 and not self.rt.kv_quant:
            # per-slot in-place K-shift on the shared batch cache
            from ..models.llama import KVCache
            b = slot.idx
            if self._pp_fwd is not None:
                # -sm layer: shift each stage's row slice on its own device
                # (layer_offset keeps SWA rope-base lookups absolute)
                new_kv = []
                for (lo, _hi), kv_s in zip(self.rt.pp_runner.bounds, self.kv):
                    row = KVCache(kv_s.k[:, b:b + 1], kv_s.v[:, b:b + 1])
                    row, new_past = k_shift(row, self.rt.cfg, n_keep,
                                            n_discard, jnp.int32(slot.n_past),
                                            layer_offset=lo)
                    new_kv.append(KVCache(
                        kv_s.k.at[:, b:b + 1].set(row.k),
                        kv_s.v.at[:, b:b + 1].set(row.v)))
                self.kv = new_kv
            else:
                row = KVCache(self.kv.k[:, b:b + 1], self.kv.v[:, b:b + 1])
                row, new_past = k_shift(row, self.rt.cfg, n_keep, n_discard,
                                        jnp.int32(slot.n_past))
                self.kv.k = self.kv.k.at[:, b:b + 1].set(row.k)
                self.kv.v = self.kv.v.at[:, b:b + 1].set(row.v)
            slot.tokens = kept
            slot.cache_tokens = kept[:int(new_past)]
            slot.n_past = int(new_past)
            return
        slot.tokens = kept
        slot.n_prompt = len(kept)       # everything kept is "prompt" now
        slot.cache_tokens = []
        slot.n_past = 0
        slot.state = SlotState.PREFILL

    # ------------------------------------------------------- slot state IO
    def save_slot(self, idx: int, path: str) -> dict:
        """Serialize one slot's cached tokens + KV rows (server
        /slots/{id}?action=save)."""
        from ..runtime.state import save_state
        slot = self.slots[idx]
        row = self._slot_row(idx)
        n = len(slot.cache_tokens)
        save_state(path, slot.cache_tokens, n, row)
        return {"id_slot": idx, "n_saved": n, "filename": str(path)}

    def _slot_row(self, idx: int):
        """One slot's KV rows: a KVCache view, or the per-stage list under
        -sm layer (runtime/state.py handles both layouts)."""
        def rows(kv):
            return KVCache(
                kv.k[:, idx:idx + 1], kv.v[:, idx:idx + 1],
                None if kv.k_scale is None else kv.k_scale[:, idx:idx + 1],
                None if kv.v_scale is None else kv.v_scale[:, idx:idx + 1])
        if isinstance(self.kv, list):
            return [rows(c) for c in self.kv]
        return rows(self.kv)

    def restore_slot(self, idx: int, path: str) -> dict:
        """Restore a saved slot state into slot idx (action=restore)."""
        from ..runtime.state import load_state
        slot = self.slots[idx]
        tokens, n_past, row = load_state(path, self._slot_row(idx))

        def put(kv, row):
            k = jax.lax.dynamic_update_slice_in_dim(kv.k, row.k, idx, axis=1)
            v = jax.lax.dynamic_update_slice_in_dim(kv.v, row.v, idx, axis=1)
            ks, vs = kv.k_scale, kv.v_scale
            if ks is not None and row.k_scale is not None:
                ks = jax.lax.dynamic_update_slice_in_dim(ks, row.k_scale,
                                                         idx, axis=1)
                vs = jax.lax.dynamic_update_slice_in_dim(vs, row.v_scale,
                                                         idx, axis=1)
            return KVCache(k, v, ks, vs)

        if isinstance(self.kv, list):
            self.kv = [put(c, r) for c, r in zip(self.kv, row)]
        else:
            self.kv = put(self.kv, row)
        slot.cache_tokens = list(tokens)
        return {"id_slot": idx, "n_restored": len(tokens), "filename": str(path)}

    def erase_slot(self, idx: int) -> dict:
        slot = self.slots[idx]
        n = len(slot.cache_tokens)
        slot.cache_tokens = []
        return {"id_slot": idx, "n_erased": n}

    # ------------------------------------------------------------- metrics
    def metrics_text(self) -> str:
        lines = [
            "# TYPE llamacpp:prompt_tokens_total counter",
            f"llamacpp:prompt_tokens_total {self.n_prompt_tokens_processed}",
            "# TYPE llamacpp:prompt_tokens_cached counter",
            f"llamacpp:prompt_tokens_cached {self.n_prompt_tokens_cached}",
            *([
                "# TYPE llamacpp:prompt_cache_ram_hits counter",
                f"llamacpp:prompt_cache_ram_hits {self.prompt_cache.n_hits}",
                "# TYPE llamacpp:prompt_cache_ram_bytes gauge",
                f"llamacpp:prompt_cache_ram_bytes {self.prompt_cache.size_bytes}",
            ] if self.prompt_cache is not None else []),
            "# TYPE llamacpp:tokens_predicted_total counter",
            f"llamacpp:tokens_predicted_total {self.n_tokens_predicted}",
            "# TYPE llamacpp:requests_total counter",
            f"llamacpp:requests_total {self.n_requests}",
            "# TYPE llamacpp:slots_idle gauge",
            f"llamacpp:slots_idle {sum(1 for s in self.slots if s.state == SlotState.IDLE)}",
            "# TYPE llamacpp:slots_processing gauge",
            f"llamacpp:slots_processing {sum(1 for s in self.slots if s.state != SlotState.IDLE)}",
            "# TYPE llamacpp:rewinds_total counter",
            f"llamacpp:rewinds_total {self.n_rewinds}",
            "# TYPE llamacpp:topk_decode_steps_total counter",
            f"llamacpp:topk_decode_steps_total {self.n_topk_steps}",
            "# TYPE llamacpp:draft_tokens_total counter",
            f"llamacpp:draft_tokens_total {self.n_draft_proposed}",
            "# TYPE llamacpp:draft_tokens_accepted_total counter",
            f"llamacpp:draft_tokens_accepted_total {self.n_draft_accepted}",
        ]
        return "\n".join(lines) + "\n"
