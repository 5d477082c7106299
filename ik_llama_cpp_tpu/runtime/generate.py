"""Model runtime: load a GGUF, run prefill/decode with jit shape-bucketing.

The analogue of llama_decode_internal's graph-reuse machinery
(src/llama.cpp:6092, can_reuse_graph :661): where the reference rebuilds a
cheap graph per ubatch, XLA compiles once per (batch, chunk-length) bucket
and reuses the executable — prompt chunks are padded up to the bucket size.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel, load_gguf
from ..models.config import ModelConfig, config_from_gguf
from ..models import llama as llama_mod
from ..models import deepseek2 as ds2_mod
from ..models.llama import KVCache
from .tokenizer import Tokenizer, tokenizer_from_gguf
from .sampling import SamplerParams, sample as sample_token

PREFILL_BUCKETS = (8, 16, 32, 64, 128, 256, 512)


def _log_model_load(gg: GGUFModel, cfg: ModelConfig) -> None:
    """Reference-style load log (docs/parameters.md "Look in the logs"):
    per-type tensor counts and total sizes."""
    import logging
    import collections
    log = logging.getLogger("ik_llama_cpp_tpu")
    counts: dict = collections.Counter()
    nbytes: dict = collections.Counter()
    total = 0
    for name, info in gg.tensors.items():
        tname = info.ggml_type.name
        counts[tname] += 1
        nbytes[tname] += len(info.data)
        total += len(info.data)
    for tname in sorted(counts):
        log.info("model tensors: %-8s %4d tensors  %8.2f MiB",
                 tname, counts[tname], nbytes[tname] / (1 << 20))
    log.info("model: arch=%s layers=%d embd=%d heads=%d/%d ff=%d vocab=%d "
             "ctx_train=%d  file=%.2f MiB",
             cfg.arch, cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.n_head_kv,
             cfg.n_ff, cfg.n_vocab, cfg.n_ctx_train, total / (1 << 20))


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return PREFILL_BUCKETS[-1]


def _chunk_limit(kv, n_past: int) -> int:
    """Largest token chunk whose bucket-padded cache write still fits.

    Prefill writes round the chunk up to a PREFILL_BUCKETS size, so a write
    at n_past touches rows [n_past, n_past + bucket) — which must stay inside
    a plain fixed-capacity cache (ring/recurrent caches wrap instead and are
    not constrained here)."""
    if not isinstance(kv, KVCache):
        return PREFILL_BUCKETS[-1]
    room = kv.capacity - n_past
    fit = 0
    for b in PREFILL_BUCKETS:
        if b <= room:
            fit = b
    if fit == 0:
        raise ValueError(
            f"KV cache full: capacity {kv.capacity}, n_past {n_past}; "
            f"writes are padded to >={PREFILL_BUCKETS[0]}-token buckets — "
            "allocate headroom (Runtime.new_cache rounds this up for you)")
    return fit


_DENSE_FAMILY = ("llama", "llama4", "granitemoe", "qwen2vl", "step35",
                 "qwen3vl", "qwen3vlmoe",
                 "qwen2", "qwen3", "mistral", "gemma",
                 "gemma2", "gemma3", "phi3", "qwen2moe", "qwen3moe",
                 "internlm2", "smollm3", "mistral3", "granite",
                 "exaone", "starcoder2", "mixtral", "gpt-oss",
                 "command-r", "cohere2",
                 # classic families on the same configurable graph
                 "gpt2", "gptneox", "falcon", "mpt", "bloom", "starcoder",
                 "refact", "phi2", "stablelm", "jais", "olmo", "baichuan",
                 "orion", "xverse", "minicpm", "qwen", "codeshell",
                 "chatglm", "glm4", "glm4moe",
                 # modern MoE / scaled variants on the same graph
                 "seed_oss", "mellum", "hunyuan-moe", "dots1", "ernie4_5",
                 "ernie4_5-moe", "minimax-m2", "minimax-m3", "mimo2",
                 "cohere2_moe", "laguna", "arctic", "dbrx", "grok", "plamo",
                 "bailingmoe2", "deci", "openelm", "bitnet", "bitnet-25",
                 "bitnet-b1.58")
FORWARDS = {a: llama_mod.forward for a in _DENSE_FAMILY}
LOADERS = {a: llama_mod.load_llama_params for a in _DENSE_FAMILY}
CACHES = {a: (lambda cfg, b, cap, quant=False: KVCache.create(cfg, b, cap, quant=quant))
          for a in _DENSE_FAMILY}
for _a in ("deepseek2", "mistral4", "glm-dsa"):
    FORWARDS[_a] = ds2_mod.forward
    LOADERS[_a] = ds2_mod.load_deepseek2_params
    CACHES[_a] = lambda cfg, b, cap, quant=False: ds2_mod.make_cache(cfg, b, cap)

from ..models import deepseek4 as ds4_mod  # noqa: E402
FORWARDS["deepseek4"] = ds4_mod.forward
LOADERS["deepseek4"] = ds4_mod.load_deepseek4_params
CACHES["deepseek4"] = lambda cfg, b, cap, quant=False: \
    ds4_mod.DS4Cache.create(cfg, b, cap)

from ..models import mamba as mamba_mod  # noqa: E402
FORWARDS["mamba"] = mamba_mod.forward
LOADERS["mamba"] = mamba_mod.load_mamba_params
CACHES["mamba"] = lambda cfg, b, cap, quant=False: mamba_mod.MambaCache.create(cfg, b, cap)

from ..models import qwen3next as q3n_mod  # noqa: E402
for _a in ("qwen3next", "qwen35", "qwen35moe"):
    FORWARDS[_a] = q3n_mod.forward
    LOADERS[_a] = q3n_mod.load_qwen3next_params
    CACHES[_a] = lambda cfg, b, cap, quant=False: q3n_mod.HybridCache.create(cfg, b, cap)

from ..models import gemma4 as gemma4_mod  # noqa: E402
FORWARDS["gemma4"] = gemma4_mod.forward
LOADERS["gemma4"] = gemma4_mod.load_gemma4_params
CACHES["gemma4"] = lambda cfg, b, cap, quant=False: \
    gemma4_mod.Gemma4Cache.create(cfg, b, cap)


def _gemma4_mtp_standalone(*args, **kwargs):
    raise RuntimeError(
        "gemma4_mtp / gemma4-assistant are draft models that attend into a "
        "TARGET gemma4 context — drive them through "
        "models.gemma4.gemma4_mtp_forward (or the server's MTP spec stage), "
        "not Runtime.eval_tokens (reference: llama_set_mtp_target_context, "
        "src/llama.cpp:12937)")


for _a in ("gemma4_mtp", "gemma4-assistant"):
    FORWARDS[_a] = _gemma4_mtp_standalone
    LOADERS[_a] = gemma4_mod.load_gemma4_mtp_params
    CACHES[_a] = lambda cfg, b, cap, quant=False: None  # uses the target's KV


def _gptj_unsupported(*args, **kwargs):
    raise NotImplementedError(
        "gptj is vestigial in the reference too: its tensor map holds only "
        "token_embd and there is no graph builder (llama-model.cpp:171, no "
        "build_gptj in src/graphs/) — every attempt to load a GPT-J GGUF "
        "fails there as well. Registered for 84/84 arch-name parity only.")


FORWARDS["gptj"] = _gptj_unsupported
LOADERS["gptj"] = _gptj_unsupported
CACHES["gptj"] = _gptj_unsupported

from ..models import openpangu as opg_mod  # noqa: E402
FORWARDS["openpangu"] = opg_mod.forward
LOADERS["openpangu"] = opg_mod.load_openpangu_params
CACHES["openpangu"] = lambda cfg, b, cap, quant=False: \
    opg_mod.PanguCache.create(cfg, b, cap)

from ..models import bert as bert_mod  # noqa: E402
for _bert_arch in ("bert", "nomic-bert", "jina-bert-v2"):
    FORWARDS[_bert_arch] = bert_mod.forward
    LOADERS[_bert_arch] = bert_mod.load_bert_params
    CACHES[_bert_arch] = lambda cfg, b, cap, quant=False: bert_mod.NoCache()


@dataclass
class Runtime:
    cfg: ModelConfig
    tokenizer: Tokenizer
    params: Any
    interpret: bool = False
    kv_quant: "bool | str" = False  # KV codec: False | True/'q8' | 'q4' |
    #                                 'q6' | 'nl4'/'iq4_nl' | per-layer dict
    swa_compress: bool = False  # ring caches on SWA layers (--swa-compress)
    mesh: Any = None        # jax Mesh for tensor/expert-parallel serving
    pp_runner: Any = None   # -sm layer: PipelineRunner (parallel/pp.py)

    _step_fns: dict = field(default_factory=dict)

    @classmethod
    def from_gguf(cls, path, *, use_quant: bool = True, interpret: bool = False,
                  kv_quant: bool = False, fuse: bool = True,
                  swa_compress: bool = False, track_reload: bool = False,
                  tensor_parallel: int = 0, expert_parallel: int = 1,
                  layer_split: int = 0,
                  k_hadamard: bool = False, v_hadamard: bool = False):
        """``tensor_parallel`` > 1 shards the model over a (1[, ep], tp)
        device mesh — the reference's -sm graph, expressed as pjit shardings
        (parallel/mesh.py). 0/1 = single chip.

        ``layer_split`` > 1 instead splits CONTIGUOUS layer ranges across
        that many devices — the reference's -sm layer (one activation hop
        per stage boundary, no collectives; parallel/pp.py). Mutually
        exclusive with tensor_parallel."""
        gg = load_gguf(path)
        cfg = config_from_gguf(gg.metadata)
        if k_hadamard or v_hadamard:
            # -khad/-vhad: outlier-taming rotation for quantized KV
            # (hadamard.cu analogue; ops/kv_quant.hadamard_rotate)
            from dataclasses import replace as _dc_replace
            cfg = _dc_replace(cfg, k_hadamard=k_hadamard,
                              v_hadamard=v_hadamard)
        tok = tokenizer_from_gguf(gg.metadata)
        loader = LOADERS.get(cfg.arch)
        if loader is None:
            raise NotImplementedError(f"arch {cfg.arch!r} not supported yet")
        import inspect
        mesh = None
        if tensor_parallel and tensor_parallel > 1:
            fuse = False         # TP column split needs separate q/k/v
        kw = {}
        sig = inspect.signature(loader).parameters
        if "fuse" in sig:
            kw["fuse"] = fuse     # merge qkv / gate-up (single-chip fast path)
        if "mla" in sig:
            # latent absorb cache — also under TP: wk_b/wv_b shard on the
            # head axis with a replicated latent cache (the reference's
            # distribute_mla_tensors_for_split_mode_graph design)
            kw["mla"] = True
        if layer_split and layer_split > 1:
            if tensor_parallel and tensor_parallel > 1:
                raise ValueError("-sm layer and -sm graph are exclusive "
                                 "(pick tensor_parallel OR layer_split)")
            if FORWARDS.get(cfg.arch) is not llama_mod.forward:
                raise NotImplementedError(
                    f"layer_split supports the standard attention graph; "
                    f"arch {cfg.arch!r} has a specialized forward")
        params = loader(gg, cfg, use_quant=use_quant, **kw)
        pp_runner = None
        if layer_split and layer_split > 1:
            from ..parallel.pp import PipelineRunner
            pp_runner = PipelineRunner(cfg, params, n_stages=layer_split)
            # stage copies own the weights now; drop the staging params so
            # device 0 does not hold a full duplicate
            params = {}
        if tensor_parallel and tensor_parallel > 1:
            from ..parallel.mesh import make_mesh, shard_params
            shape = ((1, tensor_parallel) if expert_parallel <= 1
                     else (1, expert_parallel, tensor_parallel))
            n_dev = int(np.prod(shape))
            mesh = make_mesh(shape, devices=jax.devices()[:n_dev])
            params = shard_params(params, mesh)
        _log_model_load(gg, cfg)
        rt = cls(cfg=cfg, tokenizer=tok, params=params, interpret=interpret,
                 kv_quant=kv_quant, swa_compress=swa_compress, mesh=mesh,
                 pp_runner=pp_runner)
        if track_reload:
            # on-demand tensor reload (llama-reload analogue): snapshot
            # per-tensor CRCs so reload_changed_tensors() can patch the
            # live params when the GGUF changes on disk
            from .reload import ReloadInfo
            rt._reload_info = ReloadInfo(path, gg)
            rt._loader_kw = dict(use_quant=use_quant, **kw)
        return rt

    def _no_pp(self, what: str):
        if self.pp_runner is not None:
            raise NotImplementedError(
                f"{what} is not available under -sm layer yet "
                f"(generate/eval_tokens/server paths are; load without "
                f"layer_split for this feature)")

    @property
    def recurrent(self) -> bool:
        return self.cfg.arch in ("mamba", "qwen3next", "qwen35", "qwen35moe")

    def reload_changed_tensors(self) -> bool:
        """Pick up on-disk tensor changes into the live model
        (llama_reload_changed_tensors, include/llama.h:1635)."""
        from .reload import reload_changed_tensors
        return reload_changed_tensors(self)

    @property
    def needs_n_valid(self) -> bool:
        """Padded prefill rows must not be committed to persistent state:
        recurrent scans, and ring writes under --swa-compress (padded rows
        would wrap and clobber live window rows)."""
        return self.recurrent or self.swa_compress

    # ------------------------------------------------------------------
    def _step(self, chunk: int, last_only: bool):
        key = (chunk, last_only)
        if key not in self._step_fns:
            fwd = FORWARDS[self.cfg.arch]
            cfg, interp = self.cfg, self.interpret

            if self.pp_runner is not None:
                # -sm layer: host-chained per-stage jits; kv is the list of
                # per-stage caches from new_cache()
                runner = self.pp_runner

                def step(params, tokens, kv, n_past, n_valid=None):
                    return runner(tokens, kv, n_past)
            elif self.mesh is not None:
                from ..parallel.tp import make_tp_forward
                tp_fwd = make_tp_forward(cfg, self.mesh, self.params,
                                         fwd=fwd, logits_last_only=last_only)

                def step(params, tokens, kv, n_past, n_valid=None,
                         _f=tp_fwd):
                    return _f(params, tokens, kv, n_past)
            elif self.needs_n_valid:
                # recurrent state / ring writes must not advance past the
                # valid length
                @jax.jit
                def step(params, tokens, kv, n_past, n_valid):
                    return fwd(params, cfg, tokens, kv, n_past,
                               interpret=interp, logits_last_only=last_only,
                               n_valid=n_valid)
            else:
                @jax.jit
                def step(params, tokens, kv, n_past, n_valid=None):
                    return fwd(params, cfg, tokens, kv, n_past,
                               interpret=interp, logits_last_only=last_only)

            self._step_fns[key] = step
        return self._step_fns[key]

    # ----------------------------------------------------- MTP (nextn) ----
    @property
    def has_mtp(self) -> bool:
        return isinstance(self.params, dict) and "mtp_blocks" in self.params

    def new_mtp_cache(self, batch: int = 1, capacity: int = 512) -> KVCache:
        """1-layer KV cache for the trailing NextN/MTP layer."""
        import dataclasses
        cfg1 = dataclasses.replace(self.cfg, n_layer=1)
        return KVCache.create(cfg1, batch, capacity)

    def _mtp_step(self, chunk: int):
        key = ("mtp", chunk)
        if key not in self._step_fns:
            from ..models.llama import mtp_forward
            cfg, interp = self.cfg, self.interpret

            @jax.jit
            def step(params, tokens, hidden, kv, n_past):
                return mtp_forward(params, cfg, tokens, hidden, kv, n_past,
                                   interpret=interp)

            self._step_fns[key] = step
        return self._step_fns[key]

    def mtp_eval(self, ids: list[int], hidden: np.ndarray, kv: KVCache,
                 n_past: int):
        """Run the MTP layer over (token, hidden) pairs — warmup /
        update-accepted (mtp_update_kv_cache, common/speculative.cpp:3240).
        Returns (last_logits (V,), last_mtp_hidden (E,), kv, n_past)."""
        logits = h_out = None
        i = 0
        while i < len(ids):
            chunk = ids[i:i + PREFILL_BUCKETS[-1]]
            b = _bucket(len(chunk))
            padded = np.zeros((1, b), np.int32)
            padded[0, :len(chunk)] = chunk
            hid = np.zeros((1, b, hidden.shape[-1]), np.float32)
            hid[0, :len(chunk)] = hidden[i:i + len(chunk)]
            step = self._mtp_step(b)
            logits, kv, h_out = step(self.params, jnp.asarray(padded),
                                     jnp.asarray(hid), kv, jnp.int32(n_past))
            n_past += len(chunk)
            i += len(chunk)
        j = len(chunk) - 1            # last REAL position of the final chunk
        return (np.asarray(logits[0, j]), np.asarray(h_out[0, j]), kv, n_past)

    def eval_tokens_hidden(self, ids: list[int], kv: KVCache, n_past: int = 0):
        """eval_tokens variant returning per-position PRE-output-norm hidden
        states (the MTP input, 'result_mtp_embd'). Returns
        (logits_all (n, V), hidden (n, E), kv, n_past)."""
        self._no_pp("eval_tokens_hidden (MTP hidden extraction)")
        fwd = FORWARDS[self.cfg.arch]
        cfg, interp = self.cfg, self.interpret
        key = ("hidden-step",)
        if key not in self._step_fns:
            @jax.jit
            def step(params, tokens, kv, n_past):
                return fwd(params, cfg, tokens, kv, n_past, interpret=interp,
                           return_mtp_hidden=True)
            self._step_fns[key] = step
        step = self._step_fns[key]
        out_l, out_h = [], []
        i = 0
        while i < len(ids):
            chunk = ids[i:i + _chunk_limit(kv, n_past)]
            b = _bucket(len(chunk))
            padded = np.zeros((1, b), np.int32)
            padded[0, :len(chunk)] = chunk
            logits, kv, hid = step(self.params, jnp.asarray(padded), kv,
                                   jnp.int32(n_past))
            out_l.append(np.asarray(logits[0, :len(chunk)]))
            out_h.append(np.asarray(hid[0, :len(chunk)]))
            n_past += len(chunk)
            i += len(chunk)
        return (np.concatenate(out_l), np.concatenate(out_h), kv, n_past)

    def new_cache(self, batch: int = 1, capacity: int = 512) -> KVCache:
        # pad so bucket-rounded writes near the end fit: a decode at
        # n_past = capacity-1 still writes a PREFILL_BUCKETS[0]-row slab.
        # Rounded to a multiple of 256 — the decode FA kernel needs a
        # power-of-two KV tile >= 128 dividing the capacity; an 8-rounded
        # capacity silently dropped every serving-path decode onto the
        # copy-heavy slab fallback (<= 255 wasted rows is noise next to
        # that)
        b0 = max(PREFILL_BUCKETS[0], 256)
        capacity = -(-(capacity + PREFILL_BUCKETS[0] - 1) // b0) * b0
        if isinstance(self.kv_quant, dict):
            # per-layer first/last codec overrides (llama.h:390-397):
            # {"type": "q4", "first": "q8", "n_first": 1,
            #  "last": "q8", "n_last": 1}
            if FORWARDS.get(self.cfg.arch) is not llama_mod.forward:
                raise NotImplementedError(
                    "per-layer KV codec overrides need the standard "
                    f"attention graph; arch {self.cfg.arch!r} is custom")
            s = self.kv_quant
            ovr = s.get("first", s.get("last", "q8"))
            n_first = int(s.get("n_first", 1 if "first" in s else 0))
            n_last = int(s.get("n_last", 1 if "last" in s else 0))
            if n_first + n_last < self.cfg.n_layer:
                return llama_mod.MixedKVCache.create(
                    self.cfg, batch, capacity, mid=s.get("type", "q4"),
                    override=ovr, n_first=n_first, n_last=n_last)
            # degenerate: every layer overridden -> plain cache of the
            # override codec
            return KVCache.create(self.cfg, batch, capacity, quant=ovr)
        if self.pp_runner is not None:
            # list of per-stage caches, each resident on its stage's device
            return self.pp_runner.init_cache(batch, capacity,
                                             quant=self.kv_quant)
        if self.cfg.arch in ("deepseek2", "glm-dsa"):
            absorb = "wk_b" in self.params["blocks"][0]
            return ds2_mod.make_cache(self.cfg, batch, capacity, mla=absorb)
        if self.swa_compress:
            # --swa-compress: ring caches on sliding-window layers
            # (llama.cpp:1198-1227). Only for the standard attention graph
            # with a bf16 cache; silently ineffective rings fall back.
            cap_margin = PREFILL_BUCKETS[-1] + 64
            if (FORWARDS.get(self.cfg.arch) is llama_mod.forward
                    and not self.kv_quant and self.cfg.swa_window > 0
                    and self.cfg.swa_window + cap_margin + 128 < capacity):
                return llama_mod.SwaKVCache.create(
                    self.cfg, batch, capacity, margin=cap_margin)
        return CACHES[self.cfg.arch](self.cfg, batch, capacity, quant=self.kv_quant)

    def eval_tokens(self, ids: list[int], kv: KVCache, n_past: int = 0,
                    *, all_logits: bool = False):
        """Evaluate ids; returns (logits ndarray (len(ids) or 1, V), kv, n_past)."""
        out_chunks = []
        logits = None
        last_len = 0
        i = 0
        while i < len(ids):
            chunk = ids[i:i + _chunk_limit(kv, n_past)]
            b = _bucket(len(chunk))
            padded = np.zeros((1, b), np.int32)
            padded[0, :len(chunk)] = chunk
            step = self._step(b, False)
            if self.needs_n_valid:
                logits, kv_new = step(self.params, jnp.asarray(padded), kv,
                                      jnp.int32(n_past), jnp.int32(len(chunk)))
            else:
                logits, kv_new = step(self.params, jnp.asarray(padded), kv,
                                      jnp.int32(n_past))
            # only the first len(chunk) positions are real; roll back cache writes
            # beyond them by trimming n_past bookkeeping (cache rows past kv_len
            # are ignored by the mask on subsequent steps)
            if all_logits:
                out_chunks.append(np.asarray(logits[0, :len(chunk)]))
            kv = kv_new
            last_len = len(chunk)
            n_past += len(chunk)
            i += len(chunk)
        if all_logits:
            return np.concatenate(out_chunks, axis=0), kv, n_past
        # fetch ONLY the final position's row (device-side slice): prefill
        # callers never need intermediate logits, and device->host readback
        # of a full (T, V) block is the single most expensive fetch in the
        # serve loop (the reference reads back just the out_ids rows too,
        # llama.cpp:6576-6601)
        final = np.asarray(logits[0, last_len - 1:last_len])
        return final, kv, n_past

    def _spec_verify(self, width: int, donate: bool = True):
        """Jitted decode-shaped speculative-verify step: evaluate a (B, W)
        block of [last_token | draft...] rows and return the per-position
        argmax predictions (B, W) int32 — the ONLY readback is W ints/row,
        never the (W, V) logits block. The TPU-native answer to the
        reference's draft-in-batch verification (server-context.cpp:
        3564-3599): verification is one decode-shaped device step; the host
        only counts the leading match length. Rejected-cache rows need no
        rollback — n_past stays behind them and the next step overwrites."""
        key = ("spec-verify", width, donate)
        if key not in self._step_fns:
            fwd = FORWARDS[self.cfg.arch]
            cfg, interp = self.cfg, self.interpret

            @functools.partial(jax.jit,
                               donate_argnums=(2,) if donate else ())
            def step(params, tokens, kv, n_past):
                logits, kv = fwd(params, cfg, tokens, kv, n_past,
                                 interpret=interp)
                preds = jnp.argmax(logits.astype(jnp.float32),
                                   axis=-1).astype(jnp.int32)
                return preds, kv

            self._step_fns[key] = step
        return self._step_fns[key]

    def _spec_loop(self, width: int, rounds: int, *, draft: str = "ngram",
                   ngram_n: int = 4, table_bits: int = 16):
        """Fully ON-DEVICE speculative decoding: ``rounds`` draft+verify
        rounds inside ONE jit (lax.scan) — zero host round-trips per round,
        the way _decode_loop chains plain decode steps. The r4 design paid
        one ~26 ms tunnel round-trip per spec round (host drafter propose +
        one _spec_verify call), which made every realistic drafter a net
        slowdown; here the drafter itself lives on device.

        draft="ngram": a device-resident modular-hash n-gram table — the
        TPU re-design of the reference's ngram_mod stage (common/
        ngram-mod.cpp + common_speculative_state_ngram_mod, speculative.cpp:
        786-848): an open-addressed int32 array indexed by an FNV-1a hash of
        the last ``ngram_n`` tokens, storing the following token. Lookup
        chains width-1 proposals; accepted tokens are folded back into the
        table inside the same scan step. A table miss proposes token 0
        (verification is fixed-width, so a junk proposal costs nothing over
        proposing fewer).

        draft="replay": proposals stream from a pre-supplied continuation
        buffer (the oracle/spec-bench drafter; also the building block for
        server-side static drafts).

        Returns a jitted callable:
          ngram:  (params, table, win, cur, kv, n_past)
                  -> (buf, counts, table, win, cur, kv, n_past)
          replay: (params, replay, pos, cur, kv, n_past)
                  -> (buf, counts, pos, cur, kv, n_past)
        where buf is (rounds*width,) int32 whose first sum(counts) entries
        are the newly generated tokens and counts (rounds,) is the
        per-round emission count (1 + accepted). kv (and the ngram table)
        are donated.
        """
        key = ("spec-loop", width, rounds, draft, ngram_n, table_bits)
        if key in self._step_fns:
            return self._step_fns[key]
        if self.recurrent or self.pp_runner is not None or self.mesh is not None:
            raise NotImplementedError(
                "on-device spec loop needs a single-chip non-recurrent "
                "graph (positional KV rewind); use generate_speculative")
        fwd = FORWARDS[self.cfg.arch]
        cfg, interp = self.cfg, self.interpret
        W = width
        size = 1 << table_bits

        def _hash(win):
            # FNV-1a over the n-gram, uint32 wraparound (matches the host
            # prefeed in runtime/speculative.py _ngram_mod_prefeed)
            h = jnp.uint32(2166136261)
            for i in range(ngram_n):
                h = (h ^ win[i].astype(jnp.uint32)) * jnp.uint32(16777619)
            return (h & jnp.uint32(size - 1)).astype(jnp.int32)

        def _verify(params, cur, proposal, kv, n_past):
            block = jnp.concatenate([cur[None], proposal])[None]   # (1, W)
            logits, kv = fwd(params, cfg, block, kv, n_past,
                             interpret=interp)
            preds = jnp.argmax(logits[0].astype(jnp.float32),
                               axis=-1).astype(jnp.int32)          # (W,)
            match = (preds[:-1] == proposal).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(match))
            return preds, n_acc, kv

        def _compact(em, cs):
            # (rounds, W) emissions, (rounds,) counts -> packed buffer;
            # cs is returned too so the host can attribute acceptance
            # per-round (rounds past the caller's token budget emit valid
            # greedy tokens but must not dilute the accept-rate stats)
            offs = jnp.cumsum(cs) - cs
            idx = offs[:, None] + jnp.arange(W)[None, :]
            idx = jnp.where(jnp.arange(W)[None, :] < cs[:, None], idx,
                            rounds * W)
            buf = jnp.full((rounds * W,), -1, jnp.int32)
            buf = buf.at[idx.reshape(-1)].set(em.reshape(-1), mode="drop")
            return buf, cs

        if draft == "ngram":
            @functools.partial(jax.jit, donate_argnums=(1, 4))
            def loop(params, table, win, cur, kv, n_past):
                def body(carry, _):
                    table, win, cur, kv, n_past = carry

                    def dstep(w, _):
                        t = jnp.maximum(table[_hash(w)], 0)
                        return jnp.concatenate([w[1:], t[None]]), t

                    _, proposal = jax.lax.scan(dstep, win, None, length=W - 1)
                    preds, n_acc, kv = _verify(params, cur, proposal, kv,
                                               n_past)
                    c = n_acc + 1

                    def ustep(state, j):
                        table, w = state
                        tok = preds[j]
                        valid = j < c
                        h = _hash(w)
                        table = table.at[h].set(
                            jnp.where(valid, tok, table[h]))
                        w = jnp.where(valid,
                                      jnp.concatenate([w[1:], tok[None]]), w)
                        return (table, w), None

                    (table, win), _ = jax.lax.scan(ustep, (table, win),
                                                   jnp.arange(W))
                    cur = preds[n_acc]
                    return (table, win, cur, kv, n_past + c), (preds, c)

                (table, win, cur, kv, n_past), (em, cs) = jax.lax.scan(
                    body, (table, win, cur, kv, n_past), None, length=rounds)
                buf, cs = _compact(em, cs)
                return buf, cs, table, win, cur, kv, n_past
        elif draft == "replay":
            @functools.partial(jax.jit, donate_argnums=(4,))
            def loop(params, replay, pos, cur, kv, n_past):
                def body(carry, _):
                    pos, cur, kv, n_past = carry
                    proposal = jax.lax.dynamic_slice(replay, (pos,), (W - 1,))
                    preds, n_acc, kv = _verify(params, cur, proposal, kv,
                                               n_past)
                    c = n_acc + 1
                    cur = preds[n_acc]
                    return (pos + c, cur, kv, n_past + c), (preds, c)

                (pos, cur, kv, n_past), (em, cs) = jax.lax.scan(
                    body, (pos, cur, kv, n_past), None, length=rounds)
                buf, cs = _compact(em, cs)
                return buf, cs, pos, cur, kv, n_past
        else:
            raise ValueError(f"unknown device draft kind {draft!r}")

        self._step_fns[key] = loop
        return loop

    def eval_probe(self, tokens, positions, block_mask, kv, n_past: int):
        """Tree/lookahead probe: evaluate a block whose tokens sit at
        explicit (possibly non-contiguous) ``positions`` with an in-block
        visibility ``block_mask`` (T, T) — the analogue of a multi-seq-id
        llama_batch (examples/lookahead/lookahead.cpp:182-259). Returns all
        T logit rows. The cache is NOT advanced: jax arrays are immutable,
        so the caller's ``kv`` stays the committed state (free rollback)."""
        self._no_pp("eval_probe (lookahead/tree decoding)")
        fwd = FORWARDS[self.cfg.arch]
        if fwd is not llama_mod.forward:
            raise NotImplementedError(
                f"eval_probe: arch {self.cfg.arch} uses a custom graph "
                "without block-mask support")
        cfg, interp = self.cfg, self.interpret
        t = len(tokens)
        key = ("probe", t)
        if key not in self._step_fns:
            @jax.jit
            def step(params, toks, pos, mask, kv, n_past):
                logits, _ = fwd(params, cfg, toks, kv, n_past,
                                interpret=interp, positions=pos,
                                block_mask=mask)
                return logits
            self._step_fns[key] = step
        step = self._step_fns[key]
        logits = step(self.params,
                      jnp.asarray(np.asarray(tokens, np.int32)[None]),
                      jnp.asarray(np.asarray(positions, np.int32)[None]),
                      jnp.asarray(np.asarray(block_mask, bool)),
                      kv, jnp.int32(n_past))
        return np.asarray(logits[0])

    def generate(self, prompt: str | list[int], max_new_tokens: int = 32,
                 sampler: SamplerParams | None = None, seed: int = 0,
                 capacity: int = 512, stop_at_eos: bool = True):
        """Greedy/sampled generation. Returns (prompt_ids, generated_ids)."""
        sampler = sampler or SamplerParams(temp=0.0)
        if isinstance(prompt, str):
            ids = self.tokenizer.encode(prompt)
        else:
            ids = list(prompt)
        kv = self.new_cache(1, capacity)
        logits, kv, n_past = self.eval_tokens(ids, kv, 0)
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(max_new_tokens):
            tok = sample_token(logits[-1], sampler, rng, history=ids + out)
            out.append(int(tok))
            if stop_at_eos and tok == self.tokenizer.eos_id:
                break
            logits, kv, n_past = self.eval_tokens([int(tok)], kv, n_past)
        return ids, out

    def _embed_step(self, chunk: int):
        key = ("embed", chunk)
        if key not in self._step_fns:
            fwd = FORWARDS[self.cfg.arch]
            cfg, interp = self.cfg, self.interpret

            @jax.jit
            def step(params, tokens, kv, n_past, n_valid):
                return fwd(params, cfg, tokens, kv, n_past,
                           interpret=interp, return_hidden=True,
                           n_valid=n_valid)

            self._step_fns[key] = step
        return self._step_fns[key]

    def embed(self, ids: list[int], pooling: str = "mean",
              normalize: bool = True) -> np.ndarray:
        """Embedding extraction with pooling (llama_get_embeddings +
        llama_pooling_type NONE/MEAN/CLS/LAST; examples/embedding).

        Returns (E,) for pooled modes, (T, E) for pooling='none'."""
        self._no_pp("embedding extraction")
        n = len(ids)
        b = _bucket(n) if n <= PREFILL_BUCKETS[-1] else n
        kv = self.new_cache(1, max(b + 8, 64))
        padded = np.zeros((1, b), np.int32)
        padded[0, :n] = ids
        hidden, _ = self._embed_step(b)(self.params, jnp.asarray(padded), kv,
                                        jnp.int32(0), jnp.int32(n))
        h = np.asarray(hidden[0, :n], np.float32)   # (T, E)
        if pooling == "none":
            return h
        if pooling == "cls":
            e = h[0]
        elif pooling == "last":
            e = h[-1]
        else:   # mean
            e = h.mean(axis=0)
        if normalize:
            e = e / (np.linalg.norm(e) + 1e-12)
        return e

    def _decode_loop(self, n_steps: int):
        """Jitted on-device greedy decode loop: n_steps forward+argmax steps
        inside ONE executable (lax.scan), so token generation never pays a
        host round-trip per token — the TPU-native answer to the reference's
        tight llama_decode loop."""
        if self.pp_runner is not None:
            raise NotImplementedError(
                "-sm layer decodes via eval_tokens/generate (per-stage "
                "devices cannot share one on-device scan); use generate()")
        key = ("loop", n_steps)
        if key not in self._step_fns:
            fwd = FORWARDS[self.cfg.arch]
            cfg, interp = self.cfg, self.interpret

            @functools.partial(jax.jit, donate_argnums=(2,))
            def loop(params, tok0, kv, n_past0):
                def body(carry, _):
                    tok, kv, n_past = carry
                    logits, kv = fwd(params, cfg, tok, kv, n_past,
                                     interpret=interp, logits_last_only=True)
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                    return (nxt[:, None], kv, n_past + 1), nxt
                (_, kv, n_past), toks = jax.lax.scan(
                    body, (tok0, kv, n_past0), None, length=n_steps)
                return toks.T, kv, n_past       # (B, n_steps)

            self._step_fns[key] = loop
        return self._step_fns[key]

    def generate_greedy_on_device(self, prompt: str | list[int],
                                  max_new_tokens: int = 32,
                                  capacity: int = 512,
                                  stop_at_eos: bool = True):
        """Greedy generation with the whole decode loop on device.

        Returns (prompt_ids, generated_ids) like generate()."""
        if self.pp_runner is not None:   # no shared on-device scan across stages
            return self.generate(prompt, max_new_tokens, capacity=capacity,
                                 stop_at_eos=stop_at_eos)
        ids = self.tokenizer.encode(prompt) if isinstance(prompt, str) \
            else list(prompt)
        capacity = max(capacity, len(ids) + max_new_tokens + 8)
        kv = self.new_cache(1, capacity)
        logits, kv, n_past = self.eval_tokens(ids, kv, 0)
        first = int(np.argmax(logits[-1]))
        if max_new_tokens <= 1:
            return ids, [first]
        loop = self._decode_loop(max_new_tokens - 1)
        toks, kv, _ = loop(self.params, jnp.asarray([[first]], jnp.int32),
                           kv, jnp.int32(n_past))
        out = [first] + [int(t) for t in np.asarray(toks[0])]
        if stop_at_eos and self.tokenizer.eos_id in out:
            out = out[: out.index(self.tokenizer.eos_id) + 1]
        return ids, out

    def layer_hiddens(self, ids: list[int]) -> np.ndarray:
        """Per-layer hidden states (n_layer, T, E) f32 at each position —
        feeds the control-vector generator (cvector-generator analogue)."""
        self._no_pp("layer_hiddens (control-vector generator)")
        n = len(ids)
        b = _bucket(n) if n <= PREFILL_BUCKETS[-1] else n
        key = ("layers", b)
        if key not in self._step_fns:
            fwd = FORWARDS[self.cfg.arch]
            cfg, interp = self.cfg, self.interpret

            @jax.jit
            def step(params, tokens, kv, n_past):
                return fwd(params, cfg, tokens, kv, n_past,
                           interpret=interp, return_layer_hiddens=True)

            self._step_fns[key] = step
        kv = self.new_cache(1, max(b + 8, 64))
        padded = np.zeros((1, b), np.int32)
        padded[0, :n] = ids
        hs, _ = self._step_fns[key](self.params, jnp.asarray(padded), kv,
                                    jnp.int32(0))
        return np.asarray(hs[:, 0, :n], np.float32)

    def all_position_logits(self, ids: list[int], capacity: int = 512) -> np.ndarray:
        # the last prefill chunk is padded up to its shape bucket — the cache
        # must have room for the padded writes
        n = len(ids)
        rem = n % PREFILL_BUCKETS[-1] or PREFILL_BUCKETS[-1]
        need = (n - rem) + _bucket(rem)
        capacity = max(capacity, need)
        kv = self.new_cache(1, capacity)
        logits, _, _ = self.eval_tokens(ids, kv, 0, all_logits=True)
        return logits
