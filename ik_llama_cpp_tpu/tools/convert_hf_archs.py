"""Per-architecture HF -> GGUF converters (registry).

The structural analogue of the reference's per-model register classes
(convert_hf_to_gguf.py:47+ ``@Model.register``): each class declares the
GGUF arch name, metadata, and a tensor map; the generic driver in
``convert_registered`` handles vocab, dtype policy, and writing. Only the
tensor set our engine's loaders require is emitted (the per-arch
templates in tests/fixtures.py are the contract).

Key HF->ggml conventions handled here:
  * NORM-rope archs (llama/baichuan/olmo/command-r/mixtral...) need the
    q/k row permute from HF half-rotation to ggml pair-interleave order.
  * gpt2-family Conv1D weights are stored (in, out) and must be
    transposed to Linear order.
  * gptneox/bloom fuse qkv per-head [q k v] interleaved; ggml wants
    [Q;K;V] planar.
  * per-expert HF tensors stack into the 3-D ffn_*_exps tensors.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

CONVERTERS: dict[str, type] = {}


def register(*hf_names):
    def deco(cls):
        for n in hf_names:
            CONVERTERS[n] = cls
        return cls
    return deco


def permute_rotary(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF half-rotation -> ggml NORM pair rotation (reference permute)."""
    return (w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def deinterleave_qkv(w: np.ndarray, n_head: int, head_dim: int) -> np.ndarray:
    """(n_head*(3*d), ...) per-head [q k v] -> planar [Q; K; V]."""
    rest = w.shape[1:]
    w = w.reshape(n_head, 3, head_dim, *rest)
    w = np.swapaxes(w, 0, 1)
    return w.reshape(3 * n_head * head_dim, *rest)


class ArchConverter:
    arch: str = ""
    eps = "rms"               # 'rms' | 'layer' epsilon key
    permute_qk = False        # NORM-rope q/k permute
    norm_plus_one = False     # gemma-style (w - 1) storage
    strip_prefixes: tuple = ()
    # (hf_template, gguf_template) rows; '{i}' expands over layers
    MAP: list = []

    def __init__(self, cfg: dict, tensors: dict):
        self.cfg = cfg
        self.tensors = tensors
        for p in self.strip_prefixes:
            self.tensors = {k.removeprefix(p): v
                            for k, v in self.tensors.items()}
        self.n_layer = self.key("num_hidden_layers", "n_layer", "n_layers")
        self.n_embd = self.key("hidden_size", "n_embd", "d_model")
        self.n_head = self.key("num_attention_heads", "n_head", "n_heads")
        self.n_head_kv = self.key("num_key_value_heads", default=self.n_head)
        self.head_dim = self.cfg.get("head_dim") or self.n_embd // self.n_head
        self.n_ff = self.key("intermediate_size", "n_inner", "ffn_hidden_size",
                             default=4 * self.n_embd)
        self.n_ctx = self.key("max_position_embeddings", "n_positions",
                              "max_seq_len", default=4096)

    def key(self, *names, default=None):
        for n in names:
            if self.cfg.get(n) is not None:
                return self.cfg[n]
        return default

    # ------------------------------------------------------------ metadata
    def rope_dim(self) -> int:
        return self.head_dim

    def metadata(self, w):
        a = self.arch
        w.add(f"{a}.block_count", self.n_layer)
        w.add(f"{a}.context_length", self.n_ctx)
        w.add(f"{a}.embedding_length", self.n_embd)
        w.add(f"{a}.feed_forward_length", self.n_ff)
        w.add(f"{a}.attention.head_count", self.n_head)
        w.add(f"{a}.attention.head_count_kv", self.n_head_kv)
        if self.eps == "rms":
            w.add(f"{a}.attention.layer_norm_rms_epsilon",
                  self.key("rms_norm_eps", default=1e-5))
        else:
            w.add(f"{a}.attention.layer_norm_epsilon",
                  self.key("layer_norm_epsilon", "layer_norm_eps",
                           "norm_epsilon", default=1e-5))
        w.add(f"{a}.rope.freq_base", float(self.key("rope_theta",
                                                    default=10000.0)))
        w.add(f"{a}.rope.dimension_count", int(self.rope_dim()))
        w.add(f"{a}.vocab_size", self.cfg["vocab_size"])
        if self.head_dim != self.n_embd // self.n_head:
            w.add(f"{a}.attention.key_length", self.head_dim)
            w.add(f"{a}.attention.value_length", self.head_dim)
        self.extra_metadata(w)

    def extra_metadata(self, w):
        pass

    # ------------------------------------------------------------- tensors
    def fix(self, hf_name: str, arr: np.ndarray) -> np.ndarray:
        """Per-tensor hook (transpose, de-interleave, permute...)."""
        if self.permute_qk:
            if hf_name.endswith(("q_proj.weight", "q_proj.bias")):
                return permute_rotary(arr, self.n_head)
            if hf_name.endswith(("k_proj.weight", "k_proj.bias")):
                return permute_rotary(arr, self.n_head_kv)
        return arr

    def rows(self):
        """Yield (gguf_name, array) for every mapped tensor."""
        for hf_tpl, gg_tpl in self.MAP:
            if "{i}" in hf_tpl:
                for i in range(self.n_layer):
                    hf = hf_tpl.format(i=i)
                    if hf in self.tensors:
                        arr = self.fix(hf, np.asarray(self.tensors[hf],
                                                      np.float32))
                        if self.norm_plus_one and "norm" in gg_tpl:
                            arr = arr + 1.0
                        yield gg_tpl.format(i=i), arr
            elif hf_tpl in self.tensors:
                arr = self.fix(hf_tpl, np.asarray(self.tensors[hf_tpl],
                                                  np.float32))
                if self.norm_plus_one and "norm" in gg_tpl:
                    arr = arr + 1.0
                yield gg_tpl, arr
        yield from self.extra_rows()

    def extra_rows(self):
        return ()

    def fuse_qkv(self, i: int, base="model.layers.{i}.self_attn",
                 names=("q_proj", "k_proj", "v_proj")):
        """Concat separate q/k/v into the planar fused [Q;K;V] tensors."""
        b = base.format(i=i)
        out = []
        for suffix in ("weight", "bias"):
            parts = [self.tensors.get(f"{b}.{n}.{suffix}") for n in names]
            if all(p is not None for p in parts):
                out.append((suffix,
                            np.concatenate([np.asarray(p, np.float32)
                                            for p in parts], axis=0)))
        return out

    def stack_experts(self, i: int, n_expert: int,
                      base="model.layers.{i}.mlp.experts",
                      projs=(("gate_proj", "ffn_gate_exps"),
                             ("up_proj", "ffn_up_exps"),
                             ("down_proj", "ffn_down_exps"))):
        b = base.format(i=i)
        if f"{b}.0.{projs[0][0]}.weight" not in self.tensors:
            return
        for hf_p, gg in projs:
            stack = np.stack([np.asarray(
                self.tensors[f"{b}.{e}.{hf_p}.weight"], np.float32)
                for e in range(n_expert)])
            yield f"blk.{i}.{gg}.weight", stack


_LLAMA_STYLE = [
    ("model.embed_tokens.weight", "token_embd.weight"),
    ("model.norm.weight", "output_norm.weight"),
    ("lm_head.weight", "output.weight"),
    ("model.layers.{i}.input_layernorm.weight", "blk.{i}.attn_norm.weight"),
    ("model.layers.{i}.post_attention_layernorm.weight", "blk.{i}.ffn_norm.weight"),
    ("model.layers.{i}.self_attn.q_proj.weight", "blk.{i}.attn_q.weight"),
    ("model.layers.{i}.self_attn.k_proj.weight", "blk.{i}.attn_k.weight"),
    ("model.layers.{i}.self_attn.v_proj.weight", "blk.{i}.attn_v.weight"),
    ("model.layers.{i}.self_attn.o_proj.weight", "blk.{i}.attn_output.weight"),
    ("model.layers.{i}.self_attn.q_proj.bias", "blk.{i}.attn_q.bias"),
    ("model.layers.{i}.self_attn.k_proj.bias", "blk.{i}.attn_k.bias"),
    ("model.layers.{i}.self_attn.v_proj.bias", "blk.{i}.attn_v.bias"),
    ("model.layers.{i}.self_attn.q_norm.weight", "blk.{i}.attn_q_norm.weight"),
    ("model.layers.{i}.self_attn.k_norm.weight", "blk.{i}.attn_k_norm.weight"),
    ("model.layers.{i}.mlp.gate_proj.weight", "blk.{i}.ffn_gate.weight"),
    ("model.layers.{i}.mlp.up_proj.weight", "blk.{i}.ffn_up.weight"),
    ("model.layers.{i}.mlp.down_proj.weight", "blk.{i}.ffn_down.weight"),
]


# --------------------------------------------------------------- gpt2 family
@register("GPT2LMHeadModel")
class GPT2(ArchConverter):
    arch = "gpt2"
    eps = "layer"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("wte.weight", "token_embd.weight"),
        ("wpe.weight", "position_embd.weight"),
        ("ln_f.weight", "output_norm.weight"),
        ("ln_f.bias", "output_norm.bias"),
    ] + [(f"h.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("ln_1", "attn_norm"), ("attn.c_attn", "attn_qkv"),
                      ("attn.c_proj", "attn_output"), ("ln_2", "ffn_norm"),
                      ("mlp.c_fc", "ffn_up"), ("mlp.c_proj", "ffn_down"))
         for s in ("weight", "bias")]

    def fix(self, hf_name, arr):
        # Conv1D stores (in, out): transpose back to Linear order
        if arr.ndim == 2 and (".c_attn." in hf_name or ".c_proj." in hf_name
                              or ".c_fc." in hf_name):
            arr = arr.T
        return arr


@register("GPTBigCodeForCausalLM")
class StarCoder(GPT2):
    """starcoder: gpt2 structure, Linear (not Conv1D) weights, MQA."""
    arch = "starcoder"

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        if cfg.get("multi_query", True):
            self.n_head_kv = 1

    def fix(self, hf_name, arr):
        return arr    # GPTBigCode uses nn.Linear: already (out, in)


@register("GPTNeoXForCausalLM")
class GPTNeoX(ArchConverter):
    arch = "gptneox"
    eps = "layer"
    strip_prefixes = ("gpt_neox.",)
    MAP = [
        ("embed_in.weight", "token_embd.weight"),
        ("final_layer_norm.weight", "output_norm.weight"),
        ("final_layer_norm.bias", "output_norm.bias"),
        ("embed_out.weight", "output.weight"),
    ] + [(f"layers.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("attention.query_key_value", "attn_qkv"),
                      ("attention.dense", "attn_output"),
                      ("post_attention_layernorm", "ffn_norm"),
                      ("mlp.dense_h_to_4h", "ffn_up"),
                      ("mlp.dense_4h_to_h", "ffn_down"))
         for s in ("weight", "bias")]

    def rope_dim(self):
        return int(self.head_dim * self.cfg.get("rotary_pct", 0.25))

    def extra_metadata(self, w):
        w.add(f"{self.arch}.use_parallel_residual",
              bool(self.cfg.get("use_parallel_residual", True)))

    def fix(self, hf_name, arr):
        if "query_key_value" in hf_name:
            arr = deinterleave_qkv(arr, self.n_head, self.head_dim)
        return arr


@register("BloomForCausalLM")
class Bloom(ArchConverter):
    arch = "bloom"
    eps = "layer"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("word_embeddings.weight", "token_embd.weight"),
        ("word_embeddings_layernorm.weight", "token_embd_norm.weight"),
        ("word_embeddings_layernorm.bias", "token_embd_norm.bias"),
        ("ln_f.weight", "output_norm.weight"),
        ("ln_f.bias", "output_norm.bias"),
    ] + [(f"h.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("self_attention.query_key_value", "attn_qkv"),
                      ("self_attention.dense", "attn_output"),
                      ("post_attention_layernorm", "ffn_norm"),
                      ("mlp.dense_h_to_4h", "ffn_up"),
                      ("mlp.dense_4h_to_h", "ffn_down"))
         for s in ("weight", "bias")]

    def fix(self, hf_name, arr):
        if "query_key_value" in hf_name:
            arr = deinterleave_qkv(arr, self.n_head, self.head_dim)
        return arr


@register("MptForCausalLM", "MPTForCausalLM")
class MPT(ArchConverter):
    arch = "mpt"
    eps = "layer"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("wte.weight", "token_embd.weight"),
        ("norm_f.weight", "output_norm.weight"),
        ("norm_f.bias", "output_norm.bias"),
    ] + [(f"blocks.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("norm_1", "attn_norm"), ("attn.Wqkv", "attn_qkv"),
                      ("attn.out_proj", "attn_output"), ("norm_2", "ffn_norm"),
                      ("ffn.up_proj", "ffn_up"), ("ffn.down_proj", "ffn_down"))
         for s in ("weight", "bias")]

    def extra_metadata(self, w):
        ac = self.cfg.get("attn_config", {})
        w.add(f"{self.arch}.attention.max_alibi_bias",
              float(ac.get("alibi_bias_max", 8.0)))
        if ac.get("clip_qkv"):
            w.add(f"{self.arch}.attention.clamp_kqv", float(ac["clip_qkv"]))


@register("FalconForCausalLM", "RWForCausalLM")
class Falcon(ArchConverter):
    """falcon 7B form: shared-norm parallel residual, un-biased fused qkv,
    NEOX rope (multi_query or grouped kv layouts both normalized)."""
    arch = "falcon"
    eps = "layer"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("word_embeddings.weight", "token_embd.weight"),
        ("ln_f.weight", "output_norm.weight"),
        ("ln_f.bias", "output_norm.bias"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"h.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("self_attention.query_key_value", "attn_qkv"),
                      ("self_attention.dense", "attn_output"),
                      ("mlp.dense_h_to_4h", "ffn_up"),
                      ("mlp.dense_4h_to_h", "ffn_down"))
         for s in ("weight", "bias")]

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        if cfg.get("new_decoder_architecture"):
            self.n_head_kv = cfg.get("num_kv_heads", 8)
        elif cfg.get("multi_query", True):
            self.n_head_kv = 1

    def fix(self, hf_name, arr):
        if "query_key_value" in hf_name and self.cfg.get(
                "new_decoder_architecture"):
            # grouped layout: per kv-group [q*(h/kv) k v] -> planar [Q;K;V]
            d, kv = self.head_dim, self.n_head_kv
            qpk = self.n_head // kv
            a = arr.reshape(kv, qpk + 2, d, *arr.shape[1:])
            q = a[:, :qpk].reshape(kv * qpk * d, *arr.shape[1:])
            k = a[:, qpk].reshape(kv * d, *arr.shape[1:])
            v = a[:, qpk + 1].reshape(kv * d, *arr.shape[1:])
            arr = np.concatenate([q, k, v], axis=0)
        return arr


@register("PhiForCausalLM")
class Phi2(ArchConverter):
    """phi2: shared-norm parallel residual, partial NEOX rope, biased fused
    qkv, biased lm head."""
    arch = "phi2"
    eps = "layer"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.final_layernorm.weight", "output_norm.weight"),
        ("model.final_layernorm.bias", "output_norm.bias"),
        ("lm_head.weight", "output.weight"),
        ("lm_head.bias", "output.bias"),
    ] + [(f"model.layers.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("self_attn.dense", "attn_output"),
                      ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down"))
         for s in ("weight", "bias")]

    def rope_dim(self):
        return int(self.head_dim * self.cfg.get("partial_rotary_factor", 0.5))

    def extra_rows(self):
        for i in range(self.n_layer):
            for suffix, arr in self.fuse_qkv(i):
                yield f"blk.{i}.attn_qkv.{suffix}", arr


@register("StableLmForCausalLM", "StableLMEpochForCausalLM", "LlavaStableLMEpochForCausalLM")
class StableLM(ArchConverter):
    arch = "stablelm"
    eps = "layer"
    MAP = _LLAMA_STYLE + [
        ("model.norm.bias", "output_norm.bias"),
        ("model.layers.{i}.input_layernorm.bias", "blk.{i}.attn_norm.bias"),
        ("model.layers.{i}.post_attention_layernorm.bias",
         "blk.{i}.ffn_norm.bias"),
    ]

    def rope_dim(self):
        return int(self.head_dim * self.cfg.get("partial_rotary_factor", 0.25))


@register("GemmaForCausalLM")
class Gemma(ArchConverter):
    """gemma v1: llama-ish body, tied head, (w-1) norm storage, NEOX rope."""
    arch = "gemma"
    norm_plus_one = True
    MAP = _LLAMA_STYLE


@register("CohereForCausalLM")
class CommandR(ArchConverter):
    """command-r: shared-LayerNorm parallel residual, logit scale, tied
    head, NORM rope."""
    arch = "command-r"
    eps = "layer"
    permute_qk = True
    MAP = _LLAMA_STYLE

    def extra_metadata(self, w):
        w.add(f"{self.arch}.logit_scale",
              float(self.cfg.get("logit_scale", 0.0625)))


@register("OlmoForCausalLM", "OLMoForCausalLM")
class Olmo(ArchConverter):
    """olmo: non-parametric norms (no norm tensors), optional qkv clamp,
    NORM rope."""
    arch = "olmo"
    permute_qk = True
    MAP = [(h, g) for h, g in _LLAMA_STYLE if "norm" not in h]

    def extra_metadata(self, w):
        w.add(f"{self.arch}.attention.layer_norm_epsilon", 1e-5)
        if self.cfg.get("clip_qkv"):
            w.add(f"{self.arch}.attention.clamp_kqv",
                  float(self.cfg["clip_qkv"]))


@register("SmolLM3ForCausalLM")
class SmolLM3(ArchConverter):
    """smollm3: llama body with rope skipped every 4th layer (engine-side
    no_rope_step=4, llama-hparams.cpp:1496)."""
    arch = "smollm3"
    permute_qk = True
    MAP = _LLAMA_STYLE


# ------------------------------------------------------------------ MoE archs
@register("MixtralForCausalLM")
class Mixtral(ArchConverter):
    """mixtral: LLM_ARCH_LLAMA + stacked block_sparse_moe experts
    (w1=gate, w3=up, w2=down) — GGUF architecture string is 'llama',
    matching the reference converter (mixtral is not an arch name)."""
    arch = "llama"
    permute_qk = True
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.block_sparse_moe.gate.weight",
         "blk.{i}.ffn_gate_inp.weight"),
    ]

    def extra_metadata(self, w):
        w.add(f"{self.arch}.expert_count", self.cfg["num_local_experts"])
        w.add(f"{self.arch}.expert_used_count",
              self.cfg.get("num_experts_per_tok", 2))
        w.add(f"{self.arch}.expert_feed_forward_length", self.n_ff)

    def extra_rows(self):
        n_exp = self.cfg["num_local_experts"]
        for i in range(self.n_layer):
            yield from self.stack_experts(
                i, n_exp, base="model.layers.{i}.block_sparse_moe.experts",
                projs=(("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                       ("w2", "ffn_down_exps")))


@register("Qwen2MoeForCausalLM")
class Qwen2Moe(ArchConverter):
    """qwen2moe: biased attention, softmax router, gated shared expert."""
    arch = "qwen2moe"
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.mlp.gate.weight", "blk.{i}.ffn_gate_inp.weight"),
        ("model.layers.{i}.mlp.shared_expert.gate_proj.weight",
         "blk.{i}.ffn_gate_shexp.weight"),
        ("model.layers.{i}.mlp.shared_expert.up_proj.weight",
         "blk.{i}.ffn_up_shexp.weight"),
        ("model.layers.{i}.mlp.shared_expert.down_proj.weight",
         "blk.{i}.ffn_down_shexp.weight"),
        ("model.layers.{i}.mlp.shared_expert_gate.weight",
         "blk.{i}.ffn_gate_inp_shexp.weight"),
    ]

    def extra_metadata(self, w):
        w.add(f"{self.arch}.expert_count", self.cfg["num_experts"])
        w.add(f"{self.arch}.expert_used_count",
              self.cfg.get("num_experts_per_tok", 4))
        w.add(f"{self.arch}.expert_feed_forward_length",
              self.cfg["moe_intermediate_size"])
        w.add(f"{self.arch}.expert_shared_feed_forward_length",
              self.cfg.get("shared_expert_intermediate_size",
                           self.cfg["moe_intermediate_size"]))

    def extra_rows(self):
        for i in range(self.n_layer):
            yield from self.stack_experts(i, self.cfg["num_experts"])


@register("DbrxForCausalLM")
class DBRX(ArchConverter):
    """dbrx: fused Wqkv, norm_2 as attn-output norm, flat packed expert
    tensors (w1/v1/w2) reshaped to the stacked 3-D layout."""
    arch = "dbrx"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("wte.weight", "token_embd.weight"),
        ("norm_f.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"blocks.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("norm_attn_norm.norm_1", "attn_norm"),
                      ("norm_attn_norm.attn.Wqkv", "attn_qkv"),
                      ("norm_attn_norm.attn.out_proj", "attn_output"),
                      ("norm_attn_norm.norm_2", "attn_output_norm"),
                      ("ffn.router.layer", "ffn_gate_inp"))]

    def __init__(self, cfg, tensors):
        cfg = dict(cfg)
        cfg.setdefault("num_hidden_layers", cfg.get("n_layers"))
        cfg.setdefault("hidden_size", cfg.get("d_model"))
        cfg.setdefault("num_attention_heads", cfg.get("n_heads"))
        ac = cfg.get("attn_config", {})
        cfg.setdefault("num_key_value_heads", ac.get("kv_n_heads", 1))
        cfg.setdefault("rope_theta", ac.get("rope_theta", 10000.0))
        fc = cfg.get("ffn_config", {})
        cfg.setdefault("intermediate_size", fc.get("ffn_hidden_size"))
        super().__init__(cfg, tensors)

    def extra_metadata(self, w):
        fc = self.cfg.get("ffn_config", {})
        w.add(f"{self.arch}.expert_count", fc.get("moe_num_experts", 16))
        w.add(f"{self.arch}.expert_used_count", fc.get("moe_top_k", 4))
        w.add(f"{self.arch}.expert_feed_forward_length", self.n_ff)
        ac = self.cfg.get("attn_config", {})
        if ac.get("clip_qkv"):
            w.add(f"{self.arch}.attention.clamp_kqv", float(ac["clip_qkv"]))

    def extra_rows(self):
        fc = self.cfg.get("ffn_config", {})
        ne, ff, d = fc.get("moe_num_experts", 16), self.n_ff, self.n_embd
        for i in range(self.n_layer):
            b = f"blocks.{i}.ffn.experts.mlp"
            if f"{b}.w1" not in self.tensors:
                continue
            w1 = np.asarray(self.tensors[f"{b}.w1"], np.float32).reshape(ne, ff, d)
            v1 = np.asarray(self.tensors[f"{b}.v1"], np.float32).reshape(ne, ff, d)
            w2 = np.asarray(self.tensors[f"{b}.w2"], np.float32).reshape(ne, ff, d)
            yield f"blk.{i}.ffn_gate_exps.weight", w1
            yield f"blk.{i}.ffn_up_exps.weight", v1
            yield f"blk.{i}.ffn_down_exps.weight", w2.transpose(0, 2, 1)


@register("GraniteMoeForCausalLM")
class GraniteMoe(ArchConverter):
    """granitemoe: granite scalar multipliers + MoE with fused
    input_linear ([gate; up]) per expert."""
    arch = "granitemoe"
    permute_qk = True
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.block_sparse_moe.router.layer.weight",
         "blk.{i}.ffn_gate_inp.weight"),
    ]

    def extra_metadata(self, w):
        a = self.arch
        w.add(f"{a}.embedding_scale",
              float(self.cfg.get("embedding_multiplier", 1.0)))
        w.add(f"{a}.residual_scale",
              float(self.cfg.get("residual_multiplier", 1.0)))
        w.add(f"{a}.attention.scale",
              float(self.cfg.get("attention_multiplier", 0.0)))
        w.add(f"{a}.logit_scale", float(self.cfg.get("logits_scaling", 1.0)))
        w.add(f"{a}.expert_count", self.cfg["num_local_experts"])
        w.add(f"{a}.expert_used_count",
              self.cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.expert_feed_forward_length", self.n_ff)

    def extra_rows(self):
        ff = self.n_ff
        for i in range(self.n_layer):
            b = f"model.layers.{i}.block_sparse_moe"
            il = self.tensors.get(f"{b}.input_linear.weight")
            ol = self.tensors.get(f"{b}.output_linear.weight")
            if il is None:
                continue
            il = np.asarray(il, np.float32)       # (ne, 2*ff, d)
            yield f"blk.{i}.ffn_gate_exps.weight", il[:, :ff]
            yield f"blk.{i}.ffn_up_exps.weight", il[:, ff:]
            yield f"blk.{i}.ffn_down_exps.weight", np.asarray(ol, np.float32)


# LLM_EXPERT_GATING_FUNC_* (llama-hparams.h:12-16): 3 is softmax-weight,
# sqrt-softplus (DeepSeek-V4) is 4
_GATING = {"softmax": 1, "sigmoid": 2, "softmax_weight": 3,
           "sqrtsoftplus": 4, "sqrt_softplus": 4}


@register("DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM")
class DeepseekV2(ArchConverter):
    """deepseek2/3: MLA (q-lora + kv-lora) attention, leading dense layers,
    gated MoE with optional selection bias, shared experts
    (reference: convert_hf_to_gguf.py DeepseekV2Model)."""
    arch = "deepseek2"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"model.layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("post_attention_layernorm", "ffn_norm"),
                      ("self_attn.q_proj", "attn_q"),
                      ("self_attn.q_a_proj", "attn_q_a"),
                      ("self_attn.q_a_layernorm", "attn_q_a_norm"),
                      ("self_attn.q_b_proj", "attn_q_b"),
                      ("self_attn.kv_a_proj_with_mqa", "attn_kv_a_mqa"),
                      ("self_attn.kv_a_layernorm", "attn_kv_a_norm"),
                      ("self_attn.kv_b_proj", "attn_kv_b"),
                      ("self_attn.o_proj", "attn_output"),
                      ("mlp.gate_proj", "ffn_gate"),
                      ("mlp.up_proj", "ffn_up"),
                      ("mlp.down_proj", "ffn_down"),
                      ("mlp.gate", "ffn_gate_inp"),
                      ("mlp.shared_experts.gate_proj", "ffn_gate_shexp"),
                      ("mlp.shared_experts.up_proj", "ffn_up_shexp"),
                      ("mlp.shared_experts.down_proj", "ffn_down_shexp"))]

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        self.head_dim = (cfg["qk_nope_head_dim"] + cfg["qk_rope_head_dim"])

    def rope_dim(self):
        return self.cfg["qk_rope_head_dim"]

    def metadata(self, w):
        super().metadata(w)
        a = self.arch
        w.add(f"{a}.attention.key_length", self.head_dim)
        w.add(f"{a}.attention.value_length", self.cfg["v_head_dim"])

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        if cfg.get("q_lora_rank"):
            w.add(f"{a}.attention.q_lora_rank", cfg["q_lora_rank"])
        w.add(f"{a}.attention.kv_lora_rank", cfg["kv_lora_rank"])
        w.add(f"{a}.leading_dense_block_count",
              cfg.get("first_k_dense_replace", 0))
        w.add(f"{a}.expert_count", cfg["n_routed_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.expert_shared_count", cfg.get("n_shared_experts", 0))
        w.add(f"{a}.expert_feed_forward_length", cfg["moe_intermediate_size"])
        w.add(f"{a}.expert_weights_scale",
              float(cfg.get("routed_scaling_factor", 1.0)))
        w.add(f"{a}.expert_weights_norm", bool(cfg.get("norm_topk_prob",
                                                       False)))
        w.add(f"{a}.expert_gating_func",
              _GATING.get(cfg.get("scoring_func", "softmax"), 1))

    def extra_rows(self):
        for i in range(self.n_layer):
            yield from self.stack_experts(i, self.cfg["n_routed_experts"])
            b = self.tensors.get(
                f"model.layers.{i}.mlp.gate.e_score_correction_bias")
            if b is not None:
                yield f"blk.{i}.exp_probs_b.bias", np.asarray(b, np.float32)


@register("GlmForCausalLM", "Glm4ForCausalLM")
class Glm4(ArchConverter):
    """glm4: sandwich post-norms, fused-SWIGLU FFN (gate_up -> ffn_up),
    partial interleaved rope (HF GLM rope is already pair-interleaved, so
    no permute)."""
    arch = "glm4"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"model.layers.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("self_attn.q_proj", "attn_q"),
                      ("self_attn.k_proj", "attn_k"),
                      ("self_attn.v_proj", "attn_v"),
                      ("self_attn.o_proj", "attn_output"),
                      ("post_attention_layernorm", "ffn_norm"),
                      ("post_self_attn_layernorm", "post_attention_norm"),
                      ("post_mlp_layernorm", "post_ffw_norm"),
                      ("mlp.gate_up_proj", "ffn_up"),
                      ("mlp.down_proj", "ffn_down"))
         for s in ("weight", "bias")]

    def rope_dim(self):
        return int(self.head_dim * self.cfg.get("partial_rotary_factor", 0.5))


# ------------------------------------------------------- seed-oss / ernie
@register("SeedOssForCausalLM")
class SeedOss(ArchConverter):
    """seed_oss: llama body, biased attention, pre-FFN norm stored as
    post_attention_norm (reference SeedOssModel; build_seedoss.cpp:32)."""
    arch = "seed_oss"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
        ("model.layers.{i}.input_layernorm.weight", "blk.{i}.attn_norm.weight"),
        ("model.layers.{i}.post_attention_layernorm.weight",
         "blk.{i}.post_attention_norm.weight"),
        ("model.layers.{i}.self_attn.q_proj.weight", "blk.{i}.attn_q.weight"),
        ("model.layers.{i}.self_attn.k_proj.weight", "blk.{i}.attn_k.weight"),
        ("model.layers.{i}.self_attn.v_proj.weight", "blk.{i}.attn_v.weight"),
        ("model.layers.{i}.self_attn.o_proj.weight", "blk.{i}.attn_output.weight"),
        ("model.layers.{i}.self_attn.q_proj.bias", "blk.{i}.attn_q.bias"),
        ("model.layers.{i}.self_attn.k_proj.bias", "blk.{i}.attn_k.bias"),
        ("model.layers.{i}.self_attn.v_proj.bias", "blk.{i}.attn_v.bias"),
        ("model.layers.{i}.mlp.gate_proj.weight", "blk.{i}.ffn_gate.weight"),
        ("model.layers.{i}.mlp.up_proj.weight", "blk.{i}.ffn_up.weight"),
        ("model.layers.{i}.mlp.down_proj.weight", "blk.{i}.ffn_down.weight"),
    ]


@register("Ernie4_5ForCausalLM", "Ernie4_5_ForCausalLM")
class Ernie45(ArchConverter):
    """ernie4_5: llama body; checkpoints may carry an 'ernie.' prefix and a
    fused qkv_proj split by (H + 2*Hkv) * head_dim (reference
    Ernie4_5Model.modify_tensors)."""
    arch = "ernie4_5"
    strip_prefixes = ()
    MAP = _LLAMA_STYLE

    def __init__(self, cfg, tensors):
        tensors = {k.replace("ernie.", "model."): v for k, v in tensors.items()}
        super().__init__(cfg, tensors)
        # split fused qkv into q/k/v rows
        qd = self.n_head * self.head_dim
        kd = self.n_head_kv * self.head_dim
        for i in range(self.n_layer):
            b = f"model.layers.{i}.self_attn"
            fused = self.tensors.pop(f"{b}.qkv_proj.weight", None)
            if fused is not None:
                a = np.asarray(fused, np.float32)
                self.tensors[f"{b}.q_proj.weight"] = a[:qd]
                self.tensors[f"{b}.k_proj.weight"] = a[qd:qd + kd]
                self.tensors[f"{b}.v_proj.weight"] = a[qd + kd:qd + 2 * kd]


@register("Ernie4_5_MoeForCausalLM")
class Ernie45Moe(Ernie45):
    """ernie4_5-moe: interleaved MoE with shared experts and the
    moe_statics router-correction bias (reference Ernie4_5MoeModel)."""
    arch = "ernie4_5-moe"
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.mlp.gate.weight", "blk.{i}.ffn_gate_inp.weight"),
        ("model.layers.{i}.mlp.shared_experts.gate_proj.weight",
         "blk.{i}.ffn_gate_shexp.weight"),
        ("model.layers.{i}.mlp.shared_experts.up_proj.weight",
         "blk.{i}.ffn_up_shexp.weight"),
        ("model.layers.{i}.mlp.shared_experts.down_proj.weight",
         "blk.{i}.ffn_down_shexp.weight"),
    ]

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.expert_count", cfg["moe_num_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("moe_k", 2))
        w.add(f"{a}.interleave_moe_layer_step",
              cfg.get("moe_layer_interval", 1))
        w.add(f"{a}.leading_dense_block_count",
              cfg.get("moe_layer_start_index", 0))
        w.add(f"{a}.expert_feed_forward_length", cfg["moe_intermediate_size"])
        nshexp = cfg.get("moe_num_shared_experts", 0)
        if nshexp:
            w.add(f"{a}.expert_shared_count", nshexp)
            # spec quirk: shexp width = intermediate_size // num_kv_heads
            # (reference Ernie4_5MoeModel.set_gguf_parameters)
            w.add(f"{a}.expert_shared_feed_forward_length",
                  self.n_ff // self.n_head_kv)

    def extra_rows(self):
        for i in range(self.n_layer):
            yield from self.stack_experts(i, self.cfg["moe_num_experts"])
            b = self.tensors.get(
                f"model.layers.{i}.mlp.moe_statics.e_score_correction_bias")
            if b is not None:
                yield f"blk.{i}.exp_probs_b.bias", \
                    np.asarray(b, np.float32).reshape(-1)


@register("Dots1ForCausalLM")
class Dots1(ArchConverter):
    """dots1: qwen3-style attention (per-head qk norms) + deepseek-style
    MoE (dense lead, sigmoid gating, correction bias, shared experts)."""
    arch = "dots1"
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.mlp.gate.weight", "blk.{i}.ffn_gate_inp.weight"),
        ("model.layers.{i}.mlp.shared_experts.gate_proj.weight",
         "blk.{i}.ffn_gate_shexp.weight"),
        ("model.layers.{i}.mlp.shared_experts.up_proj.weight",
         "blk.{i}.ffn_up_shexp.weight"),
        ("model.layers.{i}.mlp.shared_experts.down_proj.weight",
         "blk.{i}.ffn_down_shexp.weight"),
    ]

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.expert_count", cfg["n_routed_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.leading_dense_block_count",
              cfg.get("first_k_dense_replace", 0))
        w.add(f"{a}.expert_feed_forward_length", cfg["moe_intermediate_size"])
        w.add(f"{a}.expert_shared_count", cfg.get("n_shared_experts", 0))
        w.add(f"{a}.expert_weights_scale",
              float(cfg.get("routed_scaling_factor", 1.0)))
        w.add(f"{a}.expert_weights_norm", bool(cfg.get("norm_topk_prob",
                                                       False)))
        w.add(f"{a}.expert_gating_func",
              _GATING.get(cfg.get("scoring_func", "softmax"), 1))

    def extra_rows(self):
        for i in range(self.n_layer):
            yield from self.stack_experts(i, self.cfg["n_routed_experts"])
            b = self.tensors.get(
                f"model.layers.{i}.mlp.gate.e_score_correction_bias")
            if b is not None:
                yield f"blk.{i}.exp_probs_b.bias", np.asarray(b, np.float32)


@register("Glm4MoeForCausalLM")
class Glm4Moe(Dots1):
    """glm4moe (GLM-4.5): dots1-shaped MoE body at half rotary dims; HF
    checkpoints may carry trailing NextN layers which are dropped here
    like the reference's nextn skip (Glm4MoeModel)."""
    arch = "glm4moe"

    def rope_dim(self):
        return int(self.head_dim * self.cfg.get("partial_rotary_factor", 0.5))


# ------------------------------------------------------ encoder families
@register("BertModel", "BertForMaskedLM", "CamembertModel",
          "XLMRobertaModel")
class Bert(ArchConverter):
    """bert encoder (+ roberta variants): absolute positions, token-type
    embeddings, post-LN blocks. Roberta-family position embeddings carry a
    padding offset (pad_token_id + 1) that is trimmed off, matching the
    reference's XLMRobertaModel._position_offset handling."""
    arch = "bert"
    eps = "layer"
    strip_prefixes = ("bert.", "roberta.",)
    MAP = [
        ("embeddings.word_embeddings.weight", "token_embd.weight"),
        ("embeddings.position_embeddings.weight", "position_embd.weight"),
        ("embeddings.token_type_embeddings.weight", "token_types.weight"),
        ("embeddings.LayerNorm.weight", "token_embd_norm.weight"),
        ("embeddings.LayerNorm.bias", "token_embd_norm.bias"),
    ] + [(f"encoder.layer.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("attention.self.query", "attn_q"),
                      ("attention.self.key", "attn_k"),
                      ("attention.self.value", "attn_v"),
                      ("attention.output.dense", "attn_output"),
                      ("attention.output.LayerNorm", "attn_output_norm"),
                      ("intermediate.dense", "ffn_up"),
                      ("output.dense", "ffn_down"),
                      ("output.LayerNorm", "layer_output_norm"))
         for s in ("weight", "bias")]

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        self.pos_offset = 0
        if cfg.get("model_type") in ("xlm-roberta", "camembert", "roberta"):
            self.pos_offset = int(cfg.get("pad_token_id", 1)) + 1
            self.n_ctx -= self.pos_offset

    def fix(self, hf_name, arr):
        if hf_name.endswith("position_embeddings.weight") and self.pos_offset:
            arr = arr[self.pos_offset:]
        return arr

    def extra_metadata(self, w):
        w.add(f"{self.arch}.attention.causal", False)
        w.add("tokenizer.ggml.token_type_count",
              int(self.cfg.get("type_vocab_size", 2)))


@register("T5ForConditionalGeneration", "T5WithLMHeadModel",
          "MT5ForConditionalGeneration", "UMT5ForConditionalGeneration",
          "T5EncoderModel")
class T5(ArchConverter):
    """t5/mt5/umt5 encoder-decoder: relative-bucket attention bias, enc/dec
    stacks, optionally gated FFN (flan). T5EncoderModel emits the encoder
    stack only (reference T5EncoderModel -> t5encoder)."""
    arch = "t5"

    def __init__(self, cfg, tensors):
        cfg = dict(cfg)
        cfg.setdefault("num_hidden_layers", cfg.get("num_layers"))
        cfg.setdefault("hidden_size", cfg.get("d_model"))
        cfg.setdefault("num_attention_heads", cfg.get("num_heads"))
        cfg.setdefault("intermediate_size", cfg.get("d_ff"))
        cfg.setdefault("head_dim", cfg.get("d_kv"))
        if cfg.get("architectures", [""])[0] == "T5EncoderModel":
            self.arch = "t5encoder"
        super().__init__(cfg, tensors)
        m = [("shared.weight", "token_embd.weight"),
             ("encoder.embed_tokens.weight", "token_embd.weight"),
             ("lm_head.weight", "output.weight"),
             ("encoder.final_layer_norm.weight", "enc.output_norm.weight"),
             ("decoder.final_layer_norm.weight", "dec.output_norm.weight")]
        for i in range(self.n_layer):
            for hf_stack, gg in (("encoder", "enc"), ("decoder", "dec")):
                b = f"{hf_stack}.block.{i}.layer"
                g = f"{gg}.blk.{i}"
                m += [(f"{b}.0.SelfAttention.q.weight", f"{g}.attn_q.weight"),
                      (f"{b}.0.SelfAttention.k.weight", f"{g}.attn_k.weight"),
                      (f"{b}.0.SelfAttention.v.weight", f"{g}.attn_v.weight"),
                      (f"{b}.0.SelfAttention.o.weight", f"{g}.attn_o.weight"),
                      (f"{b}.0.SelfAttention.relative_attention_bias.weight",
                       f"{g}.attn_rel_b.weight"),
                      (f"{b}.0.layer_norm.weight", f"{g}.attn_norm.weight")]
                ffl = 1 if hf_stack == "encoder" else 2
                if hf_stack == "decoder":
                    m += [(f"{b}.1.EncDecAttention.q.weight",
                           f"{g}.cross_attn_q.weight"),
                          (f"{b}.1.EncDecAttention.k.weight",
                           f"{g}.cross_attn_k.weight"),
                          (f"{b}.1.EncDecAttention.v.weight",
                           f"{g}.cross_attn_v.weight"),
                          (f"{b}.1.EncDecAttention.o.weight",
                           f"{g}.cross_attn_o.weight"),
                          (f"{b}.1.layer_norm.weight",
                           f"{g}.cross_attn_norm.weight")]
                m += [(f"{b}.{ffl}.DenseReluDense.wi.weight",
                       f"{g}.ffn_up.weight"),
                      (f"{b}.{ffl}.DenseReluDense.wi_0.weight",
                       f"{g}.ffn_gate.weight"),
                      (f"{b}.{ffl}.DenseReluDense.wi_1.weight",
                       f"{g}.ffn_up.weight"),
                      (f"{b}.{ffl}.DenseReluDense.wo.weight",
                       f"{g}.ffn_down.weight"),
                      (f"{b}.{ffl}.layer_norm.weight",
                       f"{g}.ffn_norm.weight")]
        self.MAP = m

    def metadata(self, w):
        a = self.arch
        w.add(f"{a}.block_count", self.n_layer)
        w.add(f"{a}.context_length", self.n_ctx)
        w.add(f"{a}.embedding_length", self.n_embd)
        w.add(f"{a}.feed_forward_length", self.n_ff)
        w.add(f"{a}.attention.head_count", self.n_head)
        w.add(f"{a}.attention.head_count_kv", self.n_head)
        w.add(f"{a}.attention.key_length", self.head_dim)
        w.add(f"{a}.attention.value_length", self.head_dim)
        w.add(f"{a}.attention.layer_norm_rms_epsilon",
              self.key("layer_norm_epsilon", default=1e-6))
        w.add(f"{a}.attention.relative_buckets_count",
              self.key("relative_attention_num_buckets", default=32))
        w.add(f"{a}.decoder_start_token_id",
              self.key("decoder_start_token_id", default=0))
        w.add(f"{a}.vocab_size", self.cfg["vocab_size"])


# ------------------------------------------------ classic CJK/community archs
@register("QWenLMHeadModel")
class Qwen1(ArchConverter):
    """qwen (v1): gpt2-shaped trunk with fused biased c_attn and a
    half-split swiglu FFN (mlp.w2 = gate, mlp.w1 = up); the HF
    intermediate_size already stores DOUBLE the real FFN width, matching
    the GGUF convention (create_qwen_tensors n_ff/2)."""
    arch = "qwen"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("wte.weight", "token_embd.weight"),
        ("ln_f.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"h.{{i}}.{h}", f"blk.{{i}}.{g}")
         for h, g in (("ln_1.weight", "attn_norm.weight"),
                      ("attn.c_attn.weight", "attn_qkv.weight"),
                      ("attn.c_attn.bias", "attn_qkv.bias"),
                      ("attn.c_proj.weight", "attn_output.weight"),
                      ("ln_2.weight", "ffn_norm.weight"),
                      ("mlp.w2.weight", "ffn_gate.weight"),
                      ("mlp.w1.weight", "ffn_up.weight"),
                      ("mlp.c_proj.weight", "ffn_down.weight"))]


@register("BaichuanForCausalLM", "BaiChuanForCausalLM")
class Baichuan(ArchConverter):
    """baichuan: llama body with the fused W_pack projection split into
    thirds, q/k NORM-permuted (reference BaichuanModel)."""
    arch = "baichuan"
    permute_qk = True
    MAP = _LLAMA_STYLE

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        e = self.n_embd
        for i in range(self.n_layer):
            b = f"model.layers.{i}.self_attn"
            pack = self.tensors.pop(f"{b}.W_pack.weight", None)
            if pack is not None:
                a = np.asarray(pack, np.float32)
                self.tensors[f"{b}.q_proj.weight"] = a[:e]
                self.tensors[f"{b}.k_proj.weight"] = a[e:2 * e]
                self.tensors[f"{b}.v_proj.weight"] = a[2 * e:]


@register("InternLM2ForCausalLM")
class InternLM2(ArchConverter):
    """internlm2: grouped fused wqkv ([q*rep, k, v] per kv group)
    de-interleaved + NORM permute; w1/w3/w2 FFN naming (reference
    InternLM2Model.modify_tensors)."""
    arch = "internlm2"
    MAP = [
        ("model.tok_embeddings.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("output.weight", "output.weight"),
    ] + [(f"model.layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("attention_norm", "attn_norm"),
                      ("ffn_norm", "ffn_norm"),
                      ("attention.wo", "attn_output"),
                      ("feed_forward.w1", "ffn_gate"),
                      ("feed_forward.w3", "ffn_up"),
                      ("feed_forward.w2", "ffn_down"))]

    def extra_rows(self):
        hd, h, hkv = self.head_dim, self.n_head, self.n_head_kv
        rep = h // hkv
        e = self.n_embd
        for i in range(self.n_layer):
            w = self.tensors.get(f"model.layers.{i}.attention.wqkv.weight")
            if w is None:
                continue
            a = np.asarray(w, np.float32).reshape(hkv, rep + 2, hd, e)
            q = a[:, :rep].reshape(-1, e)
            k = a[:, -2].reshape(-1, e)
            v = a[:, -1].reshape(-1, e)
            yield f"blk.{i}.attn_q.weight", permute_rotary(q, h)
            yield f"blk.{i}.attn_k.weight", permute_rotary(k, hkv)
            yield f"blk.{i}.attn_v.weight", v


@register("OrionForCausalLM")
class Orion(ArchConverter):
    """orion: llama-shaped body with biased LayerNorms."""
    arch = "orion"
    eps = "layer"
    MAP = _LLAMA_STYLE + [
        ("model.norm.bias", "output_norm.bias"),
        ("model.layers.{i}.input_layernorm.bias", "blk.{i}.attn_norm.bias"),
        ("model.layers.{i}.post_attention_layernorm.bias",
         "blk.{i}.ffn_norm.bias"),
    ]


@register("XverseForCausalLM")
class Xverse(ArchConverter):
    """xverse: llama-structured RMS variant, NORM rope."""
    arch = "xverse"
    permute_qk = True
    MAP = _LLAMA_STYLE


@register("MiniCPMForCausalLM")
class MiniCPM(ArchConverter):
    """minicpm: llama body (hardcoded graph scalars live in the engine,
    build_minicpm.cpp:14-16); tied head."""
    arch = "minicpm"
    permute_qk = True
    MAP = _LLAMA_STYLE


@register("GPTRefactForCausalLM")
class Refact(ArchConverter):
    """refact: MQA + ALiBi with fused kv and gate_up splits and the
    2/3*4E rounded FFN width (reference RefactModel)."""
    arch = "refact"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("wte.weight", "token_embd.weight"),
        ("ln_f.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"h.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("ln_1", "attn_norm"), ("ln_2", "ffn_norm"),
                      ("attn.q", "attn_q"), ("attn.c_proj", "attn_output"),
                      ("mlp.c_proj", "ffn_down"))]

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        self.n_head_kv = 1
        inner = 4 * self.n_embd
        hidden = int(2 * inner / 3)
        self.n_ff = 256 * ((hidden + 255) // 256)

    def extra_rows(self):
        hd = self.head_dim
        for i in range(self.n_layer):
            kv = self.tensors.get(f"h.{i}.attn.kv.weight")
            if kv is not None:
                a = np.asarray(kv, np.float32)
                yield f"blk.{i}.attn_k.weight", a[:hd]
                yield f"blk.{i}.attn_v.weight", a[hd:]
            gu = self.tensors.get(f"h.{i}.mlp.gate_up_proj.weight")
            if gu is not None:
                a = np.asarray(gu, np.float32)
                yield f"blk.{i}.ffn_gate.weight", a[:self.n_ff]
                yield f"blk.{i}.ffn_up.weight", a[self.n_ff:]


@register("CodeShellForCausalLM")
class CodeShell(GPT2):
    """codeshell: gpt2 trunk (Linear weights) with grouped-query attention
    and partial rope (reference CodeShellModel)."""
    arch = "codeshell"

    def __init__(self, cfg, tensors):
        cfg = dict(cfg)
        cfg.setdefault("num_hidden_layers", cfg.get("n_layer"))
        cfg.setdefault("hidden_size", cfg.get("n_embd"))
        cfg.setdefault("num_attention_heads", cfg.get("n_head"))
        cfg.setdefault("num_key_value_heads", cfg.get("num_query_groups", 1))
        cfg.setdefault("intermediate_size", 4 * cfg["hidden_size"])
        super().__init__(cfg, tensors)

    def fix(self, hf_name, arr):
        return arr    # nn.Linear weights

    def extra_rows(self):
        if ("lm_head.weight" not in self.tensors
                and "output.weight" not in self.tensors):
            # reference copies tok_embd into output for codeshell
            yield "output.weight", np.asarray(self.tensors["wte.weight"],
                                              np.float32)


@register("ChatGLMForConditionalGeneration", "ChatGLMModel")
class ChatGLM(ArchConverter):
    """chatglm (glm2/3 lineage): fused biased qkv, fused [gate|up] swiglu
    FFN kept whole (the engine splits halves in-graph), half rotary."""
    arch = "chatglm"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("embedding.word_embeddings.weight", "token_embd.weight"),
        ("encoder.final_layernorm.weight", "output_norm.weight"),
        ("output_layer.weight", "output.weight"),
    ] + [(f"encoder.layers.{{i}}.{h}", f"blk.{{i}}.{g}")
         for h, g in (("input_layernorm.weight", "attn_norm.weight"),
                      ("self_attention.query_key_value.weight",
                       "attn_qkv.weight"),
                      ("self_attention.query_key_value.bias",
                       "attn_qkv.bias"),
                      ("self_attention.dense.weight", "attn_output.weight"),
                      ("post_attention_layernorm.weight", "ffn_norm.weight"),
                      ("mlp.dense_h_to_4h.weight", "ffn_up.weight"),
                      ("mlp.dense_4h_to_h.weight", "ffn_down.weight"))]

    def __init__(self, cfg, tensors):
        cfg = dict(cfg)
        cfg.setdefault("num_hidden_layers", cfg.get("num_layers"))
        cfg.setdefault("num_key_value_heads",
                       cfg.get("multi_query_group_num",
                               cfg.get("num_attention_heads")))
        cfg.setdefault("intermediate_size", cfg.get("ffn_hidden_size"))
        cfg.setdefault("max_position_embeddings", cfg.get("seq_length", 4096))
        cfg.setdefault("rms_norm_eps", cfg.get("layernorm_epsilon", 1e-5))
        super().__init__(cfg, tensors)

    def rope_dim(self):
        return self.head_dim // 2


@register("MiniMaxM2ForCausalLM")
class MiniMaxM2(ArchConverter):
    """minimax-m2: mixtral-style block_sparse_moe (w1=gate, w2=down, w3=up)
    with full-width qk norms and a router correction bias."""
    arch = "minimax-m2"
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.block_sparse_moe.gate.weight",
         "blk.{i}.ffn_gate_inp.weight"),
    ]

    def rope_dim(self):
        return self.key("rotary_dim", default=self.head_dim)

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.expert_count", cfg["num_local_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.expert_feed_forward_length", self.n_ff)
        w.add(f"{a}.expert_weights_norm",
              bool(cfg.get("norm_topk_prob", False)))
        w.add(f"{a}.expert_gating_func",
              _GATING.get(cfg.get("scoring_func", "softmax"), 1))

    def extra_rows(self):
        ne = self.cfg["num_local_experts"]
        for i in range(self.n_layer):
            yield from self.stack_experts(
                i, ne, base="model.layers.{i}.block_sparse_moe.experts",
                projs=(("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                       ("w2", "ffn_down_exps")))
            b = self.tensors.get(
                f"model.layers.{i}.block_sparse_moe.gate"
                ".e_score_correction_bias")
            if b is not None:
                yield f"blk.{i}.exp_probs_b.bias", np.asarray(b, np.float32)


@register("MellumForCausalLM")
class Mellum(ArchConverter):
    """mellum: llama body with per-head qk norms, NEOX rope."""
    arch = "mellum"
    MAP = _LLAMA_STYLE


@register("Cohere2MoeForCausalLM")
class Cohere2Moe(ArchConverter):
    """cohere2_moe: command-a MoE — SWA layer pattern, sigmoid routing,
    dense prefix layers at their own FFN width, no ffn_norm (parallel
    residual trunk)."""
    arch = "cohere2_moe"
    eps = "layer"
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.mlp.gate.weight", "blk.{i}.ffn_gate_inp.weight"),
    ]

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.logit_scale", float(cfg.get("logit_scale", 1.0)))
        w.add(f"{a}.attention.sliding_window", cfg["sliding_window"])
        w.add(f"{a}.attention.sliding_window_pattern",
              np.asarray([1 if t == "sliding_attention" else 0
                          for t in cfg["layer_types"]], np.int32))
        w.add(f"{a}.expert_count", cfg["num_experts"])
        w.add(f"{a}.expert_used_count", cfg["num_experts_per_tok"])
        w.add(f"{a}.expert_feed_forward_length", self.n_ff)
        w.add(f"{a}.leading_dense_block_count",
              cfg.get("first_k_dense_replace", 0))
        w.add(f"{a}.expert_weights_norm",
              bool(cfg.get("norm_topk_prob", False)))
        w.add(f"{a}.expert_gating_func", 2)   # sigmoid only

    def extra_rows(self):
        for i in range(self.n_layer):
            yield from self.stack_experts(i, self.cfg["num_experts"])


@register("BailingMoeV2ForCausalLM")
class BailingMoeV2(ArchConverter):
    """bailingmoe2 (Ling/Ring 2.0): fused unbiased qkv + per-head qk
    norms, half rotary, grouped sigmoid routing with expert_bias, dense
    lead, shared experts (trailing HF NextN/MTP layers are dropped)."""
    arch = "bailingmoe2"
    MAP = [
        ("model.word_embeddings.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
        ("model.layers.{i}.input_layernorm.weight", "blk.{i}.attn_norm.weight"),
        ("model.layers.{i}.attention.query_key_value.weight",
         "blk.{i}.attn_qkv.weight"),
        ("model.layers.{i}.attention.dense.weight",
         "blk.{i}.attn_output.weight"),
        ("model.layers.{i}.attention.query_layernorm.weight",
         "blk.{i}.attn_q_norm.weight"),
        ("model.layers.{i}.attention.key_layernorm.weight",
         "blk.{i}.attn_k_norm.weight"),
        ("model.layers.{i}.post_attention_layernorm.weight",
         "blk.{i}.ffn_norm.weight"),
        ("model.layers.{i}.mlp.gate_proj.weight", "blk.{i}.ffn_gate.weight"),
        ("model.layers.{i}.mlp.up_proj.weight", "blk.{i}.ffn_up.weight"),
        ("model.layers.{i}.mlp.down_proj.weight", "blk.{i}.ffn_down.weight"),
        ("model.layers.{i}.mlp.gate.weight", "blk.{i}.ffn_gate_inp.weight"),
        ("model.layers.{i}.mlp.shared_experts.gate_proj.weight",
         "blk.{i}.ffn_gate_shexp.weight"),
        ("model.layers.{i}.mlp.shared_experts.up_proj.weight",
         "blk.{i}.ffn_up_shexp.weight"),
        ("model.layers.{i}.mlp.shared_experts.down_proj.weight",
         "blk.{i}.ffn_down_shexp.weight"),
    ]

    def rope_dim(self):
        return int(self.head_dim * self.cfg.get("partial_rotary_factor", 0.5))

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.expert_count", cfg["num_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.expert_feed_forward_length", cfg["moe_intermediate_size"])
        w.add(f"{a}.expert_shared_count", cfg.get("num_shared_experts", 0))
        w.add(f"{a}.expert_shared_feed_forward_length",
              cfg.get("moe_shared_expert_intermediate_size",
                      cfg["moe_intermediate_size"]
                      * cfg.get("num_shared_experts", 1)))
        w.add(f"{a}.leading_dense_block_count",
              cfg.get("first_k_dense_replace", 0))
        w.add(f"{a}.expert_weights_scale",
              float(cfg.get("routed_scaling_factor", 1.0)))
        w.add(f"{a}.expert_weights_norm", bool(cfg.get("norm_topk_prob",
                                                       False)))
        w.add(f"{a}.expert_gating_func",
              _GATING.get(cfg.get("score_function", "softmax"), 1))
        if cfg.get("num_nextn_predict_layers"):
            w.add(f"{a}.nextn_predict_layers",
                  cfg["num_nextn_predict_layers"])

    def extra_rows(self):
        for i in range(self.n_layer):
            yield from self.stack_experts(i, self.cfg["num_experts"])
            b = self.tensors.get(f"model.layers.{i}.mlp.gate.expert_bias")
            if b is not None:
                yield f"blk.{i}.exp_probs_b.bias", np.asarray(b, np.float32)


@register("ArcticForCausalLM")
class Arctic(ArchConverter):
    """arctic (snowflake): NORM-permuted llama attention, a dense residual
    MLP on EVERY layer (residual_mlp.w1/w3/w2 + residual_layernorm) plus
    full-width MoE experts behind post_attention_layernorm
    (reference ArcticModel + its FFN_NORM/FFN_NORM_EXP overrides)."""
    arch = "arctic"
    permute_qk = True
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"model.layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("residual_layernorm", "ffn_norm"),
                      ("post_attention_layernorm", "ffn_norm_exps"),
                      ("self_attn.q_proj", "attn_q"),
                      ("self_attn.k_proj", "attn_k"),
                      ("self_attn.v_proj", "attn_v"),
                      ("self_attn.o_proj", "attn_output"),
                      ("residual_mlp.w1", "ffn_gate"),
                      ("residual_mlp.w3", "ffn_up"),
                      ("residual_mlp.w2", "ffn_down"),
                      ("block_sparse_moe.gate", "ffn_gate_inp"))]

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.expert_count", cfg["num_local_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.expert_feed_forward_length", self.n_ff)

    def extra_rows(self):
        ne = self.cfg["num_local_experts"]
        for i in range(self.n_layer):
            yield from self.stack_experts(
                i, ne, base="model.layers.{i}.block_sparse_moe.experts",
                projs=(("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                       ("w2", "ffn_down_exps")))


@register("JAISLMHeadModel")
class Jais(ArchConverter):
    """jais: gpt2 trunk (Conv1D transposes) + ALiBi + swiglu, with the mup
    embedding/width scales folded into wte / lm_head at conversion
    (reference JaisModel)."""
    arch = "jais"
    eps = "layer"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("ln_f.weight", "output_norm.weight"),
        ("ln_f.bias", "output_norm.bias"),
    ] + [(f"h.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("ln_1", "attn_norm"), ("attn.c_attn", "attn_qkv"),
                      ("attn.c_proj", "attn_output"), ("ln_2", "ffn_norm"),
                      ("mlp.c_fc", "ffn_up"), ("mlp.c_fc2", "ffn_gate"),
                      ("mlp.c_proj", "ffn_down"))
         for s in ("weight", "bias")]

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        self.emb_scale = float(cfg.get("mup_embeddings_scale",
                                       cfg.get("embeddings_scale", 1.0)))
        if "mup_output_alpha" in cfg:
            self.width_scale = float(cfg["mup_output_alpha"]
                                     * cfg.get("mup_width_scale", 1.0))
        else:
            self.width_scale = float(cfg.get("width_scale", 1.0))

    def fix(self, hf_name, arr):
        if arr.ndim == 2 and hf_name.endswith((".c_attn.weight",
                                               ".c_proj.weight",
                                               ".c_fc.weight",
                                               ".c_fc2.weight")):
            arr = arr.T
        return arr

    def extra_metadata(self, w):
        import math
        slopes = self.tensors.get("transformer.relative_pe.slopes")
        if slopes is None:
            slopes = self.tensors.get("relative_pe.slopes")
        if slopes is not None:
            n2 = 2 ** int(math.floor(math.log2(self.n_head)))
            bias = -round(math.log2(float(np.asarray(slopes)[0])) * n2)
        else:
            bias = 8.0
        w.add(f"{self.arch}.attention.max_alibi_bias", float(bias))

    def extra_rows(self):
        wte = np.asarray(self.tensors["wte.weight"], np.float32)
        yield "token_embd.weight", wte * self.emb_scale
        head = self.tensors.get("lm_head.weight")
        head = wte if head is None else np.asarray(head, np.float32)
        yield "output.weight", head * self.width_scale


@register("NomicBertModel")
class NomicBert(ArchConverter):
    """nomic-bert: rope bert with fused Wqkv and silu-gated FFN
    (fc12 = gate, fc11 = up per the reference tensor table)."""
    arch = "nomic-bert"
    eps = "layer"
    MAP = [
        ("embeddings.word_embeddings.weight", "token_embd.weight"),
        ("embeddings.token_type_embeddings.weight", "token_types.weight"),
        ("emb_ln.weight", "token_embd_norm.weight"),
        ("emb_ln.bias", "token_embd_norm.bias"),
    ] + [(f"encoder.layers.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("attn.Wqkv", "attn_qkv"),
                      ("attn.out_proj", "attn_output"),
                      ("norm1", "attn_output_norm"),
                      ("mlp.fc12", "ffn_gate"),
                      ("mlp.fc11", "ffn_up"),
                      ("mlp.fc2", "ffn_down"),
                      ("norm2", "layer_output_norm"))
         for s in ("weight", "bias")]

    def __init__(self, cfg, tensors):
        cfg = dict(cfg)
        cfg.setdefault("num_hidden_layers", cfg.get("n_layer"))
        cfg.setdefault("hidden_size", cfg.get("n_embd"))
        cfg.setdefault("num_attention_heads", cfg.get("n_head"))
        cfg.setdefault("intermediate_size", cfg.get("n_inner"))
        cfg.setdefault("max_position_embeddings", cfg.get("n_positions", 2048))
        super().__init__(cfg, tensors)

    def extra_metadata(self, w):
        w.add(f"{self.arch}.attention.causal", False)
        w.add(f"{self.arch}.pooling_type", 1)
        w.add("tokenizer.ggml.token_type_count",
              int(self.cfg.get("type_vocab_size", 2)))


@register("JinaBertModel", "JinaBertForMaskedLM")
class JinaBertV2(ArchConverter):
    """jina-bert-v2: ALiBi bert with gated gelu FFN (gated_layers_w = gate,
    gated_layers_v = up) and optional q/k layernorms."""
    arch = "jina-bert-v2"
    eps = "layer"
    strip_prefixes = ("bert.",)
    MAP = [
        ("embeddings.word_embeddings.weight", "token_embd.weight"),
        ("embeddings.token_type_embeddings.weight", "token_types.weight"),
        ("embeddings.LayerNorm.weight", "token_embd_norm.weight"),
        ("embeddings.LayerNorm.bias", "token_embd_norm.bias"),
    ] + [(f"encoder.layer.{{i}}.{h}.{s}", f"blk.{{i}}.{g}.{s}")
         for h, g in (("attention.self.query", "attn_q"),
                      ("attention.self.key", "attn_k"),
                      ("attention.self.value", "attn_v"),
                      ("attention.output.dense", "attn_output"),
                      ("attention.output.LayerNorm", "attn_output_norm"),
                      ("attention.self.layer_norm_q", "attn_q_norm"),
                      ("attention.self.layer_norm_k", "attn_k_norm"),
                      ("layer_norm_1", "attn_norm_2"),
                      ("mlp.gated_layers_w", "ffn_gate"),
                      ("mlp.gated_layers_v", "ffn_up"),
                      ("mlp.wo", "ffn_down"),
                      ("mlp.down_layer", "ffn_down"),
                      ("mlp.layernorm", "layer_output_norm"),
                      ("layer_norm_2", "layer_output_norm"))
         for s in ("weight", "bias")]

    def extra_rows(self):
        # fused gated_layers = [gate; up] used by some jina checkpoints
        for i in range(self.n_layer):
            g = self.tensors.get(f"encoder.layer.{i}.mlp.gated_layers.weight")
            if g is not None:
                a = np.asarray(g, np.float32)
                yield f"blk.{i}.ffn_gate.weight", a[:self.n_ff]
                yield f"blk.{i}.ffn_up.weight", a[self.n_ff:]

    def extra_metadata(self, w):
        w.add(f"{self.arch}.attention.causal", False)
        w.add(f"{self.arch}.pooling_type", 1)
        w.add("tokenizer.ggml.token_type_count",
              int(self.cfg.get("type_vocab_size", 2)))


@register("BitnetForCausalLM", "BitNetForCausalLM")
class Bitnet(ArchConverter):
    """bitnet b1.58: projections ternarized at conversion (sign weights +
    per-tensor absmax .scale companions, reference BitnetModel
    weight_quant)."""
    arch = "bitnet-25"      # transformers BitNet = 2B4T lineage (relu^2)
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
        ("model.layers.{i}.input_layernorm.weight", "blk.{i}.attn_norm.weight"),
        ("model.layers.{i}.post_attention_layernorm.weight",
         "blk.{i}.ffn_norm.weight"),
        ("model.layers.{i}.self_attn.inner_attn_ln.weight",
         "blk.{i}.attn_sub_norm.weight"),
        ("model.layers.{i}.self_attn.attn_sub_norm.weight",
         "blk.{i}.attn_sub_norm.weight"),
        ("model.layers.{i}.mlp.ffn_layernorm.weight",
         "blk.{i}.ffn_sub_norm.weight"),
        ("model.layers.{i}.mlp.ffn_sub_norm.weight",
         "blk.{i}.ffn_sub_norm.weight"),
    ]
    _TERN = {"q_proj": "attn_q", "k_proj": "attn_k", "v_proj": "attn_v",
             "o_proj": "attn_output", "gate_proj": "ffn_gate",
             "up_proj": "ffn_up", "down_proj": "ffn_down"}

    def extra_rows(self):
        for i in range(self.n_layer):
            for hf, gg in self._TERN.items():
                for sub in ("self_attn", "mlp"):
                    w = self.tensors.get(
                        f"model.layers.{i}.{sub}.{hf}.weight")
                    if w is None:
                        continue
                    a = np.asarray(w, np.float32)
                    s = 1.0 / max(np.abs(a).mean(), 1e-5)
                    q = np.clip(np.rint(a * s), -1, 1) / s
                    scale = np.abs(q).max()
                    tern = np.sign(np.where(np.abs(q) < 1e-6, 0.0, q))
                    yield f"blk.{i}.{gg}.weight", tern.astype(np.float32)
                    yield f"blk.{i}.{gg}.scale", \
                        np.asarray([scale], np.float32)


@register("OpenELMForCausalLM")
class OpenELM(ArchConverter):
    """openelm: per-layer head/kv/FFN width arrays, fused qkv, q/k norms,
    proj_1 split into [gate; up] at each layer's own width (reference
    OpenELMModel)."""
    arch = "openelm"
    strip_prefixes = ("transformer.",)
    MAP = [
        ("token_embeddings.weight", "token_embd.weight"),
        ("norm.weight", "output_norm.weight"),
    ] + [(f"layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("attn_norm", "attn_norm"),
                      ("attn.qkv_proj", "attn_qkv"),
                      ("attn.out_proj", "attn_output"),
                      ("attn.q_norm", "attn_q_norm"),
                      ("attn.k_norm", "attn_k_norm"),
                      ("ffn_norm", "ffn_norm"),
                      ("ffn.proj_2", "ffn_down"))]

    @staticmethod
    def _make_divisible(v, divisor):
        new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    def __init__(self, cfg, tensors):
        cfg = dict(cfg)
        cfg.setdefault("num_hidden_layers", cfg.get("num_transformer_layers"))
        cfg.setdefault("hidden_size", cfg.get("model_dim"))
        cfg["num_attention_heads"] = cfg["num_query_heads"][0]
        cfg.setdefault("max_position_embeddings",
                       cfg.get("max_context_length", 2048))
        super().__init__(cfg, tensors)
        self.head_dim = cfg["head_dim"]
        self.ffn_dims = [self._make_divisible(m * self.n_embd,
                                              cfg["ffn_dim_divisor"])
                         for m in cfg["ffn_multipliers"]]

    def metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.block_count", self.n_layer)
        w.add(f"{a}.context_length", self.n_ctx)
        w.add(f"{a}.embedding_length", self.n_embd)
        w.add(f"{a}.feed_forward_length",
              np.asarray(self.ffn_dims, np.int32))
        w.add(f"{a}.attention.head_count",
              np.asarray(cfg["num_query_heads"], np.int32))
        w.add(f"{a}.attention.head_count_kv",
              np.asarray(cfg["num_kv_heads"], np.int32))
        w.add(f"{a}.rope.freq_base",
              float(cfg.get("rope_freq_constant", 10000.0)))
        w.add(f"{a}.attention.layer_norm_rms_epsilon", 1e-6)
        w.add(f"{a}.rope.dimension_count", self.head_dim)
        w.add(f"{a}.attention.key_length", self.head_dim)
        w.add(f"{a}.attention.value_length", self.head_dim)
        w.add(f"{a}.vocab_size", cfg["vocab_size"])

    def extra_rows(self):
        for i in range(self.n_layer):
            g = self.tensors.get(f"layers.{i}.ffn.proj_1.weight")
            if g is not None:
                a = np.asarray(g, np.float32)
                ff = self.ffn_dims[i]
                yield f"blk.{i}.ffn_gate.weight", a[:ff]
                yield f"blk.{i}.ffn_up.weight", a[ff:]


@register("DeciLMForCausalLM")
class DeciLM(ArchConverter):
    """deci / nemotron-51B: per-layer variable GQA from block_configs
    (n_heads_in_group / replace_with_linear / ffn_mult), NORM rope
    (reference DeciModel)."""
    arch = "deci"
    permute_qk = True
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.self_attn.linear_attn.weight",
         "blk.{i}.attn_output.weight"),
    ]

    @staticmethod
    def _ffn_size(mult, n_embd):
        x = int(2 * mult * n_embd / 3)
        return ((x + 255) // 256) * 256

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        bcs = cfg.get("block_configs")
        self.kv_arr, self.head_arr, self.ffn_arr = [], [], []
        for il in range(self.n_layer):
            bc = bcs[il] if bcs else None
            at = (bc or {}).get("attention", {})
            fc = (bc or {}).get("ffn", {})
            grp = at.get("n_heads_in_group") if bc else \
                self.n_head // self.n_head_kv
            if bc and grp is None:
                self.kv_arr.append(0)
                self.head_arr.append(self.n_head
                                     if at.get("replace_with_linear") else 0)
            else:
                self.kv_arr.append(self.n_head // grp)
                self.head_arr.append(self.n_head)
            mult = fc.get("ffn_mult") if bc else None
            self.ffn_arr.append(self._ffn_size(mult, self.n_embd)
                                if mult else self.n_ff)

    def fix(self, hf_name, arr):
        # per-layer kv count for the k permute
        if hf_name.endswith("k_proj.weight"):
            il = int(hf_name.split(".")[2])
            return permute_rotary(arr, self.kv_arr[il] or 1)
        if hf_name.endswith("q_proj.weight"):
            return permute_rotary(arr, self.n_head)
        return arr

    def metadata(self, w):
        # per-layer arrays ride the STANDARD keys (the engine promotes
        # head_count/head_count_kv/feed_forward_length to arrays)
        a = self.arch
        w.add(f"{a}.block_count", self.n_layer)
        w.add(f"{a}.context_length", self.n_ctx)
        w.add(f"{a}.embedding_length", self.n_embd)
        w.add(f"{a}.feed_forward_length",
              np.asarray(self.ffn_arr, np.int32))
        w.add(f"{a}.attention.head_count",
              np.asarray(self.head_arr, np.int32))
        w.add(f"{a}.attention.head_count_kv",
              np.asarray(self.kv_arr, np.int32))
        w.add(f"{a}.attention.layer_norm_rms_epsilon",
              self.key("rms_norm_eps", default=1e-5))
        w.add(f"{a}.rope.freq_base", float(self.key("rope_theta",
                                                    default=10000.0)))
        w.add(f"{a}.rope.dimension_count", int(self.head_dim))
        w.add(f"{a}.vocab_size", self.cfg["vocab_size"])


@register("PlamoForCausalLM")
class Plamo(ArchConverter):
    """plamo: parallel attn+FFN trunk at model.layers.layers.* with the
    q / o head-interleave shuffles generalized from the reference's
    hardcoded 13B shapes (PlamoModel.shuffle_attn_*_weight)."""
    arch = "plamo"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"model.layers.layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("norm", "attn_norm"),
                      ("self_attn.q_proj", "attn_q"),
                      ("self_attn.k_proj", "attn_k"),
                      ("self_attn.v_proj", "attn_v"),
                      ("self_attn.o_proj", "attn_output"),
                      ("mlp.gate_proj", "ffn_gate"),
                      ("mlp.up_proj", "ffn_up"),
                      ("mlp.down_proj", "ffn_down"))]

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        # config's num_key_value_heads is unreliable in plamo-13b; the
        # reference hardcodes 5 kv heads (n_head=40). Generalize: trust the
        # config when it divides n_head, else fall back to n_head.
        if self.n_head % max(self.n_head_kv, 1) or self.n_head_kv == 0:
            self.n_head_kv = self.n_head

    def fix(self, hf_name, arr):
        kv, hd = self.n_head_kv, self.head_dim
        rep = self.n_head // kv
        if hf_name.endswith("q_proj.weight"):
            a = arr.reshape(rep, kv, hd, arr.shape[-1])
            return a.transpose(1, 0, 2, 3).reshape(arr.shape)
        if hf_name.endswith("o_proj.weight"):
            a = arr.reshape(arr.shape[0], rep, kv, hd)
            return a.transpose(0, 2, 1, 3).reshape(arr.shape)
        return arr


@register("GrokForCausalLM", "Grok1ForCausalLM")
class Grok(ArchConverter):
    """grok: sandwich-normed MoE (pre/post attn + pre/post moe norms),
    attention/router/final logit softcaps, embedding/output scales."""
    arch = "grok"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
    ] + [(f"model.layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("pre_attn_norm", "attn_norm"),
                      ("attn.q_proj", "attn_q"),
                      ("attn.k_proj", "attn_k"),
                      ("attn.v_proj", "attn_v"),
                      ("attn.o_proj", "attn_output"),
                      ("self_attn.q_proj", "attn_q"),
                      ("self_attn.k_proj", "attn_k"),
                      ("self_attn.v_proj", "attn_v"),
                      ("self_attn.o_proj", "attn_output"),
                      ("post_attn_norm", "attn_output_norm"),
                      ("pre_moe_norm", "ffn_norm"),
                      ("post_moe_norm", "layer_output_norm"),
                      ("block_sparse_moe.gate", "ffn_gate_inp"))]

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.expert_count", cfg["num_local_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.expert_feed_forward_length",
              cfg.get("moe_intermediate_size", self.n_ff))
        w.add(f"{a}.attn_logit_softcapping",
              float(cfg.get("attn_logit_softcapping", 30.0)))
        if cfg.get("embedding_multiplier_scale"):
            w.add(f"{a}.embedding_scale",
                  float(cfg["embedding_multiplier_scale"]))
        if cfg.get("output_multiplier_scale"):
            w.add(f"{a}.logit_scale", float(cfg["output_multiplier_scale"]))

    def extra_rows(self):
        ne = self.cfg["num_local_experts"]
        for i in range(self.n_layer):
            yield from self.stack_experts(
                i, ne, base="model.layers.{i}.block_sparse_moe.experts",
                projs=(("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                       ("w2", "ffn_down_exps")))


@register("OpenPanguV2ForCausalLM")
class OpenPanguV2(ArchConverter):
    """openPangu-2.0-Flash: MLA (with pre-split k_b/v_b), DSA/SWA hybrid
    schedule, sigmoid MoE with correction bias, mHC hyper-connections and
    MoME causal convs (reference OpenPanguV2Model; our engine fixture
    make_tiny_openpangu_gguf defines the GGUF schema)."""
    arch = "openpangu"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("lm_head.weight", "output.weight"),
        ("model.merge_mhc_module.phi", "merge_mhc_phi.weight"),
        ("model.merge_mhc_module.branch_alpha_pre", "merge_mhc_alpha"),
        ("model.merge_mhc_module.branch_beta_pre", "merge_mhc_beta"),
        ("model.merge_mhc_module.norm_gamma", "merge_mhc_gamma"),
    ] + [(f"model.layers.{{i}}.{h}", f"blk.{{i}}.{g}")
         for h, g in (
             ("input_layernorm.weight", "attn_norm.weight"),
             ("post_attention_layernorm.weight",
              "post_attention_norm.weight"),
             ("pre_mlp_layernorm.weight", "ffn_norm.weight"),
             ("post_mlp_layernorm.weight", "post_ffw_norm.weight"),
             ("block_post_layernorm.weight", "block_post_norm.weight"),
             ("self_attn.q_a_proj.weight", "attn_q_a.weight"),
             ("self_attn.q_a_layernorm.weight", "attn_q_a_norm.weight"),
             ("self_attn.q_b_proj.weight", "attn_q_b.weight"),
             ("self_attn.kv_a_proj_with_mqa.weight", "attn_kv_a_mqa.weight"),
             ("self_attn.kv_a_layernorm.weight", "attn_kv_a_norm.weight"),
             ("self_attn.o_proj.weight", "attn_output.weight"),
             ("self_attn.qa_conv.weight", "attn_qa_conv.weight"),
             ("self_attn.compresskv_conv.weight",
              "attn_compresskv_conv.weight"),
             ("self_attn.o_conv.weight", "attn_o_conv.weight"),
             ("self_attn.param_sink_compressed_kv", "attn_param_sink_kv"),
             ("self_attn.param_sink_k_pe", "attn_param_sink_k_pe"),
             ("self_attn.indexer.k_norm.weight", "attn_indexer_k_norm.weight"),
             ("self_attn.indexer.weights_proj.weight",
              "attn_indexer_weights_proj.weight"),
             ("self_attn.indexer.wk.weight", "attn_indexer_k.weight"),
             ("self_attn.indexer.wq_b.weight", "attn_indexer_q_b.weight"),
             ("mlp.gate_proj.weight", "ffn_gate.weight"),
             ("mlp.up_proj.weight", "ffn_up.weight"),
             ("mlp.down_proj.weight", "ffn_down.weight"),
             ("mlp.gate.weight", "ffn_gate_inp.weight"),
             ("mlp.shared_experts.gate_proj.weight", "ffn_gate_shexp.weight"),
             ("mlp.shared_experts.up_proj.weight", "ffn_up_shexp.weight"),
             ("mlp.shared_experts.down_proj.weight", "ffn_down_shexp.weight"),
             ("attn_mhc_module.phi", "attn_mhc_phi.weight"),
             ("attn_mhc_module.branch_alpha", "attn_mhc_alpha"),
             ("attn_mhc_module.branch_beta", "attn_mhc_beta"),
             ("attn_mhc_module.norm_gamma", "attn_mhc_gamma"),
             ("mlp_mhc_module.phi", "mlp_mhc_phi.weight"),
             ("mlp_mhc_module.branch_alpha", "mlp_mhc_alpha"),
             ("mlp_mhc_module.branch_beta", "mlp_mhc_beta"),
             ("mlp_mhc_module.norm_gamma", "mlp_mhc_gamma"))]

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        # NextN/MTP layers are REAL blocks in this layout
        self.n_layer += int(cfg.get("num_nextn_predict_layers", 0) or 0)
        self.head_dim = cfg["qk_nope_head_dim"] + cfg["qk_rope_head_dim"]

    def rope_dim(self):
        return self.cfg["qk_rope_head_dim"]

    def metadata(self, w):
        super().metadata(w)
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.attention.key_length", self.head_dim)
        w.add(f"{a}.attention.value_length", cfg["v_head_dim"])

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.attention.q_lora_rank", cfg["q_lora_rank"])
        w.add(f"{a}.attention.kv_lora_rank", cfg["kv_lora_rank"])
        w.add(f"{a}.leading_dense_block_count",
              cfg.get("first_k_dense_replace", 0))
        w.add(f"{a}.expert_count", cfg["n_routed_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.expert_shared_count", cfg.get("n_shared_experts", 0))
        w.add(f"{a}.expert_feed_forward_length", cfg["moe_intermediate_size"])
        w.add(f"{a}.expert_weights_scale",
              float(cfg.get("routed_scaling_factor", 1.0)))
        w.add(f"{a}.expert_weights_norm",
              bool(cfg.get("norm_topk_prob", False)))
        w.add(f"{a}.expert_gating_func", 2)
        if cfg.get("num_nextn_predict_layers"):
            w.add(f"{a}.nextn_predict_layers",
                  int(cfg["num_nextn_predict_layers"]))
        w.add(f"{a}.attention.indexer.head_count", cfg["index_n_heads"])
        w.add(f"{a}.attention.indexer.key_length", cfg["index_head_dim"])
        w.add(f"{a}.attention.indexer.top_k", cfg["index_topk"])
        w.add(f"{a}.mhc_num_stream", cfg["mhc_num_stream"])
        w.add(f"{a}.mhc_recur_norm", cfg["mhc_recur_norm"])
        w.add(f"{a}.param_sink_number", cfg["param_sink_number"])
        if cfg.get("sliding_window") is not None:
            w.add(f"{a}.attention.sliding_window", cfg["sliding_window"])
        if cfg.get("swa_layers") is not None:
            w.add(f"{a}.swa_layers",
                  np.asarray(cfg["swa_layers"], np.int32))
        if cfg.get("sliding_window_list") is not None:
            w.add(f"{a}.sliding_window_list",
                  np.asarray(cfg["sliding_window_list"], np.int32))

    def extra_rows(self):
        cfg = self.cfg
        h = self.n_head
        d_nope, d_v = cfg["qk_nope_head_dim"], cfg["v_head_dim"]
        for i in range(self.n_layer):
            kv_b = self.tensors.get(
                f"model.layers.{i}.self_attn.kv_b_proj.weight")
            if kv_b is not None:
                a = np.asarray(kv_b, np.float32)
                lora = a.shape[-1]
                kvb = a.reshape(h, d_nope + d_v, lora)
                k_b = kvb[:, :d_nope].transpose(0, 2, 1).reshape(
                    h * lora, d_nope)
                v_b = kvb[:, d_nope:].reshape(h * d_v, lora)
                yield f"blk.{i}.attn_k_b.weight", k_b
                yield f"blk.{i}.attn_v_b.weight", v_b
            b = self.tensors.get(
                f"model.layers.{i}.mlp.e_score_correction_bias")
            if b is None:
                b = self.tensors.get(
                    f"model.layers.{i}.mlp.e_score_correction.bias")
            if b is not None:
                yield f"blk.{i}.exp_probs_b.bias", \
                    np.asarray(b, np.float32).reshape(-1)
            yield from self.stack_experts(
                i, cfg["n_routed_experts"])


@register("LagunaForCausalLM")
class Laguna(ArchConverter):
    """laguna (poolside): step35-style body with SOFTPLUS attention gates
    (g_proj squeezed), per-layer head counts, split full/SWA rope params,
    sigmoid MoE with shared expert and correction bias (reference
    LagunaModel)."""
    arch = "laguna"
    MAP = _LLAMA_STYLE + [
        ("model.layers.{i}.self_attn.g_proj.weight", "blk.{i}.attn_gate.weight"),
        ("model.layers.{i}.mlp.gate.weight", "blk.{i}.ffn_gate_inp.weight"),
        ("model.layers.{i}.mlp.shared_experts.gate_proj.weight",
         "blk.{i}.ffn_gate_shexp.weight"),
        ("model.layers.{i}.mlp.shared_experts.up_proj.weight",
         "blk.{i}.ffn_up_shexp.weight"),
        ("model.layers.{i}.mlp.shared_experts.down_proj.weight",
         "blk.{i}.ffn_down_shexp.weight"),
        ("model.layers.{i}.mlp.shared_expert.gate_proj.weight",
         "blk.{i}.ffn_gate_shexp.weight"),
        ("model.layers.{i}.mlp.shared_expert.up_proj.weight",
         "blk.{i}.ffn_up_shexp.weight"),
        ("model.layers.{i}.mlp.shared_expert.down_proj.weight",
         "blk.{i}.ffn_down_shexp.weight"),
    ]

    def fix(self, hf_name, arr):
        if hf_name.endswith(".g_proj.weight"):
            return np.squeeze(arr)
        return arr

    def metadata(self, w):
        a, cfg = self.arch, self.cfg
        hd = self.head_dim
        rp = cfg.get("rope_parameters", {}) or {}
        full = rp.get("full_attention", rp)
        swa = rp.get("sliding_attention", {}) or {}
        prf = float(cfg.get("partial_rotary_factor", 1.0))
        prf_full = float(full.get("partial_rotary_factor", prf))
        prf_swa = float(swa.get("partial_rotary_factor", 1.0))
        heads = cfg.get("num_attention_heads_per_layer")             or [self.n_head] * self.n_layer
        kvs = cfg.get("num_key_value_heads_per_layer")             or [self.n_head_kv] * self.n_layer
        w.add(f"{a}.block_count", self.n_layer)
        w.add(f"{a}.context_length", self.n_ctx)
        w.add(f"{a}.embedding_length", self.n_embd)
        w.add(f"{a}.feed_forward_length", self.n_ff)
        w.add(f"{a}.attention.head_count", np.asarray(heads, np.int32)
              if len(set(heads)) > 1 else heads[0])
        w.add(f"{a}.attention.head_count_kv", np.asarray(kvs, np.int32)
              if len(set(kvs)) > 1 else kvs[0])
        w.add(f"{a}.attention.key_length", hd)
        w.add(f"{a}.attention.value_length", hd)
        w.add(f"{a}.attention.layer_norm_rms_epsilon",
              self.key("rms_norm_eps", default=1e-5))
        w.add(f"{a}.attention.sliding_window", cfg.get("sliding_window", 0))
        if cfg.get("layer_types"):
            w.add(f"{a}.attention.sliding_window_pattern",
                  np.asarray([1 if t == "sliding_attention" else 0
                              for t in cfg["layer_types"]], np.int32))
        w.add(f"{a}.rope.dimension_count", int(hd * prf_full))
        w.add(f"{a}.rope.dimension_count_swa", int(hd * prf_swa))
        w.add(f"{a}.rope.freq_base", float(full.get("rope_theta", 500000.0)))
        w.add(f"{a}.rope.freq_base_swa", float(swa.get("rope_theta",
                                                       10000.0)))
        w.add(f"{a}.expert_count", cfg["num_experts"])
        w.add(f"{a}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{a}.expert_feed_forward_length", cfg["moe_intermediate_size"])
        sh = cfg.get("shared_expert_intermediate_size")
        if sh:
            w.add(f"{a}.expert_shared_feed_forward_length", int(sh))
        if cfg.get("moe_routed_scaling_factor") is not None:
            w.add(f"{a}.expert_weights_scale",
                  float(cfg["moe_routed_scaling_factor"]))
        w.add(f"{a}.expert_weights_norm", True)
        w.add(f"{a}.expert_gating_func", 2)
        lead = 0
        for t in cfg.get("mlp_layer_types", []):
            if t != "dense":
                break
            lead += 1
        w.add(f"{a}.leading_dense_block_count", lead)
        w.add(f"{a}.vocab_size", cfg["vocab_size"])

    def extra_rows(self):
        for i in range(self.n_layer):
            for nm in ("e_score_correction_bias", "e_score_correction"):
                b = self.tensors.get(f"model.layers.{i}.mlp.experts.{nm}")
                if b is not None:
                    yield f"blk.{i}.exp_probs_b.bias", \
                        np.asarray(b, np.float32).reshape(-1)
                    break
            yield from self.stack_experts(i, self.cfg["num_experts"])


# ------------------------------------------------------------ dflash drafts
@register("DFlashDraftModel")
class DFlashDraft(ArchConverter):
    """DFlash block-diffusion draft head (reference DFlashDraftModel,
    convert_hf_to_gguf.py:2334): qwen3-style blocks + the fc/hidden_norm
    feature-fusion tensors and the dflash.* metadata block. Checkpoints may
    name tensors with or without the ``model.`` prefix; optional per-layer
    ``attention_sink_bias`` becomes attn_sinks."""
    arch = "dflash-draft"
    causal = False
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("lm_head.weight", "output.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("model.fc.weight", "dflash_fc.weight"),
        ("model.hidden_norm.weight", "dflash_hidden_norm.weight"),
    ] + [(f"model.layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("post_attention_layernorm", "post_attention_norm"),
                      ("self_attn.q_proj", "attn_q"),
                      ("self_attn.k_proj", "attn_k"),
                      ("self_attn.v_proj", "attn_v"),
                      ("self_attn.o_proj", "attn_output"),
                      ("self_attn.q_norm", "attn_q_norm"),
                      ("self_attn.k_norm", "attn_k_norm"),
                      ("mlp.gate_proj", "ffn_gate"),
                      ("mlp.up_proj", "ffn_up"),
                      ("mlp.down_proj", "ffn_down"))] + [
        ("model.layers.{i}.self_attn.attention_sink_bias",
         "blk.{i}.attn_sinks.weight"),
    ]

    def __init__(self, cfg, tensors):
        # the reference normalizes bare top-level names to model.* forms
        # (DFlashDraftModel.modify_tensors)
        tensors = {(k if k.startswith(("model.", "lm_head."))
                    else "model." + k): v for k, v in tensors.items()}
        super().__init__(cfg, tensors)
        dfc = cfg.get("dflash_config")
        self.dflash = dfc if isinstance(dfc, dict) else {}

    def dkey(self, name, default=None):
        if name in self.dflash:
            return self.dflash[name]
        if name in self.cfg:
            return self.cfg[name]
        if default is None:
            raise ValueError(f"dflash conversion requires {name} metadata")
        return default

    def rope_dim(self):
        return int(self.head_dim
                   * float(self.cfg.get("partial_rotary_factor", 1.0)))

    def metadata(self, w):
        super().metadata(w)
        a = self.arch
        # the draft graph always runs FA with explicit head sizes
        w.add(f"{a}.attention.key_length", self.head_dim)
        w.add(f"{a}.attention.value_length", self.head_dim)

    def extra_metadata(self, w):
        a = self.arch
        w.add(f"{a}.attention.causal", self.causal)
        tli = [int(v) for v in self.dkey("target_layer_ids")]
        w.add(f"{a}.dflash.block_size", int(self.dkey("block_size")))
        w.add(f"{a}.dflash.mask_token_id", int(self.dkey("mask_token_id")))
        w.add(f"{a}.dflash.target_layer_ids", np.asarray(tli, np.int32))
        nf = self.dflash.get("n_target_features",
                             self.cfg.get("n_target_features"))
        if nf is None:
            nf = int(self.n_embd) * len(tli)
        w.add(f"{a}.dflash.n_target_features", int(nf))
        rb = self.dflash.get("backbone_rotary_base")
        if rb is not None:
            w.add(f"{a}.dflash.backbone_rotary_base", float(rb))
        vs = self.dflash.get("attention_value_scale",
                             self.cfg.get("attention_value_scale"))
        if vs is not None:
            w.add(f"{a}.attention.value_scale", float(vs))
        sw = self.cfg.get("sliding_window",
                          self.dflash.get("swa_window_size"))
        use_swa = self.cfg.get("use_sliding_window",
                               self.dflash.get("use_swa"))
        if use_swa and sw:
            lt = self.cfg.get("layer_types")
            pattern = ([1 if str(x) == "sliding_attention" else 0
                        for x in lt] if lt else [1] * self.n_layer)
            w.add(f"{a}.attention.sliding_window", int(sw))
            w.add(f"{a}.attention.sliding_window_pattern",
                  np.asarray(pattern, np.int32))
        rs = self.cfg.get("rope_scaling")
        if isinstance(rs, dict) and rs.get("factor"):
            w.add(f"{a}.rope.scaling.type",
                  str(rs.get("rope_type", rs.get("type", "linear"))))
            w.add(f"{a}.rope.scaling.factor", float(rs["factor"]))


@register("DFlashLagunaForCausalLM")
class DFlashLaguna(DFlashDraft):
    """Laguna-style causal DFlash draft (DFlashLagunaForCausalLM,
    convert_hf_to_gguf.py:2626): packed qkv_proj split planar, per-head
    softplus attention gate (g_proj), per-capture aux hidden norms, and
    mandatory all-SWA layers."""
    causal = True

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        if self.dflash.get("causal") is not True:
            raise ValueError("DFlashLaguna requires dflash_config.causal")
        if not self.cfg.get("sliding_window"):
            raise ValueError("DFlashLaguna requires sliding_window")
        self.cfg = dict(self.cfg)
        self.cfg["use_sliding_window"] = True
        # split packed qkv into the planar q/k/v the base MAP expects
        qd = self.n_head * self.head_dim
        kvd = self.n_head_kv * self.head_dim
        for i in range(self.n_layer):
            b = f"model.layers.{i}.self_attn"
            packed = self.tensors.pop(f"{b}.qkv_proj.weight", None)
            if packed is not None:
                packed = np.asarray(packed, np.float32)
                self.tensors[f"{b}.q_proj.weight"] = packed[:qd]
                self.tensors[f"{b}.k_proj.weight"] = packed[qd:qd + kvd]
                self.tensors[f"{b}.v_proj.weight"] = packed[qd + kvd:]

    def extra_metadata(self, w):
        super().extra_metadata(w)
        w.add(f"{self.arch}.dflash.laguna", True)

    def extra_rows(self):
        for i in range(self.n_layer):
            g = self.tensors.get(f"model.layers.{i}.self_attn.g_proj.weight")
            if g is not None:
                g = np.asarray(g, np.float32)
                yield (f"blk.{i}.attn_gate.weight",
                       g.reshape(self.n_head, self.n_embd))
        j = 0
        while f"model.aux_hidden_norms.{j}.weight" in self.tensors:
            yield (f"dflash_aux_hidden_norm.{j}.weight",
                   np.asarray(
                       self.tensors[f"model.aux_hidden_norms.{j}.weight"],
                       np.float32))
            j += 1


# ------------------------------------------------------------ gemma4 family
@register("Gemma4ForConditionalGeneration")
class Gemma4(ArchConverter):
    """gemma4 (gemma-3n-style) text model (Gemma4Model,
    convert_hf_to_gguf.py:3869): per-layer input embeddings, dual SWA/full
    head geometry, optional MoE layers with fused gate|up experts + scales,
    layer output scalars, and a generated proportional-rope rope_freqs."""
    arch = "gemma4"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("model.embed_tokens_per_layer.weight", "per_layer_token_embd.weight"),
        ("model.per_layer_model_projection.weight",
         "per_layer_model_proj.weight"),
        ("model.per_layer_projection_norm.weight",
         "per_layer_proj_norm.weight"),
    ] + [(f"model.layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("self_attn.q_proj", "attn_q"),
                      ("self_attn.k_proj", "attn_k"),
                      ("self_attn.v_proj", "attn_v"),
                      ("self_attn.o_proj", "attn_output"),
                      ("self_attn.q_norm", "attn_q_norm"),
                      ("self_attn.k_norm", "attn_k_norm"),
                      ("post_attention_layernorm", "post_attention_norm"),
                      ("pre_feedforward_layernorm", "ffn_norm"),
                      ("pre_feedforward_layernorm_2", "pre_ffw_norm_2"),
                      ("post_feedforward_layernorm", "post_ffw_norm"),
                      ("post_feedforward_layernorm_1", "post_ffw_norm_1"),
                      ("post_feedforward_layernorm_2", "post_ffw_norm_2"),
                      ("layer_scalar", "layer_output_scale"),
                      ("per_layer_input_gate", "inp_gate"),
                      ("per_layer_projection", "proj"),
                      ("post_per_layer_input_norm", "post_norm"),
                      ("mlp.gate_proj", "ffn_gate"),
                      ("mlp.up_proj", "ffn_up"),
                      ("mlp.down_proj", "ffn_down"))]

    def __init__(self, cfg, tensors):
        text = cfg.get("text_config")
        if isinstance(text, dict):
            cfg = {**cfg, **text}
        # multimodal checkpoints prefix the text tower; lm_head is unused
        # (Gemma4Model.modify_tensors skips it)
        tensors = {k.replace("language_model.", ""): v
                   for k, v in tensors.items() if "language_model." in k
                   or "rope_freqs" in k or not cfg.get("text_config")}
        tensors.pop("lm_head.weight", None)
        # bare scalar params are stored without a .weight suffix
        for k in list(tensors):
            if k.endswith(("per_dim_scale", "layer_scalar")):
                tensors[k + ".weight"] = tensors.pop(k)
        super().__init__(cfg, tensors)
        self.swa_layers = [str(t) == "sliding_attention"
                           for t in self.cfg["layer_types"]]
        rp = self.cfg.get("rope_parameters", {})
        self.rope_full = rp.get("full_attention", {})
        self.rope_swa = rp.get("sliding_attention", {})
        self.head_dim_full = int(self.cfg["global_head_dim"])
        self.head_dim_swa = int(self.cfg["head_dim"])

    def metadata(self, w):
        a, cfg = self.arch, self.cfg
        w.add(f"{a}.block_count", self.n_layer)
        w.add(f"{a}.context_length", self.n_ctx)
        w.add(f"{a}.embedding_length", self.n_embd)
        n_shared = int(cfg.get("num_kv_shared_layers", 0))
        if cfg.get("use_double_wide_mlp"):
            first_shared = self.n_layer - n_shared
            w.add(f"{a}.feed_forward_length",
                  np.asarray([self.n_ff if il < first_shared
                              else 2 * self.n_ff
                              for il in range(self.n_layer)], np.int32))
        else:
            w.add(f"{a}.feed_forward_length", self.n_ff)
        w.add(f"{a}.attention.head_count", self.n_head)
        n_kv_full = cfg.get("num_global_key_value_heads")
        if n_kv_full is not None and int(n_kv_full) != int(self.n_head_kv):
            w.add(f"{a}.attention.head_count_kv",
                  np.asarray([self.n_head_kv if s else int(n_kv_full)
                              for s in self.swa_layers], np.int32))
        else:
            w.add(f"{a}.attention.head_count_kv", self.n_head_kv)
        w.add(f"{a}.attention.layer_norm_rms_epsilon",
              self.key("rms_norm_eps", default=1e-6))
        w.add(f"{a}.attention.sliding_window", int(cfg["sliding_window"]))
        w.add(f"{a}.attention.sliding_window_pattern",
              np.asarray([1 if s else 0 for s in self.swa_layers], np.int32))
        w.add(f"{a}.attention.shared_kv_layers", n_shared)
        w.add(f"{a}.attention.key_length", self.head_dim_full)
        w.add(f"{a}.attention.value_length", self.head_dim_full)
        w.add(f"{a}.attention.key_length_swa", self.head_dim_swa)
        w.add(f"{a}.attention.value_length_swa", self.head_dim_swa)
        w.add(f"{a}.rope.dimension_count", self.head_dim_full)
        prf_swa = float(self.rope_swa.get(
            "partial_rotary_factor", cfg.get("partial_rotary_factor", 1.0)))
        w.add(f"{a}.rope.dimension_count_swa",
              int(self.head_dim_swa * prf_swa))
        w.add(f"{a}.rope.freq_base",
              float(self.rope_full.get("rope_theta", 1000000.0)))
        w.add(f"{a}.rope.freq_base_swa",
              float(self.rope_swa.get("rope_theta", 10000.0)))
        w.add(f"{a}.embedding_length_per_layer_input",
              int(cfg.get("hidden_size_per_layer_input", 0)))
        ffe = cfg.get("expert_intermediate_size",
                      cfg.get("moe_intermediate_size"))
        if ffe:
            w.add(f"{a}.expert_feed_forward_length", int(ffe))
        if cfg.get("num_experts"):
            w.add(f"{a}.expert_count", int(cfg["num_experts"]))
            w.add(f"{a}.expert_used_count",
                  int(cfg.get("num_experts_per_tok", 2)))
        if cfg.get("final_logit_softcapping"):
            w.add(f"{a}.final_logit_softcapping",
                  float(cfg["final_logit_softcapping"]))
        w.add(f"{a}.vocab_size", cfg["vocab_size"])

    def _gen_rope_freqs(self):
        # proportional rope: rotate the first prf*D/2 pairs, freeze the rest
        # (Gemma4Model.generate_extra_tensors)
        prf = float(self.rope_full.get("partial_rotary_factor", 1.0))
        n_rot = int(self.head_dim_full * prf / 2)
        n_unrot = self.head_dim_full // 2 - n_rot
        return np.asarray([1.0] * n_rot + [1e30] * n_unrot, np.float32)

    def extra_rows(self):
        if str(self.rope_full.get("rope_type", "proportional")) \
                == "proportional":
            yield "rope_freqs.weight", self._gen_rope_freqs()
        ffe = int(self.cfg.get("expert_intermediate_size",
                               self.cfg.get("moe_intermediate_size", 0)) or 0)
        for i in range(self.n_layer):
            b = f"model.layers.{i}.mlp"
            router = self.tensors.get(f"{b}.router.weight")
            if router is None:
                continue
            yield f"blk.{i}.ffn_gate_inp.weight", \
                np.asarray(router, np.float32)
            rs = self.tensors.get(f"{b}.router.scale")
            if rs is not None:
                yield f"blk.{i}.ffn_gate_inp.scale", \
                    np.asarray(rs, np.float32)
            for hf, gg in (("experts.gate_up_proj", "ffn_gate_up_exps"),
                           ("experts.down_proj", "ffn_down_exps")):
                arr = self.tensors.get(f"{b}.{hf}.weight",
                                       self.tensors.get(f"{b}.{hf}"))
                if arr is None:
                    continue
                arr = np.asarray(arr, np.float32)
                # (E, in, out) checkpoints -> ggml (E, out, in)
                if gg == "ffn_gate_up_exps" and ffe \
                        and arr.shape[-1] == 2 * ffe:
                    arr = arr.swapaxes(-1, -2)
                if gg == "ffn_down_exps" and arr.shape[-1] == self.n_embd \
                        and arr.shape[-2] == ffe:
                    arr = arr.swapaxes(-1, -2)
                yield f"blk.{i}.{gg}.weight", arr
            pes = self.tensors.get(f"{b}.experts.per_expert_scale")
            if pes is not None:
                yield f"blk.{i}.ffn_down_exps.scale", \
                    np.asarray(pes, np.float32).reshape(-1)


@register("Gemma4AssistantForCausalLM", "Gemma4UnifiedAssistantForCausalLM")
class Gemma4Assistant(ArchConverter):
    """gemma4 MTP / assistant draft tier (Gemma4AssistantModel,
    convert_hf_to_gguf.py:3969): Q-only attention layers against the
    target's KV cache, pre/post backbone projections, optional ordered
    centroid embeddings (token_ordering is inverted into a
    token->centroid table at conversion)."""
    arch = "gemma4_mtp"
    MAP = [
        ("model.embed_tokens.weight", "token_embd.weight"),
        ("model.norm.weight", "output_norm.weight"),
        ("pre_projection.weight", "mtp_pre_proj.weight"),
        ("post_projection.weight", "mtp_post_proj.weight"),
        ("masked_embedding.centroids.weight", "mtp_centroids.weight"),
        ("centroids.weight", "mtp_centroids.weight"),
        ("model.centroids.weight", "mtp_centroids.weight"),
    ] + [(f"model.layers.{{i}}.{h}.weight", f"blk.{{i}}.{g}.weight")
         for h, g in (("input_layernorm", "attn_norm"),
                      ("self_attn.q_proj", "attn_q"),
                      ("self_attn.q_norm", "attn_q_norm"),
                      ("self_attn.o_proj", "attn_output"),
                      ("post_attention_layernorm", "post_attention_norm"),
                      ("pre_feedforward_layernorm", "ffn_norm"),
                      ("mlp.gate_proj", "ffn_gate"),
                      ("mlp.up_proj", "ffn_up"),
                      ("mlp.down_proj", "ffn_down"),
                      ("post_feedforward_layernorm", "post_ffw_norm"),
                      ("layer_scalar", "layer_output_scale"))]

    def __init__(self, cfg, tensors):
        text = cfg.get("text_config")
        if isinstance(text, dict):
            cfg = {**cfg, **text}
        for k in list(tensors):
            if k.endswith("layer_scalar") or k in ("centroids",
                                                   "model.centroids"):
                tensors[k + ".weight"] = tensors.pop(k)
        for k in ("token_ordering", "token_ordering.weight",
                  "model.token_ordering", "model.token_ordering.weight",
                  "masked_embedding.token_ordering"):
            if k in tensors:
                tensors["__token_ordering__"] = tensors.pop(k)
        super().__init__(cfg, tensors)
        self.swa_layers = [str(t) == "sliding_attention"
                           for t in self.cfg["layer_types"]]

    def metadata(self, w):
        a, cfg = self.arch, self.cfg
        hd_swa = int(cfg["head_dim"])
        hd_full = int(cfg.get("global_head_dim") or hd_swa)
        kv_swa = int(cfg["num_key_value_heads"])
        kv_full = int(cfg.get("num_global_key_value_heads") or kv_swa)
        w.add(f"{a}.block_count", self.n_layer)
        w.add(f"{a}.context_length", self.n_ctx)
        w.add(f"{a}.embedding_length", self.n_embd)
        w.add(f"{a}.feed_forward_length", self.n_ff)
        w.add(f"{a}.attention.head_count", self.n_head)
        if kv_full != kv_swa:
            w.add(f"{a}.attention.head_count_kv",
                  np.asarray([kv_swa if s else kv_full
                              for s in self.swa_layers], np.int32))
        else:
            w.add(f"{a}.attention.head_count_kv", kv_swa)
        w.add(f"{a}.attention.key_length", hd_full)
        w.add(f"{a}.attention.value_length", hd_full)
        w.add(f"{a}.attention.key_length_swa", hd_swa)
        w.add(f"{a}.attention.value_length_swa", hd_swa)
        w.add(f"{a}.attention.layer_norm_rms_epsilon",
              self.key("rms_norm_eps", default=1e-6))
        w.add(f"{a}.attention.sliding_window", int(cfg["sliding_window"]))
        w.add(f"{a}.attention.sliding_window_pattern",
              np.asarray([1 if s else 0 for s in self.swa_layers], np.int32))
        w.add(f"{a}.rope.dimension_count", hd_full)
        w.add(f"{a}.rope.dimension_count_swa", hd_swa)
        rp = cfg.get("rope_parameters", {})
        w.add(f"{a}.rope.freq_base", float(
            rp.get("full_attention", {}).get("rope_theta", 1000000.0)))
        w.add(f"{a}.rope.freq_base_swa", float(
            rp.get("sliding_attention", {}).get("rope_theta", 10000.0)))
        w.add(f"{a}.backbone_embedding_length",
              int(cfg["backbone_hidden_size"]))
        w.add(f"{a}.use_ordered_embeddings",
              bool(cfg.get("use_ordered_embeddings", False)))
        w.add(f"{a}.centroid_count", int(cfg.get("num_centroids", 0)))
        w.add(f"{a}.centroid_top_k",
              int(cfg.get("centroid_intermediate_top_k", 0)))
        w.add(f"{a}.vocab_size", cfg["vocab_size"])

    def extra_rows(self):
        ordering = self.tensors.get("__token_ordering__")
        if ordering is not None:
            # invert the vocab permutation into token->centroid ids
            # (Gemma4AssistantModel.modify_tensors)
            order = np.asarray(ordering).astype(np.int64).reshape(-1)
            n_vocab = order.shape[0]
            n_cent = int(self.cfg.get("num_centroids", 2048)) or 2048
            per = max(1, n_vocab // n_cent)
            inv = np.zeros(n_vocab, np.int64)
            inv[order] = np.arange(n_vocab)
            yield ("mtp_token_ordering.weight",
                   (inv // per).astype(np.int32))


# ------------------------------------------------------------ deepseek v4
@register("DeepseekV4ForCausalLM", "DeepseekV4FlashForCausalLM",
          "DeepseekV4ProForCausalLM")
class DeepseekV4(ArchConverter):
    """DeepSeek-V4 (DeepseekV4Model, convert_hf_to_gguf.py:4738): native
    DSv4 checkpoint naming (``layers.N.attn.wq_a`` / ``hc_*`` — the layout
    _map_dsv4_tensor_name defines) -> our deepseek4 tensor set:
    hyper-connection mixers, k-only latent attention with grouped low-rank
    output, sinks, routed+shared experts, and the optional CSA/HCA
    compressor + LID indexer tensors (extension rows mirroring our
    loader's names; the reference converts those via its DSv2 path)."""
    arch = "deepseek4"
    MAP = [
        ("embed.weight", "token_embd.weight"),
        ("norm.weight", "output_norm.weight"),
        ("head.weight", "output.weight"),
        ("hc_head_fn", "hc_head_fn.weight"),
        ("hc_head_base", "hc_head_base.weight"),
        ("hc_head_scale", "hc_head_scale.weight"),
    ] + [(f"layers.{{i}}.{h}", f"blk.{{i}}.{g}")
         for h, g in (("attn_norm.weight", "attn_norm.weight"),
                      ("ffn_norm.weight", "ffn_norm.weight"),
                      ("attn.wq_a.weight", "attn_q_a.weight"),
                      ("attn.q_norm.weight", "attn_q_a_norm.weight"),
                      ("attn.wq_b.weight", "attn_q_b.weight"),
                      ("attn.wkv.weight", "attn_kv.weight"),
                      ("attn.kv_norm.weight", "attn_kv_a_norm.weight"),
                      ("attn.wo_a.weight", "attn_output_a.weight"),
                      ("attn.wo_b.weight", "attn_output_b.weight"),
                      ("attn.attn_sink", "attn_sinks.weight"),
                      ("hc_attn_fn", "hc_attn_fn.weight"),
                      ("hc_attn_base", "hc_attn_base.weight"),
                      ("hc_attn_scale", "hc_attn_scale.weight"),
                      ("hc_ffn_fn", "hc_ffn_fn.weight"),
                      ("hc_ffn_base", "hc_ffn_base.weight"),
                      ("hc_ffn_scale", "hc_ffn_scale.weight"),
                      ("ffn.gate.weight", "ffn_gate_inp.weight"),
                      ("ffn.gate.bias", "exp_probs_b.bias"),
                      ("ffn.shared_experts.w1.weight",
                       "ffn_gate_shexp.weight"),
                      ("ffn.shared_experts.w2.weight",
                       "ffn_down_shexp.weight"),
                      ("ffn.shared_experts.w3.weight",
                       "ffn_up_shexp.weight"),
                      # compressor + indexer (our loader's names)
                      ("attn.compress_kv.weight",
                       "attn_compress_kv.weight"),
                      ("attn.compress_gate.weight",
                       "attn_compress_gate.weight"),
                      ("attn.compress_ape.weight",
                       "attn_compress_ape.weight"),
                      ("attn.compress_norm.weight",
                       "attn_compress_norm.weight"),
                      ("indexer.compress_kv.weight",
                       "indexer.compress_kv.weight"),
                      ("indexer.compress_gate.weight",
                       "indexer.compress_gate.weight"),
                      ("indexer.compress_ape.weight",
                       "indexer.compress_ape.weight"),
                      ("indexer.compress_norm.weight",
                       "indexer.compress_norm.weight"),
                      ("indexer.wq_b.weight", "indexer.attn_q_b.weight"),
                      ("indexer.proj.weight", "indexer.proj.weight"),
                      ("indexer.k_norm.weight", "indexer.k_norm.weight"))]

    def __init__(self, cfg, tensors):
        super().__init__(cfg, tensors)
        self.head_dim = int(cfg.get("head_dim")
                            or cfg.get("kv_lora_rank")
                            or self.n_embd // self.n_head)

    def rope_dim(self):
        return int(self.cfg.get("qk_rope_head_dim",
                                self.cfg.get("rope_dim", self.head_dim)))

    def metadata(self, w):
        super().metadata(w)
        a = self.arch
        w.add(f"{a}.attention.key_length", self.head_dim)
        w.add(f"{a}.attention.value_length", self.head_dim)

    def extra_metadata(self, w):
        a, cfg = self.arch, self.cfg
        if cfg.get("q_lora_rank"):
            w.add(f"{a}.attention.q_lora_rank", int(cfg["q_lora_rank"]))
        w.add(f"{a}.attention.kv_lora_rank",
              int(cfg.get("kv_lora_rank", self.head_dim)))
        w.add(f"{a}.attention.output_group_count",
              int(cfg.get("o_groups", 1)))
        w.add(f"{a}.attention.output_lora_rank",
              int(cfg.get("o_lora_rank", 0)))
        w.add(f"{a}.expert_count", int(cfg["n_routed_experts"]))
        w.add(f"{a}.expert_used_count",
              int(cfg.get("num_experts_per_tok", 2)))
        w.add(f"{a}.expert_shared_count",
              int(cfg.get("n_shared_experts", 0)))
        w.add(f"{a}.expert_feed_forward_length",
              int(cfg["moe_intermediate_size"]))
        w.add(f"{a}.leading_dense_block_count",
              int(cfg.get("first_k_dense_replace", 0)))
        w.add(f"{a}.expert_weights_scale",
              float(cfg.get("routed_scaling_factor", 1.0)))
        w.add(f"{a}.expert_weights_norm",
              bool(cfg.get("norm_topk_prob", False)))
        w.add(f"{a}.expert_gating_func",
              _GATING.get(cfg.get("scoring_func", "softmax"), 1))
        clamp = float(cfg.get("swiglu_limit", 0.0) or 0.0)
        w.add(f"{a}.swiglu_clamp_exp",
              np.full(self.n_layer, clamp, np.float32))
        w.add(f"{a}.swiglu_clamp_shexp",
              np.full(self.n_layer, clamp, np.float32))
        w.add(f"{a}.hyper_connection.count", int(cfg.get("hc_mult", 1)))
        w.add(f"{a}.hyper_connection.sinkhorn_iterations",
              int(cfg.get("hc_sinkhorn_iters", 3)))
        w.add(f"{a}.hyper_connection.epsilon",
              float(cfg.get("hc_eps", self.key("rms_norm_eps",
                                               default=1e-6))))
        if cfg.get("num_hash_layers") is not None:
            w.add(f"{a}.hash_layer_count", int(cfg["num_hash_layers"]))
        idx_h = cfg.get("num_indexer_heads", cfg.get("index_n_heads"))
        if idx_h:
            w.add(f"{a}.attention.indexer.head_count", int(idx_h))
            w.add(f"{a}.attention.indexer.key_length",
                  int(cfg.get("indexer_head_dim",
                              cfg.get("index_head_dim", 0))))
            w.add(f"{a}.attention.indexer.top_k",
                  int(cfg.get("indexer_topk", cfg.get("index_topk", 0))))
        if cfg.get("compress_ratios"):
            w.add(f"{a}.attention.compress_ratios",
                  np.asarray([int(v) for v in cfg["compress_ratios"]],
                             np.int32))
            w.add(f"{a}.attention.compress_rope_freq_base",
                  float(cfg.get("compress_rope_theta",
                                cfg.get("rope_theta", 10000.0))))
        if cfg.get("sliding_window"):
            w.add(f"{a}.attention.sliding_window",
                  int(cfg["sliding_window"]))

    def extra_rows(self):
        n_expert = int(self.cfg["n_routed_experts"])
        for i in range(self.n_layer):
            yield from self.stack_experts(
                i, n_expert, base=f"layers.{i}.ffn.experts",
                projs=(("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                       ("w2", "ffn_down_exps")))


def convert_registered(hf_arch: str, cfg: dict, tensors: dict, hf_dir: Path,
                       out_path, outtype: str) -> Path:
    """Generic driver for registered per-arch converters."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter
    from ..quant.quantize import quantize
    from .convert_hf import vocab_from_tokenizer_json, _write_fallback_vocab

    conv = CONVERTERS[hf_arch](cfg, tensors)
    arch = conv.arch
    if isinstance(cfg.get("text_config"), dict):
        # multimodal configs nest the text hparams (gemma4 etc.)
        cfg = {**cfg["text_config"], **{k: v for k, v in cfg.items()
                                        if k != "text_config"}}
    w = GGUFWriter(out_path, arch=arch)
    w.add("general.name", Path(hf_dir).name)
    conv.metadata(w)

    vocab = vocab_from_tokenizer_json(Path(hf_dir))
    if vocab is not None:
        tokens, types, merges = vocab
        w.add("tokenizer.ggml.model", "gpt2")
        w.add("tokenizer.ggml.pre", "default")
        w.add("tokenizer.ggml.tokens", tokens)
        w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
        w.add("tokenizer.ggml.merges", merges)
    else:
        _write_fallback_vocab(w, cfg["vocab_size"])
    for key in ("bos_token_id", "eos_token_id"):
        if cfg.get(key) is not None:
            v = cfg[key]
            w.add(f"tokenizer.ggml.{key}",
                  int(v[0] if isinstance(v, list) else v))

    ttype = {"f32": GGMLType.F32, "f16": GGMLType.F16,
             "q8_0": GGMLType.Q8_0}[outtype]
    for gname, arr in conv.rows():
        arr = np.asarray(arr, np.float32)
        t = ttype
        if (arr.ndim == 1 or "norm" in gname or gname.endswith(".bias")
                or "gate_inp" in gname or arr.shape[-1] % 32 != 0):
            t = GGMLType.F32
        if t == GGMLType.F32:
            w.add_tensor(gname, arr)
        else:
            w.add_tensor(gname, quantize(arr.reshape(-1, arr.shape[-1]), t),
                         shape=tuple(reversed(arr.shape)), ggml_type=t)
    w.write()
    return Path(out_path)
