"""Dense transformer family: llama / llama2/3 / qwen2 / qwen3 / mistral.

The TPU analogue of the reference's per-arch graph builders
(src/graphs/build_llama.cpp, build_qwen3.cpp): one functional forward over a
fixed-capacity KV cache, jit-compiled once per (batch, chunk) shape bucket.

Weight names follow GGUF conventions (token_embd, blk.N.attn_q, ...), the
same tensors llm_load_tensors declares for LLM_ARCH_LLAMA/QWEN2/QWEN3.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops import layers as L
from ..ops.attention import alibi_slopes, attend
from ..ops.moe import ExpertWeights, QuantExpertWeights, moe_ffn
from ..ops.flash_attention import (flash_attention, flash_attention_q8,
                                   flash_attention_decode,
                                   flash_attention_decode_q8)
from ..ops.kv_quant import (dequantize_kv, quantize_kv_rows,
                             dequantize_kv_q4, quantize_kv_rows_q4,
                             dequantize_kv_q6, quantize_kv_rows_q6,
                             KV_ENCODERS, KV_DECODERS, kv_codec_of,
                             hadamard_rotate)
from .weights import _use_pallas
from .config import ModelConfig, config_from_gguf
from .weights import (DenseLinear, QLinear, dequant_tensor, fuse_linears,
                      load_dense, load_linear, scale_linear)


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    """Fixed-capacity KV cache; optionally int8-quantized with per-(token,
    head) scales — the analogue of -ctk/-ctv q8_0 (quantize-on-write)."""

    k: Any  # (L, B, S, Hkv, Dk) bf16 or int8
    v: Any  # (L, B, S, Hkv, Dv)
    k_scale: Any = None  # (L, B, S, Hkv) f32 when quantized
    v_scale: Any = None

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, capacity: int,
               dtype=jnp.bfloat16, quant: "bool | str" = False):
        """quant: False (bf16), True/'q8' (int8 per-row), 'q4'/'q6'/'nl4'
        (packed per-row codecs — the -ctk/-ctv q4_0 / q6_0 / iq4_nl
        analogues; see ops/kv_quant.py for the layouts)."""
        shape = (cfg.n_layer, batch, capacity, cfg.n_head_kv, cfg.head_dim)
        if quant in ("q4", "q6", "nl4", "iq4_nl"):
            # packed codecs, told apart by (dtype, stored width):
            # q4 = uint8 D/2, q6 = uint8 3D/4 (two bit-planes), nl4 =
            # int8 D/2 (IQ4_NL value grid) — kv_quant.kv_codec_of
            codec = "nl4" if quant == "iq4_nl" else quant
            w = _KV_CODEC_WIDTH[codec](cfg.head_dim)
            dt = _KV_CODEC_DTYPE[codec]
            qshape = shape[:-1] + (w,)
            sshape = shape[:-1]
            return cls(jnp.zeros(qshape, dt),
                       jnp.zeros(qshape, dt),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))
        if quant:
            sshape = shape[:-1]
            return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def quantized(self):
        return self.k_scale is not None

    @property
    def capacity(self):
        return self.k.shape[2]


class _SwaLayerView:
    """kv.k[i]-style per-layer access over the split full/SWA stacks."""

    def __init__(self, cache: "SwaKVCache", field: str):
        self._c = cache
        self._f = field

    def __getitem__(self, i: int):
        m = self._c.layer_map[i]
        if m >= 0:
            return getattr(self._c, self._f + "_full")[m]
        return getattr(self._c, self._f + "_swa")[-m - 1]


@jax.tree_util.register_pytree_node_class
@dataclass
class SwaKVCache:
    """--swa-compress analogue (reference llama.cpp:1198-1227 row_count
    plan): sliding-window layers get a RING cache of ~window+margin rows
    instead of full capacity — for gemma3/gpt-oss-class models with mostly
    SWA layers this shrinks KV memory by capacity/(window+margin) on those
    layers. Ring slot of position p is p % swa_cap; attention recovers
    per-slot absolute positions, so logits are bit-identical to the full
    cache. bf16 only (like the reference, incompatible with defrag/splits;
    here: with -ctk/-ctv q8)."""

    k_full: Any   # (Lf, B, S, Hkv, D)
    v_full: Any
    k_swa: Any    # (Ls, B, Sw, Hkv, D)
    v_swa: Any
    layer_map: tuple = ()   # per layer: m >= 0 -> full[m]; m < 0 -> swa[-m-1]

    def tree_flatten(self):
        return (self.k_full, self.v_full, self.k_swa, self.v_swa), \
            (self.layer_map,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, layer_map=aux[0])

    @property
    def k(self):
        return _SwaLayerView(self, "k")

    @property
    def v(self):
        return _SwaLayerView(self, "v")

    k_scale = None
    v_scale = None

    @property
    def quantized(self):
        return False

    @property
    def capacity(self):
        return self.k_full.shape[2]

    @property
    def swa_cap(self):
        return self.k_swa.shape[2]

    def ring(self, i: int) -> int:
        return self.swa_cap if self.layer_map[i] < 0 else 0

    def with_layers(self, new_k: list, new_v: list) -> "SwaKVCache":
        fk = [None] * self.k_full.shape[0]
        fv = [None] * self.k_full.shape[0]
        sk = [None] * self.k_swa.shape[0]
        sv = [None] * self.k_swa.shape[0]
        for i, m in enumerate(self.layer_map):
            if m >= 0:
                fk[m], fv[m] = new_k[i], new_v[i]
            else:
                sk[-m - 1], sv[-m - 1] = new_k[i], new_v[i]
        return SwaKVCache(jnp.stack(fk) if fk else self.k_full,
                          jnp.stack(fv) if fv else self.v_full,
                          jnp.stack(sk) if sk else self.k_swa,
                          jnp.stack(sv) if sv else self.v_swa,
                          self.layer_map)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, capacity: int,
               dtype=jnp.bfloat16, margin: int = 576):
        """margin must cover the largest prefill chunk + draft length so a
        ring write never overwrites rows still inside a chunk's window."""
        assert cfg.swa_window > 0, "--swa-compress needs sliding-window layers"
        sw_cap = -(-(cfg.swa_window + margin) // 128) * 128
        assert sw_cap < capacity, (
            f"--swa-compress had no effect: ring {sw_cap} >= ctx {capacity}")
        lm, nf, ns = [], 0, 0
        for i in range(cfg.n_layer):
            if cfg.layer_is_swa(i):
                lm.append(-ns - 1)
                ns += 1
            else:
                lm.append(nf)
                nf += 1
        assert ns, "--swa-compress had no effect: no sliding-window layers"
        hkv, d = cfg.n_head_kv, cfg.head_dim
        return cls(jnp.zeros((nf, batch, capacity, hkv, d), dtype),
                   jnp.zeros((nf, batch, capacity, hkv, d), dtype),
                   jnp.zeros((ns, batch, sw_cap, hkv, d), dtype),
                   jnp.zeros((ns, batch, sw_cap, hkv, d), dtype),
                   tuple(lm))


_KV_CODEC_WIDTH = {  # stored last-dim bytes per head_dim D
    "q8": lambda d: d, "q4": lambda d: d // 2, "q6": lambda d: 3 * d // 4,
    "nl4": lambda d: d // 2}
_KV_CODEC_DTYPE = {"q8": jnp.int8, "q4": jnp.uint8, "q6": jnp.uint8,
                   "nl4": jnp.int8}
# user-facing alias (-ctk/-ctv iq4_nl)
_KV_CODEC_WIDTH["iq4_nl"] = _KV_CODEC_WIDTH["nl4"]
_KV_CODEC_DTYPE["iq4_nl"] = _KV_CODEC_DTYPE["nl4"]


class _MixedLayerView:
    """kv.k[i]-style per-layer access over the override/mid codec stacks."""

    def __init__(self, cache: "MixedKVCache", field: str):
        self._c = cache
        self._f = field

    def __getitem__(self, i: int):
        m = self._c.layer_map[i]
        if m >= 0:
            return getattr(self._c, self._f + "_ovr")[m]
        return getattr(self._c, self._f + "_mid")[-m - 1]


@jax.tree_util.register_pytree_node_class
@dataclass
class MixedKVCache:
    """Per-layer KV codec overrides — the analogue of the reference's
    first/last-layer KV-type params (include/llama.h:390-397: e.g. keep the
    most sensitive first/last layers at q8 while the bulk sits at q4/q6).
    Two stacks: 'ovr' layers use the override codec, 'mid' the base codec;
    per-layer codec selection downstream is purely shape-driven (stored
    uint8 width), so attention/write paths need no extra flags."""

    k_ovr: Any
    v_ovr: Any
    ks_ovr: Any
    vs_ovr: Any
    k_mid: Any
    v_mid: Any
    ks_mid: Any
    vs_mid: Any
    layer_map: tuple = ()   # m >= 0 -> ovr[m]; m < 0 -> mid[-m-1]

    def tree_flatten(self):
        return (self.k_ovr, self.v_ovr, self.ks_ovr, self.vs_ovr,
                self.k_mid, self.v_mid, self.ks_mid, self.vs_mid), \
            (self.layer_map,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, layer_map=aux[0])

    @property
    def k(self):
        return _MixedLayerView(self, "k")

    @property
    def v(self):
        return _MixedLayerView(self, "v")

    @property
    def k_scale(self):
        return _MixedLayerView(self, "ks")

    @property
    def v_scale(self):
        return _MixedLayerView(self, "vs")

    @property
    def quantized(self):
        return True

    @property
    def capacity(self):
        return self.k_mid.shape[2]

    def with_layers(self, new_k, new_v, new_ks, new_vs) -> "MixedKVCache":
        no = self.k_ovr.shape[0]
        nm = self.k_mid.shape[0]
        ok, ov, oks, ovs = [None] * no, [None] * no, [None] * no, [None] * no
        mk, mv, mks, mvs = [None] * nm, [None] * nm, [None] * nm, [None] * nm
        for i, m in enumerate(self.layer_map):
            if m >= 0:
                ok[m], ov[m] = new_k[i], new_v[i]
                oks[m], ovs[m] = new_ks[i], new_vs[i]
            else:
                j = -m - 1
                mk[j], mv[j] = new_k[i], new_v[i]
                mks[j], mvs[j] = new_ks[i], new_vs[i]
        return MixedKVCache(
            jnp.stack(ok), jnp.stack(ov), jnp.stack(oks), jnp.stack(ovs),
            jnp.stack(mk), jnp.stack(mv), jnp.stack(mks), jnp.stack(mvs),
            self.layer_map)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, capacity: int,
               mid: str = "q4", override: str = "q8",
               n_first: int = 1, n_last: int = 1):
        hkv, d = cfg.n_head_kv, cfg.head_dim
        lm, no, nm = [], 0, 0
        for i in range(cfg.n_layer):
            if i < n_first or i >= cfg.n_layer - n_last:
                lm.append(no)
                no += 1
            else:
                lm.append(-nm - 1)
                nm += 1
        assert no and nm, (n_first, n_last, cfg.n_layer)

        def stacks(codec, n):
            w = _KV_CODEC_WIDTH[codec](d)
            dt = _KV_CODEC_DTYPE[codec]
            q = jnp.zeros((n, batch, capacity, hkv, w), dt)
            s = jnp.zeros((n, batch, capacity, hkv), jnp.float32)
            return q, jnp.copy(q), s, jnp.copy(s)

        return cls(*stacks(override, no), *stacks(mid, nm), tuple(lm))


def load_llama_params(gg: GGUFModel, cfg: ModelConfig, *, use_quant: bool = True,
                      fuse: bool = False):
    """GGUF -> pytree of device weights.

    ``fuse`` merges q/k/v and gate/up into single matmuls at load (the
    reference's merge-qkv / fused-up-gate, llama-load-tensors.cpp) — saves
    decode-step dispatches. Leave False for tensor-parallel sharding (the
    TP column split assumes separate q/k/v) and per-projection LoRA."""
    t = gg.tensors
    params: dict[str, Any] = {}
    params["tok_embd"] = jnp.asarray(
        np.ascontiguousarray(dequant_tensor(t["token_embd.weight"])),
        dtype=jnp.bfloat16,
    )
    if "position_embd.weight" in t:   # gpt2/starcoder learned positions
        params["pos_embd"] = jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["position_embd.weight"])), jnp.float32)
    if "token_embd_norm.weight" in t:  # bloom embedding LayerNorm
        params["tok_norm"] = load_dense(t["token_embd_norm.weight"])
        if "token_embd_norm.bias" in t:
            params["tok_norm_b"] = load_dense(t["token_embd_norm.bias"])
    if "output_norm.weight" in t:
        params["output_norm"] = load_dense(t["output_norm.weight"])
    if "output_norm.bias" in t:
        params["output_norm_b"] = load_dense(t["output_norm.bias"])
    out_name = "output.weight" if "output.weight" in t else "token_embd.weight"
    params["output"] = load_linear(t[out_name], use_quant=use_quant)
    if "output.bias" in t:             # phi2 lm-head bias (build_phi2.cpp)
        params["output_b"] = load_dense(t["output.bias"])

    blocks = []
    mtp_blocks = []
    for i in range(cfg.n_layer + cfg.nextn_layers):
        p = f"blk.{i}."
        blk = {}
        if p + "attn_output.weight" in t:   # absent on deci attention-free layers
            blk["wo"] = load_linear(t[p + "attn_output.weight"], use_quant=use_quant)
        if p + "attn_norm.weight" in t:  # olmo has non-parametric norms
            blk["attn_norm"] = load_dense(t[p + "attn_norm.weight"])
        if p + "attn_norm_2.weight" in t:  # falcon-40B second attention norm
            blk["attn_norm_2"] = load_dense(t[p + "attn_norm_2.weight"])
        if cfg.arch in ("gpt-oss", "seed_oss"):
            # gpt-oss/seed_oss name their pre-FFN norm "post_attention_norm"
            # (llama-load-tensors.cpp:3996; build_seedoss.cpp:32)
            blk["ffn_norm"] = load_dense(t[p + "post_attention_norm.weight"])
        elif cfg.arch == "dbrx":
            # dbrx's pre-MoE norm is stored as "attn_output_norm"
            # (create_dbrx_tensors; build_dbrx.cpp attn_out_norm)
            blk["ffn_norm"] = load_dense(t[p + "attn_output_norm.weight"])
        elif p + "ffn_norm.weight" in t:
            # present under parallel residual too (gptneox use_par_res has a
            # separate FFN LayerNorm over the layer input)
            blk["ffn_norm"] = load_dense(t[p + "ffn_norm.weight"])
        # command-r / falcon / phi2 / stablelm-parallel: no ffn_norm — the
        # shared attn_norm output feeds the FFN
        if p + "attn_qkv.weight" in t:   # fused QKV (phi3-style wqkv)
            blk["wqkv"] = load_linear(t[p + "attn_qkv.weight"], use_quant=use_quant)
        elif p + "attn_q.weight" in t:
            blk["wq"] = load_linear(t[p + "attn_q.weight"], use_quant=use_quant)
            blk["wk"] = load_linear(t[p + "attn_k.weight"], use_quant=use_quant)
            blk["wv"] = load_linear(t[p + "attn_v.weight"], use_quant=use_quant)
        # else: deci attention-free / linear-attention layer (wo only)
        if p + "ffn_gate_inp.weight" in t:  # MoE layer (qwen2moe/qwen3moe style)
            blk["ffn_gate_inp"] = load_linear(t[p + "ffn_gate_inp.weight"],
                                              use_quant=False)
            if p + "ffn_gate_inp.bias" in t:   # router bias (gpt-oss)
                blk["ffn_gate_inp_b"] = load_dense(t[p + "ffn_gate_inp.bias"])
            blk["experts"] = _load_experts(t, p, use_quant=use_quant)
            if p + "ffn_gate_shexp.weight" in t:  # shared expert (qwen2moe)
                blk["ffn_gate_shexp"] = load_linear(t[p + "ffn_gate_shexp.weight"], use_quant=use_quant)
                blk["ffn_up_shexp"] = load_linear(t[p + "ffn_up_shexp.weight"], use_quant=use_quant)
                blk["ffn_down_shexp"] = load_linear(t[p + "ffn_down_shexp.weight"], use_quant=use_quant)
                if p + "ffn_gate_inp_shexp.weight" in t:
                    blk["ffn_gate_inp_shexp"] = load_linear(t[p + "ffn_gate_inp_shexp.weight"], use_quant=False)
        if p + "ffn_up.weight" in t:
            # dense FFN — possibly ALONGSIDE experts (arctic parallel MoE
            # branch, grok dense+MoE sum)
            # phi3-style models fuse gate+up into a single ffn_up tensor
            if p + "ffn_gate.weight" in t:
                blk["ffn_gate"] = load_linear(t[p + "ffn_gate.weight"], use_quant=use_quant)
            blk["ffn_up"] = load_linear(t[p + "ffn_up.weight"], use_quant=use_quant)
            blk["ffn_down"] = load_linear(t[p + "ffn_down.weight"], use_quant=use_quant)
        for opt in ("attn_q_norm", "attn_k_norm"):
            if p + opt + ".weight" in t:
                blk[opt] = load_dense(t[p + opt + ".weight"])
        # sandwich norms; canonical GGUF names per llama-model.cpp:467/146
        if cfg.arch not in ("gpt-oss", "seed_oss"):
            for key, name in (("attn_post_norm", "post_attention_norm"),
                              ("ffn_post_norm", "post_ffw_norm")):
                if p + name + ".weight" in t:
                    blk[key] = load_dense(t[p + name + ".weight"])
        if cfg.arch == "grok":
            # grok sandwich norms: attn_output_norm on the attention output,
            # layer_output_norm (or post_ffw_norm) on the FFN output
            # (build_grok.cpp:66,107; create_grok_tensors:739,778)
            blk["attn_post_norm"] = load_dense(t[p + "attn_output_norm.weight"])
            for name in ("layer_output_norm", "post_ffw_norm"):
                if p + name + ".weight" in t:
                    blk["ffn_post_norm"] = load_dense(t[p + name + ".weight"])
                    break
        if p + "ffn_norm_exps.weight" in t:   # arctic parallel-MoE norm
            blk["ffn_norm_exps"] = load_dense(t[p + "ffn_norm_exps.weight"])
        if p + "exp_probs_b.bias" in t:   # deepseek/glm4moe selection bias
            blk["ffn_exp_probs_b"] = load_dense(t[p + "exp_probs_b.bias"])
        for opt_b in ("attn_q.bias", "attn_k.bias", "attn_v.bias",
                      "attn_qkv.bias", "attn_output.bias", "attn_norm.bias",
                      "attn_norm_2.bias", "ffn_norm.bias",
                      "ffn_up.bias", "ffn_down.bias", "ffn_gate.bias"):
            if p + opt_b in t:
                blk[opt_b.replace(".", "_")] = load_dense(t[p + opt_b])
        for sub in ("attn_sub_norm", "ffn_sub_norm"):
            if p + sub + ".weight" in t:   # bitnet inner norms
                blk[sub] = load_dense(t[p + sub + ".weight"])
        # bitnet per-tensor scales: fold into the weights at load (the
        # post-matmul ggml_scale/mul is a scalar/per-channel multiply,
        # build_bitnet.cpp; the eps-compensated sub-norms become plain
        # rms_norms once the weight carries its scale)
        for key, tname in (("wq", "attn_q"), ("wk", "attn_k"),
                           ("wv", "attn_v"), ("wo", "attn_output"),
                           ("ffn_gate", "ffn_gate"), ("ffn_up", "ffn_up"),
                           ("ffn_down", "ffn_down")):
            if p + tname + ".scale" in t and key in blk:
                blk[key] = scale_linear(blk[key],
                                        load_dense(t[p + tname + ".scale"]))
        if p + "attn_gate.weight" in t and cfg.arch in ("step35", "laguna"):
            # step35 head-wise attention output gate (wqkv_gate,
            # llama-load-tensors.cpp:1252; build_std_attention gated branch)
            blk["attn_gate"] = load_linear(t[p + "attn_gate.weight"],
                                           use_quant=use_quant)
        for sn in ("attn_sinks.weight", "attn_sinks"):
            if p + sn in t:               # per-head sink logits (gpt-oss)
                blk["attn_sinks"] = load_dense(t[p + sn])
                break
        if i >= cfg.n_layer:
            # trailing NextN/MTP layer (nextn_predict_layers): its own
            # attention+FFN block plus the eh_proj/enorm/hnorm glue
            # (create tensors: llama-load-tensors.cpp:1291; graph:
            # build_glm4_moe_mtp, src/graphs/build_glm4.cpp:280-368)
            if p + "nextn.eh_proj.weight" not in t:
                continue
            blk["eh_proj"] = load_linear(t[p + "nextn.eh_proj.weight"],
                                         use_quant=use_quant)
            blk["enorm"] = load_dense(t[p + "nextn.enorm.weight"])
            blk["hnorm"] = load_dense(t[p + "nextn.hnorm.weight"])
            if p + "nextn.shared_head_norm.weight" in t:
                blk["shead_norm"] = load_dense(
                    t[p + "nextn.shared_head_norm.weight"])
            if p + "nextn.shared_head.head.weight" in t:
                blk["shead"] = load_linear(
                    t[p + "nextn.shared_head.head.weight"],
                    use_quant=use_quant)
            if p + "nextn.embed_tokens.weight" in t:
                blk["mtp_embd"] = jnp.asarray(np.ascontiguousarray(
                    dequant_tensor(t[p + "nextn.embed_tokens.weight"])),
                    jnp.bfloat16)
            mtp_blocks.append(blk)
            continue
        if fuse:
            _fuse_block(blk)
        blocks.append(blk)
    params["blocks"] = blocks
    if mtp_blocks:
        params["mtp_blocks"] = mtp_blocks
    return params


def mtp_forward(params, cfg: ModelConfig, tokens, hidden, kv: KVCache, n_past,
                *, interpret: bool = False):
    """NextN/MTP layer step (build_glm4_moe_mtp, src/graphs/build_glm4.cpp:
    280-368): predict the token at position p+2 from the MAIN model's
    pre-output-norm hidden state at position p and the token at p+1.

    tokens: (B, T) the p+1 tokens; hidden: (B, T, E) main hidden at p;
    kv: a 1-layer KVCache for the MTP layer. Returns (logits, kv, hidden')
    where hidden' is the MTP layer's own output stream (chained drafts)."""
    mtp = params["mtp_blocks"][0]
    b, t = tokens.shape
    embd = mtp.get("mtp_embd", params["tok_embd"])
    emb = embd[tokens].astype(jnp.float32)
    x = jnp.concatenate([
        L.rms_norm(emb, mtp["enorm"], cfg.rms_eps),
        L.rms_norm(hidden.astype(jnp.float32), mtp["hnorm"], cfg.rms_eps),
    ], axis=-1)
    x = mtp["eh_proj"](x.astype(jnp.bfloat16),
                       interpret=interpret).astype(jnp.bfloat16)

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    rope_dims = cfg.rope_dim or cfg.head_dim
    cos, sin = L.rope_cache(q_pos, rope_dims, cfg.rope_freq_base)

    h = _norm(x, mtp.get("attn_norm"), mtp.get("attn_norm_bias"), cfg)
    attn_out, (k_i, v_i, ks_i, vs_i) = _attn_block(
        mtp, h, cfg, kv.k[0], kv.v[0], n_past, q_pos, cos, sin, interpret,
        kv_ks=None if kv.k_scale is None else kv.k_scale[0],
        kv_vs=None if kv.v_scale is None else kv.v_scale[0])
    if "attn_post_norm" in mtp:
        attn_out = L.rms_norm(attn_out, mtp["attn_post_norm"], cfg.rms_eps)
    x = x + attn_out.astype(x.dtype)
    h = _norm(x, mtp.get("ffn_norm"), mtp.get("ffn_norm_bias"), cfg)
    ff = _ffn(mtp, h, cfg, interpret=interpret)
    x = x + ff.astype(x.dtype)

    kv = KVCache(k_i[None], v_i[None],
                 None if ks_i is None else ks_i[None],
                 None if vs_i is None else vs_i[None])
    out_hidden = x.astype(jnp.float32)
    y = L.rms_norm(x, mtp.get("shead_norm", params.get("output_norm")),
                   cfg.rms_eps)
    head = mtp.get("shead", params["output"])
    logits = head(y.astype(jnp.bfloat16), interpret=interpret
                  ).astype(jnp.float32)
    return logits, kv, out_hidden


def _fuse_block(blk: dict) -> None:
    """Merge separate q/k/v (and gate/up) into fused linears in place."""
    if all(k in blk for k in ("wq", "wk", "wv")) and not any(
            k in blk for k in ("attn_q_bias", "attn_k_bias", "attn_v_bias")):
        fused = fuse_linears([blk["wq"], blk["wk"], blk["wv"]])
        if fused is not None:
            blk["wqkv"] = fused
            del blk["wq"], blk["wk"], blk["wv"]
    if "ffn_gate" in blk and "ffn_up" in blk and not any(
            k in blk for k in ("ffn_gate_bias", "ffn_up_bias")):
        fused = fuse_linears([blk["ffn_gate"], blk["ffn_up"]])
        if fused is not None:
            blk["ffn_up"] = fused
            del blk["ffn_gate"]


def _planar_stacked(info):
    """Planar-decode a stacked expert tensor (ne = (K, N, n_expert)) to
    (codes int8 (n_expert, K, N), scale f32 (n_expert, K//G, N), group).
    Returns None when the format has no symmetric planar decode (float
    tensors, or asymmetric formats carrying a per-group bias)."""
    from ..quant.planar import PLANAR_FNS, planar_decode
    from ..native import planar_decode_native
    if info.ggml_type not in PLANAR_FNS:
        return None
    k, n, n_expert = info.shape[0], info.shape[1], info.shape[2]
    nat = planar_decode_native(info.data, info.ggml_type, k)
    if nat is not None:
        codes, scale, bias, group = nat
    else:
        pw = planar_decode(info.data, info.ggml_type, k)
        codes, scale, bias, group = pw.codes, pw.scale, pw.bias, pw.group
    if bias is not None:
        return None
    codes = np.ascontiguousarray(
        codes.reshape(n_expert, n, k).transpose(0, 2, 1))       # (G, K, N)
    scale = np.ascontiguousarray(
        scale.reshape(n_expert, n, k // group).transpose(0, 2, 1))
    from .weights import _i8_mxu_enabled
    from ..ops.qmatmul import SUPERGROUP, requant_supergroup
    if _i8_mxu_enabled() and k % SUPERGROUP == 0:
        # supergroup-256 recode (same trick as QLinearI8, exact-value
        # requantization, error <= S/254): feeds the int8 MXU decode
        # kernels (ops/moe_decode.py *_i8) — no per-weight VPU dequant.
        # Scales become f32 (K/256, N): 4x FEWER scale bytes than bf16 K/32
        q8 = np.empty_like(codes)
        sw = np.empty((n_expert, k // SUPERGROUP, n), np.float32)
        for e in range(n_expert):
            q8[e], sw[e] = requant_supergroup(codes[e], scale[e], group=group)
        return jnp.asarray(q8), jnp.asarray(sw), SUPERGROUP
    # bf16 scale storage: numerically identical (kernels round scales to
    # bf16 in-register), half the scale HBM traffic
    return jnp.asarray(codes), jnp.asarray(scale, jnp.bfloat16), group


def _load_experts(t, prefix: str, *, use_quant: bool = True):
    """Stacked 3-D expert tensors (ne = (K, N, n_expert)) -> device arrays.

    Quantized path (the analogue of keeping experts in their GGUF quant for
    iqk_moe_fused_up_gate / mmq_id.cu): planar int8 codes + f32 group scales
    per projection, consumed by ops/moe_qmm.ragged_qmatmul. Falls back to
    dequantized bf16 when any projection has no symmetric planar form."""
    def bias(name):
        if prefix + name not in t:
            return None
        return jnp.asarray(dequant_tensor(t[prefix + name]), jnp.float32)

    names = ("ffn_gate_exps.weight", "ffn_up_exps.weight",
             "ffn_down_exps.weight")
    if use_quant:
        planar = [_planar_stacked(t[prefix + nm]) for nm in names]
        if all(p is not None for p in planar):
            (gc, gs, gg), (uc, us, ug), (dc, ds, dg) = planar
            return QuantExpertWeights(
                gate=gc, gate_s=gs, up=uc, up_s=us, down=dc, down_s=ds,
                gate_group=gg, up_group=ug, down_group=dg,
                gate_b=bias("ffn_gate_exps.bias"),
                up_b=bias("ffn_up_exps.bias"),
                down_b=bias("ffn_down_exps.bias"),
            )

    def stacked(name):
        info = t[prefix + name]
        arr = dequant_tensor(info)  # logical (n_expert, N, K)
        arr = arr.transpose(0, 2, 1)  # (n_expert, K, N)
        return jnp.asarray(np.ascontiguousarray(arr), dtype=jnp.bfloat16)

    return ExpertWeights(
        gate=stacked("ffn_gate_exps.weight"),
        up=stacked("ffn_up_exps.weight"),
        down=stacked("ffn_down_exps.weight"),
        gate_b=bias("ffn_gate_exps.bias"),
        up_b=bias("ffn_up_exps.bias"),
        down_b=bias("ffn_down_exps.bias"),
    )


def _norm(x, w, b, cfg: ModelConfig):
    if cfg.norm_type == "layer":
        return L.layer_norm(x, w, b, cfg.rms_eps)
    return L.rms_norm(x, w, cfg.rms_eps)


def _sumsq(x):
    """Per-column sum of squares over all token rows (imatrix statistic)."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=tuple(range(xf.ndim - 1)))


def _act_limit(cfg, il, shared=False):
    lims = (cfg.extra or {}).get(
        "swiglu_limits_shared" if shared else "swiglu_limits")
    return float(lims[il]) if lims else 0.0


def _ffn(blk, h, cfg: ModelConfig, interpret=False, stats=None, il=0,
         ep_axis=None):
    """Dense or MoE feed-forward on (B, T, E) normalized input."""
    b, t, e = h.shape
    if "experts" in blk:
        router = blk["ffn_gate_inp"](h.reshape(-1, e), interpret=interpret)
        if "ffn_gate_inp_b" in blk:
            router = router + blk["ffn_gate_inp_b"]
        if stats is not None:
            stats[f"blk.{il}.ffn_gate_exps.weight"] = _sumsq(h)
            stats[f"blk.{il}.ffn_up_exps.weight"] = _sumsq(h)
            stats[f"blk.{il}.ffn_gate_inp.weight"] = _sumsq(h)
        y = moe_ffn(h.reshape(-1, e), router, blk["experts"], cfg.n_expert_used,
                    gating=cfg.expert_gating_func,
                    norm_topk=cfg.norm_topk_prob or cfg.expert_weights_norm,
                    scale=cfg.expert_weights_scale, ep_axis=ep_axis,
                    selection_bias=blk.get("ffn_exp_probs_b"),
                    activation=cfg.moe_act,
                    weight_before_ffn=cfg.moe_weight_before,
                    act_limit=_act_limit(cfg, il))
        if "ffn_gate_shexp" in blk:
            g = blk["ffn_gate_shexp"](h, interpret=interpret)
            u = blk["ffn_up_shexp"](h, interpret=interpret)
            sh = blk["ffn_down_shexp"](
                L.glu(g, u, cfg.moe_act,
                      limit=_act_limit(cfg, il, shared=True)
                      ).astype(jnp.bfloat16),
                interpret=interpret)
            if "ffn_gate_inp_shexp" in blk:  # qwen2moe gated shared expert
                gate = jax.nn.sigmoid(blk["ffn_gate_inp_shexp"](h, interpret=interpret))
                sh = sh * gate
            y = y.reshape(b, t, e) + sh
        y = y.reshape(b, t, e)
        if cfg.arch == "grok" and "ffn_up" in blk:
            # grok: dense FFN and MoE read the same normed input; their sum
            # is scaled by sqrt(2)/2 (build_grok.cpp:100)
            d = _ffn_dense(blk, h, cfg, interpret=interpret, stats=stats, il=il)
            y = (y + d) * float(np.sqrt(2.0) / 2.0)
        return y
    return _ffn_dense(blk, h, cfg, interpret=interpret, stats=stats, il=il)


def _ffn_dense(blk, h, cfg: ModelConfig, interpret=False, stats=None, il=0):
    if "ffn_gate" in blk:
        gate = blk["ffn_gate"](h, interpret=interpret)
        up = blk["ffn_up"](h, interpret=interpret)
        if "ffn_gate_bias" in blk:    # jais gated FFN with biases
            gate = gate + blk["ffn_gate_bias"]
        if "ffn_up_bias" in blk:
            up = up + blk["ffn_up_bias"]
    else:
        both = blk["ffn_up"](h, interpret=interpret)
        if "ffn_up_bias" in blk:
            both = both + blk["ffn_up_bias"]
        # per-layer FFN widths (openelm/deci): the no-gate test must use
        # THIS layer's width, not the scalar n_ff
        nf_l = cfg.n_ff_arr[il] if cfg.n_ff_arr else cfg.n_ff
        if both.shape[-1] == nf_l:
            # no gate at all (starcoder2 GELU-SEQ, build_starcoder2.cpp:70)
            y = L.gelu(both.astype(jnp.float32)) if cfg.act == "gelu" \
                else L.silu(both.astype(jnp.float32))
            y = blk["ffn_down"](y.astype(jnp.bfloat16), interpret=interpret)
            if "ffn_down_bias" in blk:
                y = y + blk["ffn_down_bias"]
            return y
        # fused gate+up in one tensor (phi3, build_phi3.cpp LLM_FFN_SWIGLU)
        gate, up = jnp.split(both, 2, axis=-1)
    act = L.glu(gate, up, cfg.act,
                limit=_act_limit(cfg, il)).astype(jnp.bfloat16)
    if "ffn_sub_norm" in blk:    # bitnet inner norm before ffn_down
        act = L.rms_norm(act, blk["ffn_sub_norm"], cfg.rms_eps).astype(jnp.bfloat16)
    if stats is not None:
        stats[f"blk.{il}.ffn_gate.weight"] = _sumsq(h)
        stats[f"blk.{il}.ffn_up.weight"] = stats[f"blk.{il}.ffn_gate.weight"]
        stats[f"blk.{il}.ffn_down.weight"] = _sumsq(act)
    y = blk["ffn_down"](act, interpret=interpret)
    if "ffn_down_bias" in blk:
        y = y + blk["ffn_down_bias"]
    return y


def _attn_block(blk, x, cfg: ModelConfig, kv_k, kv_v, n_past, q_pos, cos, sin,
                interpret=False, tp_axis=None, stats=None, il=0,
                kv_ks=None, kv_vs=None, swa_window=None,
                n_head=None, n_head_kv=None, attn_chunk=0,
                attn_scale_vec=None, ring=0, n_valid=None, sp_axis=None,
                block_mask=None, kv_stack=None):
    """One attention sublayer. x: (B, T, E). kv_*: (B, S, Hkv, D). Returns (y, k, v).

    ``sp_axis``: sequence-parallel prefill — x/kv hold this shard's T/P
    chunk, q_pos is already absolute; attention runs as ring attention over
    the freshly projected local k/v (ops/ring_attention.py).

    ``kv_stack``: (layer_idx, k, v, k_scale, v_scale) with the WHOLE stacked
    (L, B, S, Hkv, D) cache — the copy-free decode fast path; kv_k/kv_v are
    ignored and the returned kv tuple holds the updated STACKS."""
    b, t, _ = x.shape
    h, hkv, d = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    if n_head is not None:       # deci/openelm per-layer head counts
        h = n_head
    if n_head_kv is not None:
        hkv = n_head_kv

    if stats is not None:
        stats[f"blk.{il}.attn_q.weight"] = _sumsq(x)
        stats[f"blk.{il}.attn_k.weight"] = stats[f"blk.{il}.attn_q.weight"]
        stats[f"blk.{il}.attn_v.weight"] = stats[f"blk.{il}.attn_q.weight"]
    if "wqkv" in blk:   # fused QKV: one matmul, split activations (phi3)
        qkv = blk["wqkv"](x, interpret=interpret)
        if "attn_qkv_bias" in blk:   # gpt2/bloom/mpt/qwen/chatglm bqkv
            qkv = qkv + blk["attn_qkv_bias"]
        q = qkv[..., : h * d]
        k = qkv[..., h * d: h * d + hkv * d]
        v = qkv[..., h * d + hkv * d:]
    else:
        q = blk["wq"](x, interpret=interpret)
        k = blk["wk"](x, interpret=interpret)
        v = blk["wv"](x, interpret=interpret)
    if "attn_q_bias" in blk:
        q = q + blk["attn_q_bias"]
    if "attn_k_bias" in blk:
        k = k + blk["attn_k_bias"]
    if "attn_v_bias" in blk:
        v = v + blk["attn_v_bias"]
    if cfg.clamp_kqv > 0:   # mpt/olmo f_clamp_kqv (build_mpt.cpp:50)
        q = jnp.clip(q, -cfg.clamp_kqv, cfg.clamp_kqv)
        k = jnp.clip(k, -cfg.clamp_kqv, cfg.clamp_kqv)
        v = jnp.clip(v, -cfg.clamp_kqv, cfg.clamp_kqv)
    q = q.reshape(b, t, h, d)
    k = k.reshape(b, t, hkv, d)
    v = v.reshape(b, t, hkv, d)

    if "attn_q_norm" in blk:
        qn, kn = blk["attn_q_norm"], blk["attn_k_norm"]
        if qn.ndim == 1 and qn.shape[0] == h * d and d != h * d:
            # minimax-m2: RMS over the WHOLE q/k projection before the head
            # split (build_minimaxm2.cpp:209-215)
            q = L.rms_norm(q.reshape(b, t, h * d), qn,
                           cfg.rms_eps).reshape(b, t, h, d)
            k = L.rms_norm(k.reshape(b, t, hkv * d), kn,
                           cfg.rms_eps).reshape(b, t, hkv, d)
        elif cfg.norm_type == "layer":  # stablelm per-head LN (no bias)
            q = L.layer_norm(q, qn, None, cfg.rms_eps)
            k = L.layer_norm(k, kn, None, cfg.rms_eps)
        else:                           # qwen3-style per-head RMS norm
            q = L.rms_norm(q, qn, cfg.rms_eps)
            k = L.rms_norm(k, kn, cfg.rms_eps)

    if cfg.qk_l2_norm and cos is not None:
        # llama4 weightless Llama4TextL2Norm on rope layers
        # (build_llama.cpp:89-95)
        q = L.rms_norm(q, None, cfg.rms_eps)
        k = L.rms_norm(k, None, cfg.rms_eps)
    if cos is not None:           # smollm3 NoPE layers pass cos=None
        q = L.apply_rope(q, cos, sin, cfg.rope_type)
        k = L.apply_rope(k, cos, sin, cfg.rope_type)
    if attn_scale_vec is not None:
        # llama4 NoPE-layer attention temperature (llama.cpp:5187)
        q = (q.astype(jnp.float32) * attn_scale_vec[..., None, None]
             ).astype(q.dtype)

    # -khad/-vhad (reference ggml-cuda/hadamard.cu): rotate K+q (scores
    # unchanged: Hq . Hk = q . k) and/or V by a head-dim Hadamard before
    # quantize-on-write, spreading outliers so the row-absmax KV codecs
    # lose less. V is un-rotated after attention (H is its own inverse).
    if cfg.k_hadamard:
        k = hadamard_rotate(k)
        q = hadamard_rotate(q)
    if cfg.v_hadamard:
        v = hadamard_rotate(v)

    # append to cache at each row's n_past (vector for continuous batching)
    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    attn = None
    out_kv = None
    if kv_stack is not None:
        # ---- copy-free decode fast path ---------------------------------
        # The WHOLE stacked (L, B, S, Hkv, D) cache is threaded through the
        # step: fresh rows land via in-place dynamic_update_slice at the
        # static layer index, and the decode FA kernel DMAs its tiles
        # straight out of the stack (flash_attention_decode layer arg). The
        # per-layer slab extract + jnp.stack re-assembly of the slab path
        # copies the full capacity-sized cache every token — at 4k context
        # ~3 GB/token, the measured tg@4096 droop (PERF_NOTES round 4).
        il_s, st_k, st_v, st_ks, st_vs = kv_stack
        quant = st_ks is not None
        if quant:
            _enc = KV_ENCODERS[kv_codec_of(st_k, d)]
            kq, ks = _enc(k)
            vq, vs = _enc(v)
        else:
            kq, vq = k.astype(st_k.dtype), v.astype(st_v.dtype)

        # static python loop over batch rows: a vmap over the batch axis
        # makes XLA pick a batch-major layout for the DUS fusion and insert
        # full-cache layout-change copies around every kernel call (6x the
        # capacity-sized cache per decode step in the compiled HLO); plain
        # 5-D updates alias in place
        z = jnp.int32(0)
        for bb in range(b):
            st_k = jax.lax.dynamic_update_slice(
                st_k, kq[bb][None, None], (il_s, bb, npv[bb], z, z))
            st_v = jax.lax.dynamic_update_slice(
                st_v, vq[bb][None, None], (il_s, bb, npv[bb], z, z))
            if quant:
                st_ks = jax.lax.dynamic_update_slice(
                    st_ks, ks[bb][None, None], (il_s, bb, npv[bb], z))
                st_vs = jax.lax.dynamic_update_slice(
                    st_vs, vs[bb][None, None], (il_s, bb, npv[bb], z))
        out_kv = (st_k, st_v, st_ks, st_vs)

        _swa = cfg.swa_window if swa_window is None else swa_window
        dec = (flash_attention_decode_q8 if quant
               else flash_attention_decode)
        kv_args = ((st_k, st_ks, st_v, st_vs) if quant else (st_k, st_v))
        from ..ops import tuning as _tuning
        fa_cfg = _tuning.get("fa_decode", t, st_k.shape[2], st_k.shape[3])
        attn = dec(q.astype(jnp.bfloat16), *kv_args, npv, npv + t, il_s,
                   scale=cfg.f_attention_scale or (1.0 / float(np.sqrt(d))),
                   softcap=cfg.attn_softcap, swa_window=_swa,
                   attn_chunk=attn_chunk, sinks=blk.get("attn_sinks"),
                   interpret=interpret, **fa_cfg)
        if attn is None:
            # unsupported shape: slab views of the already-updated stacks;
            # the generic dispatch below takes over (copies, but correct)
            kv_k, kv_v = st_k[il_s], st_v[il_s]
            kv_ks = st_ks[il_s] if quant else None
            kv_vs = st_vs[il_s] if quant else None

    upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0), jnp.int32(0))))
    upd_s = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0))))
    quant = kv_ks is not None
    if kv_stack is not None:
        pass                                   # rows already written above
    elif ring > 0:
        # --swa-compress ring write: position p lives in slot p % ring.
        # Padded prefill rows (>= n_valid) would WRAP onto live window rows,
        # unlike the full cache where they land beyond kv_len — route them
        # out of bounds and let scatter 'drop' discard the write.
        ridx = (npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]) % ring
        if n_valid is not None:
            rows_ok = jnp.arange(t, dtype=jnp.int32)[None, :] < n_valid
            ridx = jnp.where(rows_ok, ridx, ring)
        wr = jax.vmap(lambda c, new, ix: c.at[ix].set(new, mode="drop"))
        kv_k = wr(kv_k, k.astype(kv_k.dtype), ridx)
        kv_v = wr(kv_v, v.astype(kv_v.dtype), ridx)
    elif quant:  # quantize-on-write (-ctk/-ctv q8/q4/q6/iq4_nl analogue)
        _enc = KV_ENCODERS[kv_codec_of(kv_k, d)]
        kq, ks = _enc(k)
        vq, vs = _enc(v)
        kv_k = upd(kv_k, kq, npv)
        kv_v = upd(kv_v, vq, npv)
        kv_ks = upd_s(kv_ks, ks, npv)
        kv_vs = upd_s(kv_vs, vs, npv)
    else:
        kv_k = upd(kv_k, k.astype(kv_k.dtype), npv)
        kv_v = upd(kv_v, v.astype(kv_v.dtype), npv)

    if swa_window is None:
        swa_window = cfg.swa_window
    scale = cfg.f_attention_scale or (1.0 / float(np.sqrt(d)))
    kv_len = npv + t
    # per-layer head counts (deci): the shared cache is allocated at the max
    # kv-head count; attend over this layer's leading head slots only
    kv_k_a = kv_k if (kv_k is None or kv_k.shape[2] == hkv) else kv_k[:, :, :hkv]
    kv_v_a = kv_v if (kv_v is None or kv_v.shape[2] == hkv) else kv_v[:, :, :hkv]
    kv_ks_a = kv_ks if (kv_ks is None or kv_ks.shape[2] == hkv) else kv_ks[:, :, :hkv]
    kv_vs_a = kv_vs if (kv_vs is None or kv_vs.shape[2] == hkv) else kv_vs[:, :, :hkv]
    qb = q.astype(jnp.bfloat16)
    sinks = blk.get("attn_sinks")
    _codec = kv_codec_of(kv_k_a, d) if quant else None
    # packed sub-byte codecs have no fused prefill-FA kernel yet: the
    # generic paths below dequantize first (flash_attention_q8 is q8-only)
    is_packed = _codec in ("q4", "q6", "nl4")
    _deq = KV_DECODERS[_codec] if quant else dequantize_kv
    # decode / spec-verify shapes: the native-layout kernel reads the cache
    # without per-step transpose copies, fetches each KV tile once for all q
    # heads, and its grid is (B, S/ts) — flat TG vs context (sweep-bench).
    # ``attn`` may already be set by the stacked fast path above.
    if attn is not None:
        pass
    elif block_mask is not None:
        # tree/lookahead probe (the llama_batch seq_id mask of
        # examples/lookahead): queries may be at non-contiguous positions and
        # in-block visibility is branch-structured, so route to the XLA
        # attend path with explicit per-slot key positions + an allow mask.
        # The committed prefix (slots < n_past) is contiguous (slot == pos);
        # block slots npv+j carry position q_pos[:, j].
        assert ring == 0 and sp_axis is None, \
            "block_mask probe unsupported under ring cache / seq parallel"
        s_cap = kv_k_a.shape[1]
        slots = jnp.arange(s_cap, dtype=jnp.int32)[None, :]        # (1, S)
        blk_j = slots - npv[:, None]                               # (B, S)
        in_blk = (blk_j >= 0) & (blk_j < t)
        blk_jc = jnp.clip(blk_j, 0, t - 1)
        grid_pos = jnp.take_along_axis(q_pos, blk_jc, axis=1)      # (B, S)
        key_pos = jnp.where(slots < npv[:, None], slots,
                            jnp.where(in_blk, grid_pos, -1))
        bm = jnp.broadcast_to(block_mask[None].astype(bool), (b, t, t))
        bm_g = jnp.take_along_axis(
            bm, jnp.broadcast_to(blk_jc[:, None, :], (b, t, s_cap)), axis=2)
        allow = (slots < npv[:, None])[:, None, :] | \
            (in_blk[:, None, :] & bm_g)
        attn = attend(qb,
                      kv_k_a if not quant
                      else _deq(kv_k_a, kv_ks_a).astype(jnp.bfloat16),
                      kv_v_a if not quant
                      else _deq(kv_v_a, kv_vs_a).astype(jnp.bfloat16),
                      q_pos=q_pos, kv_len=kv_len, scale=scale,
                      softcap=cfg.attn_softcap, swa_window=swa_window,
                      sinks=sinks, attn_chunk=attn_chunk,
                      key_positions=key_pos, allow_mask=allow)
    elif sp_axis is not None:
        # context-parallel prefill: ring attention over the fresh local
        # chunk's k/v (the cache holds this shard's rows for later decode).
        # Sinks/alibi/chunked-attn are not sequence-sharded yet.
        assert ring == 0 and cfg.alibi_max_bias <= 0 and attn_chunk == 0 \
            and sinks is None, "unsupported feature under sequence parallel"
        from ..ops.ring_attention import ring_attend
        attn = ring_attend(qb, k.astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16), sp_axis, scale=scale,
                           softcap=cfg.attn_softcap,
                           swa_window=swa_window or 0).astype(qb.dtype)
    elif ring > 0:
        # compacted SWA layer: recover each slot's absolute position (the
        # LAST position congruent to the slot index below the fill level);
        # unwritten slots get -1. The window bound keeps older-wrapped rows
        # masked exactly as the full cache would.
        slots = jnp.arange(ring, dtype=jnp.int32)[None, :]
        kvl = kv_len[:, None]
        p = slots + ((kvl - 1 - slots) // ring) * ring
        key_pos = jnp.where(slots < jnp.minimum(kvl, ring), p, -1)
        attn = attend(qb, kv_k_a, kv_v_a, q_pos=q_pos, kv_len=kv_len,
                      scale=scale, softcap=cfg.attn_softcap,
                      swa_window=swa_window, sinks=sinks,
                      attn_chunk=attn_chunk, key_positions=key_pos)
    if attn is not None:
        pass
    elif t <= 16 and cfg.alibi_max_bias <= 0 and _use_pallas():
        dec = (flash_attention_decode_q8 if quant else flash_attention_decode)
        kv_args = ((kv_k_a, kv_ks_a, kv_v_a, kv_vs_a) if quant
                   else (kv_k_a, kv_v_a))
        from ..ops import tuning as _tuning
        fa_cfg = _tuning.get("fa_decode", t, kv_k_a.shape[1],
                             kv_k_a.shape[2])
        attn = dec(qb, *kv_args, npv, kv_len, scale=scale,
                   softcap=cfg.attn_softcap, swa_window=swa_window,
                   attn_chunk=attn_chunk, sinks=sinks, **fa_cfg)
    if attn is not None:
        pass
    elif cfg.alibi_max_bias > 0:
        # ALiBi models (bloom/mpt/jais/refact/baichuan-13b): XLA attend path
        # with per-head position-bias slopes
        attn = attend(qb, kv_k_a if not quant else _deq(kv_k_a, kv_ks_a).astype(jnp.bfloat16),
                      kv_v_a if not quant else _deq(kv_v_a, kv_vs_a).astype(jnp.bfloat16),
                      q_pos=q_pos, kv_len=kv_len, scale=scale,
                      softcap=cfg.attn_softcap, swa_window=swa_window,
                      alibi=alibi_slopes(h, cfg.alibi_max_bias))
    elif sinks is not None and _use_pallas() and not quant:
        attn = flash_attention(qb, kv_k_a, kv_v_a, npv, kv_len, scale=scale,
                               softcap=cfg.attn_softcap, swa_window=swa_window,
                               attn_chunk=attn_chunk, sinks=sinks)
    elif sinks is not None and _use_pallas() and not is_packed:
        # quantized-KV + sinks: fused q8 FA kernel (the reference FA handles
        # sinks together with quantized caches, iqk_flash_attn.cpp:121-149)
        attn = flash_attention_q8(qb, kv_k_a, kv_ks_a, kv_v_a, kv_vs_a, npv,
                                  kv_len, scale=scale, softcap=cfg.attn_softcap,
                                  swa_window=swa_window, attn_chunk=attn_chunk,
                                  sinks=sinks)
    elif sinks is not None:
        # sinks without Pallas: XLA attend path (dequantize first if needed)
        attn = attend(qb, kv_k_a if not quant else _deq(kv_k_a, kv_ks_a).astype(jnp.bfloat16),
                      kv_v_a if not quant else _deq(kv_v_a, kv_vs_a).astype(jnp.bfloat16),
                      q_pos=q_pos, kv_len=kv_len, scale=scale,
                      softcap=cfg.attn_softcap, swa_window=swa_window,
                      sinks=sinks)
    elif quant and _use_pallas() and not is_packed:
        attn = flash_attention_q8(qb, kv_k_a, kv_ks_a, kv_v_a, kv_vs_a, npv, kv_len,
                                  scale=scale, softcap=cfg.attn_softcap,
                                  swa_window=swa_window, attn_chunk=attn_chunk)
    elif quant:
        attn = attend(qb, _deq(kv_k_a, kv_ks_a).astype(jnp.bfloat16),
                      _deq(kv_v_a, kv_vs_a).astype(jnp.bfloat16),
                      q_pos=q_pos, kv_len=kv_len, scale=scale,
                      softcap=cfg.attn_softcap, swa_window=swa_window,
                      attn_chunk=attn_chunk)
    elif _use_pallas():
        attn = flash_attention(qb, kv_k_a, kv_v_a, npv, kv_len, scale=scale,
                               softcap=cfg.attn_softcap, swa_window=swa_window,
                               attn_chunk=attn_chunk)
    else:
        attn = attend(qb, kv_k_a, kv_v_a, q_pos=q_pos, kv_len=kv_len,
                      scale=scale, softcap=cfg.attn_softcap,
                      swa_window=swa_window, attn_chunk=attn_chunk)
    if cfg.v_hadamard:
        # undo the V rotation: attn = A @ (V H), so attn @ H = A @ V
        attn = hadamard_rotate(attn)
    if "attn_gate" in blk:
        # step35: per-head sigmoid gate; laguna: SOFTPLUS gate, per-head
        # (XS.2) or per-output-element (M.1) — width inferred from the
        # tensor (build_std_attention "attn_gated_3d",
        # llama-build-context.cpp:3372-3398)
        gate = blk["attn_gate"](x, interpret=interpret)  # (B,T,H) | (B,T,H*D)
        gf32 = gate.astype(jnp.float32)
        gf32 = (jax.nn.softplus(gf32) if cfg.arch == "laguna"
                else jax.nn.sigmoid(gf32))
        if gate.shape[-1] == h:
            attn = attn * gf32[..., None].astype(attn.dtype)
        else:
            attn = attn * gf32.reshape(b, t, h, d).astype(attn.dtype)
    attn = attn.reshape(b, t, h * d)
    if "attn_sub_norm" in blk:   # bitnet inner norm before the out proj
        attn = L.rms_norm(attn, blk["attn_sub_norm"], cfg.rms_eps)
    if stats is not None:
        stats[f"blk.{il}.attn_output.weight"] = _sumsq(attn)
    out = blk["wo"](attn, interpret=interpret)
    if "attn_output_bias" in blk:
        out = out + blk["attn_output_bias"]
    if tp_axis is not None:
        # the reference's GGML_OP_REDUCE / ncclAllReduce (reduce.cu:164)
        out = jax.lax.psum(out, tp_axis)
    if out_kv is not None:      # stacked fast path: updated stacks
        return out, out_kv
    return out, (kv_k, kv_v, kv_ks, kv_vs)


def forward(params, cfg: ModelConfig, tokens, kv: KVCache, n_past,
            *, interpret: bool = False, logits_last_only: bool = False,
            tp_axis: str | None = None, ep_axis: str | None = None,
            collect_stats: bool = False, n_valid=None,
            return_hidden: bool = False, return_layer_hiddens: bool = False,
            return_mtp_hidden: bool = False, inputs_embeds=None,
            layer_offset: int = 0, return_raw_stream: bool = False,
            sp_axis: str | None = None,
            positions=None, block_mask=None):
    """tokens: (B, T) int32; n_past: scalar or (B,) int32 (per-sequence fill).

    Returns (logits f32, KVCache); with ``return_hidden`` the final-norm
    hidden states (B, T, E) f32 are returned instead of logits (embedding
    extraction — the analogue of llama_get_embeddings, llama.h).
    ``inputs_embeds`` (B, T, E) replaces the token-embedding lookup — the
    llama_batch.embd input path used for multimodal image tokens.

    ``layer_offset``/``return_raw_stream`` serve the layer-split pipeline
    (-sm layer analogue, parallel/pp.py): a stage holds a contiguous slice
    of blocks and a matching KV slice, but per-layer config lookups (SWA
    masks, per-layer head/ffn/rope arrays, nope schedule) must use the
    ABSOLUTE layer index — local index + layer_offset. Non-final stages
    return the raw residual stream (pre-output-norm) for the next stage."""
    b, t = tokens.shape
    if inputs_embeds is not None:
        x = inputs_embeds.astype(jnp.bfloat16)
    else:
        x = params["tok_embd"][tokens]  # (B, T, E) bf16
    if cfg.embd_scale > 0 and layer_offset == 0:
        # gemma input scaling (build_gemma*.cpp inp_scaled); later pipeline
        # stages receive the already-scaled stream via inputs_embeds
        x = (x.astype(jnp.float32) * cfg.embd_scale).astype(x.dtype)

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    if positions is not None:
        # tree/lookahead probe (llama_batch.pos): explicit, possibly
        # non-contiguous absolute positions; rope + causal masking follow
        q_pos = jnp.broadcast_to(
            jnp.asarray(positions, jnp.int32).reshape(-1, t), (b, t))
    else:
        q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    if sp_axis is not None:
        # sequence-parallel prefill (parallel/sp.py): this shard holds the
        # shard_index-th contiguous T-chunk; positions offset accordingly
        q_pos = q_pos + jax.lax.axis_index(sp_axis) * t
    if "pos_embd" in params:   # gpt2/starcoder learned absolute positions
        x = x + params["pos_embd"][q_pos].astype(x.dtype)
    if "tok_norm" in params:   # bloom embedding LayerNorm (build_bloom.cpp:20)
        x = _norm(x, params["tok_norm"], params.get("tok_norm_b"), cfg)
    rope_dims = cfg.rope_dim or cfg.head_dim
    # rope scaling (linear / yarn) per ggml_rope_ext semantics: linear scales
    # positions by 1/factor; yarn additionally ramps extrapolation + mscale
    freq_scale = (1.0 / cfg.rope_scale_factor
                  if cfg.rope_scaling in ("linear", "yarn")
                  and cfg.rope_scale_factor not in (0.0, 1.0) else 1.0)
    ext_factor = 1.0 if (cfg.rope_scaling == "yarn" and freq_scale != 1.0) else 0.0
    rope_kw = dict(freq_scale=freq_scale, ext_factor=ext_factor,
                   attn_factor=cfg.rope_attn_factor or 1.0,
                   n_ctx_orig=cfg.rope_orig_ctx or cfg.n_ctx_train)
    cos, sin = L.rope_cache(q_pos, rope_dims, cfg.rope_freq_base, **rope_kw)
    _sections = (cfg.extra or {}).get("rope_sections") or []
    if sum(_sections):
        # qwen3vl imrope: 'extra'-stream pairs carry position 0 for text
        # (ggml.c:20777; llama.cpp:6238-6257)
        _m = L.imrope_text_mask(_sections, rope_dims)
        cos = jnp.where(_m, cos, 1.0)
        sin = jnp.where(_m, sin, 0.0)
    if cfg.rope_freq_base_swa > 0 and cfg.swa_layer_mask:
        # gemma3: SWA layers rope at their own base, unscaled
        # (build_gemma3.cpp:42 freq_base_l/freq_scale_l)
        cos_swa, sin_swa = L.rope_cache(q_pos, rope_dims, cfg.rope_freq_base_swa)
    else:
        cos_swa, sin_swa = cos, sin

    rope_arr_all = (cfg.extra or {}).get("rope_dim_arr")
    if rope_arr_all:
        _rope_by_dim = {dd: L.rope_cache(q_pos, dd, cfg.rope_freq_base,
                                         **rope_kw)
                        for dd in set(rope_arr_all)}
        if cfg.rope_freq_base_swa > 0 and cfg.swa_layer_mask:
            _rope_swa_by_dim = {
                dd: L.rope_cache(q_pos, dd, cfg.rope_freq_base_swa)
                for dd in set(rope_arr_all)}
        else:
            _rope_swa_by_dim = _rope_by_dim
    attn_temp = None
    if cfg.attn_temp_scale > 0:
        # llama4 NoPE attention temperature (llama.cpp:5187)
        attn_temp = (jnp.log(jnp.floor((q_pos.astype(jnp.float32) + 1.0)
                                       / cfg.attn_temp_floor) + 1.0)
                     * cfg.attn_temp_scale + 1.0)
    stats = {} if collect_stats else None
    layer_hiddens = []
    # copy-free decode fast path (plain KVCache, decode/verify-sized T):
    # thread the stacked (L, B, S, Hkv, D) cache through the layers — rows
    # are written in place and the decode FA kernel indexes the layer via a
    # prefetched scalar, so no per-layer slab of the capacity-sized cache
    # is ever materialized (the slab+restack copies were the tg@4096 droop)
    fast_stack = (t <= 16 and _use_pallas() and type(kv) is KVCache
                  and block_mask is None and sp_axis is None
                  and n_valid is None and cfg.alibi_max_bias <= 0
                  and not cfg.n_head_arr and not cfg.n_head_kv_arr)
    st = (kv.k, kv.v, kv.k_scale, kv.v_scale) if fast_stack else None
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for i, blk in enumerate(params["blocks"]):
        iabs = i + layer_offset   # absolute layer index for config lookups
        x_layer_in = x    # arctic's parallel MoE branch reads the layer input
        is_swa = cfg.layer_is_swa(iabs)
        rope_arr = (cfg.extra or {}).get("rope_dim_arr")
        if rope_arr:
            # step35 per-layer rotary dims (rope_dim_per_layer,
            # llama-hparams.cpp:1587-1591). NOTE: an n_rot-dim rope has its
            # OWN frequency progression base^(-2i/n_rot) — tables are built
            # per distinct rot width, not sliced from the widest one
            dim_l = int(rope_arr[iabs])
            cos_l, sin_l = _rope_by_dim[dim_l]
            cos_swa_l, sin_swa_l = _rope_swa_by_dim[dim_l]
        else:
            cos_l, sin_l, cos_swa_l, sin_swa_l = cos, sin, cos_swa, sin_swa
        nope = (not cfg.use_rope) or \
            (cfg.no_rope_step > 0 and (iabs + 1) % cfg.no_rope_step == 0) or \
            (bool(cfg.nope_layer_mask) and cfg.nope_layer_mask[iabs])
        # deci/openelm per-layer head/ffn widths
        n_head_l = cfg.n_head_arr[iabs] if cfg.n_head_arr else cfg.n_head
        n_head_kv_l = cfg.n_head_kv_arr[iabs] if cfg.n_head_kv_arr else cfg.n_head_kv
        n_ff_l = cfg.n_ff_arr[iabs] if cfg.n_ff_arr else None
        h = _norm(x, blk.get("attn_norm"), blk.get("attn_norm_bias"), cfg) \
            if ("attn_norm" in blk or cfg.norm_type == "layer"
                or n_head_l > 0) else x
        # falcon-40B: the attention reads its own second LayerNorm while the
        # FFN reads attn_norm (build_falcon.cpp:33-38)
        h_attn = (_norm(x, blk["attn_norm_2"], blk.get("attn_norm_2_bias"), cfg)
                  if "attn_norm_2" in blk else h)
        if n_head_l == 0:
            # deci attention-free layer (build_deci.cpp:33)
            attn_out = jnp.zeros_like(x)
            k_i, v_i = kv.k[i], kv.v[i]
            ks_i = None if kv.k_scale is None else kv.k_scale[i]
            vs_i = None if kv.v_scale is None else kv.v_scale[i]
        elif n_head_kv_l == 0:
            # deci "linear attention": wo over the normed input
            attn_out = blk["wo"](h_attn, interpret=interpret)
            if tp_axis is not None:
                attn_out = jax.lax.psum(attn_out, tp_axis)
            k_i, v_i = kv.k[i], kv.v[i]
            ks_i = None if kv.k_scale is None else kv.k_scale[i]
            vs_i = None if kv.v_scale is None else kv.v_scale[i]
        else:
            chunk_l = cfg.attn_chunk if (
                cfg.attn_chunk > 0 and (not cfg.swa_layer_mask
                                        or cfg.swa_layer_mask[iabs])) else 0
            attn_out, (k_i, v_i, ks_i, vs_i) = _attn_block(
                blk, h_attn, cfg,
                None if fast_stack else kv.k[i],
                None if fast_stack else kv.v[i], n_past, q_pos,
                None if nope else (cos_swa_l if is_swa else cos_l),
                None if nope else (sin_swa_l if is_swa else sin_l), interpret,
                tp_axis=tp_axis, stats=stats, il=iabs,
                kv_ks=None if fast_stack or kv.k_scale is None
                else kv.k_scale[i],
                kv_vs=None if fast_stack or kv.v_scale is None
                else kv.v_scale[i],
                swa_window=cfg.swa_window if is_swa else 0,
                n_head=n_head_l if cfg.n_head_arr else None,
                n_head_kv=n_head_kv_l if cfg.n_head_kv_arr else None,
                attn_chunk=chunk_l,
                attn_scale_vec=attn_temp if nope else None,
                ring=kv.ring(i) if isinstance(kv, SwaKVCache) else 0,
                n_valid=n_valid, sp_axis=sp_axis, block_mask=block_mask,
                kv_stack=None if not fast_stack else (i, *st))
            if fast_stack:
                st = (k_i, v_i, ks_i, vs_i)
        if "attn_post_norm" in blk:   # gemma2/3/glm4 sandwich norm
            attn_out = L.rms_norm(attn_out, blk["attn_post_norm"], cfg.rms_eps)
        if cfg.residual_branch_scale > 0:   # minicpm scale_res on the branch
            attn_out = attn_out * cfg.residual_branch_scale
        parallel = cfg.parallel_residual or (
            cfg.arch == "stablelm" and "ffn_norm" not in blk)
        if parallel:
            # command-r/falcon/phi2: FFN reads the SAME normed input; both
            # branches add into the residual together (build_command_r.cpp).
            # gptneox use_par_res keeps a separate FFN LayerNorm over the
            # layer input (build_gptneox.cpp:75-95); stablelm layers without
            # an ffn_norm tensor fall into the shared-norm form per layer.
            if cfg.par_res_separate_norm and "ffn_norm" in blk:
                h_ffn = _norm(x, blk["ffn_norm"], blk.get("ffn_norm_bias"), cfg)
            else:
                h_ffn = h
            ff = _ffn(blk, h_ffn, cfg, interpret=interpret, stats=stats,
                      il=iabs, ep_axis=ep_axis)
            if tp_axis is not None:
                ff = jax.lax.psum(ff, tp_axis)
            if cfg.residual_branch_scale > 0:
                ff = ff * cfg.residual_branch_scale
            x = x + attn_out.astype(x.dtype) + ff.astype(x.dtype)
            if "cvec" in params:
                x = x + params["cvec"][i].astype(x.dtype)
            if return_layer_hiddens:
                layer_hiddens.append(x.astype(jnp.float32))
            new_k.append(k_i)
            new_v.append(v_i)
            new_ks.append(ks_i)
            new_vs.append(vs_i)
            continue
        x = x + attn_out.astype(x.dtype)
        if cfg.residual_scale > 0:
            # granite f_residual_scale — this fork scales the WHOLE stream
            # after the residual add (build_llama.cpp:114 on the output of
            # build_std_attention(add_input=true))
            x = (x.astype(jnp.float32) * cfg.residual_scale).astype(x.dtype)
        if n_ff_l == 0 or ("ffn_up" not in blk and "experts" not in blk):
            # deci FFN-free layer: attention residual only
            if "cvec" in params:
                x = x + params["cvec"][i].astype(x.dtype)
            if return_layer_hiddens:
                layer_hiddens.append(x.astype(jnp.float32))
            new_k.append(k_i)
            new_v.append(v_i)
            new_ks.append(ks_i)
            new_vs.append(vs_i)
            continue
        h = _norm(x, blk.get("ffn_norm"), blk.get("ffn_norm_bias"), cfg)
        if "ffn_norm_exps" in blk:
            # arctic: the sequential FFN is the DENSE one; the MoE runs in
            # parallel over the LAYER INPUT under its own RMS norm and adds
            # into the residual afterwards (build_arctic.cpp:70-98)
            ff = _ffn_dense(blk, h, cfg, interpret=interpret, stats=stats,
                            il=iabs)
        else:
            ff = _ffn(blk, h, cfg, interpret=interpret, stats=stats, il=iabs,
                      ep_axis=ep_axis)
        if tp_axis is not None:
            ff = jax.lax.psum(ff, tp_axis)
        if "ffn_post_norm" in blk:
            ff = L.rms_norm(ff, blk["ffn_post_norm"], cfg.rms_eps)
        if cfg.residual_branch_scale > 0:   # minicpm scale_res
            ff = ff * cfg.residual_branch_scale
        if cfg.moe_normed_residual and "experts" in blk:
            # build_llama MoE-branch quirk: the FFN residual is the NORMED
            # ffn input — llm_build_moe_ffn's add_input adds its own
            # (normed) argument and the raw ffn_inp add is commented out
            # (build_llama.cpp:139-164, :191); applies to mixtral /
            # granitemoe / llama4
            x = (h + ff.astype(jnp.float32)).astype(x.dtype)
        else:
            x = x + ff.astype(x.dtype)
        if "ffn_norm_exps" in blk:
            hx = L.rms_norm(x_layer_in, blk["ffn_norm_exps"], cfg.rms_eps)
            moe_y = _ffn(blk, hx, cfg, interpret=interpret, stats=stats,
                         il=iabs, ep_axis=ep_axis)
            if tp_axis is not None:
                moe_y = jax.lax.psum(moe_y, tp_axis)
            x = x + moe_y.astype(x.dtype)
        if cfg.residual_scale > 0:
            x = (x.astype(jnp.float32) * cfg.residual_scale).astype(x.dtype)
        if "cvec" in params:   # control vector (lctx.cvec.apply_to at l_out)
            x = x + params["cvec"][i].astype(x.dtype)
        if return_layer_hiddens:
            layer_hiddens.append(x.astype(jnp.float32))
        new_k.append(k_i)
        new_v.append(v_i)
        new_ks.append(ks_i)
        new_vs.append(vs_i)

    if fast_stack:
        # stacks were updated in place layer by layer — no re-assembly
        kv = KVCache(st[0], st[1], st[2], st[3])
    elif isinstance(kv, SwaKVCache):
        kv = kv.with_layers(new_k, new_v)
    elif isinstance(kv, MixedKVCache):
        kv = kv.with_layers(new_k, new_v, new_ks, new_vs)
    else:
        kv = KVCache(jnp.stack(new_k), jnp.stack(new_v),
                     None if new_ks[0] is None else jnp.stack(new_ks),
                     None if new_vs[0] is None else jnp.stack(new_vs))
    if return_layer_hiddens:
        return jnp.stack(layer_hiddens), kv
    if return_raw_stream:
        # pipeline stage output: the residual stream, pre-output-norm,
        # handed to the next stage's inputs_embeds (parallel/pp.py)
        return x.astype(jnp.float32), kv
    mtp_hidden = x    # pre-output-norm stream ("result_mtp_embd")
    x = _norm(x, params.get("output_norm"), params.get("output_norm_b"), cfg)
    if return_hidden:
        return x.astype(jnp.float32), kv
    if logits_last_only:
        x = x[:, -1:, :]
    if collect_stats:
        stats["output.weight"] = _sumsq(x)
    logits = params["output"](x, interpret=interpret).astype(jnp.float32)
    if "output_b" in params:   # phi2 lm-head bias
        logits = logits + params["output_b"]
    if tp_axis is not None:
        # vocab-sharded head -> gather full logits, drop vocab padding
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
        logits = logits[..., :cfg.n_vocab]
    if cfg.f_logit_scale > 0:
        # granite divides; command-r multiplies (build_command_r.cpp:65)
        logits = logits * cfg.f_logit_scale if cfg.logit_scale_mul \
            else logits / cfg.f_logit_scale
    if cfg.final_softcap > 0:
        logits = L.softcap(logits, cfg.final_softcap)
    if collect_stats:
        return logits, kv, stats
    if return_mtp_hidden:
        return logits, kv, mtp_hidden.astype(jnp.float32)
    return logits, kv
