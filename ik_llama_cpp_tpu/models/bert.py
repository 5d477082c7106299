"""BERT-family encoder (bert-bge / e5 / minilm embeddings) — the TPU
analogue of build_bert (src/graphs/build_bert.cpp).

Post-LN encoder: x = LN(tok + type0 + pos); per layer x = LN(x + attn(x)),
x = LN(x + gelu-FFN(x)); bidirectional (non-causal) attention; output =
final hidden states (pooling happens in the runtime). No KV cache — the
whole sequence is encoded in one pass; a dummy cache object keeps the
Runtime interface uniform.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops import layers as L
from ..ops.attention import alibi_slopes
from .config import ModelConfig
from .weights import dequant_tensor, load_dense, load_linear


@jax.tree_util.register_pytree_node_class
class NoCache:
    """Encoder models keep no state; placeholder for the Runtime interface."""

    def tree_flatten(self):
        return (), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()

    capacity = 1 << 30

    @classmethod
    def create(cls, cfg=None, batch=None, capacity=None, **_):
        return cls()


def load_bert_params(gg: GGUFModel, cfg: ModelConfig, *, use_quant: bool = True):
    """bert / nomic-bert (fused wqkv + rope, silu-par FFN, no biases) /
    jina-bert-v2 (no positions, ALiBi, gelu-par gated FFN)."""
    t = gg.tensors

    def opt_dense(name):
        return load_dense(t[name]) if name in t else None

    def opt_norm(base):
        if base + ".weight" not in t:
            return None
        return (load_dense(t[base + ".weight"]), opt_dense(base + ".bias"))

    params: dict[str, Any] = {
        "tok_embd": jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["token_embd.weight"])), jnp.bfloat16),
        "tok_norm": (load_dense(t["token_embd_norm.weight"]),
                     load_dense(t["token_embd_norm.bias"])),
    }
    if "token_types.weight" in t:
        params["type_embd"] = load_dense(t["token_types.weight"])
    if "position_embd.weight" in t:
        params["pos_embd"] = jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["position_embd.weight"])), jnp.float32)
    blocks = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        blk = {
            "wo": load_linear(t[p + "attn_output.weight"], use_quant=use_quant),
            "attn_out_norm": (load_dense(t[p + "attn_output_norm.weight"]),
                              load_dense(t[p + "attn_output_norm.bias"])),
            "ffn_up": load_linear(t[p + "ffn_up.weight"], use_quant=use_quant),
            "ffn_down": load_linear(t[p + "ffn_down.weight"], use_quant=use_quant),
            "layer_out_norm": (load_dense(t[p + "layer_output_norm.weight"]),
                               load_dense(t[p + "layer_output_norm.bias"])),
        }
        if p + "attn_qkv.weight" in t:       # nomic-bert fused QKV
            blk["wqkv"] = load_linear(t[p + "attn_qkv.weight"],
                                      use_quant=use_quant)
        else:
            blk["wq"] = load_linear(t[p + "attn_q.weight"], use_quant=use_quant)
            blk["wk"] = load_linear(t[p + "attn_k.weight"], use_quant=use_quant)
            blk["wv"] = load_linear(t[p + "attn_v.weight"], use_quant=use_quant)
            blk["bq"] = load_dense(t[p + "attn_q.bias"])
            blk["bk"] = load_dense(t[p + "attn_k.bias"])
            blk["bv"] = load_dense(t[p + "attn_v.bias"])
        for nm, key in (("attn_output.bias", "bo"), ("ffn_up.bias", "ffn_up_b"),
                        ("ffn_down.bias", "ffn_down_b")):
            if p + nm in t:
                blk[key] = load_dense(t[p + nm])
        if p + "ffn_gate.weight" in t:       # jina/nomic gated FFN
            blk["ffn_gate"] = load_linear(t[p + "ffn_gate.weight"],
                                          use_quant=use_quant)
        qn = opt_norm(p + "attn_q_norm")
        if qn is not None:
            blk["q_norm"] = qn
            blk["k_norm"] = opt_norm(p + "attn_k_norm")
        n2 = opt_norm(p + "attn_norm_2")
        if n2 is not None:
            blk["attn_norm_2"] = n2
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def forward(params, cfg: ModelConfig, tokens, cache, n_past,
            *, interpret: bool = False, logits_last_only: bool = False,
            return_hidden: bool = True, n_valid=None, **_):
    """tokens: (B, T). Returns (hidden (B, T, E) f32, cache).

    BERT has no LM head; forward always returns hidden states. ``n_valid``
    masks padded positions out of the bidirectional attention."""
    b, t = tokens.shape
    h_, d = cfg.n_head, cfg.head_dim
    eps = cfg.rms_eps

    pos = jnp.arange(t, dtype=jnp.int32)
    x = params["tok_embd"][tokens].astype(jnp.float32)
    if "type_embd" in params:
        x = x + params["type_embd"][0]
    if cfg.arch == "bert" and "pos_embd" in params:
        x = x + params["pos_embd"][pos][None, :, :]
    x = L.layer_norm(x, *params["tok_norm"], eps)
    use_rope = cfg.arch == "nomic-bert"
    cos, sin = (L.rope_cache(pos[None, :], cfg.rope_dim or d,
                             cfg.rope_freq_base)
                if use_rope else (None, None))
    slopes = (alibi_slopes(h_, cfg.alibi_max_bias)
              if cfg.alibi_max_bias > 0 else None)

    if n_valid is None:
        n_valid = jnp.int32(t)
    valid = (pos < n_valid)                                 # (T,)
    # bidirectional mask over VALID positions only
    amask = valid[None, None, None, :]                      # (1,1,1,T)

    for blk in params["blocks"]:
        if "wqkv" in blk:                                  # nomic fused QKV
            qkv = blk["wqkv"](x.astype(jnp.bfloat16), interpret=interpret)
            q = qkv[..., : h_ * d].reshape(b, t, h_, d)
            k = qkv[..., h_ * d: 2 * h_ * d].reshape(b, t, h_, d)
            v = qkv[..., 2 * h_ * d:].reshape(b, t, h_, d)
        else:
            q = (blk["wq"](x.astype(jnp.bfloat16), interpret=interpret)
                 + blk["bq"]).reshape(b, t, h_, d)
            k = (blk["wk"](x.astype(jnp.bfloat16), interpret=interpret)
                 + blk["bk"]).reshape(b, t, h_, d)
            v = (blk["wv"](x.astype(jnp.bfloat16), interpret=interpret)
                 + blk["bv"]).reshape(b, t, h_, d)
        if "q_norm" in blk:         # jina per-projection LayerNorms
            q = L.layer_norm(q.reshape(b, t, h_ * d), *blk["q_norm"], eps
                             ).reshape(b, t, h_, d)
            k = L.layer_norm(k.reshape(b, t, h_ * d), *blk["k_norm"], eps
                             ).reshape(b, t, h_, d)
        if use_rope:
            q = L.apply_rope(q, cos, sin, cfg.rope_type)
            k = L.apply_rope(k, cos, sin, cfg.rope_type)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / jnp.sqrt(float(d))
        if slopes is not None:      # jina-bert-v2 ALiBi
            dist = jnp.abs(pos[None, :, None] - pos[None, None, :]
                           ).astype(jnp.float32)
            scores = scores - (jnp.asarray(slopes, jnp.float32)
                               [None, :, None, None] * dist[:, None])
        scores = jnp.where(amask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
        attn = attn.reshape(b, t, h_ * d)
        out = blk["wo"](attn.astype(jnp.bfloat16), interpret=interpret)
        if "bo" in blk:
            out = out + blk["bo"]
        inp = x
        x = L.layer_norm(x + out.astype(jnp.float32), *blk["attn_out_norm"], eps)
        if "attn_norm_2" in blk:
            # jina-bert-v2 re-adds the LAYER INPUT after attn_out_norm
            # (build_bert.cpp:141-144)
            x = L.layer_norm(x + inp, *blk["attn_norm_2"], eps)
        ffn_inp = x
        ff = blk["ffn_up"](x.astype(jnp.bfloat16), interpret=interpret)
        if "ffn_up_b" in blk:
            ff = ff + blk["ffn_up_b"]
        if "ffn_gate" in blk:       # nomic silu-par / jina gelu-par
            gate = blk["ffn_gate"](x.astype(jnp.bfloat16), interpret=interpret)
            act = "gelu" if cfg.arch == "jina-bert-v2" else "silu"
            ff = L.glu(gate.astype(jnp.float32), ff.astype(jnp.float32), act)
        else:
            ff = L.gelu(ff.astype(jnp.float32))
        ff = blk["ffn_down"](ff.astype(jnp.bfloat16), interpret=interpret)
        if "ffn_down_b" in blk:
            ff = ff + blk["ffn_down_b"]
        x = L.layer_norm(ffn_inp + ff.astype(jnp.float32),
                         *blk["layer_out_norm"], eps)

    return x.astype(jnp.float32), cache
