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
    t = gg.tensors
    params: dict[str, Any] = {
        "tok_embd": jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["token_embd.weight"])), jnp.bfloat16),
        "type_embd": load_dense(t["token_types.weight"]),
        "pos_embd": jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["position_embd.weight"])), jnp.float32),
        "tok_norm": (load_dense(t["token_embd_norm.weight"]),
                     load_dense(t["token_embd_norm.bias"])),
    }
    blocks = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        blk = {
            "wq": load_linear(t[p + "attn_q.weight"], use_quant=use_quant),
            "wk": load_linear(t[p + "attn_k.weight"], use_quant=use_quant),
            "wv": load_linear(t[p + "attn_v.weight"], use_quant=use_quant),
            "wo": load_linear(t[p + "attn_output.weight"], use_quant=use_quant),
            "bq": load_dense(t[p + "attn_q.bias"]),
            "bk": load_dense(t[p + "attn_k.bias"]),
            "bv": load_dense(t[p + "attn_v.bias"]),
            "bo": load_dense(t[p + "attn_output.bias"]),
            "attn_out_norm": (load_dense(t[p + "attn_output_norm.weight"]),
                              load_dense(t[p + "attn_output_norm.bias"])),
            "ffn_up": load_linear(t[p + "ffn_up.weight"], use_quant=use_quant),
            "ffn_up_b": load_dense(t[p + "ffn_up.bias"]),
            "ffn_down": load_linear(t[p + "ffn_down.weight"], use_quant=use_quant),
            "ffn_down_b": load_dense(t[p + "ffn_down.bias"]),
            "layer_out_norm": (load_dense(t[p + "layer_output_norm.weight"]),
                               load_dense(t[p + "layer_output_norm.bias"])),
        }
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
    x = x + params["type_embd"][0]
    x = x + params["pos_embd"][pos][None, :, :]
    x = L.layer_norm(x, *params["tok_norm"], eps)

    if n_valid is None:
        n_valid = jnp.int32(t)
    valid = (pos < n_valid)                                 # (T,)
    # bidirectional mask over VALID positions only
    amask = valid[None, None, None, :]                      # (1,1,1,T)

    for blk in params["blocks"]:
        q = (blk["wq"](x.astype(jnp.bfloat16), interpret=interpret)
             + blk["bq"]).reshape(b, t, h_, d)
        k = (blk["wk"](x.astype(jnp.bfloat16), interpret=interpret)
             + blk["bk"]).reshape(b, t, h_, d)
        v = (blk["wv"](x.astype(jnp.bfloat16), interpret=interpret)
             + blk["bv"]).reshape(b, t, h_, d)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / jnp.sqrt(float(d))
        scores = jnp.where(amask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
        attn = attn.reshape(b, t, h_ * d)
        out = blk["wo"](attn.astype(jnp.bfloat16), interpret=interpret) + blk["bo"]
        x = L.layer_norm(x + out.astype(jnp.float32), *blk["attn_out_norm"], eps)
        ff = blk["ffn_up"](x.astype(jnp.bfloat16), interpret=interpret) + blk["ffn_up_b"]
        ff = L.gelu(ff.astype(jnp.float32))
        ff = blk["ffn_down"](ff.astype(jnp.bfloat16), interpret=interpret) + blk["ffn_down_b"]
        x = L.layer_norm(x + ff.astype(jnp.float32), *blk["layer_out_norm"], eps)

    return x.astype(jnp.float32), cache
