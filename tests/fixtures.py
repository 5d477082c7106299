"""Synthetic model fixtures: tiny llama-architecture GGUFs with random weights.

These files are valid for BOTH engines — ours and the reference llama.cpp —
which is what enables true cross-engine parity tests (greedy decode, PPL)
without downloading real checkpoints.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ik_llama_cpp_tpu.gguf.constants import GGMLType
from ik_llama_cpp_tpu.gguf.writer import GGUFWriter
from ik_llama_cpp_tpu.quant.quantize import quantize


def byte_vocab():
    """SPM-style vocab: specials + 256 byte tokens + a few common words."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]  # UNKNOWN, CONTROL, CONTROL
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(6)  # BYTE
        scores.append(0.0)
    # a few merged pieces so SPM has something to merge
    for i, w in enumerate(["▁the", "▁a", "he", "th", "▁t", "er", "in", "▁and",
                           "▁of", "▁to", "an", "on", "▁is", "es", "at", "or"]):
        tokens.append(w)
        types.append(1)  # NORMAL
        scores.append(-float(i))
    return tokens, scores, types


def make_tiny_llama_gguf(
    path: str | Path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    quant: GGMLType = GGMLType.F16,
    seed: int = 0,
    arch: str = "llama",
) -> Path:
    path = Path(path)
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-test")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.vocab_size", n_vocab)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.add("tokenizer.ggml.add_bos_token", True)
    w.add("tokenizer.ggml.add_eos_token", False)

    def randw(*shape, scale=None):
        fan_in = shape[-1]
        scale = scale or (1.0 / np.sqrt(fan_in))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr2d, ttype=quant):
        """arr2d logical (n_out, n_in); store quantized or f32/f16.

        Falls back to F16 when the row length isn't divisible by the type's
        block size (the analogue of llama-quantize's change_type_if_necessary).
        """
        from ik_llama_cpp_tpu.gguf.constants import GEOMETRY
        if ttype != GGMLType.F32 and arr2d.shape[-1] % GEOMETRY[ttype].block_elems != 0:
            ttype = GGMLType.F16
        if ttype == GGMLType.F32:
            w.add_tensor(name, arr2d.astype(np.float32))
        else:
            w.add_tensor(name, quantize(arr2d, ttype),
                         shape=tuple(reversed(arr2d.shape)), ggml_type=ttype)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
    w.write()
    return path


def make_tiny_moe_gguf(
    path: str | Path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_expert: int = 8,
    n_expert_used: int = 2,
    n_ff_exp: int = 96,
    quant: GGMLType = GGMLType.F16,
    seed: int = 0,
) -> Path:
    """Tiny qwen3moe-architecture GGUF (router + stacked expert tensors +
    qk-norms), loadable by both engines."""
    path = Path(path)
    arch = "qwen3moe"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-moe-test")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff_exp)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.vocab_size", n_vocab)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.add("tokenizer.ggml.add_bos_token", True)

    def randw(*shape, scale=None):
        fan_in = shape[-1]
        scale = scale or (1.0 / np.sqrt(fan_in))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr, ttype=quant):
        from ik_llama_cpp_tpu.gguf.constants import GEOMETRY
        if ttype != GGMLType.F32 and arr.shape[-1] % GEOMETRY[ttype].block_elems != 0:
            ttype = GGMLType.F16
        if ttype == GGMLType.F32:
            w.add_tensor(name, arr.astype(np.float32))
        else:
            w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), ttype),
                         shape=tuple(reversed(arr.shape)), ggml_type=ttype)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_q.weight", randw(n_head * head_dim, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_head * head_dim))
        w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, np.float32))
        w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, np.float32))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "ffn_gate_inp.weight", randw(n_expert, n_embd), GGMLType.F32)
        addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
    w.write()
    return path


def make_tiny_deepseek2_gguf(
    path: str | Path,
    *,
    arch: str = "deepseek2",
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    d_nope: int = 32,
    d_rope: int = 16,
    d_v: int = 32,
    q_lora: int = 24,
    kv_lora: int = 32,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_expert_shared: int = 1,
    n_ff: int = 96,
    n_ff_exp: int = 64,
    dense_lead: int = 1,
    gating: int = 2,  # sigmoid (V3-style)
    seed: int = 0,
) -> Path:
    """Tiny deepseek2-architecture GGUF: MLA (q-lora + kv-lora) attention,
    leading dense layer, sigmoid-gated MoE with selection bias + shared expert."""
    path = Path(path)
    pass  # arch from parameter
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    dk = d_nope + d_rope

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-mla-test")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.key_length", dk)
    w.add(f"{arch}.attention.value_length", d_v)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", d_rope)
    w.add(f"{arch}.attention.q_lora_rank", q_lora)
    w.add(f"{arch}.attention.kv_lora_rank", kv_lora)
    w.add(f"{arch}.leading_dense_block_count", dense_lead)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_shared_count", n_expert_shared)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.expert_weights_scale", 1.5)
    w.add(f"{arch}.expert_weights_norm", True)
    w.add(f"{arch}.expert_gating_func", gating)
    w.add(f"{arch}.vocab_size", n_vocab)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.add("tokenizer.ggml.add_bos_token", True)

    def randw(*shape, scale=None):
        fan_in = shape[-1]
        scale = scale or (1.0 / np.sqrt(fan_in))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_q_a.weight", randw(q_lora, n_embd))
        w.add_tensor(p + "attn_q_a_norm.weight", np.ones(q_lora, np.float32))
        addw(p + "attn_q_b.weight", randw(n_head * dk, q_lora))
        addw(p + "attn_kv_a_mqa.weight", randw(kv_lora + d_rope, n_embd))
        w.add_tensor(p + "attn_kv_a_norm.weight", np.ones(kv_lora, np.float32))
        addw(p + "attn_kv_b.weight", randw(n_head * (d_nope + d_v), kv_lora))
        addw(p + "attn_output.weight", randw(n_embd, n_head * d_v))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        if i < dense_lead:
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
            addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        else:
            w.add_tensor(p + "ffn_gate_inp.weight", randw(n_expert, n_embd))
            w.add_tensor(p + "exp_probs_b.bias",
                         (rng.standard_normal(n_expert) * 0.1).astype(np.float32))
            addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
            addw(p + "ffn_gate_shexp.weight", randw(n_ff_exp * n_expert_shared, n_embd))
            addw(p + "ffn_up_shexp.weight", randw(n_ff_exp * n_expert_shared, n_embd))
            addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_exp * n_expert_shared))
    w.write()
    return path


def _std_vocab_kv(w, tokens, scores, types):
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.add("tokenizer.ggml.add_bos_token", True)


def make_tiny_gemma_gguf(
    path: str | Path,
    *,
    version: int = 2,      # 2 = gemma2 (post-norms, softcaps), 3 = gemma3 (+qk-norm)
    n_layer: int = 3,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    seed: int = 0,
) -> Path:
    """Tiny gemma2/gemma3-architecture GGUF: tied embeddings, sandwich norms,
    gelu FFN, alternating SWA layers (+ per-layer rope base for gemma3)."""
    path = Path(path)
    arch = f"gemma{version}"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", f"tiny-{arch}-test")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.sliding_window", 32)
    w.add(f"{arch}.rope.freq_base", 1000000.0 if version == 3 else 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.vocab_size", n_vocab)
    if version == 2:
        w.add(f"{arch}.attn_logit_softcapping", 50.0)
        w.add(f"{arch}.final_logit_softcapping", 30.0)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr2d):
        w.add_tensor(name, quantize(arr2d, GGMLType.F16),
                     shape=tuple(reversed(arr2d.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    # gemma ties lm_head to token_embd: no output.weight tensor
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        w.add_tensor(p + "post_attention_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "post_ffw_norm.weight", np.ones(n_embd, np.float32))
        if version == 3:
            w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, np.float32))
            w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, np.float32))
        addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
    w.write()
    return path


def make_tiny_phi3_gguf(
    path: str | Path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    rope_frac: float = 0.5,     # partial rotary: n_rot = rope_frac * head_dim
    seed: int = 0,
) -> Path:
    """Tiny phi3-architecture GGUF: fused attn_qkv, fused gate+up in ffn_up,
    partial rotary dims."""
    path = Path(path)
    arch = "phi3"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    n_rot = int(head_dim * rope_frac)

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-phi3-test")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", n_rot)
    w.add(f"{arch}.attention.sliding_window", 2047)
    tokens.append("<|endoftext|>"); scores.append(0.0); types.append(3)
    n_vocab = len(tokens)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr2d):
        w.add_tensor(name, quantize(arr2d, GGMLType.F16),
                     shape=tuple(reversed(arr2d.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_qkv.weight", randw(n_embd + 2 * kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "ffn_up.weight", randw(2 * n_ff, n_embd))   # fused gate|up
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
    w.write()
    return path


def make_tiny_mamba_gguf(
    path: str | Path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    d_state: int = 16,
    d_conv: int = 4,
    seed: int = 0,
) -> Path:
    """Tiny mamba-architecture GGUF: ssm_in/conv1d/x/dt/a/d/out tensors,
    recurrent state (no KV cache)."""
    path = Path(path)
    arch = "mamba"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_inner = 2 * n_embd
    dt_rank = max(1, n_embd // 16)

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-mamba-test")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 1 << 20)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", 0)
    w.add(f"{arch}.attention.head_count", 0)
    w.add(f"{arch}.attention.head_count_kv", 0)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.ssm.conv_kernel", d_conv)
    w.add(f"{arch}.ssm.inner_size", d_inner)
    w.add(f"{arch}.ssm.state_size", d_state)
    w.add(f"{arch}.ssm.time_step_rank", dt_rank)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr2d):
        w.add_tensor(name, quantize(arr2d, GGMLType.F16),
                     shape=tuple(reversed(arr2d.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "ssm_in.weight", randw(2 * d_inner, n_embd))
        # conv kernel stored with ne = (d_conv, 1, d_inner) like the converter
        w.add_tensor(p + "ssm_conv1d.weight",
                     randw(d_inner, d_conv, scale=0.4).astype(np.float32))
        w.add_tensor(p + "ssm_conv1d.bias", randw(d_inner).astype(np.float32))
        addw(p + "ssm_x.weight", randw(dt_rank + 2 * d_state, d_inner))
        addw(p + "ssm_dt.weight", randw(d_inner, dt_rank))
        w.add_tensor(p + "ssm_dt.bias", randw(d_inner).astype(np.float32))
        # A = -exp(A_log) < 0 (decay)
        a_log = rng.standard_normal((d_inner, d_state)).astype(np.float32) * 0.3
        w.add_tensor(p + "ssm_a", (-np.exp(a_log)).astype(np.float32))
        w.add_tensor(p + "ssm_d", np.ones(d_inner, np.float32))
        addw(p + "ssm_out.weight", randw(n_embd, d_inner))
    w.write()
    return path


def make_tiny_mmproj_gguf(
    path: str | Path,
    *,
    n_embd_text: int = 64,
    n_embd: int = 32,
    n_head: int = 4,
    n_ff: int = 64,
    n_layer: int = 2,
    image_size: int = 28,
    patch_size: int = 14,
    seed: int = 0,
) -> Path:
    """Tiny CLIP mmproj GGUF (llava-style MLP projector)."""
    path = Path(path)
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, arch="clip")
    w.add("clip.has_vision_encoder", True)
    w.add("clip.projector_type", "mlp")
    w.add("clip.vision.image_size", image_size)
    w.add("clip.vision.patch_size", patch_size)
    w.add("clip.vision.embedding_length", n_embd)
    w.add("clip.vision.feed_forward_length", n_ff)
    w.add("clip.vision.block_count", n_layer)
    w.add("clip.vision.attention.head_count", n_head)
    w.add("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add("clip.vision.projection_dim", n_embd_text)
    w.add("clip.vision.image_mean", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add("clip.vision.image_std", np.asarray([0.5, 0.5, 0.5], np.float32))

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_pos = (image_size // patch_size) ** 2 + 1
    w.add_tensor("v.patch_embd.weight",
                 randw(n_embd, 3 * patch_size * patch_size).reshape(
                     n_embd, 3, patch_size, patch_size))
    w.add_tensor("v.patch_embd.bias", randw(n_embd))
    w.add_tensor("v.class_embd", randw(n_embd))
    w.add_tensor("v.position_embd.weight", randw(n_pos, n_embd))
    w.add_tensor("v.pre_ln.weight", np.ones(n_embd, np.float32))
    w.add_tensor("v.pre_ln.bias", np.zeros(n_embd, np.float32))
    w.add_tensor("v.post_ln.weight", np.ones(n_embd, np.float32))
    w.add_tensor("v.post_ln.bias", np.zeros(n_embd, np.float32))
    for i in range(n_layer):
        p = f"v.blk.{i}."
        for tn, shape in (("attn_q", (n_embd, n_embd)), ("attn_k", (n_embd, n_embd)),
                          ("attn_v", (n_embd, n_embd)), ("attn_out", (n_embd, n_embd)),
                          ("ffn_up", (n_ff, n_embd)), ("ffn_down", (n_embd, n_ff))):
            w.add_tensor(p + tn + ".weight", randw(*shape))
            w.add_tensor(p + tn + ".bias", np.zeros(shape[0], np.float32))
        for ln in ("ln1", "ln2"):
            w.add_tensor(p + ln + ".weight", np.ones(n_embd, np.float32))
            w.add_tensor(p + ln + ".bias", np.zeros(n_embd, np.float32))
    w.add_tensor("mm.0.weight", randw(n_embd_text, n_embd))
    w.add_tensor("mm.0.bias", np.zeros(n_embd_text, np.float32))
    w.add_tensor("mm.2.weight", randw(n_embd_text, n_embd_text))
    w.add_tensor("mm.2.bias", np.zeros(n_embd_text, np.float32))
    w.write()
    return path


def make_tiny_gptoss_gguf(
    path: str | Path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 96,
    quant: GGMLType = GGMLType.F16,
    seed: int = 0,
) -> Path:
    """Tiny gpt-oss-architecture GGUF: attention sinks + qkv/output biases,
    biased router, per-expert biases, swiglu_oai MoE, alternating SWA."""
    path = Path(path)
    arch = "gpt-oss"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-gptoss-test")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff_exp)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.sliding_window", 32)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        from ik_llama_cpp_tpu.gguf.constants import GEOMETRY
        t = quant
        if t != GGMLType.F32 and arr.shape[-1] % GEOMETRY[t].block_elems != 0:
            t = GGMLType.F16
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), t),
                     shape=tuple(reversed(arr.shape)), ggml_type=t)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        w.add_tensor(p + "attn_q.bias", randw(n_embd) * 0.1)
        w.add_tensor(p + "attn_k.bias", randw(kv_dim) * 0.1)
        w.add_tensor(p + "attn_v.bias", randw(kv_dim) * 0.1)
        w.add_tensor(p + "attn_output.bias", randw(n_embd) * 0.1)
        w.add_tensor(p + "attn_sinks.weight", randw(n_head))
        w.add_tensor(p + "post_attention_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ffn_gate_inp.weight", randw(n_expert, n_embd))
        w.add_tensor(p + "ffn_gate_inp.bias", randw(n_expert) * 0.1)
        addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
        w.add_tensor(p + "ffn_gate_exps.bias", randw(n_expert, n_ff_exp) * 0.1)
        w.add_tensor(p + "ffn_up_exps.bias", randw(n_expert, n_ff_exp) * 0.1)
        w.add_tensor(p + "ffn_down_exps.bias", randw(n_expert, n_embd) * 0.1)
    w.write()
    return path


def make_tiny_llamalike_gguf(path, *, arch: str, extra_kv=None, seed=0,
                             n_layer=2, n_embd=64, n_head=4, n_head_kv=2,
                             n_ff=128, ffn_norm=True, eps_key="rms",
                             tied=False, attn_bias=False, qk_norm=False):
    """Generic llama-structured fixture with an arbitrary arch name +
    extra metadata (granite, smollm3, ...)."""
    path = Path(path)
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    w = GGUFWriter(path, arch=arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    if eps_key == "rms":
        w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    else:
        w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.vocab_size", n_vocab)
    for k, v in (extra_kv or {}).items():
        w.add(k, v)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr2d):
        w.add_tensor(name, quantize(arr2d, GGMLType.F16),
                     shape=tuple(reversed(arr2d.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    if not tied:
        addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        if qk_norm:       # qwen3-style per-head q/k RMS norms
            w.add_tensor(p + "attn_q_norm.weight",
                         (1.0 + 0.1 * rng.standard_normal(head_dim)).astype(np.float32))
            w.add_tensor(p + "attn_k_norm.weight",
                         (1.0 + 0.1 * rng.standard_normal(head_dim)).astype(np.float32))
        if attn_bias:     # qwen2/qwen2vl-style q/k/v biases
            w.add_tensor(p + "attn_q.bias", randw(n_embd) * 0.5)
            w.add_tensor(p + "attn_k.bias", randw(kv_dim) * 0.5)
            w.add_tensor(p + "attn_v.bias", randw(kv_dim) * 0.5)
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        if ffn_norm:
            w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
    w.write()
    return path


def make_tiny_starcoder2_gguf(path, *, seed=0, n_layer=2, n_embd=64,
                              n_head=4, n_head_kv=2, n_ff=128):
    """starcoder2: LayerNorm (weight+bias), biased attn/ffn, no-gate GELU FFN."""
    path = Path(path)
    arch = "starcoder2"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-starcoder2")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr2d):
        w.add_tensor(name, quantize(arr2d, GGMLType.F16),
                     shape=tuple(reversed(arr2d.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("output_norm.bias", np.zeros(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "attn_norm.bias", randw(n_embd) * 0.02)
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        w.add_tensor(p + "attn_q.bias", randw(n_embd) * 0.05)
        w.add_tensor(p + "attn_k.bias", randw(kv_dim) * 0.05)
        w.add_tensor(p + "attn_v.bias", randw(kv_dim) * 0.05)
        w.add_tensor(p + "attn_output.bias", randw(n_embd) * 0.05)
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ffn_norm.bias", randw(n_embd) * 0.02)
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        w.add_tensor(p + "ffn_up.bias", randw(n_ff) * 0.05)
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        w.add_tensor(p + "ffn_down.bias", randw(n_embd) * 0.05)
    w.write()
    return path


def make_tiny_qwen2moe_gguf(
    path: str | Path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 48,
    n_ff_shexp: int = 96,
    seed: int = 0,
) -> Path:
    """Tiny qwen2moe GGUF: attn biases, softmax router (norm off), gated
    shared expert (ffn_gate_inp_shexp sigmoid gate)."""
    path = Path(path)
    arch = "qwen2moe"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-qwen2moe-test")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff_exp)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        w.add_tensor(p + "attn_q.bias", randw(n_embd) * 0.1)
        w.add_tensor(p + "attn_k.bias", randw(kv_dim) * 0.1)
        w.add_tensor(p + "attn_v.bias", randw(kv_dim) * 0.1)
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ffn_gate_inp.weight", randw(n_expert, n_embd))
        addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
        addw(p + "ffn_gate_shexp.weight", randw(n_ff_shexp, n_embd))
        addw(p + "ffn_up_shexp.weight", randw(n_ff_shexp, n_embd))
        addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_shexp))
        w.add_tensor(p + "ffn_gate_inp_shexp.weight", randw(1, n_embd))
    w.write()
    return path


def make_tiny_bert_gguf(
    path: str | Path,
    *,
    n_layer: int = 2,
    n_embd: int = 64,
    n_head: int = 4,
    n_ff: int = 128,
    n_ctx: int = 128,
    seed: int = 0,
    variant: str = "bert",
) -> Path:
    """Tiny bert-family GGUF (WPM vocab, post-LN encoder).

    variant: "bert" (abs pos + biased attn + gelu-seq FFN),
    "nomic-bert" (fused wqkv + rope, silu-par FFN, no biases),
    "jina-bert-v2" (no positions, ALiBi, q/k LNs, attn_norm_2,
    gelu-par FFN with down bias) — create_bert_tensors /
    create_jina_bert2_tensors, llama-load-tensors.cpp:919-1018."""
    path = Path(path)
    arch = variant
    rng = np.random.default_rng(seed)
    # minimal WPM vocab: specials + ascii word pieces
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    types = [3, 2, 3, 3, 3]
    import string
    for c in string.ascii_lowercase:
        tokens.append("▁" + c)
        types.append(1)
    for c in string.ascii_lowercase:
        tokens.append(c)
        types.append(1)
    for wrd in ["▁the", "▁hello", "▁world", "ing", "ed"]:
        tokens.append(wrd)
        types.append(1)
    n_vocab = len(tokens)

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", n_ctx)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-12)
    w.add(f"{arch}.attention.causal", False)
    w.add(f"{arch}.vocab_size", n_vocab)
    if variant == "nomic-bert":
        w.add(f"{arch}.rope.freq_base", 1000.0)
    if variant != "bert":
        w.add(f"{arch}.pooling_type", 1)  # required key for nomic/jina
    w.add("tokenizer.ggml.token_type_count", 2)
    w.add("tokenizer.ggml.model", "bert")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.zeros(n_vocab, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.unknown_token_id", 1)
    w.add("tokenizer.ggml.cls_token_id", 2)
    w.add("tokenizer.ggml.seperator_token_id", 3)
    # override WPM defaults (bos=101/sep=102/mask=103/unk=100,
    # llama-vocab.cpp:1794-1799) that lie outside this tiny vocab
    w.add("tokenizer.ggml.bos_token_id", 2)
    w.add("tokenizer.ggml.padding_token_id", 0)
    w.add("tokenizer.ggml.mask_token_id", 4)
    w.add("tokenizer.ggml.add_bos_token", False)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr2d):
        w.add_tensor(name, quantize(arr2d, GGMLType.F16),
                     shape=tuple(reversed(arr2d.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("token_types.weight", randw(2, n_embd).astype(np.float32))
    if variant == "bert":
        w.add_tensor("position_embd.weight",
                     randw(n_ctx, n_embd).astype(np.float32))
    w.add_tensor("token_embd_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("token_embd_norm.bias", np.zeros(n_embd, np.float32))

    def randn(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    for i in range(n_layer):
        p = f"blk.{i}."
        if variant == "nomic-bert":
            addw(p + "attn_qkv.weight", randw(3 * n_embd, n_embd))
            addw(p + "attn_output.weight", randw(n_embd, n_embd))
        else:
            for tn in ("attn_q", "attn_k", "attn_v", "attn_output"):
                addw(p + tn + ".weight", randw(n_embd, n_embd))
                w.add_tensor(p + tn + ".bias", randw(n_embd) * 0.02)
        if variant == "bert":
            for tn, shp in (("ffn_up", (n_ff, n_embd)),
                            ("ffn_down", (n_embd, n_ff))):
                addw(p + tn + ".weight", randw(*shp))
                w.add_tensor(p + tn + ".bias", randw(shp[0]) * 0.02)
        else:
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(p + "ffn_down.weight", randw(n_embd, n_ff))
            if variant == "jina-bert-v2":
                w.add_tensor(p + "ffn_down.bias", randw(n_embd) * 0.02)
        if variant == "jina-bert-v2":
            for nn in ("attn_q_norm", "attn_k_norm", "attn_norm_2"):
                w.add_tensor(p + nn + ".weight", randn(n_embd))
                w.add_tensor(p + nn + ".bias", randw(n_embd) * 0.02)
        for nn in ("attn_output_norm", "layer_output_norm"):
            w.add_tensor(p + nn + ".weight", randn(n_embd))
            w.add_tensor(p + nn + ".bias", randw(n_embd) * 0.02)
    w.write()
    return path


def make_tiny_qwen3next_gguf(
    path: str | Path,
    *,
    n_layer: int = 4,          # layers 0-2 recurrent, layer 3 full attention
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    head_k_dim: int = 64,      # ssm_d_state (64: the reference's fused
                               # delta-net kernel only supports head dims
                               # 64/128; its generic fallback for other dims
                               # misreads the permuted v/g/beta layouts)
    num_k_heads: int = 2,      # ssm_n_group
    num_v_heads: int = 4,      # ssm_dt_rank
    head_v_dim: int = 64,      # -> ssm_d_inner = 256
    d_conv: int = 4,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 48,
    n_ff_shexp: int = 64,
    seed: int = 0,
) -> Path:
    """Tiny qwen3next GGUF: 3:1 delta-net/attention hybrid + MoE + shared
    expert + gated attention q."""
    path = Path(path)
    arch = "qwen3next"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    ssm_d_inner = head_v_dim * num_v_heads
    key_dim = head_k_dim * num_k_heads
    value_dim = ssm_d_inner
    r = num_v_heads // num_k_heads
    qkvz_dim = key_dim * 2 + value_dim * 2
    conv_dim = key_dim * 2 + value_dim
    ba_dim = num_v_heads * 2

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-qwen3next")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff_exp)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim // 2)
    w.add(f"{arch}.ssm.conv_kernel", d_conv)
    w.add(f"{arch}.ssm.inner_size", ssm_d_inner)
    w.add(f"{arch}.ssm.state_size", head_k_dim)
    w.add(f"{arch}.ssm.time_step_rank", num_v_heads)
    w.add(f"{arch}.ssm.group_count", num_k_heads)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "post_attention_norm.weight",
                     np.ones(n_embd, np.float32))
        if (i + 1) % 4 != 0:     # recurrent
            addw(p + "ssm_in.weight", randw(qkvz_dim, n_embd))
            # conv kernel ne = (d_conv, conv_dim)
            w.add_tensor(p + "ssm_conv1d.weight",
                         randw(conv_dim, d_conv, scale=0.4))
            w.add_tensor(p + "ssm_dt.bias", randw(num_v_heads))
            w.add_tensor(p + "ssm_a",
                         (-np.abs(rng.standard_normal(num_v_heads)) * 0.5
                          ).astype(np.float32))
            addw(p + "ssm_ba.weight", randw(ba_dim, n_embd))
            w.add_tensor(p + "ssm_norm.weight", np.ones(head_v_dim, np.float32))
            addw(p + "ssm_out.weight", randw(n_embd, value_dim))
        else:                    # full attention with gated q
            addw(p + "attn_q.weight", randw(n_head * head_dim * 2, n_embd))
            addw(p + "attn_k.weight", randw(kv_dim, n_embd))
            addw(p + "attn_v.weight", randw(kv_dim, n_embd))
            addw(p + "attn_output.weight", randw(n_embd, n_head * head_dim))
            w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, np.float32))
            w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, np.float32))
        w.add_tensor(p + "ffn_gate_inp.weight", randw(n_expert, n_embd))
        addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
        w.add_tensor(p + "ffn_gate_inp_shexp.weight", randw(1, n_embd))
        addw(p + "ffn_gate_shexp.weight", randw(n_ff_shexp, n_embd))
        addw(p + "ffn_up_shexp.weight", randw(n_ff_shexp, n_embd))
        addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_shexp))
    w.write()
    return path


# ---------------------------------------------------------------- classic archs
# per-arch tensor templates mirroring create_tensors_helper (llama-load-
# tensors.cpp): which tensors exist, which carry biases, fused-vs-split qkv
_CLASSIC = {
    #            norm_b qkv    qkv_b attn_b ffn_b ffn_norm gate  pos  tok_n eps
    "gpt2":      dict(norm_b=True, fused=True, qkv_b=True, attn_b=True,
                      ffn_b=True, gate=False, pos=True, eps="layer"),
    "gptneox":   dict(norm_b=True, fused=True, qkv_b=True, attn_b=True,
                      ffn_b=True, gate=False, eps="layer"),
    "falcon":    dict(norm_b=True, fused=True, qkv_b=False, attn_b=False,
                      ffn_b=False, gate=False, ffn_norm=False, eps="layer"),
    "mpt":       dict(norm_b=True, fused=True, qkv_b=True, attn_b=True,
                      ffn_b=True, gate=False, eps="layer"),
    "bloom":     dict(norm_b=True, fused=True, qkv_b=True, attn_b=True,
                      ffn_b=True, gate=False, tok_norm=True, eps="layer"),
    "starcoder": dict(norm_b=True, fused=True, qkv_b=True, attn_b=True,
                      ffn_b=True, gate=False, pos=True, eps="layer"),
    "phi2":      dict(norm_b=True, fused=True, qkv_b=True, attn_b=True,
                      ffn_b=True, gate=False, ffn_norm=False, out_b=True,
                      eps="layer"),
    "stablelm":  dict(norm_b=True, fused=False, qkv_b=False, attn_b=False,
                      ffn_b=False, gate=True, eps="layer"),
    "jais":      dict(norm_b=True, fused=True, qkv_b=True, attn_b=True,
                      ffn_b=True, gate=True, gate_b=True, eps="layer"),
    "olmo":      dict(norm_b=False, fused=False, qkv_b=False, attn_b=False,
                      ffn_b=False, gate=True, no_norms=True, eps="layer"),
    "baichuan":  dict(norm_b=False, fused=False, qkv_b=False, attn_b=False,
                      ffn_b=False, gate=True, eps="rms"),
    "orion":     dict(norm_b=True, fused=False, qkv_b=False, attn_b=False,
                      ffn_b=False, gate=True, out_norm_b=True, eps="layer"),
    "xverse":    dict(norm_b=False, fused=False, qkv_b=False, attn_b=False,
                      ffn_b=False, gate=True, eps="rms"),
    "qwen":      dict(norm_b=False, fused=True, qkv_b=True, attn_b=False,
                      ffn_b=False, gate=True, eps="rms"),
    "codeshell": dict(norm_b=True, fused=True, qkv_b=True, attn_b=True,
                      ffn_b=True, gate=False, eps="layer"),
    "chatglm":   dict(norm_b=False, fused=True, qkv_b=True, attn_b=False,
                      ffn_b=False, gate=False, swiglu=True, eps="rms"),
    # glm4's tensor-name table has no attn_qkv entry — GGUFs carry separate
    # q/k/v (create_glm4_tensors' wqkv branch is only for runtime merge_qkv)
    "glm4":      dict(norm_b=False, fused=False, qkv_b=False, attn_b=False,
                      ffn_b=False, gate=False, swiglu=True, sandwich=True,
                      eps="rms"),
}


def make_tiny_classic_gguf(path, *, arch: str, seed=0, n_layer=2, n_embd=64,
                           n_head=4, n_head_kv=None, n_ff=128, rope_dim=None,
                           extra_kv=None, tied=False, overrides=None):
    """Classic-family fixture (gpt2/gptneox/falcon/mpt/bloom/starcoder/phi2/
    stablelm/jais/olmo/baichuan/orion/xverse/qwen/codeshell/chatglm/glm4),
    emitting exactly the tensor set create_tensors_helper requires per arch.
    ``overrides`` merges into the per-arch template (e.g. stablelm-12B
    parallel form: {"ffn_norm": False, "qk_norm": True})."""
    t = dict(_CLASSIC[arch])
    t.update(overrides or {})
    path = Path(path)
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    if n_head_kv is None:
        n_head_kv = n_head
    head_dim = n_embd // n_head
    kv_dim = n_head_kv * head_dim
    w = GGUFWriter(path, arch=arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 128)
    w.add(f"{arch}.embedding_length", n_embd)
    # qwen stores DOUBLE the actual FFN width (create_qwen_tensors n_ff/2)
    w.add(f"{arch}.feed_forward_length", 2 * n_ff if arch == "qwen" else n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    if t["eps"] == "rms":
        w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    else:
        w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", rope_dim or head_dim)
    w.add(f"{arch}.vocab_size", n_vocab)
    for k, v in (extra_kv or {}).items():
        w.add(k, v)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr2d):
        w.add_tensor(name, quantize(arr2d, GGMLType.F16),
                     shape=tuple(reversed(arr2d.shape)), ggml_type=GGMLType.F16)

    def norm(name, bias):
        w.add_tensor(name + ".weight",
                     (1.0 + 0.1 * rng.standard_normal(n_embd)).astype(np.float32))
        if bias:
            w.add_tensor(name + ".bias",
                         (0.1 * rng.standard_normal(n_embd)).astype(np.float32))

    def vec(name, n):
        w.add_tensor(name, (0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    if t.get("pos"):
        addw("position_embd.weight", randw(128, n_embd, scale=0.1))
    if t.get("tok_norm"):
        norm("token_embd_norm", True)
    if not t.get("no_norms"):
        norm("output_norm", t.get("out_norm_b", t["norm_b"]))
    if not tied:
        addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
        if t.get("out_b"):
            vec("output.bias", n_vocab)
    qkv_dim = n_embd + 2 * kv_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        if not t.get("no_norms"):
            norm(p + "attn_norm", t["norm_b"])
        if t["fused"]:
            addw(p + "attn_qkv.weight", randw(qkv_dim, n_embd))
            if t["qkv_b"]:
                vec(p + "attn_qkv.bias", qkv_dim)
        else:
            addw(p + "attn_q.weight", randw(n_embd, n_embd))
            addw(p + "attn_k.weight", randw(kv_dim, n_embd))
            addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        if t["attn_b"]:
            vec(p + "attn_output.bias", n_embd)
        if t.get("qk_norm"):   # stablelm-12B per-head LN (d, h) ne-order
            w.add_tensor(p + "attn_q_norm.weight",
                         (1.0 + 0.1 * rng.standard_normal(
                             (n_head, head_dim))).astype(np.float32))
            w.add_tensor(p + "attn_k_norm.weight",
                         (1.0 + 0.1 * rng.standard_normal(
                             (n_head_kv, head_dim))).astype(np.float32))
        if t.get("ffn_norm", True) and not t.get("no_norms"):
            norm(p + "ffn_norm", t["norm_b"])
        if t.get("swiglu"):
            addw(p + "ffn_up.weight", randw(2 * n_ff, n_embd))
        else:
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        if t["gate"] and not t.get("swiglu"):
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        if t["ffn_b"]:
            vec(p + "ffn_up.bias", n_ff)
            vec(p + "ffn_down.bias", n_embd)
            if t.get("gate_b"):
                vec(p + "ffn_gate.bias", n_ff)
        if t.get("sandwich"):
            norm(p + "post_attention_norm", False)
            norm(p + "post_ffw_norm", False)
    w.write()
    return path


# ------------------------------------------------------------- modern MoE archs
# per-arch templates mirroring create_tensors_helper for the modern MoE /
# scaled families (hunyuan-moe, dots1, minimax-m2/m3, mimo2, cohere2_moe,
# ernie4_5-moe, arctic, dbrx, grok)
_MOE2 = {
    # hunyuan sizes its expert tensors with n_ff, not n_ff_exp
    # (create_hunyuan_tensors:3970 create_std_ffn_exps(..., n_ff))
    "hunyuan-moe": dict(qk_norm="head", shexp=True, exps_n_ff=True),
    "dots1":       dict(qk_norm="head", shexp="exp_width", probs_b=True,
                        dense_lead=1),
    "minimax-m3":  dict(qk_norm="head", shexp="exp_width", probs_b=True,
                        dense_lead=1),
    "minimax-m2":  dict(qk_norm="full", probs_b=True, exps_n_ff=True),
    "mimo2":       dict(probs_b=True, dense_lead=1),
    "cohere2_moe": dict(no_ffn_norm=True),
    # creator requires MoE tensors on ALL i >= dense_lead, so only
    # moe_step=1 is self-consistent in the reference (llama-load-
    # tensors.cpp:3924 vs build_ernie45.cpp:149)
    "ernie4_5-moe": dict(shexp=True, probs_b=True, dense_lead=1,
                         moe_step=1),
    "arctic":      dict(dense_all=True, norm_exps=True, exps_n_ff=True),
    "dbrx":        dict(fused=True, ffn_as_out_norm=True),
    "grok":        dict(dense_all=True, grok_sandwich=True),
    "mellum":      dict(qk_norm="head"),
    # glm4moe (GLM-4.5): qk norms + router bias + leading dense + shared
    # expert; also the host of the trailing nextn/MTP layer (nextn=1)
    "glm4moe":     dict(qk_norm="head", probs_b=True, dense_lead=1,
                        shexp=True),
    # granitemoe: plain llama attention + MoE everywhere + granite scalars
    # (passed via extra_kv)
    "granitemoe":  dict(exps_n_ff=True),
    # mixtral: LLM_ARCH_LLAMA with expert tensors
    "llama":       dict(exps_n_ff=True),
    # bailingmoe2: fused unbiased qkv + per-head qk norms + dense lead +
    # shexp sized (n_ff_shexp or n_ff_exp) * n_expert_shared
    "bailingmoe2": dict(fused=True, qk_norm="head", shexp=True,
                        probs_b=True, dense_lead=1),
}


def make_tiny_moe2_gguf(path, *, arch: str, seed=0, n_layer=3, n_embd=64,
                        n_head=4, n_head_kv=2, n_ff=96, n_ff_exp=48,
                        n_expert=4, n_expert_used=2, n_ff_shexp=32,
                        extra_kv=None, nextn=0):
    """Modern-MoE fixture emitting the tensor set create_tensors_helper
    requires per arch (see _MOE2)."""
    t = dict(_MOE2[arch])
    path = Path(path)
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kv_dim = n_head_kv * head_dim
    w = GGUFWriter(path, arch=arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.block_count", n_layer + nextn)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    if nextn:
        w.add(f"{arch}.nextn_predict_layers", nextn)
    if t.get("shexp"):
        w.add(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
        w.add(f"{arch}.expert_shared_count", 1)
    if t.get("dense_lead"):
        w.add(f"{arch}.leading_dense_block_count", t["dense_lead"])
    if t.get("moe_step"):
        w.add(f"{arch}.interleave_moe_layer_step", t["moe_step"])
    w.add(f"{arch}.vocab_size", n_vocab)
    for k, v in (extra_kv or {}).items():
        w.add(k, v)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    ones("output_norm.weight", n_embd)
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))

    lead = t.get("dense_lead", 0)
    step = t.get("moe_step", 1)
    for i in range(n_layer + nextn):
        p = f"blk.{i}."
        ones(p + "attn_norm.weight", n_embd)
        if t.get("fused"):
            addw(p + "attn_qkv.weight", randw(n_embd + 2 * kv_dim, n_embd))
        else:
            addw(p + "attn_q.weight", randw(n_embd, n_embd))
            addw(p + "attn_k.weight", randw(kv_dim, n_embd))
            addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        if t.get("qk_norm") == "head":
            ones(p + "attn_q_norm.weight", head_dim)
            ones(p + "attn_k_norm.weight", head_dim)
        elif t.get("qk_norm") == "full":
            ones(p + "attn_q_norm.weight", n_embd)
            ones(p + "attn_k_norm.weight", kv_dim)
        if t.get("grok_sandwich"):
            ones(p + "attn_output_norm.weight", n_embd)
            ones(p + "layer_output_norm.weight", n_embd)
        if t.get("ffn_as_out_norm"):
            ones(p + "attn_output_norm.weight", n_embd)
        elif not t.get("no_ffn_norm"):
            ones(p + "ffn_norm.weight", n_embd)
        is_moe = i >= lead and (i + 1) % step == 0
        if t.get("dense_all") or not is_moe:
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
            addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        if is_moe:
            # sharp router (3x scale): top-k margins large enough that bf16
            # noise in the hidden state cannot flip expert selection, which
            # would discretely change outputs and break cross-engine parity
            addw(p + "ffn_gate_inp.weight",
                 randw(n_expert, n_embd, scale=3.0 / np.sqrt(n_embd)))
            if t.get("probs_b"):
                w.add_tensor(p + "exp_probs_b.bias",
                             (0.2 * rng.standard_normal(n_expert)).astype(np.float32))
            if t.get("norm_exps"):
                ones(p + "ffn_norm_exps.weight", n_embd)
            fexp = n_ff if t.get("exps_n_ff") else n_ff_exp
            addw(p + "ffn_gate_exps.weight", randw(n_expert, fexp, n_embd))
            addw(p + "ffn_up_exps.weight", randw(n_expert, fexp, n_embd))
            addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, fexp))
            if t.get("shexp"):
                # dots1 sizes its shared expert at n_ff_exp * n_expert_shared
                # (create_dots1_tensors:3820)
                sw = n_ff_exp if t["shexp"] == "exp_width" else n_ff_shexp
                addw(p + "ffn_gate_shexp.weight", randw(sw, n_embd))
                addw(p + "ffn_up_shexp.weight", randw(sw, n_embd))
                addw(p + "ffn_down_shexp.weight", randw(n_embd, sw))
        if i >= n_layer:
            # trailing NextN/MTP layer glue (create tensors:
            # llama-load-tensors.cpp:1291)
            addw(p + "nextn.eh_proj.weight", randw(n_embd, 2 * n_embd))
            ones(p + "nextn.enorm.weight", n_embd)
            ones(p + "nextn.hnorm.weight", n_embd)
            ones(p + "nextn.shared_head_norm.weight", n_embd)
    w.write()
    return path


def make_tiny_deci_gguf(path, *, seed=0, n_embd=64, n_ff=96):
    """deci (Nemotron): per-layer head counts — layer0 normal GQA, layer1
    attention-free (n_head=0), layer2 'linear attention' (n_head_kv=0,
    wo-only) per build_deci.cpp / create_deci_tensors."""
    path = Path(path)
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = 16
    heads = [4, 0, 4]
    heads_kv = [2, 0, 0]
    w = GGUFWriter(path, arch="deci")
    w.add("deci.block_count", 3)
    w.add("deci.context_length", 256)
    w.add("deci.embedding_length", n_embd)
    w.add("deci.feed_forward_length", [n_ff, n_ff, n_ff])
    w.add("deci.attention.head_count", heads)
    w.add("deci.attention.head_count_kv", heads_kv)
    w.add("deci.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("deci.rope.freq_base", 10000.0)
    w.add("deci.rope.dimension_count", head_dim)
    w.add("deci.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd))
    ones("output_norm.weight", n_embd)
    addw("output.weight", randw(n_vocab, n_embd))
    for i in range(3):
        p = f"blk.{i}."
        h, hkv = heads[i], heads_kv[i]
        if hkv == 0 and h > 0:     # linear attention: wo only
            ones(p + "attn_norm.weight", n_embd)
            addw(p + "attn_output.weight", randw(n_embd, n_embd))
        elif hkv > 0:
            ones(p + "attn_norm.weight", n_embd)
            addw(p + "attn_q.weight", randw(h * head_dim, n_embd))
            addw(p + "attn_k.weight", randw(hkv * head_dim, n_embd))
            addw(p + "attn_v.weight", randw(hkv * head_dim, n_embd))
            addw(p + "attn_output.weight", randw(n_embd, h * head_dim))
        ones(p + "ffn_norm.weight", n_embd)
        addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
    w.write()
    return path


def make_tiny_openelm_gguf(path, *, seed=0, n_embd=64):
    """openelm: per-layer head counts + per-layer FFN widths + per-head
    qk RMS norms on a fused unbiased qkv (build_openelm.cpp)."""
    path = Path(path)
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = 16
    heads = [4, 2, 4]
    heads_kv = [2, 1, 2]
    ffs = [96, 64, 96]
    w = GGUFWriter(path, arch="openelm")
    w.add("openelm.block_count", 3)
    w.add("openelm.context_length", 256)
    w.add("openelm.embedding_length", n_embd)
    w.add("openelm.feed_forward_length", ffs)
    w.add("openelm.attention.head_count", heads)
    w.add("openelm.attention.head_count_kv", heads_kv)
    w.add("openelm.attention.key_length", head_dim)
    w.add("openelm.attention.value_length", head_dim)
    w.add("openelm.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("openelm.rope.freq_base", 10000.0)
    w.add("openelm.rope.dimension_count", head_dim)
    w.add("openelm.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd))
    ones("output_norm.weight", n_embd)
    for i in range(3):
        p = f"blk.{i}."
        h, hkv, ff = heads[i], heads_kv[i], ffs[i]
        ones(p + "attn_norm.weight", n_embd)
        addw(p + "attn_qkv.weight", randw((h + 2 * hkv) * head_dim, n_embd))
        ones(p + "attn_q_norm.weight", head_dim)
        ones(p + "attn_k_norm.weight", head_dim)
        addw(p + "attn_output.weight", randw(n_embd, h * head_dim))
        ones(p + "ffn_norm.weight", n_embd)
        addw(p + "ffn_gate.weight", randw(ff, n_embd))
        addw(p + "ffn_up.weight", randw(ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, ff))
    w.write()
    return path


def ugm_vocab():
    """Tiny unigram (UGM/T5) vocab: specials + word pieces + single-char
    fallback pieces, scores = log-probs (words preferred over chars)."""
    tokens = ["<pad>", "</s>", "<unk>"]
    types = [3, 3, 2]                 # CONTROL, CONTROL, UNKNOWN
    scores = [0.0, 0.0, 0.0]
    words = ["▁Hello", "▁world", "▁this", "▁is",
             "▁a", "▁test", "▁the", "▁of", "ing",
             "ed", "er", "▁qu", "ick", "▁brown", "▁fox"]
    for wd in words:
        tokens.append(wd)
        types.append(1)
        scores.append(-4.0 - 0.1 * (len(tokens) % 7))
    import string
    for ch in string.ascii_letters + string.digits + ".,!?'-:;":
        tokens.append(ch)
        types.append(1)
        scores.append(-10.0 - 0.01 * ord(ch) % 3)
    tokens.append("▁")
    types.append(1)
    scores.append(-9.0)
    return tokens, scores, types


def make_tiny_t5_gguf(path, *, seed=0, n_layer=2, n_embd=64, n_head=4,
                      n_ff=96, n_buckets=8, gated=False):
    """Tiny T5 GGUF: UGM vocab + enc/dec stacks with relative-bucket
    attention bias (create_t5_tensors; build_t5.cpp)."""
    path = Path(path)
    rng = np.random.default_rng(seed)
    tokens, scores, types = ugm_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    w = GGUFWriter(path, arch="t5")
    w.add("t5.block_count", n_layer)
    w.add("t5.context_length", 256)
    w.add("t5.embedding_length", n_embd)
    w.add("t5.feed_forward_length", n_ff)
    w.add("t5.attention.head_count", n_head)
    w.add("t5.attention.head_count_kv", n_head)
    w.add("t5.attention.key_length", head_dim)
    w.add("t5.attention.value_length", head_dim)
    w.add("t5.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("t5.attention.relative_buckets_count", n_buckets)
    w.add("t5.decoder_start_token_id", 0)
    w.add("t5.vocab_size", n_vocab)
    w.add("tokenizer.ggml.model", "t5")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.eos_token_id", 1)
    w.add("tokenizer.ggml.unknown_token_id", 2)
    w.add("tokenizer.ggml.padding_token_id", 0)
    w.add("tokenizer.ggml.add_eos_token", True)

    def randw(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd))
    ones("enc.output_norm.weight", n_embd)
    ones("dec.output_norm.weight", n_embd)
    qk = n_head * head_dim
    for i in range(n_layer):
        # the reference fork's build_t5_encoder reads the DECODER's wq/wk/wv
        # (model.layers[il].wq) instead of wq_enc — a fork bug vs upstream.
        # Write identical q/k/v weights into both stacks so cross-engine
        # parity is meaningful while our implementation keeps the correct
        # enc.* tensors.
        qkv_shared = [randw(qk, n_embd) for _ in range(3)]
        for pre, cross in ((f"enc.blk.{i}.", False), (f"dec.blk.{i}.", True)):
            ones(pre + "attn_norm.weight", n_embd)
            if i == 0:
                w.add_tensor(pre + "attn_rel_b.weight",
                             (0.5 * rng.standard_normal(
                                 (n_buckets, n_head))).astype(np.float32))
            addw(pre + "attn_q.weight", qkv_shared[0])
            addw(pre + "attn_k.weight", qkv_shared[1])
            addw(pre + "attn_v.weight", qkv_shared[2])
            addw(pre + "attn_o.weight", randw(n_embd, qk))
            ones(pre + "ffn_norm.weight", n_embd)
            if gated:
                addw(pre + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(pre + "ffn_up.weight", randw(n_ff, n_embd))
            addw(pre + "ffn_down.weight", randw(n_embd, n_ff))
            if cross:
                ones(pre + "cross_attn_norm.weight", n_embd)
                addw(pre + "cross_attn_q.weight", randw(qk, n_embd))
                addw(pre + "cross_attn_k.weight", randw(qk, n_embd))
                addw(pre + "cross_attn_v.weight", randw(qk, n_embd))
                addw(pre + "cross_attn_o.weight", randw(n_embd, qk))
    w.write()
    return path


def make_tiny_bitnet_gguf(path, *, arch="bitnet-b1.58", seed=0, n_layer=2,
                          n_embd=64, n_head=4, n_head_kv=2, n_ff=96,
                          scales=True):
    """BitNet b1.58/25: attn/ffn inner sub-norms, relu^2 gated FFN, optional
    per-tensor scalar .scale tensors (create_bitnet2_tensors;
    build_bitnet.cpp build_bitnet_158)."""
    path = Path(path)
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kv_dim = n_head_kv * head_dim
    w = GGUFWriter(path, arch=arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd))
    ones("output_norm.weight", n_embd)
    for i in range(n_layer):
        p = f"blk.{i}."
        ones(p + "attn_norm.weight", n_embd)
        ones(p + "attn_sub_norm.weight", n_embd)
        ones(p + "ffn_sub_norm.weight", n_ff)
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        ones(p + "ffn_norm.weight", n_embd)
        addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        if scales:
            for tname in ("attn_q", "attn_k", "attn_v", "attn_output",
                          "ffn_gate", "ffn_up", "ffn_down"):
                w.add_tensor(p + tname + ".scale",
                             np.asarray([0.5 + rng.random()], np.float32))
    w.write()
    return path


def make_tiny_qwen35_gguf(path, *, moe=False, seed=0, n_layer=4, n_embd=64,
                          n_head=4, n_head_kv=2, head_k_dim=64,
                          num_k_heads=2, num_v_heads=4, head_v_dim=64,
                          d_conv=4, n_ff=96, n_expert=4, n_expert_used=2,
                          n_ff_exp=48, n_ff_shexp=32):
    """Qwen3.5 hybrid: delta-net recurrent layers with flat [q|k|v] wqkv +
    separate whole-width z gate + separate ssm_beta/ssm_alpha (repeat_type
    1), plain (ungated) full-attention layers, post_attention_norm as the
    FFN norm (create_qwen35_tensors; delta_net::build_layer_attn_linear).
    Delta head dims must be 64/128 for the reference's production kernel."""
    path = Path(path)
    arch = "qwen35moe" if moe else "qwen35"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    ssm_d_inner = head_v_dim * num_v_heads
    key_dim = head_k_dim * num_k_heads
    value_dim = ssm_d_inner
    conv_dim = key_dim * 2 + value_dim
    w = GGUFWriter(path, arch=arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    # imrope sections: all dims in the time section — text-only equivalence
    w.add(f"{arch}.rope.dimension_sections",
          np.asarray([head_dim // 2, 0, 0, 0], np.int32))
    w.add(f"{arch}.ssm.conv_kernel", d_conv)
    w.add(f"{arch}.ssm.inner_size", ssm_d_inner)
    w.add(f"{arch}.ssm.state_size", head_k_dim)
    w.add(f"{arch}.ssm.time_step_rank", num_v_heads)
    w.add(f"{arch}.ssm.group_count", num_k_heads)
    if moe:
        w.add(f"{arch}.expert_count", n_expert)
        w.add(f"{arch}.expert_used_count", n_expert_used)
        w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
        w.add(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    ones("output_norm.weight", n_embd)
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    kv_dim = n_head_kv * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        ones(p + "attn_norm.weight", n_embd)
        ones(p + "post_attention_norm.weight", n_embd)
        if (i + 1) % 4 != 0:     # recurrent
            addw(p + "attn_qkv.weight", randw(2 * key_dim + value_dim, n_embd))
            addw(p + "attn_gate.weight", randw(value_dim, n_embd))
            w.add_tensor(p + "ssm_conv1d.weight",
                         randw(conv_dim, d_conv, scale=0.4))
            w.add_tensor(p + "ssm_dt.bias", randw(num_v_heads))
            w.add_tensor(p + "ssm_a",
                         (-np.abs(rng.standard_normal(num_v_heads)) * 0.5
                          ).astype(np.float32))
            addw(p + "ssm_beta.weight", randw(num_v_heads, n_embd))
            addw(p + "ssm_alpha.weight", randw(num_v_heads, n_embd))
            ones(p + "ssm_norm.weight", head_v_dim)
            addw(p + "ssm_out.weight", randw(n_embd, value_dim))
        else:                    # gated full attention with qk norms
            # wq is {n_embd, head_dim*n_head*2}: per-head [q|gate] like
            # qwen3next (create_qwen35_tensors; llm_build_mul_mat_qkv_gated)
            addw(p + "attn_q.weight", randw(n_head * head_dim * 2, n_embd))
            addw(p + "attn_k.weight", randw(kv_dim, n_embd))
            addw(p + "attn_v.weight", randw(kv_dim, n_embd))
            addw(p + "attn_output.weight", randw(n_embd, n_head * head_dim))
            ones(p + "attn_q_norm.weight", head_dim)
            ones(p + "attn_k_norm.weight", head_dim)
        if moe:
            addw(p + "ffn_gate_inp.weight",
                 randw(n_expert, n_embd, scale=3.0 / np.sqrt(n_embd)))
            addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
            w.add_tensor(p + "ffn_gate_inp_shexp.weight", randw(1, n_embd))
            addw(p + "ffn_gate_shexp.weight", randw(n_ff_shexp, n_embd))
            addw(p + "ffn_up_shexp.weight", randw(n_ff_shexp, n_embd))
            addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_shexp))
        else:
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
            addw(p + "ffn_down.weight", randw(n_embd, n_ff))
    w.write()
    return path


def make_tiny_llama4_gguf(path, *, seed=0, n_layer=4, n_embd=64, n_head=4,
                          n_head_kv=2, n_ff=96, n_ff_exp=48, n_expert=16,
                          n_expert_used=2, moe_step=2):
    """llama4: NoPE every 4th layer with attention temperature, weightless
    qk L2 norm (16E model), interleaved MoE (sigmoid top-k + always-on
    shared expert sized n_ff_exp), chunked attention pattern
    (create_llama4_tensors; build_llama.cpp LLM_ARCH_LLAMA4 branches)."""
    path = Path(path)
    arch = "llama4"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kv_dim = n_head_kv * head_dim
    w = GGUFWriter(path, arch=arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 500000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.interleave_moe_layer_step", moe_step)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    ones("output_norm.weight", n_embd)
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    for i in range(n_layer):
        p = f"blk.{i}."
        ones(p + "attn_norm.weight", n_embd)
        ones(p + "ffn_norm.weight", n_embd)
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        if (i + 1) % moe_step == 0:
            addw(p + "ffn_gate_inp.weight",
                 randw(n_expert, n_embd, scale=3.0 / np.sqrt(n_embd)))
            addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
            addw(p + "ffn_gate_shexp.weight", randw(n_ff_exp, n_embd))
            addw(p + "ffn_up_shexp.weight", randw(n_ff_exp, n_embd))
            addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_exp))
        else:
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
            addw(p + "ffn_down.weight", randw(n_embd, n_ff))
    w.write()
    return path


def make_tiny_step35_gguf(path, *, seed=0, n_layer=4, n_embd=64, n_head=4,
                          n_head_kv=2, n_ff=96, n_ff_exp=48, n_expert=4,
                          n_expert_used=2, n_ff_shexp=32, swa=32):
    """step35: per-layer SWA pattern, per-layer rope dims (full on SWA,
    half on global), head-wise attention output gate, sigmoid MoE with
    shared expert and per-layer clamped-swiglu limits
    (create_step35_tensors; build_step35.cpp)."""
    path = Path(path)
    arch = "step35"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kv_dim = n_head_kv * head_dim
    swa_mask = [1 if (i % 2 == 0) else 0 for i in range(n_layer)]
    w = GGUFWriter(path, arch=arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.freq_base_swa", 50000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.attention.sliding_window", swa)
    w.add(f"{arch}.attention.sliding_window_pattern",
          np.asarray(swa_mask, np.int32))
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
    w.add(f"{arch}.expert_weights_norm", True)
    w.add(f"{arch}.swiglu_clamp_exp",
          np.asarray([7.0] * n_layer, np.float32))
    w.add(f"{arch}.swiglu_clamp_shexp",
          np.asarray([5.0] * n_layer, np.float32))
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    ones("output_norm.weight", n_embd)
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    for i in range(n_layer):
        p = f"blk.{i}."
        ones(p + "attn_norm.weight", n_embd)
        ones(p + "attn_q_norm.weight", head_dim)
        ones(p + "attn_k_norm.weight", head_dim)
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        addw(p + "attn_gate.weight", randw(n_head, n_embd))
        ones(p + "ffn_norm.weight", n_embd)
        addw(p + "ffn_gate_inp.weight",
             randw(n_expert, n_embd, scale=3.0 / np.sqrt(n_embd)))
        addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
        addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
        addw(p + "ffn_gate_shexp.weight", randw(n_ff_shexp, n_embd))
        addw(p + "ffn_up_shexp.weight", randw(n_ff_shexp, n_embd))
        addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_shexp))
    w.write()
    return path


def make_tiny_gemma4_gguf(
    path: str | Path,
    *,
    n_layer: int = 4,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    # NOTE head_dim 64: gemma4 parity must run the reference WITH flash
    # attention — its non-FA V-cache store transposes the 3-D (d, Hkv, T)
    # normed Vcur as if it were 2-D and scrambles the cache
    # (llm_build_kv_store, llama-build-context.cpp:959); the FA store is
    # layout-correct, and the CPU FA kernels support head size >= 64
    head_dim: int = 64,
    n_ff: int = 96,
    n_embd_per_layer: int = 16,
    n_expert: int = 4,
    n_expert_used: int = 2,
    n_ff_exp: int = 32,
    seed: int = 0,
) -> Path:
    """Tiny gemma4 (gemma-3n-style) GGUF: SWA pattern [1,1,0,1] with the
    last layer KV-shared, per-layer input embeddings, one MoE layer (fused
    gate|up experts + down scale), one no-wv layer (V = K), rope_freqs on
    the global layer (create_gemma4_tensors, llama-load-tensors.cpp:2161)."""
    path = Path(path)
    arch = "gemma4"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)

    swa_pattern = [1, 1, 0, 1][:n_layer]
    moe_layers = {1}
    no_wv_layers = {2}

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-gemma4")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.key_length_swa", head_dim)
    w.add(f"{arch}.attention.value_length_swa", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add(f"{arch}.attention.sliding_window", 8)
    w.add(f"{arch}.attention.sliding_window_pattern",
          np.asarray(swa_pattern, np.int32))
    w.add(f"{arch}.attention.shared_kv_layers", 1)
    w.add(f"{arch}.rope.freq_base", 1000000.0)
    w.add(f"{arch}.rope.freq_base_swa", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.embedding_length_per_layer_input", n_embd_per_layer)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.final_logit_softcapping", 30.0)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def randn(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr, GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", randn(n_embd))
    addw("per_layer_token_embd.weight",
         randw(n_vocab, n_embd_per_layer * n_layer, scale=0.5))
    addw("per_layer_model_proj.weight",
         randw(n_embd_per_layer * n_layer, n_embd))
    w.add_tensor("per_layer_proj_norm.weight", randn(n_embd_per_layer))
    w.add_tensor("rope_freqs.weight",
                 (1.0 + 0.5 * rng.random(head_dim // 2)).astype(np.float32))

    kv_dim = n_head_kv * head_dim
    q_dim = n_head * head_dim
    n_kv_layers = n_layer - 1
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", randn(n_embd))
        addw(p + "attn_q.weight", randw(q_dim, n_embd))
        w.add_tensor(p + "attn_q_norm.weight", randn(head_dim))
        if i < n_kv_layers:
            addw(p + "attn_k.weight", randw(kv_dim, n_embd))
            w.add_tensor(p + "attn_k_norm.weight", randn(head_dim))
            if i not in no_wv_layers:
                addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, q_dim))
        w.add_tensor(p + "post_attention_norm.weight", randn(n_embd))
        w.add_tensor(p + "ffn_norm.weight", randn(n_embd))
        addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        w.add_tensor(p + "post_ffw_norm.weight", randn(n_embd))
        if i in moe_layers:
            addw(p + "ffn_gate_inp.weight", randw(n_expert, n_embd))
            w.add_tensor(p + "ffn_gate_inp.scale", randn(n_embd))
            w.add_tensor(p + "pre_ffw_norm_2.weight", randn(n_embd))
            w.add_tensor(p + "post_ffw_norm_1.weight", randn(n_embd))
            w.add_tensor(p + "post_ffw_norm_2.weight", randn(n_embd))
            addw(p + "ffn_gate_up_exps.weight",
                 randw(n_expert, 2 * n_ff_exp, n_embd))
            addw(p + "ffn_down_exps.weight",
                 randw(n_expert, n_embd, n_ff_exp))
            w.add_tensor(p + "ffn_down_exps.scale", randn(n_expert))
        if i % 2 == 0:
            w.add_tensor(p + "layer_output_scale.weight",
                         np.asarray([0.9 + 0.2 * rng.random()], np.float32))
        w.add_tensor(p + "inp_gate.weight",
                     randw(n_embd_per_layer, n_embd).astype(np.float32))
        # f32: the reference's f16 row kernels misread very short rows
        w.add_tensor(p + "proj.weight",
                     randw(n_embd, n_embd_per_layer).astype(np.float32))
        w.add_tensor(p + "post_norm.weight", randn(n_embd))
    w.write()
    return path


def make_tiny_laguna_gguf(path, *, seed=0, n_layer=3, n_embd=64, n_head=4,
                          n_head_kv=2, n_ff=96, n_ff_exp=48, n_expert=4,
                          n_expert_used=2, n_ff_shexp=32, swa=32):
    """laguna: step35 tensor layout (create_step35_tensors,
    llama-load-tensors.cpp:5006) with SOFTPLUS attention gates — per-head
    (XS.2) on even layers, per-output-element (M.1) on odd layers — plus a
    leading dense block, sigmoid-routed MoE with shared expert, per-layer
    rope dims (full head on SWA layers, half on global) and q/k norms."""
    path = Path(path)
    arch = "laguna"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kv_dim = n_head_kv * head_dim
    swa_mask = [0, 1, 0][:n_layer] + [0] * max(0, n_layer - 3)
    w = GGUFWriter(path, arch=arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.freq_base_swa", 50000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim // 2)
    w.add(f"{arch}.rope.dimension_count_swa", head_dim)
    w.add(f"{arch}.attention.sliding_window", swa)
    w.add(f"{arch}.attention.sliding_window_pattern",
          np.asarray(swa_mask, np.int32))
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.expert_shared_feed_forward_length", n_ff_shexp)
    w.add(f"{arch}.expert_weights_norm", True)
    w.add(f"{arch}.leading_dense_block_count", 0)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    ones("output_norm.weight", n_embd)
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    for i in range(n_layer):
        p = f"blk.{i}."
        ones(p + "attn_norm.weight", n_embd)
        ones(p + "attn_q_norm.weight", head_dim)
        ones(p + "attn_k_norm.weight", head_dim)
        addw(p + "attn_q.weight", randw(n_embd, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, n_embd))
        gate_w = n_head if i % 2 == 0 else n_embd      # per-head | per-elem
        addw(p + "attn_gate.weight", randw(gate_w, n_embd))
        ones(p + "ffn_norm.weight", n_embd)
        if i == 0:      # leading dense block
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
            addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        else:
            addw(p + "ffn_gate_inp.weight",
                 randw(n_expert, n_embd, scale=3.0 / np.sqrt(n_embd)))
            w.add_tensor(p + "exp_probs_b.bias",
                         (0.1 * rng.standard_normal(n_expert)).astype(np.float32))
            addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
            addw(p + "ffn_gate_shexp.weight", randw(n_ff_shexp, n_embd))
            addw(p + "ffn_up_shexp.weight", randw(n_ff_shexp, n_embd))
            addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_shexp))
    w.write()
    return path


def make_tiny_dflash_gguf(path, *, seed=0, n_layer=2, n_embd=64, n_head=2,
                          n_head_kv=1, head_dim=64, n_ff=96,
                          n_target_layers=2, block_size=8,
                          mask_token_id=3):
    """dflash-draft: block-diffusion draft head (create_dflash_tensors,
    llama-load-tensors.cpp:2330; build_dflash.cpp). head_dim 64 because the
    draft graph always runs flash attention (build_dflash.cpp:376) and the
    reference's CPU FA kernels support head size >= 64."""
    path = Path(path)
    arch = "dflash-draft"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    n_feat = n_target_layers * n_embd
    q_dim = n_head * head_dim
    kv_dim = n_head_kv * head_dim
    w = GGUFWriter(path, arch=arch)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    w.add(f"{arch}.dflash.block_size", block_size)
    w.add(f"{arch}.dflash.mask_token_id", mask_token_id)
    w.add(f"{arch}.dflash.n_target_features", n_feat)
    w.add(f"{arch}.dflash.target_layer_ids",
          np.asarray(list(range(n_target_layers)), np.int32))
    w.add(f"{arch}.dflash.backbone_rotary_base", 50000.0)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr, GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    ones("output_norm.weight", n_embd)
    addw("dflash_fc.weight", randw(n_embd, n_feat))
    ones("dflash_hidden_norm.weight", n_embd)
    for i in range(n_layer):
        p = f"blk.{i}."
        ones(p + "attn_norm.weight", n_embd)
        ones(p + "post_attention_norm.weight", n_embd)
        ones(p + "attn_q_norm.weight", head_dim)
        ones(p + "attn_k_norm.weight", head_dim)
        addw(p + "attn_q.weight", randw(q_dim, n_embd))
        addw(p + "attn_k.weight", randw(kv_dim, n_embd))
        addw(p + "attn_v.weight", randw(kv_dim, n_embd))
        addw(p + "attn_output.weight", randw(n_embd, q_dim))
        addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
    w.write()
    return path


def make_tiny_glmdsa_gguf(path, *, seed=0, n_layer=3, n_embd=64, n_head=4,
                          d_nope=32, d_rope=16, d_v=32, q_lora=24, kv_lora=32,
                          n_expert=4, n_expert_used=2, n_ff=96, n_ff_exp=48,
                          dense_lead=1, idx_n_head=4, idx_head_size=32,
                          idx_top_k=6):
    """glm-dsa: deepseek2 MLA + sigmoid MoE + DSA lightning indexer
    (create_glm_dsa_tensors, llama-load-tensors.cpp:2979; indexer graph
    build_deepseek2.cpp:367-611). Converters pre-split attn_k_b/attn_v_b;
    IndexShare full layers are il<=1 or il%4==2 (llama-hparams.cpp:1852)."""
    path = Path(path)
    arch = "glm-dsa"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    dk = d_nope + d_rope

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-glm-dsa")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.key_length", dk)
    w.add(f"{arch}.attention.value_length", d_v)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", d_rope)
    w.add(f"{arch}.attention.q_lora_rank", q_lora)
    w.add(f"{arch}.attention.kv_lora_rank", kv_lora)
    w.add(f"{arch}.leading_dense_block_count", dense_lead)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_shared_count", 1)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.expert_weights_scale", 1.5)
    w.add(f"{arch}.expert_weights_norm", True)
    w.add(f"{arch}.expert_gating_func", 2)
    w.add(f"{arch}.attention.indexer.head_count", idx_n_head)
    w.add(f"{arch}.attention.indexer.key_length", idx_head_size)
    w.add(f"{arch}.attention.indexer.top_k", idx_top_k)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    for i in range(n_layer):
        p = f"blk.{i}."
        is_full = (i <= 1) or (i % 4 == 2)
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        addw(p + "attn_q_a.weight", randw(q_lora, n_embd))
        w.add_tensor(p + "attn_q_a_norm.weight", np.ones(q_lora, np.float32))
        addw(p + "attn_q_b.weight", randw(n_head * dk, q_lora))
        addw(p + "attn_kv_a_mqa.weight", randw(kv_lora + d_rope, n_embd))
        w.add_tensor(p + "attn_kv_a_norm.weight", np.ones(kv_lora, np.float32))
        # pre-split absorb projections: k_b ne {d_nope, kv_lora, h},
        # v_b ne {kv_lora, d_v, h}
        w.add_tensor(p + "attn_k_b.weight",
                     randw(n_head, kv_lora, d_nope))
        w.add_tensor(p + "attn_v_b.weight",
                     randw(n_head, d_v, kv_lora))
        addw(p + "attn_output.weight", randw(n_embd, n_head * d_v))
        if is_full:
            addw(p + "indexer.attn_q_b.weight",
                 randw(idx_n_head * idx_head_size, q_lora))
            addw(p + "indexer.attn_k.weight", randw(idx_head_size, n_embd))
            w.add_tensor(p + "indexer.k_norm.weight",
                         (1.0 + 0.1 * rng.standard_normal(idx_head_size)
                          ).astype(np.float32))
            w.add_tensor(p + "indexer.k_norm.bias",
                         (0.05 * rng.standard_normal(idx_head_size)
                          ).astype(np.float32))
            addw(p + "indexer.proj.weight", randw(idx_n_head, n_embd))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        if i < dense_lead:
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
            addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        else:
            w.add_tensor(p + "ffn_gate_inp.weight", randw(n_expert, n_embd))
            w.add_tensor(p + "exp_probs_b.bias",
                         (rng.standard_normal(n_expert) * 0.1).astype(np.float32))
            addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
            addw(p + "ffn_gate_shexp.weight", randw(n_ff_exp, n_embd))
            addw(p + "ffn_up_shexp.weight", randw(n_ff_exp, n_embd))
            addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_exp))
    w.write()
    return path


def make_tiny_openpangu_gguf(path, *, seed=0, n_layer=3, n_embd=64, n_head=4,
                             d_nope=32, d_rope=16, d_v=32, q_lora=24,
                             kv_lora=32, n_expert=4, n_expert_used=2,
                             n_ff=96, n_ff_exp=48, dense_lead=1,
                             # n_sink >= 16: the reference's iqk f32 GEMM
                             # misreads contraction rows shorter than the
                             # SIMD width (observed: sink-value mul_mat at
                             # NS=8 returns ~2x the true dot product)
                             n_sink=32,
                             mhc_s=4, sink_iters=20, idx_n_head=4,
                             idx_head_size=32, idx_top_k=6,
                             swa_schedule=True, swa_window=8):
    """openPangu-2.0-Flash: absorbed MLA + sigmoid MoE + mHC 4-stream
    residuals + MoME causal convs + learned param sinks + DSA/SWA schedule
    (create_openpangu_tensors, llama-load-tensors.cpp:3140;
    build_openpangu.cpp). Layer schedule here: 0 dense-FFN + SWA,
    1 MoE + DSA indexer, 2 MoE + SWA."""
    path = Path(path)
    arch = "openpangu"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    dk = d_nope + d_rope
    SH = mhc_s * n_embd
    phi_out = (mhc_s + 2) * mhc_s

    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-openpangu")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.key_length", dk)
    w.add(f"{arch}.attention.value_length", d_v)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.rope.dimension_count", d_rope)
    w.add(f"{arch}.attention.q_lora_rank", q_lora)
    w.add(f"{arch}.attention.kv_lora_rank", kv_lora)
    w.add(f"{arch}.leading_dense_block_count", dense_lead)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_shared_count", 1)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.expert_weights_scale", 1.5)
    w.add(f"{arch}.expert_weights_norm", True)
    w.add(f"{arch}.expert_gating_func", 2)
    w.add(f"{arch}.mhc_num_stream", mhc_s)
    w.add(f"{arch}.mhc_recur_norm", sink_iters)
    w.add(f"{arch}.param_sink_number", n_sink)
    w.add(f"{arch}.attention.indexer.head_count", idx_n_head)
    w.add(f"{arch}.attention.indexer.key_length", idx_head_size)
    w.add(f"{arch}.attention.indexer.top_k", idx_top_k)
    if swa_schedule:
        w.add(f"{arch}.swa_layers", np.asarray([0, 2], np.int32))
        w.add(f"{arch}.sliding_window_list",
              np.asarray([swa_window, swa_window], np.int32))
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr.reshape(-1, arr.shape[-1]), GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    def ones(name, n):
        w.add_tensor(name, (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32))

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    ones("output_norm.weight", n_embd)
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("merge_mhc_phi.weight", randw(mhc_s, SH))
    w.add_tensor("merge_mhc_alpha", np.asarray([1.0], np.float32))
    w.add_tensor("merge_mhc_beta",
                 (0.1 * rng.standard_normal(mhc_s)).astype(np.float32))
    ones("merge_mhc_gamma", SH)
    for i in range(n_layer):
        p = f"blk.{i}."
        is_dsa = i == 1
        ones(p + "attn_norm.weight", n_embd)
        ones(p + "post_attention_norm.weight", n_embd)
        ones(p + "attn_q_a_norm.weight", q_lora)
        ones(p + "attn_kv_a_norm.weight", kv_lora)
        addw(p + "attn_q_a.weight", randw(q_lora, n_embd))
        addw(p + "attn_q_b.weight", randw(n_head * dk, q_lora))
        addw(p + "attn_kv_a_mqa.weight", randw(kv_lora + d_rope, n_embd))
        # converter-split 2D layout: {d_nope, H*kv_lora} / {kv_lora, H*d_v}
        # head-major rows (create_openpangu_tensors)
        w.add_tensor(p + "attn_k_b.weight",
                     randw(n_head * kv_lora, d_nope))
        w.add_tensor(p + "attn_v_b.weight", randw(n_head * d_v, kv_lora))
        addw(p + "attn_output.weight", randw(n_embd, n_head * d_v))
        # MoME convs: small taps so the residual conv is a perturbation
        for nm, c in (("attn_qa_conv", q_lora), ("attn_compresskv_conv", kv_lora),
                      ("attn_o_conv", n_head * d_v)):
            w.add_tensor(p + nm + ".weight",
                         (0.1 * rng.standard_normal((c, 3))).astype(np.float32))
        w.add_tensor(p + "attn_param_sink_kv", randw(n_sink, kv_lora))
        w.add_tensor(p + "attn_param_sink_k_pe", randw(n_sink, d_rope))
        if is_dsa:
            addw(p + "attn_indexer_q_b.weight",
                 randw(idx_n_head * idx_head_size, q_lora))
            addw(p + "attn_indexer_k.weight", randw(idx_head_size, n_embd))
            ones(p + "attn_indexer_k_norm.weight", idx_head_size)
            addw(p + "attn_indexer_weights_proj.weight",
                 randw(idx_n_head, n_embd))
        for pre in ("attn_mhc", "mlp_mhc"):
            nm = p + pre.replace("_mhc", "_mhc")
            w.add_tensor(p + pre + "_phi.weight", randw(phi_out, SH))
            w.add_tensor(p + pre + "_alpha",
                         np.asarray([1.0, 1.0, 1.0], np.float32))
            w.add_tensor(p + pre + "_beta",
                         (0.1 * rng.standard_normal(2 * mhc_s + mhc_s * mhc_s)
                          ).astype(np.float32))
            ones(p + pre + "_gamma", SH)
        if i == 2:
            ones(p + "block_post_norm.weight", SH)
        ones(p + "ffn_norm.weight", n_embd)
        ones(p + "post_ffw_norm.weight", n_embd)
        if i < dense_lead:
            addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
            addw(p + "ffn_up.weight", randw(n_ff, n_embd))
            addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        else:
            w.add_tensor(p + "ffn_gate_inp.weight", randw(n_expert, n_embd))
            w.add_tensor(p + "exp_probs_b.bias",
                         (rng.standard_normal(n_expert) * 0.1).astype(np.float32))
            addw(p + "ffn_gate_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_up_exps.weight", randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_down_exps.weight", randw(n_expert, n_embd, n_ff_exp))
            addw(p + "ffn_gate_shexp.weight", randw(n_ff_exp, n_embd))
            addw(p + "ffn_up_shexp.weight", randw(n_ff_exp, n_embd))
            addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_exp))
    w.write()
    return path


def make_tiny_gemma4_mtp_gguf(path, *, assistant=False, seed=1, n_layer=2,
                              n_embd=48, n_backbone=64, n_head=4,
                              head_dim=64, n_ff=80):
    """Tiny gemma4 MTP / assistant draft GGUF. Pairs with
    make_tiny_gemma4_gguf (n_embd=64 -> n_backbone): Q-only layers whose
    head_dim matches the TARGET's KV cache, SWA pattern [1, 0]
    (create_tensors llama-load-tensors.cpp:2284-2297)."""
    path = Path(path)
    arch = "gemma4-assistant" if assistant else "gemma4_mtp"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    w = GGUFWriter(path, arch=arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", 2)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add(f"{arch}.attention.sliding_window", 8)
    w.add(f"{arch}.attention.sliding_window_pattern",
          np.asarray([1, 0][:n_layer], np.int32))
    w.add(f"{arch}.rope.freq_base", 1000000.0)
    w.add(f"{arch}.rope.dimension_count", head_dim)
    if assistant:
        w.add(f"{arch}.embedding_length_out", n_backbone)
        w.add(f"{arch}.n_centroids", 0)
    else:
        w.add(f"{arch}.backbone_embedding_length", n_backbone)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def randn(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr, GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    pre = "nextn.pre_projection.weight" if assistant else "mtp_pre_proj.weight"
    post = ("nextn.post_projection.weight" if assistant
            else "mtp_post_proj.weight")
    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", randn(n_embd))
    addw(pre, randw(n_embd, 2 * n_backbone))
    addw(post, randw(n_backbone, n_embd))
    w.add_tensor("rope_freqs.weight",
                 (1.0 + 0.5 * rng.random(head_dim // 2)).astype(np.float32))
    q_dim = n_head * head_dim
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", randn(n_embd))
        addw(p + "attn_q.weight", randw(q_dim, n_embd))
        w.add_tensor(p + "attn_q_norm.weight", randn(head_dim))
        addw(p + "attn_output.weight", randw(n_embd, q_dim))
        w.add_tensor(p + "post_attention_norm.weight", randn(n_embd))
        w.add_tensor(p + "ffn_norm.weight", randn(n_embd))
        addw(p + "ffn_gate.weight", randw(n_ff, n_embd))
        addw(p + "ffn_up.weight", randw(n_ff, n_embd))
        addw(p + "ffn_down.weight", randw(n_embd, n_ff))
        w.add_tensor(p + "post_ffw_norm.weight", randn(n_embd))
        if i == 0:
            w.add_tensor(p + "layer_output_scale.weight",
                         np.asarray([0.95], np.float32))
    w.write()
    return path


def make_tiny_deepseek4_gguf(path, *, seed=0, n_layer=3, n_embd=64,
                             n_head=4, head_dim=64, n_rot=32, q_lora=64,
                             hc=2, n_expert=4, n_expert_used=2, n_ff=96,
                             n_ff_exp=48, n_groups=2, o_lora=8,
                             compress=False, idx_head=64, idx_nh=2,
                             top_k=2, swa=8):
    # NOTE head_dim 64: the reference's DSv4 CPU attention kernels segfault
    # below head size 64 (same floor as its FA kernels)
    """Tiny DeepSeek-V4 GGUF (create_deepseek4_tensors,
    llama-load-tensors.cpp:4956+): hyper-connections (hc streams), k-only
    latent attention with grouped low-rank output, sinks, 1 dense lead +
    MoE layers with shared expert. With ``compress=True`` layer 1 gets the
    CSA compressor + LID indexer tensors (ratio 4) and layer 2 the HCA
    compressor (ratio 128 -> clipped by capacity in tests)."""
    path = Path(path)
    arch = "deepseek4"
    rng = np.random.default_rng(seed)
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    w = GGUFWriter(path, arch=arch)
    w.add("general.name", "tiny-deepseek4")
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", 512)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", 1)
    w.add(f"{arch}.attention.key_length", head_dim)
    w.add(f"{arch}.attention.value_length", head_dim)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add(f"{arch}.rope.dimension_count", n_rot)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.attention.q_lora_rank", q_lora)
    w.add(f"{arch}.attention.kv_lora_rank", head_dim)
    w.add(f"{arch}.expert_count", n_expert)
    w.add(f"{arch}.expert_used_count", n_expert_used)
    w.add(f"{arch}.expert_shared_count", 1)
    w.add(f"{arch}.expert_feed_forward_length", n_ff_exp)
    w.add(f"{arch}.leading_dense_block_count", 0)
    w.add(f"{arch}.expert_weights_scale", 1.5)
    w.add(f"{arch}.expert_weights_norm", True)
    w.add(f"{arch}.expert_gating_func", 4)  # sqrtsoftplus (required)
    w.add(f"{arch}.swiglu_clamp_exp", np.zeros(n_layer, np.float32))
    w.add(f"{arch}.swiglu_clamp_shexp", np.zeros(n_layer, np.float32))
    w.add(f"{arch}.hyper_connection.count", hc)
    w.add(f"{arch}.hyper_connection.sinkhorn_iterations", 3)
    w.add(f"{arch}.hyper_connection.epsilon", 1e-6)
    w.add(f"{arch}.attention.indexer.head_count", idx_nh)
    w.add(f"{arch}.attention.indexer.key_length", idx_head)
    w.add(f"{arch}.attention.indexer.top_k", top_k)
    w.add(f"{arch}.attention.output_group_count", n_groups)
    w.add(f"{arch}.attention.output_lora_rank", o_lora)
    if compress:
        ratios = [0] * n_layer
        if n_layer >= 2:
            ratios[1] = 4          # CSA + LID
        if n_layer >= 3:
            ratios[2] = 128        # HCA
        w.add(f"{arch}.attention.compress_ratios",
              np.asarray(ratios, np.int32))
        w.add(f"{arch}.attention.sliding_window", swa)
        w.add(f"{arch}.attention.compress_rope_freq_base", 10000.0)
    w.add(f"{arch}.vocab_size", n_vocab)
    _std_vocab_kv(w, tokens, scores, types)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def randn(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def addw(name, arr):
        w.add_tensor(name, quantize(arr, GGMLType.F16),
                     shape=tuple(reversed(arr.shape)), ggml_type=GGMLType.F16)

    addw("token_embd.weight", randw(n_vocab, n_embd, scale=0.5))
    addw("output.weight", randw(n_vocab, n_embd, scale=0.5))
    w.add_tensor("output_norm.weight", randn(n_embd))
    addw("hc_head_fn.weight", randw(hc, n_embd * hc))
    w.add_tensor("hc_head_scale.weight", np.asarray([0.8], np.float32))
    w.add_tensor("hc_head_base.weight",
                 (0.1 * rng.standard_normal(hc)).astype(np.float32))

    q_dim = n_head * head_dim
    mix = hc * hc + 2 * hc
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", randn(n_embd))
        addw(p + "attn_q_a.weight", randw(q_lora, n_embd))
        w.add_tensor(p + "attn_q_a_norm.weight", randn(q_lora))
        addw(p + "attn_q_b.weight", randw(q_dim, q_lora))
        addw(p + "attn_kv.weight", randw(head_dim, n_embd))
        w.add_tensor(p + "attn_kv_a_norm.weight", randn(head_dim))
        addw(p + "attn_output_a.weight",
             randw(o_lora * n_groups, q_dim // n_groups))
        addw(p + "attn_output_b.weight", randw(n_embd, o_lora * n_groups))
        w.add_tensor(p + "attn_sinks.weight",
                     (0.2 * rng.standard_normal(n_head)).astype(np.float32))
        for stem in ("hc_attn", "hc_ffn"):
            addw(p + stem + "_fn.weight", randw(mix, n_embd * hc))
            w.add_tensor(p + stem + "_scale.weight",
                         (0.5 + 0.2 * rng.random(3)).astype(np.float32))
            w.add_tensor(p + stem + "_base.weight",
                         (0.1 * rng.standard_normal(mix)).astype(np.float32))
        if compress and i == 1:
            addw(p + "attn_compress_kv.weight",
                 randw(2 * head_dim, n_embd))
            addw(p + "attn_compress_gate.weight",
                 randw(2 * head_dim, n_embd))
            w.add_tensor(p + "attn_compress_ape.weight",
                         randw(4, 2 * head_dim).astype(np.float32))
            w.add_tensor(p + "attn_compress_norm.weight", randn(head_dim))
            addw(p + "indexer.compress_kv.weight",
                 randw(2 * idx_head, n_embd))
            addw(p + "indexer.compress_gate.weight",
                 randw(2 * idx_head, n_embd))
            w.add_tensor(p + "indexer.compress_ape.weight",
                         randw(4, 2 * idx_head).astype(np.float32))
            w.add_tensor(p + "indexer.compress_norm.weight", randn(idx_head))
            addw(p + "indexer.attn_q_b.weight",
                 randw(idx_nh * idx_head, q_lora))
            addw(p + "indexer.proj.weight", randw(idx_nh, n_embd))
            w.add_tensor(p + "indexer.k_norm.weight", randn(idx_head))
        if compress and i == 2:    # HCA layer (type1: D-wide states)
            addw(p + "attn_compress_kv.weight", randw(head_dim, n_embd))
            addw(p + "attn_compress_gate.weight", randw(head_dim, n_embd))
            w.add_tensor(p + "attn_compress_ape.weight",
                         randw(128, head_dim).astype(np.float32))
            w.add_tensor(p + "attn_compress_norm.weight", randn(head_dim))
        w.add_tensor(p + "ffn_norm.weight", randn(n_embd))
        if True:       # create_deepseek4_tensors requires MoE on EVERY layer
            addw(p + "ffn_gate_inp.weight", randw(n_expert, n_embd))
            w.add_tensor(p + "exp_probs_b.bias",
                         (0.1 * rng.standard_normal(n_expert)).astype(
                             np.float32))
            addw(p + "ffn_gate_exps.weight",
                 randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_up_exps.weight",
                 randw(n_expert, n_ff_exp, n_embd))
            addw(p + "ffn_down_exps.weight",
                 randw(n_expert, n_embd, n_ff_exp))
            addw(p + "ffn_gate_shexp.weight", randw(n_ff_exp, n_embd))
            addw(p + "ffn_up_shexp.weight", randw(n_ff_exp, n_embd))
            addw(p + "ffn_down_shexp.weight", randw(n_embd, n_ff_exp))
    w.write()
    return path


def make_tiny_audio_mmproj_gguf(
    path: str | Path,
    *,
    n_embd_text: int = 64,
    n_embd: int = 32,
    n_head: int = 4,
    n_ff: int = 64,
    n_layer: int = 2,
    n_mel: int = 128,
    projector: str = "qwen2a",
    stack_factor: int = 4,
    seed: int = 0,
) -> Path:
    """Tiny whisper-style audio mmproj GGUF (clip.cpp build_whisper_enc:
    conv1d x2, ViT with q/v bias and NO k bias, post_ln, then the qwen2a fc /
    ultravox swiglu-mlp / voxtral gelu-mlp projector). 128 mel bins: the
    reference's precalculated filterbank (and its ultravox assert) is
    128-bin only."""
    path = Path(path)
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, arch="clip")
    w.add("clip.has_audio_encoder", True)
    w.add("clip.projector_type", projector)
    w.add("clip.use_gelu", True)
    w.add("clip.audio.num_mel_bins", n_mel)
    w.add("clip.audio.embedding_length", n_embd)
    w.add("clip.audio.feed_forward_length", n_ff)
    w.add("clip.audio.block_count", n_layer)
    w.add("clip.audio.attention.head_count", n_head)
    w.add("clip.audio.attention.layer_norm_epsilon", 1e-5)
    w.add("clip.audio.projection_dim", n_embd_text)
    if projector in ("ultravox", "voxtral"):
        w.add("clip.audio.projector.stack_factor", stack_factor)

    def randw(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    # conv1d: ggml ne (kernel, in, out) -> numpy writes reversed (out, in, k)
    w.add_tensor("a.conv1d.1.weight", randw(n_embd, n_mel, 3, scale=0.1))
    # conv bias ggml ne (1, out) -> numpy (out, 1): ggml_add repeats over
    # the frame axis (build_whisper_enc)
    w.add_tensor("a.conv1d.1.bias", randw(n_embd, scale=0.1).reshape(-1, 1))
    w.add_tensor("a.conv1d.2.weight", randw(n_embd, n_embd, 3, scale=0.1))
    w.add_tensor("a.conv1d.2.bias", randw(n_embd, scale=0.1).reshape(-1, 1))
    w.add_tensor("a.position_embd.weight", randw(1500, n_embd))
    w.add_tensor("a.post_ln.weight", np.ones(n_embd, np.float32))
    w.add_tensor("a.post_ln.bias", np.zeros(n_embd, np.float32))
    for i in range(n_layer):
        p = f"a.blk.{i}."
        for tn, shape, bias in (
                ("attn_q", (n_embd, n_embd), True),
                ("attn_k", (n_embd, n_embd), False),   # whisper: no k bias
                ("attn_v", (n_embd, n_embd), True),
                ("attn_out", (n_embd, n_embd), True),
                ("ffn_up", (n_ff, n_embd), True),
                ("ffn_down", (n_embd, n_ff), True)):
            w.add_tensor(p + tn + ".weight", randw(*shape))
            if bias:
                w.add_tensor(p + tn + ".bias", randw(shape[0], scale=0.05))
        for ln in ("ln1", "ln2"):
            w.add_tensor(p + ln + ".weight",
                         (1.0 + 0.1 * rng.standard_normal(n_embd)).astype(
                             np.float32))
            w.add_tensor(p + ln + ".bias", randw(n_embd, scale=0.05))
    if projector == "qwen2a":
        w.add_tensor("mm.a.fc.weight", randw(n_embd_text, n_embd))
        w.add_tensor("mm.a.fc.bias", randw(n_embd_text, scale=0.05))
    elif projector == "ultravox":
        stride = n_embd * stack_factor
        w.add_tensor("mm.a.norm_pre.weight", np.ones(stride, np.float32))
        w.add_tensor("mm.a.norm_mid.weight", np.ones(2 * n_ff, np.float32))
        w.add_tensor("mm.a.mlp.1.weight", randw(4 * n_ff, stride))
        w.add_tensor("mm.a.mlp.2.weight", randw(n_embd_text, 2 * n_ff))
    elif projector == "voxtral":
        stride = n_embd * stack_factor
        w.add_tensor("mm.a.mlp.1.weight", randw(n_ff, stride))
        w.add_tensor("mm.a.mlp.2.weight", randw(n_embd_text, n_ff))
    else:
        raise ValueError(projector)
    w.write()
    return path
