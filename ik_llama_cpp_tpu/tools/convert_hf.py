"""HF checkpoint -> GGUF converter — analogue of convert_hf_to_gguf.py.

Supports the llama / mistral / qwen2 / qwen3 / qwen3moe families from
safetensors (or pytorch .bin) + config.json + tokenizer.json. Applies the
same q/k rotation permute the reference converter applies for NORM-rope
archs so weights match ggml's rope convention.

Usage: python -m ik_llama_cpp_tpu.tools.convert_hf <hf_dir> <out.gguf>
    [--outtype f32|f16|bf16|q8_0|q4_0|q4_1|q5_0|q5_1|q6_0]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from ..gguf.constants import GEOMETRY, GGMLType
from ..gguf.writer import GGUFWriter
from ..quant.quantize import quantize

ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "llama",
    "MixtralForCausalLM": "llama",
    "Qwen2ForCausalLM": "qwen2",
    "Qwen3ForCausalLM": "qwen3",
    "Qwen3MoeForCausalLM": "qwen3moe",
    "Gemma2ForCausalLM": "gemma2",
    "Gemma3ForCausalLM": "gemma3",
    "Gemma3ForConditionalGeneration": "gemma3",
    "Phi3ForCausalLM": "phi3",
    "MambaForCausalLM": "mamba",
    "MambaLMHeadModel": "mamba",
    "Starcoder2ForCausalLM": "starcoder2",
    "GraniteForCausalLM": "granite",
}

# HF name template -> GGUF name template
NAME_MAP = [
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
    ("model.layers.{i}.mlp.gate.weight", "blk.{i}.ffn_gate_inp.weight"),
    # phi3 fused projections
    ("model.layers.{i}.self_attn.qkv_proj.weight", "blk.{i}.attn_qkv.weight"),
    ("model.layers.{i}.mlp.gate_up_proj.weight", "blk.{i}.ffn_up.weight"),
    # starcoder2 (biased LN + c_fc/c_proj FFN)
    ("model.layers.{i}.self_attn.q_proj.bias", "blk.{i}.attn_q.bias"),
    ("model.layers.{i}.self_attn.k_proj.bias", "blk.{i}.attn_k.bias"),
    ("model.layers.{i}.self_attn.v_proj.bias", "blk.{i}.attn_v.bias"),
    ("model.layers.{i}.self_attn.o_proj.bias", "blk.{i}.attn_output.bias"),
    ("model.layers.{i}.input_layernorm.bias", "blk.{i}.attn_norm.bias"),
    ("model.layers.{i}.post_attention_layernorm.bias", "blk.{i}.ffn_norm.bias"),
    ("model.layers.{i}.mlp.c_fc.weight", "blk.{i}.ffn_up.weight"),
    ("model.layers.{i}.mlp.c_fc.bias", "blk.{i}.ffn_up.bias"),
    ("model.layers.{i}.mlp.c_proj.weight", "blk.{i}.ffn_down.weight"),
    ("model.layers.{i}.mlp.c_proj.bias", "blk.{i}.ffn_down.bias"),
    ("model.norm.bias", "output_norm.bias"),
]

# gemma2/3 sandwich norms: HF's post_attention_layernorm is the POST-attn
# norm (not ffn_norm as in llama); pre_feedforward_layernorm is ffn_norm
GEMMA_NORM_MAP = [
    ("model.layers.{i}.input_layernorm.weight", "blk.{i}.attn_norm.weight"),
    ("model.layers.{i}.post_attention_layernorm.weight",
     "blk.{i}.post_attention_norm.weight"),
    ("model.layers.{i}.pre_feedforward_layernorm.weight",
     "blk.{i}.ffn_norm.weight"),
    ("model.layers.{i}.post_feedforward_layernorm.weight",
     "blk.{i}.post_ffw_norm.weight"),
]

# mamba (HF backbone.* naming; tensor names per llama-model.cpp SSM entries)
MAMBA_NAME_MAP = [
    ("backbone.embeddings.weight", "token_embd.weight"),
    ("backbone.embedding.weight", "token_embd.weight"),
    ("backbone.norm_f.weight", "output_norm.weight"),
    ("lm_head.weight", "output.weight"),
    ("backbone.layers.{i}.norm.weight", "blk.{i}.attn_norm.weight"),
    ("backbone.layers.{i}.mixer.in_proj.weight", "blk.{i}.ssm_in.weight"),
    ("backbone.layers.{i}.mixer.conv1d.weight", "blk.{i}.ssm_conv1d.weight"),
    ("backbone.layers.{i}.mixer.conv1d.bias", "blk.{i}.ssm_conv1d.bias"),
    ("backbone.layers.{i}.mixer.x_proj.weight", "blk.{i}.ssm_x.weight"),
    ("backbone.layers.{i}.mixer.dt_proj.weight", "blk.{i}.ssm_dt.weight"),
    ("backbone.layers.{i}.mixer.dt_proj.bias", "blk.{i}.ssm_dt.bias"),
    ("backbone.layers.{i}.mixer.A_log", "blk.{i}.ssm_a"),
    ("backbone.layers.{i}.mixer.D", "blk.{i}.ssm_d"),
    ("backbone.layers.{i}.mixer.out_proj.weight", "blk.{i}.ssm_out.weight"),
]


def load_hf_tensors(hf_dir: Path) -> dict[str, np.ndarray]:
    tensors = {}
    st_files = sorted(hf_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open
        for f in st_files:
            with safe_open(str(f), framework="np") as sf:
                for name in sf.keys():
                    tensors[name] = sf.get_tensor(name)
        return tensors
    bin_files = sorted(hf_dir.glob("pytorch_model*.bin"))
    if bin_files:
        import torch
        for f in bin_files:
            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            for name, t in sd.items():
                tensors[name] = t.float().numpy()
        return tensors
    raise FileNotFoundError(f"no safetensors / pytorch_model.bin in {hf_dir}")


def permute_rotary(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF half-rotation -> ggml NORM pair rotation (reference convert permute)."""
    return (w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def vocab_from_tokenizer_json(hf_dir: Path):
    tj = hf_dir / "tokenizer.json"
    if not tj.exists():
        return None
    data = json.loads(tj.read_text(encoding="utf-8"))
    model = data.get("model", {})
    if model.get("type") != "BPE":
        return None
    vocab = model["vocab"]
    merges = model.get("merges", [])
    merges = [m if isinstance(m, str) else " ".join(m) for m in merges]
    tokens = [None] * len(vocab)
    for tok, idx in vocab.items():
        tokens[idx] = tok
    added = {t["id"]: t for t in data.get("added_tokens", [])}
    for idx, t in added.items():
        while idx >= len(tokens):
            tokens.append(None)
        tokens[idx] = t["content"]
    types = [3 if i in added and added[i].get("special") else 1
             for i in range(len(tokens))]
    tokens = [t if t is not None else f"<unused{i}>" for i, t in enumerate(tokens)]
    return tokens, types, merges


def _write_fallback_vocab(w: GGUFWriter, n_vocab: int) -> None:
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    for b in range(min(256, n_vocab - 3)):
        tokens.append(f"<0x{b:02X}>")
        types.append(6)
    while len(tokens) < n_vocab:
        tokens.append(f"<unused{len(tokens)}>")
        types.append(5)
    tokens = tokens[:n_vocab]
    types = types[:n_vocab]
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray([0.0] * len(tokens), np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.unknown_token_id", 0)


def convert(hf_dir, out_path, outtype: str = "f16") -> Path:
    hf_dir = Path(hf_dir)
    cfg = json.loads((hf_dir / "config.json").read_text())
    if "text_config" in cfg:    # gemma3 conditional-generation wrapper
        cfg = {**cfg, **cfg["text_config"]}
    hf_arch = cfg.get("architectures", ["LlamaForCausalLM"])[0]
    from .convert_hf_archs import CONVERTERS, convert_registered
    if hf_arch in CONVERTERS:
        tensors = load_hf_tensors(hf_dir)
        return convert_registered(hf_arch, cfg, tensors, hf_dir, out_path,
                                  outtype)
    arch = ARCH_MAP.get(hf_arch)
    if arch is None:
        raise NotImplementedError(f"unsupported HF architecture {hf_arch}")
    if arch == "mamba":
        return _convert_mamba(hf_dir, cfg, out_path)

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    n_embd = cfg["hidden_size"]
    head_dim = cfg.get("head_dim", n_embd // n_head)
    permute = arch in ("llama", "granite")  # NORM-rope archs: q/k permute
    is_gemma = arch in ("gemma", "gemma2", "gemma3")

    w = GGUFWriter(out_path, arch=arch)
    w.add("general.name", hf_dir.name)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", cfg.get("max_position_embeddings", 4096))
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length", cfg["intermediate_size"])
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    if arch == "starcoder2":
        w.add(f"{arch}.attention.layer_norm_epsilon",
              cfg.get("norm_epsilon", 1e-5))
    else:
        w.add(f"{arch}.attention.layer_norm_rms_epsilon",
              cfg.get("rms_norm_eps", 1e-5))
    if arch == "granite":
        w.add(f"{arch}.embedding_scale", float(cfg.get("embedding_multiplier", 1.0)))
        w.add(f"{arch}.residual_scale", float(cfg.get("residual_multiplier", 1.0)))
        w.add(f"{arch}.attention.scale", float(cfg.get("attention_multiplier", 0.0)))
        w.add(f"{arch}.logit_scale", float(cfg.get("logits_scaling", 1.0)))
    w.add(f"{arch}.rope.freq_base", cfg.get("rope_theta", 10000.0))
    if arch == "phi3":
        rot = int(head_dim * cfg.get("partial_rotary_factor", 1.0))
        w.add(f"{arch}.rope.dimension_count", rot)
        w.add(f"{arch}.attention.sliding_window",
              int(cfg.get("sliding_window") or 0) or 262144)
    else:
        w.add(f"{arch}.rope.dimension_count", head_dim)
    if head_dim != n_embd // n_head or is_gemma:
        w.add(f"{arch}.attention.key_length", head_dim)
        w.add(f"{arch}.attention.value_length", head_dim)
    if is_gemma:
        if cfg.get("sliding_window"):
            w.add(f"{arch}.attention.sliding_window", int(cfg["sliding_window"]))
        if cfg.get("attn_logit_softcapping"):
            w.add(f"{arch}.attn_logit_softcapping",
                  float(cfg["attn_logit_softcapping"]))
        if cfg.get("final_logit_softcapping"):
            w.add(f"{arch}.final_logit_softcapping",
                  float(cfg["final_logit_softcapping"]))
    w.add(f"{arch}.vocab_size", cfg["vocab_size"])
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type") in ("yarn",) or rs.get("type") == "yarn":
        w.add(f"{arch}.rope.scaling.type", "yarn")
        w.add(f"{arch}.rope.scaling.factor", float(rs.get("factor", 1.0)))
        w.add(f"{arch}.rope.scaling.original_context_length",
              int(rs.get("original_max_position_embeddings", 0)))

    vocab = vocab_from_tokenizer_json(hf_dir)
    if vocab is not None:
        tokens, types, merges = vocab
        w.add("tokenizer.ggml.model", "gpt2")
        w.add("tokenizer.ggml.pre", "llama-bpe" if arch == "llama" else "default")
        w.add("tokenizer.ggml.tokens", tokens)
        w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
        w.add("tokenizer.ggml.merges", merges)
        w.add("tokenizer.ggml.add_bos_token", bool(cfg.get("bos_token_id") is not None and arch == "llama"))
    else:
        print("warning: no BPE tokenizer.json found; writing byte-fallback vocab",
              file=sys.stderr)
        _write_fallback_vocab(w, cfg["vocab_size"])
    for key, hf_key in (("bos_token_id", "bos_token_id"),
                        ("eos_token_id", "eos_token_id")):
        if cfg.get(hf_key) is not None:
            v = cfg[hf_key]
            w.add(f"tokenizer.ggml.{key}", int(v[0] if isinstance(v, list) else v))

    tensors = load_hf_tensors(hf_dir)
    if "lm_head.weight" not in tensors and cfg.get("tie_word_embeddings", False):
        pass  # loader falls back to token_embd

    # direct-conversion schemes (convert_hf_to_gguf.py --outtype: bf16 and
    # the legacy quants Q4_0..Q6_0 convert without a separate quantize pass)
    ttype = {"f32": GGMLType.F32, "f16": GGMLType.F16,
             "bf16": GGMLType.BF16, "q8_0": GGMLType.Q8_0,
             "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1,
             "q5_0": GGMLType.Q5_0, "q5_1": GGMLType.Q5_1,
             "q6_0": GGMLType.Q6_0}[outtype]

    def emit(gname: str, arr: np.ndarray):
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 1 or "norm" in gname or gname.endswith(".bias") \
                or "gate_inp" in gname:
            w.add_tensor(gname, arr.astype(np.float32))
            return
        t = ttype
        if arr.shape[-1] % GEOMETRY[t].block_elems != 0:
            t = GGMLType.F32
        if t == GGMLType.F32:
            w.add_tensor(gname, arr)
        else:
            w.add_tensor(gname, quantize(arr.reshape(-1, arr.shape[-1]), t),
                         shape=tuple(reversed(arr.shape)), ggml_type=t)

    name_map = list(NAME_MAP)
    if is_gemma:
        # gemma's norm-name semantics differ; drop the llama-family norm rows
        name_map = [(h, g) for h, g in name_map if "layernorm" not in h]
        name_map += GEMMA_NORM_MAP
        # strip the conditional-generation prefix (language_model.*)
        tensors = {k.removeprefix("language_model."): v
                   for k, v in tensors.items()}

    emitted = set()
    for hf_tpl, gg_tpl in name_map:
        if "{i}" in hf_tpl:
            for i in range(n_layer):
                hf_name = hf_tpl.format(i=i)
                if hf_name not in tensors:
                    continue
                arr = tensors[hf_name]
                if permute and hf_name.endswith(("q_proj.weight", "q_proj.bias")):
                    arr = permute_rotary(arr, n_head)
                elif permute and hf_name.endswith(("k_proj.weight", "k_proj.bias")):
                    arr = permute_rotary(arr, n_kv)
                if is_gemma and "norm" in gg_tpl:
                    # gemma stores norm weights as (w - 1): GGUF keeps w
                    arr = np.asarray(arr, np.float32) + 1.0
                emit(gg_tpl.format(i=i), arr)
                emitted.add(hf_name)
        elif hf_tpl in tensors:
            arr = tensors[hf_tpl]
            if is_gemma and "norm" in gg_tpl:
                arr = np.asarray(arr, np.float32) + 1.0
            emit(gg_tpl, arr)
            emitted.add(hf_tpl)

    # MoE stacked experts (qwen3moe): experts.N.{gate,up,down}_proj -> 3-D
    for i in range(n_layer):
        base = f"model.layers.{i}.mlp.experts"
        if f"{base}.0.gate_proj.weight" not in tensors:
            continue
        n_exp = cfg["num_experts"]
        for proj, gg in (("gate_proj", "ffn_gate_exps"), ("up_proj", "ffn_up_exps"),
                         ("down_proj", "ffn_down_exps")):
            stack = np.stack([tensors[f"{base}.{e}.{proj}.weight"]
                              for e in range(n_exp)])
            emit(f"blk.{i}.{gg}.weight", stack)
        w.add(f"{arch}.expert_count", n_exp)
        w.add(f"{arch}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        w.add(f"{arch}.expert_feed_forward_length",
              cfg.get("moe_intermediate_size", cfg["intermediate_size"]))

    skipped = [t for t in tensors if t not in emitted
               and "rotary_emb" not in t and "experts" not in t]
    if skipped:
        print(f"warning: {len(skipped)} unmapped tensors, e.g. {skipped[:4]}",
              file=sys.stderr)
    w.write()
    return Path(out_path)


def _convert_mamba(hf_dir: Path, cfg: dict, out_path) -> Path:
    """Mamba converter (convert_hf_to_gguf.py MambaModel): A_log -> -exp(A),
    conv1d kept 3-D, head_count 0, ssm.* metadata."""
    d_model = cfg.get("hidden_size", cfg.get("d_model"))
    d_conv = cfg.get("conv_kernel", cfg.get("d_conv", 4))
    d_inner = cfg.get("intermediate_size", cfg.get("d_inner")) or 2 * d_model
    d_state = cfg.get("state_size", cfg.get("d_state", 16))
    dt_rank = cfg.get("time_step_rank", cfg.get("dt_rank")) or -(d_model // -16)
    n_layer = cfg.get("num_hidden_layers", cfg.get("n_layer"))

    w = GGUFWriter(out_path, arch="mamba")
    w.add("general.name", hf_dir.name)
    w.add("mamba.block_count", n_layer)
    w.add("mamba.context_length", 1 << 20)
    w.add("mamba.embedding_length", d_model)
    w.add("mamba.feed_forward_length", 0)
    w.add("mamba.attention.head_count", 0)
    w.add("mamba.attention.layer_norm_rms_epsilon",
          cfg.get("layer_norm_epsilon", 1e-5))
    w.add("mamba.ssm.conv_kernel", d_conv)
    w.add("mamba.ssm.inner_size", d_inner)
    w.add("mamba.ssm.state_size", d_state)
    w.add("mamba.ssm.time_step_rank", int(dt_rank))
    w.add("mamba.vocab_size", cfg["vocab_size"])
    vocab = vocab_from_tokenizer_json(hf_dir)
    if vocab is not None:
        tokens, types, merges = vocab
        w.add("tokenizer.ggml.model", "gpt2")
        w.add("tokenizer.ggml.tokens", tokens)
        w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
        w.add("tokenizer.ggml.merges", merges)
    else:
        _write_fallback_vocab(w, cfg["vocab_size"])
    for key in ("bos_token_id", "eos_token_id"):
        if cfg.get(key) is not None:
            w.add(f"tokenizer.ggml.{key}", int(cfg[key]))

    tensors = load_hf_tensors(hf_dir)
    emitted = set()
    for hf_tpl, gg_tpl in MAMBA_NAME_MAP:
        if "{i}" in hf_tpl:
            for i in range(n_layer):
                hf_name = hf_tpl.format(i=i)
                if hf_name not in tensors:
                    continue
                arr = np.asarray(tensors[hf_name], np.float32)
                if hf_name.endswith("A_log"):
                    arr = -np.exp(arr)
                if hf_name.endswith("conv1d.weight"):
                    arr = arr.reshape(d_inner, d_conv)
                w.add_tensor(gg_tpl.format(i=i), arr)
                emitted.add(hf_name)
        elif hf_tpl in tensors:
            w.add_tensor(gg_tpl, np.asarray(tensors[hf_tpl], np.float32))
            emitted.add(hf_tpl)
    w.write()
    return Path(out_path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("hf_dir")
    ap.add_argument("output")
    ap.add_argument("--outtype", default="f16",
                    choices=["f32", "f16", "bf16", "q8_0", "q4_0", "q4_1",
                             "q5_0", "q5_1", "q6_0"])
    args = ap.parse_args(argv)
    convert(args.hf_dir, args.output, args.outtype)
    print(f"wrote {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
