"""HBM capacity planner — decides how a model fits on v5e chips.

The reference answers "does DeepSeek-R1 671B fit?" with hybrid CPU+GPU
offload (BASELINE.md, discussions/223); the TPU-native answer is weight
quantization (int8 planar / int4 word-packed / supergroup-int8) plus
tensor/expert-parallel sharding over an ICI mesh. This tool computes the
per-chip HBM footprint for a config and proposes the smallest mesh that
fits, so a deployment can be sized before any weights are downloaded.

Usage:
  python -m ik_llama_cpp_tpu.tools.memory_plan --preset deepseek-r1
  python -m ik_llama_cpp_tpu.tools.memory_plan --gguf model.gguf -c 16384
"""
from __future__ import annotations

import argparse
import json
from dataclasses import dataclass

HBM_BYTES = 16 * 1024**3        # v5e
HBM_HEADROOM = 0.92             # leave room for XLA scratch + fragmentation


@dataclass
class WeightScheme:
    name: str
    bits_per_weight: float      # code bits
    scale_overhead: float       # fraction (group scales etc.)

    def bytes_per_weight(self) -> float:
        return self.bits_per_weight / 8.0 * (1.0 + self.scale_overhead)


SCHEMES = {
    # int8 planar: 1 B/code + bf16 group-32 scales
    "int8": WeightScheme("int8", 8, 2.0 / 32.0),
    # int4 word-packed: 0.5 B/code + bf16 group-32 scales
    "int4": WeightScheme("int4", 4, 2.0 / 16.0),
    # supergroup int8 (QLinearI8): 1 B/code + f32 per-256 scales
    "i8mxu": WeightScheme("i8mxu", 8, 4.0 / 256.0),
    "bf16": WeightScheme("bf16", 16, 0.0),
}


@dataclass
class ModelShape:
    name: str
    n_layer: int
    n_embd: int
    n_head: int
    n_head_kv: int              # 0 => MLA latent cache
    head_dim: int
    n_ff: int                   # dense FFN width (leading dense layers)
    n_dense_layer: int          # layers with dense FFN
    n_expert: int = 0
    n_expert_used: int = 0
    n_ff_exp: int = 0
    n_vocab: int = 32000
    kv_lora: int = 0            # MLA latent width (+rope dim) per token
    rope_dim: int = 0

    def weight_params(self) -> dict:
        e, hd = self.n_embd, self.head_dim
        attn = self.n_layer * (
            # q/k/v/o (GQA) or MLA projections approximated by q + latent
            e * self.n_head * hd + 2 * e * max(self.n_head_kv, 1) * hd
            + self.n_head * hd * e)
        dense = self.n_dense_layer * 3 * e * self.n_ff
        moe_layers = self.n_layer - self.n_dense_layer
        experts = moe_layers * self.n_expert * 3 * e * self.n_ff_exp
        shexp = moe_layers * 3 * e * self.n_ff_exp if self.n_expert else 0
        embd = 2 * self.n_vocab * e
        return {"attention": attn, "dense_ffn": dense, "experts": experts,
                "shared_experts": shexp, "embeddings": embd}

    def kv_bytes_per_token(self, kv_dtype_bytes: float = 1.0) -> float:
        """int8 cache by default; MLA stores one latent row per token."""
        if self.kv_lora:
            return self.n_layer * (self.kv_lora + self.rope_dim) \
                * kv_dtype_bytes
        return self.n_layer * 2 * self.n_head_kv * self.head_dim \
            * kv_dtype_bytes


PRESETS = {
    # DeepSeek-R1 671B: 61 layers, 3 dense + 58 MoE x 256 experts,
    # MLA kv_lora 512 + 64 rope (config.json of DeepSeek-R1)
    "deepseek-r1": ModelShape(
        "DeepSeek-R1 671B", n_layer=61, n_embd=7168, n_head=128,
        n_head_kv=0, head_dim=192, n_ff=18432, n_dense_layer=3,
        n_expert=256, n_expert_used=8, n_ff_exp=2048, n_vocab=129280,
        kv_lora=512, rope_dim=64),
    "qwen3-30b-a3b": ModelShape(
        "Qwen3-30B-A3B", n_layer=48, n_embd=2048, n_head=32, n_head_kv=4,
        head_dim=128, n_ff=6144, n_dense_layer=0, n_expert=128,
        n_expert_used=8, n_ff_exp=768, n_vocab=151936),
    "llama-8b": ModelShape(
        "LLaMA-3.1-8B", n_layer=32, n_embd=4096, n_head=32, n_head_kv=8,
        head_dim=128, n_ff=14336, n_dense_layer=32, n_vocab=128256),
}


def plan(shape: ModelShape, scheme: str = "int4", ctx: int = 16384,
         batch: int = 1, mesh_limit: int = 64) -> dict:
    """Smallest (tp x ep) mesh where per-chip footprint fits HBM.

    Sharding model: expert weights divide over ep x tp (EP splits experts,
    TP column/row-splits each); attention + dense divide over tp; the
    MLA latent KV cache is replicated over tp (the absorb layout,
    parallel/mesh.py) while GQA KV divides its heads over tp."""
    sch = SCHEMES[scheme]
    parts = shape.weight_params()
    total_params = sum(parts.values())
    kv_tok = shape.kv_bytes_per_token()

    budget = HBM_BYTES * HBM_HEADROOM
    for n_chips in (1, 2, 4, 8, 16, 32, 64):
        if n_chips > mesh_limit:
            break
        w_bytes = total_params * sch.bytes_per_weight() / n_chips
        # MLA latent cache is replicated under TP (absorb layout); GQA
        # caches divide their kv heads across chips
        kv_bytes = batch * ctx * kv_tok
        if not shape.kv_lora:
            kv_bytes /= min(n_chips, max(shape.n_head_kv, 1))
        act_bytes = 512 * shape.n_embd * 4 * 8   # prefill activations est.
        need = w_bytes + kv_bytes + act_bytes
        if need <= budget:
            return {
                "model": shape.name, "scheme": scheme, "ctx": ctx,
                "chips": n_chips,
                "per_chip_gib": round(need / 1024**3, 2),
                "weights_gib": round(w_bytes / 1024**3, 2),
                "kv_gib": round(kv_bytes / 1024**3, 2),
                "total_params_b": round(total_params / 1e9, 1),
                "kv_bytes_per_token": int(kv_tok),
                "fits": True,
            }
    return {"model": shape.name, "scheme": scheme, "fits": False,
            "total_params_b": round(total_params / 1e9, 1)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default=None)
    ap.add_argument("--gguf", help="derive the shape from a GGUF header")
    ap.add_argument("--scheme", choices=sorted(SCHEMES), default="int4")
    ap.add_argument("-c", "--ctx", type=int, default=16384)
    ap.add_argument("-b", "--batch", type=int, default=1)
    args = ap.parse_args(argv)

    if args.gguf:
        from ..gguf.reader import load_gguf
        from ..models.config import config_from_gguf
        cfg = config_from_gguf(load_gguf(args.gguf).metadata)
        shape = ModelShape(
            str(args.gguf), n_layer=cfg.n_layer, n_embd=cfg.n_embd,
            n_head=cfg.n_head, n_head_kv=0 if cfg.n_lora_kv else cfg.n_head_kv,
            head_dim=cfg.head_dim, n_ff=cfg.n_ff,
            n_dense_layer=(cfg.n_layer if not cfg.n_expert
                           else cfg.n_layer_dense_lead),
            n_expert=cfg.n_expert, n_expert_used=cfg.n_expert_used,
            n_ff_exp=cfg.n_ff_exp or 0, n_vocab=cfg.n_vocab,
            kv_lora=cfg.n_lora_kv or 0,
            rope_dim=cfg.rope_dim or 0)
    else:
        shape = PRESETS[args.preset or "llama-8b"]

    print(json.dumps(plan(shape, args.scheme, args.ctx, args.batch)))


if __name__ == "__main__":
    main()
