"""LoRA adapter loading / application / merging.

GGUF adapter format matches the reference's convert_lora_to_gguf.py output:
``general.type = "adapter"``, ``adapter.type = "lora"``,
``adapter.lora.alpha`` (f32), and per-target tensor pairs
``<base-name>.lora_a`` (ne = (n_in, r)) / ``<base-name>.lora_b``
(ne = (r, n_out)).

Application is runtime low-rank (llm_build_lora_mm semantics, src/llama.cpp):
the quantized base weights stay untouched and each adapted linear gains a
``scale * (x @ A^T) @ B^T`` term. ``merge_lora`` is the export-lora analogue
(examples/export-lora): dequantize, add the delta, write F16.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import load_gguf
from ..gguf.writer import GGUFWriter
from ..models.weights import DenseLinear, LoraLinear, QLinear, dequant_tensor
from ..quant.quantize import quantize


# maps param-dict keys (models/llama.py) to GGUF tensor names
_BLK_KEY_TO_NAME = {
    "wq": "attn_q.weight",
    "wk": "attn_k.weight",
    "wv": "attn_v.weight",
    "wqkv": "attn_qkv.weight",
    "wo": "attn_output.weight",
    "ffn_gate": "ffn_gate.weight",
    "ffn_up": "ffn_up.weight",
    "ffn_down": "ffn_down.weight",
}


@dataclass
class LoraAdapter:
    """One loaded adapter: target tensor name -> (A (r, n_in), B (n_out, r))."""
    path: str
    alpha: float
    tensors: dict[str, tuple[np.ndarray, np.ndarray]]
    scale: float = 1.0      # user scale multiplier

    @property
    def rank(self) -> int:
        if not self.tensors:
            return 0
        a, _ = next(iter(self.tensors.values()))
        return a.shape[0]

    def effective_scale(self) -> float:
        r = self.rank or 1
        return self.scale * (self.alpha / r if self.alpha > 0 else 1.0)


def load_lora_gguf(path: str | Path) -> LoraAdapter:
    gg = load_gguf(path)
    md = gg.metadata
    if str(md.get("general.type", "")) not in ("adapter", ""):
        raise ValueError(f"{path}: not an adapter GGUF")
    alpha = float(np.asarray(md.get("adapter.lora.alpha", 0.0)))
    pairs: dict[str, dict[str, np.ndarray]] = {}
    for name, info in gg.tensors.items():
        if name.endswith(".lora_a"):
            base, part = name[: -len(".lora_a")], "a"
        elif name.endswith(".lora_b"):
            base, part = name[: -len(".lora_b")], "b"
        else:
            continue
        pairs.setdefault(base, {})[part] = dequant_tensor(info)
    tensors = {}
    for base, ab in pairs.items():
        if "a" in ab and "b" in ab:
            tensors[base] = (ab["a"].astype(np.float32), ab["b"].astype(np.float32))
    return LoraAdapter(path=str(path), alpha=alpha, tensors=tensors)


def _wrap(linear, a: np.ndarray, b: np.ndarray, scale: float):
    # our linears are (K=n_in, N=n_out); delta^T = A^T @ B^T
    a_t = jnp.asarray(np.ascontiguousarray(a.T), jnp.bfloat16)   # (n_in, r)
    b_t = jnp.asarray(np.ascontiguousarray(b.T), jnp.bfloat16)   # (r, n_out)
    base = linear.base if isinstance(linear, LoraLinear) else linear
    return LoraLinear(base, a_t, b_t, jnp.float32(scale))


def apply_lora(params: dict, adapter: LoraAdapter) -> dict:
    """Wrap every adapted linear in params with a LoraLinear. Returns the
    same dict (mutated)."""
    s = adapter.effective_scale()
    if "output.weight" in adapter.tensors:
        a, b = adapter.tensors["output.weight"]
        params["output"] = _wrap(params["output"], a, b, s)
    for i, blk in enumerate(params["blocks"]):
        for key, suffix in _BLK_KEY_TO_NAME.items():
            name = f"blk.{i}.{suffix}"
            if key in blk and name in adapter.tensors:
                a, b = adapter.tensors[name]
                blk[key] = _wrap(blk[key], a, b, s)
    return params


def strip_lora(params: dict) -> dict:
    """Remove all LoraLinear wrappers (restore base weights)."""
    if isinstance(params.get("output"), LoraLinear):
        params["output"] = params["output"].base
    for blk in params["blocks"]:
        for key in list(blk):
            if isinstance(blk[key], LoraLinear):
                blk[key] = blk[key].base
    return params


def set_lora_scale(params: dict, scale: float, adapter: LoraAdapter) -> None:
    """Rescale applied adapters in place (POST /lora-adapters semantics) —
    only the scale leaf changes, so jitted steps do not recompile."""
    adapter.scale = scale
    s = jnp.float32(adapter.effective_scale())
    if isinstance(params.get("output"), LoraLinear):
        params["output"].scale = s
    for blk in params["blocks"]:
        for key in blk:
            if isinstance(blk[key], LoraLinear):
                blk[key].scale = s


def merge_lora(base_path: str | Path, lora_path: str | Path,
               out_path: str | Path, *, scale: float = 1.0) -> Path:
    """export-lora analogue: merge adapter into base GGUF, writing adapted
    tensors as F16 (examples/export-lora/export-lora.cpp)."""
    gg = load_gguf(base_path)
    adapter = load_lora_gguf(lora_path)
    adapter.scale = scale
    s = adapter.effective_scale()

    arch = str(gg.metadata["general.architecture"])
    w = GGUFWriter(out_path, arch=arch)
    for key, val in gg.metadata.items():
        if key == "general.architecture":
            continue
        w.add(key, val)
    for name, info in gg.tensors.items():
        if name in adapter.tensors:
            a, b = adapter.tensors[name]
            dense = dequant_tensor(info)            # logical (n_out, n_in)
            delta = (b @ a) * s
            merged = (dense.reshape(delta.shape) + delta).astype(np.float32)
            w.add_tensor(name, quantize(merged, GGMLType.F16),
                         shape=tuple(reversed(merged.shape)),
                         ggml_type=GGMLType.F16)
        else:
            w.add_tensor(name, info.data, shape=info.shape,
                         ggml_type=info.ggml_type)
    w.write()
    return Path(out_path)


def write_lora_gguf(path: str | Path, arch: str, alpha: float,
                    tensors: dict[str, tuple[np.ndarray, np.ndarray]]) -> Path:
    """Write a LoRA adapter GGUF (convert_lora_to_gguf.py output format)."""
    w = GGUFWriter(path, arch=arch)
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", float(alpha))
    for base, (a, b) in tensors.items():
        w.add_tensor(base + ".lora_a", a.astype(np.float32))
        w.add_tensor(base + ".lora_b", b.astype(np.float32))
    w.write()
    return Path(path)
