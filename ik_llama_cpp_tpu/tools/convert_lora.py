"""HF PEFT LoRA adapter -> GGUF adapter converter.

The analogue of the reference's convert_lora_to_gguf.py: reads
``adapter_config.json`` + ``adapter_model.safetensors`` (or ``.bin``) and
writes a GGUF with ``general.type = adapter`` and ``.lora_a``/``.lora_b``
tensor pairs named after the base-model GGUF tensors.

Usage:
  python -m ik_llama_cpp_tpu.tools.convert_lora <peft_dir> -o adapter.gguf \
      [--arch llama]
"""
from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import numpy as np

from ..runtime.lora import write_lora_gguf

# HF module -> GGUF tensor-name fragment (convert_lora_to_gguf's tensor map)
_HF_TO_GGUF = {
    "self_attn.q_proj": "attn_q.weight",
    "self_attn.k_proj": "attn_k.weight",
    "self_attn.v_proj": "attn_v.weight",
    "self_attn.o_proj": "attn_output.weight",
    "self_attn.qkv_proj": "attn_qkv.weight",
    "mlp.gate_proj": "ffn_gate.weight",
    "mlp.up_proj": "ffn_up.weight",
    "mlp.down_proj": "ffn_down.weight",
    "mlp.gate_up_proj": "ffn_up.weight",
    "lm_head": "output.weight",
}

_LAYER_RE = re.compile(r"layers\.(\d+)\.(.+?)\.lora_(A|B)\.weight$")
_HEAD_RE = re.compile(r"(lm_head)\.lora_(A|B)\.weight$")


def _load_state_dict(peft_dir: Path) -> dict[str, np.ndarray]:
    st_path = peft_dir / "adapter_model.safetensors"
    if st_path.exists():
        try:
            from safetensors.numpy import load_file
            return load_file(st_path)
        except ImportError:
            from safetensors.torch import load_file as load_t
            return {k: v.float().numpy() for k, v in load_t(st_path).items()}
    bin_path = peft_dir / "adapter_model.bin"
    if bin_path.exists():
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no adapter_model.[safetensors|bin] in {peft_dir}")


def convert_peft_dir(peft_dir: str | Path, out_path: str | Path,
                     arch: str = "llama") -> Path:
    peft_dir = Path(peft_dir)
    cfg = json.loads((peft_dir / "adapter_config.json").read_text())
    alpha = float(cfg.get("lora_alpha", cfg.get("alpha", 0.0)))
    sd = _load_state_dict(peft_dir)

    pairs: dict[str, dict[str, np.ndarray]] = {}
    for key, arr in sd.items():
        m = _LAYER_RE.search(key)
        if m:
            il, module, part = int(m.group(1)), m.group(2), m.group(3)
            frag = _HF_TO_GGUF.get(module)
            if frag is None:
                continue
            name = f"blk.{il}.{frag}"
        else:
            m = _HEAD_RE.search(key)
            if not m:
                continue
            name, part = "output.weight", m.group(2)
        pairs.setdefault(name, {})[part.lower()] = np.asarray(arr, np.float32)

    tensors = {}
    for name, ab in pairs.items():
        if "a" in ab and "b" in ab:
            tensors[name] = (ab["a"], ab["b"])    # A (r, n_in), B (n_out, r)
    if not tensors:
        raise ValueError("no LoRA tensor pairs found in adapter")
    return write_lora_gguf(out_path, arch, alpha, tensors)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("peft_dir")
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--arch", default="llama")
    args = ap.parse_args(argv)
    p = convert_peft_dir(args.peft_dir, args.out, args.arch)
    print(f"wrote {p}")


if __name__ == "__main__":
    main()
