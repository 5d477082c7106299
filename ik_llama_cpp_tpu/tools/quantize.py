"""Model quantization tool — the analogue of llama-quantize
(examples/quantize/quantize.cpp + src/llama-quantize.cpp).

Re-quantizes a GGUF's tensors according to an ftype's per-tensor rules
(llama_tensor_get_type heuristics, simplified to the documented behavior),
with --custom-q regex overrides, imatrix weighting, --dry-run, and block-size
fallbacks (change_type_if_necessary).

Usage:
  python -m ik_llama_cpp_tpu.tools.quantize in.gguf out.gguf Q4_K_M \
      [--imatrix file.imatrix] [--custom-q "regex1=TYPE1,regex2=TYPE2"] [--dry-run]
"""
from __future__ import annotations

import argparse
import re
import sys
import time

import numpy as np

from ..gguf.constants import GGMLType, GEOMETRY, LlamaFtype
from ..gguf.reader import load_gguf
from ..gguf.writer import GGUFWriter
from ..quant.dequant import dequantize
from ..quant.quantize import QUANTIZE_FNS, quantize
from .imatrix import load_imatrix

# ftype -> (default type, attn_v/ffn_down bump type) following the reference's
# mixes: *_M variants use a higher-precision type for attn_v / ffn_down in the
# first layers and output.weight at Q6_K (llama-quantize.cpp:305+)
FTYPES: dict[str, dict] = {
    "F16": {"default": GGMLType.F16},
    "BF16": {"default": GGMLType.BF16},
    "Q8_0": {"default": GGMLType.Q8_0},
    "Q4_0": {"default": GGMLType.Q4_0},
    "Q5_0": {"default": GGMLType.Q5_0},
    "Q6_0": {"default": GGMLType.Q6_0},
    "Q4_K_S": {"default": GGMLType.Q4_K, "output": GGMLType.Q6_K},
    "Q4_K_M": {"default": GGMLType.Q4_K, "bump": GGMLType.Q6_K,
               "output": GGMLType.Q6_K},
    "Q5_K_S": {"default": GGMLType.Q5_K, "output": GGMLType.Q6_K},
    "Q5_K_M": {"default": GGMLType.Q5_K, "bump": GGMLType.Q6_K,
               "output": GGMLType.Q6_K},
    "Q6_K": {"default": GGMLType.Q6_K, "output": GGMLType.Q6_K},
    "IQ4_NL": {"default": GGMLType.IQ4_NL, "output": GGMLType.Q6_K},
    "IQ4_XS": {"default": GGMLType.IQ4_XS, "output": GGMLType.Q6_K},
    "Q4_1": {"default": GGMLType.Q4_1},
    "Q5_1": {"default": GGMLType.Q5_1},
    "Q8_KV": {"default": GGMLType.Q8_KV, "output": GGMLType.Q8_0},
    # k-quant low-bit mixes (llama-quantize.cpp:305+: attn_v/ffn_down of the
    # first layers bumped a tier, output at Q6_K/Q5_K)
    "Q2_K": {"default": GGMLType.Q2_K, "bump": GGMLType.Q4_K,
             "output": GGMLType.Q6_K},
    "Q2_K_S": {"default": GGMLType.Q2_K, "output": GGMLType.Q6_K},
    "Q3_K_S": {"default": GGMLType.Q3_K, "output": GGMLType.Q6_K},
    "Q3_K_M": {"default": GGMLType.Q3_K, "bump": GGMLType.Q5_K,
               "output": GGMLType.Q6_K},
    "Q3_K_L": {"default": GGMLType.Q3_K, "bump": GGMLType.Q6_K,
               "output": GGMLType.Q6_K},
    # i-quants (codebook) — sub-4-bit output heads stay at Q5_K like the
    # reference's iq2/iq3 rules
    "IQ1_S": {"default": GGMLType.IQ1_S, "bump": GGMLType.IQ3_S,
              "output": GGMLType.Q5_K},
    "IQ1_M": {"default": GGMLType.IQ1_M, "bump": GGMLType.IQ3_S,
              "output": GGMLType.Q5_K},
    "IQ2_XXS": {"default": GGMLType.IQ2_XXS, "bump": GGMLType.IQ3_S,
                "output": GGMLType.Q5_K},
    "IQ2_XS": {"default": GGMLType.IQ2_XS, "bump": GGMLType.IQ3_S,
               "output": GGMLType.Q5_K},
    "IQ2_S": {"default": GGMLType.IQ2_S, "bump": GGMLType.IQ3_S,
              "output": GGMLType.Q5_K},
    "IQ2_M": {"default": GGMLType.IQ2_S, "bump": GGMLType.IQ3_S,
              "output": GGMLType.Q5_K},
    "IQ3_XXS": {"default": GGMLType.IQ3_XXS, "bump": GGMLType.IQ3_S,
                "output": GGMLType.Q5_K},
    "IQ3_S": {"default": GGMLType.IQ3_S, "output": GGMLType.Q5_K},
    "IQ3_M": {"default": GGMLType.IQ3_S, "bump": GGMLType.Q4_K,
              "output": GGMLType.Q5_K},
    # ik-quants (the fork's IQK family, llama-quantize.cpp ik rules:
    # bump = next tier of the same family)
    "IQ2_K": {"default": GGMLType.IQ2_K, "bump": GGMLType.IQ3_K,
              "output": GGMLType.Q5_K},
    "IQ2_KS": {"default": GGMLType.IQ2_KS, "bump": GGMLType.IQ3_K,
               "output": GGMLType.Q5_K},
    "IQ2_KL": {"default": GGMLType.IQ2_KL, "bump": GGMLType.IQ3_K,
               "output": GGMLType.Q5_K},
    "IQ3_K": {"default": GGMLType.IQ3_K, "bump": GGMLType.IQ4_K,
              "output": GGMLType.Q5_K},
    "IQ3_KS": {"default": GGMLType.IQ3_KS, "bump": GGMLType.IQ4_K,
               "output": GGMLType.Q5_K},
    "IQ4_K": {"default": GGMLType.IQ4_K, "bump": GGMLType.IQ5_K,
              "output": GGMLType.Q6_K},
    "IQ4_KS": {"default": GGMLType.IQ4_KS, "bump": GGMLType.IQ5_K,
               "output": GGMLType.Q6_K},
    "IQ4_KSS": {"default": GGMLType.IQ4_KSS, "bump": GGMLType.IQ5_K,
                "output": GGMLType.Q6_K},
    "IQ5_K": {"default": GGMLType.IQ5_K, "bump": GGMLType.IQ6_K,
              "output": GGMLType.Q6_K},
    "IQ5_KS": {"default": GGMLType.IQ5_KS, "bump": GGMLType.IQ6_K,
               "output": GGMLType.Q6_K},
    "IQ6_K": {"default": GGMLType.IQ6_K, "output": GGMLType.Q6_K},
    # KT trellis quants (QTIP-style; numpy encoder is slow — minutes per
    # Mweight — but complete)
    "IQ1_KT": {"default": GGMLType.IQ1_KT, "bump": GGMLType.IQ3_K,
               "output": GGMLType.Q5_K},
    "IQ2_KT": {"default": GGMLType.IQ2_KT, "bump": GGMLType.IQ3_K,
               "output": GGMLType.Q5_K},
    "IQ3_KT": {"default": GGMLType.IQ3_KT, "bump": GGMLType.IQ4_K,
               "output": GGMLType.Q5_K},
    "IQ4_KT": {"default": GGMLType.IQ4_KT, "bump": GGMLType.IQ5_K,
               "output": GGMLType.Q6_K},
}

FTYPE_IDS = {
    "F16": LlamaFtype.MOSTLY_F16, "BF16": LlamaFtype.MOSTLY_BF16,
    "Q8_0": LlamaFtype.MOSTLY_Q8_0, "Q4_0": LlamaFtype.MOSTLY_Q4_0,
    "Q5_0": LlamaFtype.MOSTLY_Q5_0, "Q6_0": LlamaFtype.MOSTLY_Q6_0,
    "Q4_K_S": LlamaFtype.MOSTLY_Q4_K_S, "Q4_K_M": LlamaFtype.MOSTLY_Q4_K_M,
    "Q5_K_S": LlamaFtype.MOSTLY_Q5_K_S, "Q5_K_M": LlamaFtype.MOSTLY_Q5_K_M,
    "Q6_K": LlamaFtype.MOSTLY_Q6_K, "IQ4_NL": LlamaFtype.MOSTLY_IQ4_NL,
    "IQ4_XS": LlamaFtype.MOSTLY_IQ4_XS,
    "Q4_1": LlamaFtype.MOSTLY_Q4_1, "Q5_1": LlamaFtype.MOSTLY_Q5_1,
    "Q8_KV": LlamaFtype.MOSTLY_Q8_KV,
    "Q2_K": LlamaFtype.MOSTLY_Q2_K, "Q2_K_S": LlamaFtype.MOSTLY_Q2_K_S,
    "Q3_K_S": LlamaFtype.MOSTLY_Q3_K_S, "Q3_K_M": LlamaFtype.MOSTLY_Q3_K_M,
    "Q3_K_L": LlamaFtype.MOSTLY_Q3_K_L,
    "IQ1_S": LlamaFtype.MOSTLY_IQ1_S, "IQ1_M": LlamaFtype.MOSTLY_IQ1_M,
    "IQ2_XXS": LlamaFtype.MOSTLY_IQ2_XXS, "IQ2_XS": LlamaFtype.MOSTLY_IQ2_XS,
    "IQ2_S": LlamaFtype.MOSTLY_IQ2_S, "IQ2_M": LlamaFtype.MOSTLY_IQ2_M,
    "IQ3_XXS": LlamaFtype.MOSTLY_IQ3_XXS, "IQ3_S": LlamaFtype.MOSTLY_IQ3_S,
    "IQ3_M": LlamaFtype.MOSTLY_IQ3_M,
    "IQ2_K": LlamaFtype.MOSTLY_IQ2_K, "IQ2_KS": LlamaFtype.MOSTLY_IQ2_KS,
    "IQ2_KL": LlamaFtype.MOSTLY_IQ2_KL, "IQ3_K": LlamaFtype.MOSTLY_IQ3_K,
    "IQ3_KS": LlamaFtype.MOSTLY_IQ3_KS, "IQ4_K": LlamaFtype.MOSTLY_IQ4_K,
    "IQ4_KS": LlamaFtype.MOSTLY_IQ4_KS,
    "IQ4_KSS": LlamaFtype.MOSTLY_IQ4_KSS, "IQ5_K": LlamaFtype.MOSTLY_IQ5_K,
    "IQ5_KS": LlamaFtype.MOSTLY_IQ5_KS, "IQ6_K": LlamaFtype.MOSTLY_IQ6_K,
    "IQ1_KT": LlamaFtype.MOSTLY_IQ1_KT, "IQ2_KT": LlamaFtype.MOSTLY_IQ2_KT,
    "IQ3_KT": LlamaFtype.MOSTLY_IQ3_KT, "IQ4_KT": LlamaFtype.MOSTLY_IQ4_KT,
}

# tensors never quantized (same exclusions as the reference)
_KEEP_F32 = re.compile(
    r".*(_norm\.weight|ffn_gate_inp\.weight|ffn_gate_inp_shexp\.weight"
    r"|exp_probs_b\.bias|\.bias|rope_freqs\.weight|attn_sinks)$")


def tensor_target_type(name: str, shape, ftype_rules: dict,
                       custom: list[tuple[re.Pattern, GGMLType]],
                       n_layer: int) -> GGMLType:
    for pat, t in custom:
        if pat.search(name):
            return t
    if _KEEP_F32.match(name):
        return GGMLType.F32
    if name == "token_embd.weight":
        return ftype_rules.get("default")
    if name == "output.weight":
        return ftype_rules.get("output", ftype_rules["default"])
    default = ftype_rules["default"]
    bump = ftype_rules.get("bump")
    if bump is not None:
        m = re.match(r"blk\.(\d+)\.(attn_v|ffn_down)\.weight", name)
        if m and int(m.group(1)) < max(1, n_layer // 8):
            return bump
    return default


def change_type_if_necessary(ttype: GGMLType, n_per_row: int) -> GGMLType:
    """Block-size fallback chain like the reference (llama-quantize.cpp:222)."""
    if ttype == GGMLType.F32 or n_per_row % GEOMETRY[ttype].block_elems == 0:
        return ttype
    for fb in (GGMLType.IQ4_NL, GGMLType.Q8_0, GGMLType.F16):
        if n_per_row % GEOMETRY[fb].block_elems == 0 and fb in QUANTIZE_FNS:
            return fb
    return GGMLType.F16


def quantize_model(in_path, out_path, ftype: str, *, custom_q: str = "",
                   imatrix_path: str | None = None, dry_run: bool = False,
                   verbose: bool = True):
    rules = FTYPES[ftype.upper()]
    custom = []
    if custom_q:
        for rule in custom_q.split(","):
            pat, _, tname = rule.partition("=")
            custom.append((re.compile(pat), GGMLType[tname.strip().upper()]))
    imatrix = load_imatrix(imatrix_path) if imatrix_path else {}

    gg = load_gguf(in_path)
    arch = gg.metadata.get("general.architecture", "llama")
    n_layer = int(gg.metadata.get(f"{arch}.block_count", 0))

    w = GGUFWriter(out_path)
    for k, v in gg.metadata.items():
        if k == "general.file_type":
            continue
        w.add(k, v)
    w.add("general.file_type", int(FTYPE_IDS.get(ftype.upper(), 0)))

    total_in = total_out = 0
    for name, info in gg.tensors.items():
        n_per_row = info.shape[0]
        nrows = info.n_elements // n_per_row
        src_bytes = info.n_bytes
        # only 2-D+ weight matrices get quantized; small/1-D stay f32
        is_matrix = len(info.shape) >= 2 and n_per_row % 32 == 0
        ttype = tensor_target_type(name, info.shape, rules, custom, n_layer) \
            if is_matrix else GGMLType.F32
        ttype = change_type_if_necessary(ttype, n_per_row)
        if ttype not in QUANTIZE_FNS:
            ttype = GGMLType.F16
        new_bytes = GEOMETRY[ttype].row_bytes(n_per_row) * nrows
        total_in += src_bytes
        total_out += new_bytes
        if verbose:
            bpw = new_bytes * 8 / info.n_elements
            print(f"{name:48s} {str(tuple(info.shape)):>20s} "
                  f"{info.ggml_type.name:>8s} -> {ttype.name:<8s} {bpw:5.2f} bpw",
                  file=sys.stderr)
        if dry_run:
            continue
        if ttype == info.ggml_type:
            w.add_tensor(name, bytes(info.data), shape=info.shape, ggml_type=ttype)
            continue
        data = dequantize(info.data, info.ggml_type, n_per_row)
        im = imatrix.get(name)
        if im is not None and len(im) != n_per_row:
            im = None
        qbytes = quantize(data.reshape(nrows, n_per_row), ttype, imatrix=im)
        w.add_tensor(name, qbytes, shape=info.shape, ggml_type=ttype)

    if verbose:
        print(f"total: {total_in / 1e6:.2f} MB -> {total_out / 1e6:.2f} MB "
              f"({total_out * 8 / max(sum(t.n_elements for t in gg.tensors.values()), 1):.2f} bpw)",
              file=sys.stderr)
    if not dry_run:
        w.write()
    return total_out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("ftype", choices=sorted(FTYPES))
    ap.add_argument("--imatrix")
    ap.add_argument("--custom-q", default="")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)
    t0 = time.time()
    quantize_model(args.input, args.output, args.ftype, custom_q=args.custom_q,
                   imatrix_path=args.imatrix, dry_run=args.dry_run)
    print(f"done in {time.time() - t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
