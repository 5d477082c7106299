"""Per-tensor quantization error statistics — analogue of quantize-stats
(examples/quantize-stats/): RMSE / max-err / histogram of each tensor under a
candidate quant type, against the model's own float weights.

Usage: python -m ik_llama_cpp_tpu.tools.quantize_stats --gguf m.gguf --type Q4_K
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from ..gguf.constants import GGMLType, GEOMETRY
from ..gguf.reader import load_gguf
from ..quant.dequant import dequantize
from ..quant.quantize import QUANTIZE_FNS, quantize


def tensor_stats(x: np.ndarray, ttype: GGMLType, imatrix=None):
    n = x.shape[-1]
    q = quantize(x, ttype, imatrix)
    y = dequantize(q, ttype, n).reshape(x.shape)
    err = (y - x).astype(np.float64)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    maxerr = float(np.abs(err).max())
    denom = float(np.sqrt(np.mean(x.astype(np.float64) ** 2))) or 1.0
    return {"rmse": rmse, "max_err": maxerr, "rel_rmse": rmse / denom}


def run(gguf_path, ttype: GGMLType, include=None, verbose=True):
    gg = load_gguf(gguf_path)
    rows = []
    total_sq = 0.0
    total_n = 0
    for name, info in gg.tensors.items():
        if len(info.shape) < 2:
            continue
        if include and include not in name:
            continue
        n = info.shape[0]
        if n % GEOMETRY[ttype].block_elems != 0:
            continue
        x = dequantize(info.data, info.ggml_type, n)
        st = tensor_stats(x, ttype)
        rows.append((name, st))
        total_sq += st["rmse"] ** 2 * x.size
        total_n += x.size
        if verbose:
            print(f"{name:48s} rmse={st['rmse']:.6f} max={st['max_err']:.6f} "
                  f"rel={st['rel_rmse']:.4f}", file=sys.stderr)
    overall = float(np.sqrt(total_sq / max(total_n, 1)))
    if verbose:
        print(f"overall rmse for {ttype.name}: {overall:.6f}", file=sys.stderr)
    return rows, overall


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--type", default="Q4_K",
                    choices=[t.name for t in QUANTIZE_FNS])
    ap.add_argument("--include", default=None, help="substring filter")
    args = ap.parse_args(argv)
    run(args.gguf, GGMLType[args.type], args.include)


if __name__ == "__main__":
    main()
