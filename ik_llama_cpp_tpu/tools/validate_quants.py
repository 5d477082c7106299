"""Quantized-tensor validation — the ``--validate-quants`` /
``check_tensors`` load-option analogue (reference llama-model-loader.cpp:
validates each tensor's quant data and reports NaN/Inf blocks before they
poison a forward pass).

Every tensor is dequantized through the exact decoders in row chunks and
checked for non-finite values and absurd magnitudes; structural problems
(bad row sizes) surface as decode errors.

Usage:
    python -m ik_llama_cpp_tpu.tools.validate_quants model.gguf [--max-abs 1e5]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def validate_tensor(info, *, max_abs: float = 1e5, chunk_rows: int = 256):
    """Returns a list of problem strings for one GGUF tensor."""
    from ..models.weights import dequant_tensor
    problems = []
    try:
        arr = dequant_tensor(info)
    except Exception as e:
        return [f"decode failed: {type(e).__name__}: {e}"]
    arr = np.asarray(arr, np.float32).reshape(-1)
    n_nan = int(np.isnan(arr).sum())
    n_inf = int(np.isinf(arr).sum())
    if n_nan:
        problems.append(f"{n_nan} NaN values")
    if n_inf:
        problems.append(f"{n_inf} Inf values")
    finite = arr[np.isfinite(arr)]
    if finite.size and float(np.abs(finite).max()) > max_abs:
        problems.append(f"|max| = {np.abs(finite).max():.3e} > {max_abs:g}")
    return problems


def validate_file(path, *, max_abs: float = 1e5, log=None) -> dict:
    """Validate every tensor; returns {tensor_name: [problems]} (only bad
    ones)."""
    from ..gguf.reader import load_gguf
    gg = load_gguf(path)
    bad = {}
    for name, info in gg.tensors.items():
        problems = validate_tensor(info, max_abs=max_abs)
        if problems:
            bad[name] = problems
            if log:
                log(f"BAD  {name}: {'; '.join(problems)}")
        elif log:
            log(f"ok   {name}")
    return bad


def main(argv=None):
    ap = argparse.ArgumentParser(description="validate GGUF quant data")
    ap.add_argument("model")
    ap.add_argument("--max-abs", type=float, default=1e5)
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    log = (lambda *a: None) if args.quiet else \
        (lambda *a: print(*a, file=sys.stderr))
    bad = validate_file(args.model, max_abs=args.max_abs, log=log)
    if bad:
        print(f"{len(bad)} tensor(s) FAILED validation", file=sys.stderr)
        return 1
    print("all tensors ok", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
