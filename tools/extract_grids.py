"""Extract the i-quant codebook grids from the reference header into
ik_llama_cpp_tpu/quant/grids.npz.

The grids (iq2xxs_grid etc., ggml-common.h:874-1950) are learned codebooks —
data contracts of the GGUF formats, identical in every decoder. This script
parses them out of the header once; the .npz is committed.

Usage: python tools/extract_grids.py [/root/reference/ggml/src/ggml-common.h]
"""
import re
import sys
from pathlib import Path

import numpy as np

WANTED = {
    "iq2xxs_grid": np.uint64,
    "iq2xs_grid": np.uint64,
    "iq2s_grid": np.uint64,
    "iq3xxs_grid": np.uint32,
    "iq3s_grid": np.uint32,
    "iq1s_grid": np.uint64,
}


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else
               "/root/reference/ggml/src/ggml-common.h").read_text()
    out = {}
    for m in re.finditer(
            r"GGML_TABLE_BEGIN\((\w+),\s*(\w+),\s*(\w+)\)(.*?)GGML_TABLE_END\(\)",
            src, re.S):
        _ctype, name, _size, body = m.groups()
        if name not in WANTED:
            continue
        vals = [int(tok, 0) for tok in re.findall(r"0x[0-9a-fA-F]+|\d+", body)]
        out[name] = np.asarray(vals, dtype=WANTED[name])
        print(f"{name}: {len(vals)} entries")
    dest = Path(__file__).resolve().parent.parent / "ik_llama_cpp_tpu/quant/grids.npz"
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
