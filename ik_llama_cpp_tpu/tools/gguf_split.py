"""Split / merge multi-part GGUFs — examples/gguf-split analogue.

Split mode writes `base-00001-of-000NN.gguf` shards (metadata + split.* keys
in the first shard, tensors distributed by --split-max-tensors or
--split-max-size); merge mode recombines them into one file. The runtime
loader follows the split naming transparently (gguf/reader.py load_gguf).

Usage:
  python -m ik_llama_cpp_tpu.tools.gguf_split --split in.gguf out_base \
      [--split-max-tensors 128 | --split-max-size 500M]
  python -m ik_llama_cpp_tpu.tools.gguf_split --merge in-00001-of-000NN.gguf out.gguf
"""
from __future__ import annotations

import argparse
from pathlib import Path

from ..gguf.reader import load_gguf
from ..gguf.writer import GGUFWriter

LLM_KV_SPLIT_NO = "split.no"
LLM_KV_SPLIT_COUNT = "split.count"
LLM_KV_SPLIT_TENSORS_COUNT = "split.tensors.count"


def _parse_size(s: str) -> int:
    s = s.strip().upper()
    mult = 1
    if s.endswith("K"):
        mult, s = 1 << 10, s[:-1]
    elif s.endswith("M"):
        mult, s = 1 << 20, s[:-1]
    elif s.endswith("G"):
        mult, s = 1 << 30, s[:-1]
    return int(float(s) * mult)


def split_gguf(in_path, out_base, *, max_tensors: int = 128,
               max_size: int = 0) -> list[Path]:
    gg = load_gguf(in_path)
    names = list(gg.tensors)
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for name in names:
        info = gg.tensors[name]
        nb = len(info.data)
        full = (len(cur) >= max_tensors if max_size == 0
                else cur and cur_bytes + nb > max_size)
        if full:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(name)
        cur_bytes += nb
    if cur:
        groups.append(cur)

    n = len(groups)
    out_paths = []
    arch = str(gg.metadata["general.architecture"])
    for i, group in enumerate(groups):
        p = Path(f"{out_base}-{i + 1:05d}-of-{n:05d}.gguf")
        w = GGUFWriter(p, arch=arch)
        if i == 0:      # full metadata only in the first shard
            for k, v in gg.metadata.items():
                if k != "general.architecture":
                    w.add(k, v)
        w.add(LLM_KV_SPLIT_NO, i)
        w.add(LLM_KV_SPLIT_COUNT, n)
        w.add(LLM_KV_SPLIT_TENSORS_COUNT, len(names))
        for name in group:
            info = gg.tensors[name]
            w.add_tensor(name, info.data, shape=info.shape,
                         ggml_type=info.ggml_type)
        w.write()
        out_paths.append(p)
    return out_paths


def merge_gguf(first_shard, out_path) -> Path:
    gg = load_gguf(first_shard)     # reader already unions all shards
    arch = str(gg.metadata["general.architecture"])
    w = GGUFWriter(out_path, arch=arch)
    for k, v in gg.metadata.items():
        if k == "general.architecture" or k.startswith("split."):
            continue
        w.add(k, v)
    for name, info in gg.tensors.items():
        w.add_tensor(name, info.data, shape=info.shape, ggml_type=info.ggml_type)
    w.write()
    return Path(out_path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", action="store_true")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--split-max-tensors", type=int, default=128)
    ap.add_argument("--split-max-size", default="")
    args = ap.parse_args(argv)
    if args.merge:
        p = merge_gguf(args.input, args.output)
        print(f"merged -> {p}")
    else:
        size = _parse_size(args.split_max_size) if args.split_max_size else 0
        paths = split_gguf(args.input, args.output,
                           max_tensors=args.split_max_tensors, max_size=size)
        for p in paths:
            print(p)


if __name__ == "__main__":
    main()
