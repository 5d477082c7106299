"""Per-tensor + whole-model hashing of GGUF files — examples/gguf-hash
analogue (sha256/sha1/xxh64-style manifests for model provenance checks).

Usage:
  python -m ik_llama_cpp_tpu.tools.gguf_hash model.gguf [--algo sha256|sha1|blake2b]
"""
from __future__ import annotations

import argparse
import hashlib

from ..gguf.reader import load_gguf


def hash_gguf(path, algo: str = "sha256") -> dict:
    gg = load_gguf(path)
    out = {}
    total = hashlib.new(algo)
    for name, info in gg.tensors.items():
        h = hashlib.new(algo)
        data = bytes(info.data)
        h.update(data)
        total.update(data)
        out[name] = h.hexdigest()
    out["__model__"] = total.hexdigest()
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--algo", default="sha256",
                    choices=["sha256", "sha1", "blake2b", "md5"])
    args = ap.parse_args(argv)
    hashes = hash_gguf(args.model, args.algo)
    model_h = hashes.pop("__model__")
    for name, h in hashes.items():
        print(f"{args.algo}  {h}  {args.model}:{name}")
    print(f"{args.algo}  {model_h}  {args.model}")


if __name__ == "__main__":
    main()
