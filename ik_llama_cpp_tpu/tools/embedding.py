"""Embedding extraction CLI — examples/embedding analogue.

Tokenizes each prompt (one per line or per ``-p`` flag), runs the model,
and prints pooled embeddings (examples/embedding/embedding.cpp:118-205:
batch_decode + pooling + optional L2 normalization + cosine-similarity
matrix for multiple prompts).

Usage:
    python -m ik_llama_cpp_tpu.tools.embedding -m model.gguf -p "text" \
        [--pooling mean|cls|last|none] [--embd-normalize 2] [--sim]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def normalize(v: np.ndarray, p: int) -> np.ndarray:
    """common_embd_normalize (common.cpp): p=-1 none, 0 max-abs, 2 L2."""
    if p < 0:
        return v
    if p == 0:
        d = np.abs(v).max()
    elif p == 2:
        d = np.linalg.norm(v)
    else:
        d = (np.abs(v) ** p).sum() ** (1.0 / p)
    return v / d if d > 0 else v


def main(argv=None):
    ap = argparse.ArgumentParser(description="print model embeddings")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", action="append", default=[],
                    help="prompt (repeatable); '-' reads lines from stdin")
    ap.add_argument("--pooling", default="mean",
                    choices=["mean", "cls", "last", "none"])
    ap.add_argument("--embd-normalize", type=int, default=2,
                    help="-1 none, 0 max-abs, 2 L2 (default), p Minkowski")
    ap.add_argument("--embd-output-format", default="", choices=["", "json"],
                    help="'' = plain rows, json = {object: list, data: ...}")
    ap.add_argument("--sim", action="store_true",
                    help="print the cosine-similarity matrix (multi-prompt)")
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    args = ap.parse_args(argv)

    from ..runtime.generate import Runtime
    rt = Runtime.from_gguf(args.model)

    prompts: list[str] = []
    for p in args.prompt:
        if p == "-":
            prompts.extend(ln.rstrip("\n") for ln in sys.stdin if ln.strip())
        else:
            prompts.append(p)
    if not prompts:
        prompts = ["Hello world"]

    embs = []
    for text in prompts:
        ids = rt.tokenizer.encode(text)
        e = np.asarray(rt.embed(ids, args.pooling), np.float32)
        if args.pooling == "none":
            e = e.reshape(len(ids), -1)
            e = np.stack([normalize(r, args.embd_normalize) for r in e])
        else:
            e = normalize(e, args.embd_normalize)
        embs.append(e)

    if args.embd_output_format == "json":
        print(json.dumps({
            "object": "list",
            "data": [{"object": "embedding", "index": i,
                      "embedding": e.tolist()}
                     for i, e in enumerate(embs)],
            "model": args.model}))
    else:
        for i, e in enumerate(embs):
            flat = e.reshape(-1)
            head = " ".join(f"{x:9.6f}" for x in flat[:8])
            print(f"embedding {i}: {head}{' ...' if flat.size > 8 else ''} "
                  f"(dim={e.shape[-1]})")

    if args.sim and len(embs) > 1 and args.pooling != "none":
        print("\ncosine similarity matrix:")
        for a in embs:
            row = [float(np.dot(a, b) /
                         (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
                   for b in embs]
            print(" ".join(f"{x:6.2f}" for x in row))


if __name__ == "__main__":
    main()
