"""Perplexity tool — the reference's llama-perplexity protocol exactly
(examples/perplexity/perplexity.cpp:614-780):

  * tokenize the whole text (no BOS), split into non-overlapping n_ctx chunks
  * per chunk: replace token 0 with BOS (when the model adds BOS), evaluate
    with a fresh KV cache
  * NLL over positions j in [n_ctx/2, n_ctx-1): -log p(token[j+1] | ...)
  * Final estimate: PPL = exp(sum nll / count), with the same running
    uncertainty estimate

Usage: python -m ik_llama_cpp_tpu.tools.perplexity --gguf m.gguf --text f.txt
"""
from __future__ import annotations

import argparse
import math
import sys

import numpy as np

from ..runtime.generate import Runtime


def log_softmax_at(logits: np.ndarray, token: int) -> float:
    m = logits.max()
    lse = m + math.log(np.exp(logits - m).sum())
    return float(logits[token] - lse)


def compute_perplexity(rt: Runtime, text: str, n_ctx: int = 512,
                       n_chunks: int = -1, verbose: bool = True):
    tokens = rt.tokenizer.encode(text, add_bos=False, parse_special=False)
    n_chunk_max = len(tokens) // n_ctx
    n_chunk = n_chunk_max if n_chunks < 0 else min(n_chunks, n_chunk_max)
    if n_chunk == 0:
        raise ValueError(f"text too short: {len(tokens)} tokens < n_ctx {n_ctx}")
    add_bos = rt.tokenizer.add_bos and rt.tokenizer.bos_id >= 0
    first = n_ctx // 2

    nll = 0.0
    nll2 = 0.0
    count = 0
    for i in range(n_chunk):
        chunk = list(tokens[i * n_ctx:(i + 1) * n_ctx])
        if add_bos:
            chunk[0] = rt.tokenizer.bos_id
        logits = rt.all_position_logits(chunk, capacity=n_ctx)
        # match reference numerics: f32 log-softmax
        for j in range(first, n_ctx - 1):
            lp = log_softmax_at(logits[j].astype(np.float64), chunk[j + 1])
            nll += -lp
            nll2 += lp * lp
            count += 1
        if verbose:
            ppl_running = math.exp(nll / count)
            print(f"[{i + 1}]{ppl_running:.4f},", end="", flush=True, file=sys.stderr)
    if verbose:
        print(file=sys.stderr)
    ppl = math.exp(nll / count)
    nll_mean = nll / count
    var = nll2 / count - nll_mean * nll_mean
    err = ppl * math.sqrt(var / count) if var > 0 else 0.0
    return ppl, err, count


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--text", required=True, help="plain text file (e.g. wikitext-2 test)")
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=-1)
    args = ap.parse_args(argv)

    rt = Runtime.from_gguf(args.gguf)
    text = open(args.text, encoding="utf-8").read()
    ppl, err, count = compute_perplexity(rt, text, args.n_ctx, args.chunks)
    print(f"Final estimate: PPL = {ppl:.4f} +/- {err:.5f}")
    return ppl


if __name__ == "__main__":
    main()
