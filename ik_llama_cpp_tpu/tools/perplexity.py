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
    # the reference tokenizes WITH add_special (perplexity.cpp:
    # common_tokenize(ctx, prompt, true)) — for add_bos models the stream
    # starts with BOS and every chunk boundary shifts accordingly;
    # matching this exactly is required for GGUF-for-GGUF PPL parity
    add_special = rt.tokenizer.add_bos and rt.tokenizer.bos_id >= 0
    tokens = rt.tokenizer.encode(text, add_bos=add_special,
                                 parse_special=False)
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


def save_logits(rt: Runtime, text: str, out_path: str, n_ctx: int = 512,
                n_chunks: int = -1):
    """--kl-divergence-base: save per-chunk log-probs of the actual tokens +
    full logits for later KLD comparison (perplexity.cpp kl_divergence)."""
    tokens = rt.tokenizer.encode(text, add_bos=False, parse_special=False)
    n_chunk_max = len(tokens) // n_ctx
    n_chunk = n_chunk_max if n_chunks < 0 else min(n_chunks, n_chunk_max)
    add_bos = rt.tokenizer.add_bos and rt.tokenizer.bos_id >= 0
    chunks, logit_list = [], []
    for i in range(n_chunk):
        chunk = list(tokens[i * n_ctx:(i + 1) * n_ctx])
        if add_bos:
            chunk[0] = rt.tokenizer.bos_id
        logits = rt.all_position_logits(chunk, capacity=n_ctx)
        chunks.append(np.asarray(chunk, np.int32))
        logit_list.append(logits.astype(np.float16))
    np.savez_compressed(out_path, n_ctx=n_ctx,
                        chunks=np.stack(chunks), logits=np.stack(logit_list))
    return out_path


def kl_divergence(rt: Runtime, base_path: str, verbose: bool = True):
    """KLD of this model vs saved base logits (perplexity.cpp:323-378):
    mean/max KLD, same-top-token %, and both models' PPL."""
    data = np.load(base_path)
    n_ctx = int(data["n_ctx"])
    chunks, base_logits = data["chunks"], data["logits"]
    first = n_ctx // 2

    def log_softmax(x):
        x = x.astype(np.float64)
        x = x - x.max(axis=-1, keepdims=True)
        return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))

    klds, same_top = [], []
    nll_ours = nll_base = 0.0
    count = 0
    for ci in range(len(chunks)):
        chunk = [int(t) for t in chunks[ci]]
        ours = rt.all_position_logits(chunk, capacity=n_ctx)
        lo = log_softmax(ours)
        lb = log_softmax(base_logits[ci])
        for j in range(first, n_ctx - 1):
            p_base = np.exp(lb[j])
            klds.append(float(np.sum(p_base * (lb[j] - lo[j]))))
            same_top.append(int(lo[j].argmax() == lb[j].argmax()))
            nll_ours += -lo[j][chunk[j + 1]]
            nll_base += -lb[j][chunk[j + 1]]
            count += 1
    kld = np.asarray(klds)
    res = {
        "kld_mean": float(kld.mean()),
        "kld_max": float(kld.max()),
        "kld_p99": float(np.percentile(kld, 99)),
        "same_top_p": float(np.mean(same_top)),
        "ppl_ours": math.exp(nll_ours / count),
        "ppl_base": math.exp(nll_base / count),
    }
    if verbose:
        print(f"Mean KLD: {res['kld_mean']:.6f}  Max: {res['kld_max']:.6f}  "
              f"99%: {res['kld_p99']:.6f}")
        print(f"Same top token: {res['same_top_p'] * 100:.2f}%")
        print(f"PPL (ours/base): {res['ppl_ours']:.4f} / {res['ppl_base']:.4f}")
    return res


def hellaswag_score(rt: Runtime, tasks: list[dict], verbose: bool = True) -> float:
    """HellaSwag scoring (perplexity.cpp hellaswag_score): each task has a
    context and 4 endings; pick the ending with the highest
    length-normalized log-likelihood; returns accuracy in %.

    Task dict: {"query": str, "choices": [str x4], "gold": int}."""
    n_correct = 0
    for ti, task in enumerate(tasks):
        ctx_ids = rt.tokenizer.encode(task["query"])
        scores = []
        for choice in task["choices"]:
            full = ctx_ids + rt.tokenizer.encode(" " + choice.strip(),
                                                 add_bos=False)
            logits = rt.all_position_logits(full)
            lp = 0.0
            for j in range(len(ctx_ids) - 1, len(full) - 1):
                lp += log_softmax_at(logits[j].astype(np.float64), full[j + 1])
            scores.append(lp / max(len(full) - len(ctx_ids), 1))
        if int(np.argmax(scores)) == task["gold"]:
            n_correct += 1
        if verbose:
            acc = 100.0 * n_correct / (ti + 1)
            print(f"{ti + 1}\t{acc:.8f}", flush=True)
    return 100.0 * n_correct / max(len(tasks), 1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--text", help="plain text file (e.g. wikitext-2 test)")
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=-1)
    ap.add_argument("--kl-divergence-base",
                    help="save base logits to this file and exit")
    ap.add_argument("--kl-divergence",
                    help="compute KLD vs a saved base logits file")
    ap.add_argument("--hellaswag", help="JSONL tasks file: query/choices/gold")
    ap.add_argument("--hellaswag-tasks", type=int, default=400)
    args = ap.parse_args(argv)

    rt = Runtime.from_gguf(args.gguf)
    if args.kl_divergence:
        kl_divergence(rt, args.kl_divergence)
        return
    if args.hellaswag:
        import json
        tasks = [json.loads(l) for l in open(args.hellaswag)][: args.hellaswag_tasks]
        acc = hellaswag_score(rt, tasks)
        print(f"hellaswag accuracy: {acc:.4f}%")
        return
    text = open(args.text, encoding="utf-8").read()
    if args.kl_divergence_base:
        save_logits(rt, text, args.kl_divergence_base, args.n_ctx, args.chunks)
        print(f"saved base logits -> {args.kl_divergence_base}")
        return
    ppl, err, count = compute_perplexity(rt, text, args.n_ctx, args.chunks)
    print(f"Final estimate: PPL = {ppl:.4f} +/- {err:.5f}")
    return ppl


if __name__ == "__main__":
    main()
