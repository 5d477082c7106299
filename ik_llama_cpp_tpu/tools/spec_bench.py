"""Speculative-decoding benchmark — examples/spec-bench analogue: measures
accept rate and tokens/s across stages (baseline, ngram, ngram-map, draft
model) on a prompt set.

Usage:
  python -m ik_llama_cpp_tpu.tools.spec_bench -m model.gguf [-md draft.gguf]
      [-n 64] [-p "prompt"] [--autotune]
"""
from __future__ import annotations

import argparse
import time

from ..runtime.generate import Runtime
from ..runtime.speculative import (autotune_n_draft, generate_speculative)

DEFAULT_PROMPTS = [
    "The quick brown fox jumps over the lazy dog. The quick brown fox",
    "def fibonacci(n):\n    if n <= 1:\n        return n\n    return",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-md", "--model-draft")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-p", "--prompt", action="append", default=[])
    ap.add_argument("--n-draft", type=int, default=8)
    ap.add_argument("--autotune", action="store_true")
    args = ap.parse_args(argv)

    target = Runtime.from_gguf(args.model)
    draft = Runtime.from_gguf(args.model_draft) if args.model_draft else None
    prompts = args.prompt or DEFAULT_PROMPTS

    if args.autotune:
        best, res = autotune_n_draft(target, prompts[0], draft=draft)
        for n, tps in sorted(res.items()):
            print(f"n_draft={n:3d}: {tps:8.2f} t/s")
        print(f"best n_draft: {best}")
        args.n_draft = best

    stages = [("baseline", dict(n_draft=0)),
              ("ngram", dict(stage="ngram", n_draft=args.n_draft)),
              ("ngram-map", dict(stage="ngram-map", n_draft=args.n_draft))]
    if draft is not None:
        stages.append(("draft", dict(n_draft=args.n_draft)))

    print(f"| {'stage':10s} | {'t/s':>8s} | {'accept%':>8s} | {'drafted':>8s} |")
    print(f"|{'-' * 12}|{'-' * 10}|{'-' * 10}|{'-' * 10}|")

    # lookahead rides its own generator (Jacobi window probe, not the
    # propose/verify loop) but reports through the same table
    from ..runtime.lookahead import generate_lookahead
    total_tok, total_t, acc = 0, 0.0, 0
    for p in prompts:
        t0 = time.perf_counter()
        _, out, st = generate_lookahead(target, p, args.n_predict,
                                        stop_at_eos=False)
        total_t += time.perf_counter() - t0
        total_tok += len(out)
        acc += st.n_accept
    print(f"| {'lookahead':10s} | {total_tok / total_t:8.2f} |"
          f" {100.0 * acc / max(total_tok, 1):8.2f} | {'-':>8s} |")

    for name, kw in stages:
        use_draft = draft if name == "draft" else None
        total_tok, total_t = 0, 0.0
        acc_n, acc_d = 0, 0
        for p in prompts:
            t0 = time.perf_counter()
            _, out, st = generate_speculative(
                target, p, args.n_predict, draft=use_draft,
                stop_at_eos=False, **{k: v for k, v in kw.items()
                                      if k != "n_draft" or v > 0},
                n_draft=max(kw.get("n_draft", 0), 0) or 1)
            total_t += time.perf_counter() - t0
            total_tok += len(out)
            acc_n += st.n_accept
            acc_d += st.n_draft
        rate = 100.0 * acc_n / max(acc_d, 1)
        print(f"| {name:10s} | {total_tok / total_t:8.2f} | {rate:8.2f} |"
              f" {acc_d:8d} |")


if __name__ == "__main__":
    main()
