"""llama-bench + sweep-bench equivalents.

bench mode (llama-bench): PP{np}/TG{ng} grid on a model, markdown/json/csv
output (examples/llama-bench/llama-bench.cpp).

sweep mode (llama-sweep-bench): PP/TG throughput as a function of KV fill,
columns `PP TG N_KV T_PP S_PP T_TG S_TG` (examples/sweep-bench/).

Timing notes: executions are forced by fetching a small logits slice, and
every measured run uses fresh token ids (see bench.py header for why this
matters on remote-TPU tunnels).

Usage:
  python -m ik_llama_cpp_tpu.tools.bench_model -m m.gguf [-p 512] [-n 128]
  python -m ik_llama_cpp_tpu.tools.bench_model -m m.gguf --sweep -c 4096
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from ..runtime.generate import Runtime


def _time_eval(rt: Runtime, ids, kv, n_past, reps=3):
    """Median wall time of evaluating ids (fresh ids per rep)."""
    times = []
    rng = np.random.default_rng(0)
    for r in range(reps):
        fresh = [int(x) for x in rng.integers(3, max(4, rt.cfg.n_vocab - 1),
                                              len(ids))]
        t0 = time.perf_counter()
        logits, _, _ = rt.eval_tokens(fresh, kv, n_past)
        _ = float(logits[-1][:4].sum())  # force
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench(rt: Runtime, n_pp: int, n_tg: int, reps: int = 3):
    cap = max(2048, n_pp + n_tg + 8)
    kv = rt.new_cache(1, cap)
    # warm (compile)
    _time_eval(rt, [3] * n_pp, kv, 0, reps=1)
    t_pp = _time_eval(rt, [3] * n_pp, kv, 0, reps=reps)
    # TG: sequential single-token steps after a small prefill
    logits, kv2, n_past = rt.eval_tokens([3] * 16, kv, 0)
    _time_eval(rt, [5], kv2, n_past, reps=1)
    t0 = time.perf_counter()
    rng = np.random.default_rng(1)
    for i in range(n_tg):
        tok = int(rng.integers(3, rt.cfg.n_vocab - 1))
        logits, kv2, n_past = rt.eval_tokens([tok], kv2, n_past)
    _ = float(logits[-1][:4].sum())
    t_tg = time.perf_counter() - t0
    return {
        f"pp{n_pp}": n_pp / t_pp,
        f"tg{n_tg}": n_tg / t_tg,
    }


def sweep(rt: Runtime, n_ctx: int, n_pp: int = 512, n_tg: int = 32):
    """PP/TG vs KV-fill table like sweep-bench."""
    rows = []
    kv = rt.new_cache(1, n_ctx)
    n_past = 0
    print(f"|    PP |     TG |   N_KV |   T_PP s | S_PP t/s |   T_TG s | S_TG t/s |")
    print(f"|-------|--------|--------|----------|----------|----------|----------|")
    rng = np.random.default_rng(0)
    while n_past + n_pp + n_tg <= n_ctx:
        ids = [int(x) for x in rng.integers(3, rt.cfg.n_vocab - 1, n_pp)]
        t0 = time.perf_counter()
        logits, kv, n_past = rt.eval_tokens(ids, kv, n_past)
        _ = float(logits[-1][:4].sum())
        t_pp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(n_tg):
            tok = int(rng.integers(3, rt.cfg.n_vocab - 1))
            logits, kv, n_past = rt.eval_tokens([tok], kv, n_past)
        _ = float(logits[-1][:4].sum())
        t_tg = time.perf_counter() - t0
        rows.append((n_pp, n_tg, n_past - n_pp - n_tg, t_pp, n_pp / t_pp,
                     t_tg, n_tg / t_tg))
        print(f"| {n_pp:5d} | {n_tg:6d} | {rows[-1][2]:6d} | {t_pp:8.3f} | "
              f"{n_pp / t_pp:8.2f} | {t_tg:8.3f} | {n_tg / t_tg:8.2f} |")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--n-prompt", type=int, default=512)
    ap.add_argument("-n", "--n-gen", type=int, default=128)
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("-c", "--ctx", type=int, default=4096)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("-o", "--output", choices=["md", "json"], default="md")
    ap.add_argument("-ctk", "--cache-type", choices=["bf16", "q8"], default="bf16")
    args = ap.parse_args(argv)

    rt = Runtime.from_gguf(args.model, kv_quant=args.cache_type == "q8")
    if args.sweep:
        sweep(rt, args.ctx, args.n_prompt, min(args.n_gen, 32))
        return
    res = bench(rt, args.n_prompt, args.n_gen, args.reps)
    if args.output == "json":
        print(json.dumps(res))
    else:
        print("| test | t/s |")
        print("|------|-----|")
        for k, v in res.items():
            print(f"| {k} | {v:.2f} |")


if __name__ == "__main__":
    main()
