"""Batched throughput matrix — examples/batched-bench analogue.

Measures prompt-processing and generation throughput across a (PP, TG, B)
grid on the shared-cache batched decode path, printing the reference's table
columns: PP TG B N_KV T_PP S_PP T_TG S_TG T S.

Usage:
  python -m ik_llama_cpp_tpu.tools.batched_bench -m model.gguf \
      [-npp 128,256] [-ntg 16,32] [-npl 1,2,4] [-c 2048]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.generate import Runtime, FORWARDS


def bench_grid(rt: Runtime, npp: list[int], ntg: list[int], npl: list[int],
               ctx: int):
    cfg = rt.cfg
    fwd = FORWARDS[cfg.arch]
    print("|    PP |    TG |    B |   N_KV |   T_PP s | S_PP t/s |   T_TG s |"
          " S_TG t/s |    T s |    S t/s |")
    print("|-------|-------|------|--------|----------|----------|----------|"
          "----------|--------|----------|")
    rows = []
    for b in npl:
        @jax.jit
        def step(params, tokens, kv, n_past):
            return fwd(params, cfg, tokens, kv, n_past, logits_last_only=True)

        for pp in npp:
            for tg in ntg:
                if pp + tg + 8 > ctx:
                    continue
                kv = rt.new_cache(b, ctx)
                rng = np.random.default_rng(0)
                toks = rng.integers(3, cfg.n_vocab - 1, (b, pp)).astype(np.int32)
                # warm-up compile
                lg, kv2 = step(rt.params, jnp.asarray(toks), kv, jnp.int32(0))
                np.asarray(lg[:, -1, :4])
                kv = rt.new_cache(b, ctx)
                t0 = time.perf_counter()
                lg, kv = step(rt.params, jnp.asarray(toks), kv, jnp.int32(0))
                np.asarray(lg[:, -1, :4])
                t_pp = time.perf_counter() - t0

                one = rng.integers(3, cfg.n_vocab - 1, (b, 1)).astype(np.int32)
                lg, kv = step(rt.params, jnp.asarray(one), kv, jnp.int32(pp))
                np.asarray(lg[:, -1, :4])
                t0 = time.perf_counter()
                for i in range(tg - 1):
                    one = rng.integers(3, cfg.n_vocab - 1, (b, 1)).astype(np.int32)
                    lg, kv = step(rt.params, jnp.asarray(one), kv,
                                  jnp.int32(pp + 1 + i))
                np.asarray(lg[:, -1, :4])
                t_tg = time.perf_counter() - t0
                t_tg = t_tg * tg / max(tg - 1, 1)

                s_pp = b * pp / t_pp
                s_tg = b * tg / t_tg
                t_total = t_pp + t_tg
                s_total = b * (pp + tg) / t_total
                n_kv = pp + tg
                rows.append((pp, tg, b, n_kv, t_pp, s_pp, t_tg, s_tg,
                             t_total, s_total))
                print(f"| {pp:5d} | {tg:5d} | {b:4d} | {n_kv:6d} | {t_pp:8.3f} |"
                      f" {s_pp:8.2f} | {t_tg:8.3f} | {s_tg:8.2f} |"
                      f" {t_total:6.2f} | {s_total:8.2f} |")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-npp", default="128,256")
    ap.add_argument("-ntg", default="16")
    ap.add_argument("-npl", default="1,2,4")
    ap.add_argument("-c", "--ctx", type=int, default=2048)
    args = ap.parse_args(argv)
    rt = Runtime.from_gguf(args.model)
    bench_grid(rt,
               [int(x) for x in args.npp.split(",")],
               [int(x) for x in args.ntg.split(",")],
               [int(x) for x in args.npl.split(",")],
               args.ctx)


if __name__ == "__main__":
    main()
