"""Pallas kernel tile autotuner.

Sweeps tile-config candidates for the fused dequant-matmul at the decode
(M=16) and prefill (M=512) shape buckets of a model geometry, times each
on the CURRENT jax backend, and writes the winners into the tuning table
(`ops/tuning.py`) consulted by `DenseLinear.__call__` at trace time —
the measured counterpart of the reference's per-arch kernel selection
(iqk_mul_mat.cpp `MulMat::prepare`).

Run ON TPU (takes ~1-2 min per geometry):
    python -m ik_llama_cpp_tpu.tools.autotune [--embd 4096 --ff 14336]
        [--vocab 32000] [--out tuning.json] [--quick]
"""
from __future__ import annotations

import argparse
import itertools
import sys
import time


def _time_config(x, codes, scale, group, cfg, *, reps=3,
                 interpret=False) -> float:
    import jax
    from ..ops.qmatmul import qmatmul

    try:
        y = qmatmul(x, codes, scale, group=group,
                    interpret=interpret, **cfg)
        y.block_until_ready()
    except Exception:
        return float("inf")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = qmatmul(x, codes, scale, group=group,
                    interpret=interpret, **cfg)
        y.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def tune_qmatmul(shapes, *, group=32, quick=False, log=print,
                 interpret=False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    table: dict = {}
    bms = (64, 128, 256, 512)
    bns = (256, 512, 1024) if not quick else (512,)
    bks = (512, 1024, 2048) if not quick else (1024,)
    for (m, k, n) in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        codes = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        scale = jnp.asarray(rng.standard_normal((k // group, n)) * 0.01,
                            jnp.float32)
        best_cfg, best_t = {}, _time_config(x, codes, scale, group, {},
                                            interpret=interpret)
        log(f"qmatmul m{m} k{k} n{n}: default {best_t * 1e6:.0f}us")
        for bm, bn, bk in itertools.product(bms, bns, bks):
            if bm > max(m, 64) or bk > k or bn > n:
                continue
            cfg = {"block_m": bm, "block_n": bn, "block_k": bk}
            t = _time_config(x, codes, scale, group, cfg,
                             interpret=interpret)
            if t < best_t * 0.98:          # >2% win or keep default
                best_cfg, best_t = cfg, t
        from ..ops.tuning import _mbucket
        key = f"m{_mbucket(m)}_k{k}_n{n}"
        if best_cfg:
            table[key] = best_cfg
            log(f"  -> {best_cfg} at {best_t * 1e6:.0f}us")
        else:
            log("  -> defaults win")
    return table


def tune_fa_decode(shapes, *, quick=False, log=print,
                   interpret=False) -> dict:
    """block_kv sweep for the native-layout decode FA at decode shapes
    (B, T, S, Hkv, D)."""
    import jax.numpy as jnp
    import numpy as np
    from ..ops.flash_attention import flash_attention_decode
    from ..ops.tuning import _mbucket

    rng = np.random.default_rng(1)
    table: dict = {}
    cands = (256, 512, 1024, 2048) if not quick else (1024,)
    for (b, t, s_len, hkv, d, h) in shapes:
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s_len, hkv, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s_len, hkv, d)), jnp.bfloat16)
        npv = jnp.full((b,), s_len - t, jnp.int32)
        kvl = jnp.full((b,), s_len, jnp.int32)
        best_cfg, best_t = {}, float("inf")

        def run(cfg):
            try:
                y = flash_attention_decode(q, k, v, npv, kvl,
                                           scale=d ** -0.5,
                                           interpret=interpret, **cfg)
                if y is None:
                    return float("inf")
                y.block_until_ready()
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    flash_attention_decode(q, k, v, npv, kvl,
                                           scale=d ** -0.5,
                                           interpret=interpret,
                                           **cfg).block_until_ready()
                    best = min(best, time.perf_counter() - t0)
                return best
            except Exception:
                return float("inf")

        base = run({})
        log(f"fa_decode b{b} t{t} s{s_len} hkv{hkv}: default {base*1e6:.0f}us")
        best_t = base
        for bk in cands:
            if bk > s_len:
                continue
            tcfg = {"block_kv": bk}
            tt = run(tcfg)
            if tt < best_t * 0.98:
                best_cfg, best_t = tcfg, tt
        if best_cfg:
            table[f"m{_mbucket(t)}_k{s_len}_n{hkv}"] = best_cfg
            log(f"  -> {best_cfg} at {best_t*1e6:.0f}us")
        else:
            log("  -> defaults win")
    return table


def main(argv=None):
    ap = argparse.ArgumentParser(description="Pallas tile autotuner")
    ap.add_argument("--embd", type=int, default=4096)
    ap.add_argument("--ff", type=int, default=14336)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--group", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode (CPU CI drive; timings meaningless)")
    args = ap.parse_args(argv)

    E, F, V = args.embd, args.ff, args.vocab
    shapes = []
    for m in (16, 512):
        shapes += [(m, E, E), (m, E, F), (m, F, E), (m, E, V)]
    from ..ops import tuning
    table = dict(tuning.load())
    q = table.setdefault("qmatmul", {})
    q.update(tune_qmatmul(shapes, group=args.group, quick=args.quick,
                          interpret=args.interpret,
                          log=lambda *a: print(*a, file=sys.stderr)))
    heads = max(1, E // 128)
    fa_shapes = [(1, 1, s_len, max(1, heads // 4), 128, heads)
                 for s_len in ((1024, 4096) if not args.quick else (1024,))]
    f = table.setdefault("fa_decode", {})
    f.update(tune_fa_decode(fa_shapes, quick=args.quick,
                            interpret=args.interpret,
                            log=lambda *a: print(*a, file=sys.stderr)))
    path = tuning.save(table, args.out)
    print(f"wrote {path}", file=sys.stderr)
    return table


if __name__ == "__main__":
    main()
