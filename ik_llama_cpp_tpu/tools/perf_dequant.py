"""Decode-path dequant-matmul microbenchmark (the PERF_NOTES.md harness).

Times fused dequant-matmul kernel variants at the TG shape (M=16 decode
bucket, 8B-geometry K=4096 N=14336) inside one jitted lax.scan over L
distinct weight copies, so per-call dispatch and the axon tunnel round-trip
amortize away.  Reports us/matmul and effective weight-stream GB/s.

Usage:  python -m ik_llama_cpp_tpu.tools.perf_dequant [--m 16] [--iters 64]

Variants:
  int8-f32s    current planar kernel (ops/qmatmul.py), f32 scales in HBM
  int8-bf16s   same kernel, bf16 scales in HBM (numerically identical: the
               kernel rounds scales to bf16 in-register anyway)
  int16-pair   2 codes per 16-bit lane: codes packed (K, N/2) int16 with the
               low/high output half in the low/high byte; in-kernel
               sign-extend shifts produce both halves at 16-bit lane density
               — probes whether the ~300 G weights/s VPU convert ceiling
               (PERF_NOTES.md) can be halved
  xla-bf16     XLA native dense bf16 dot (the no-dequant reference point)
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.qmatmul import qmatmul


def _pair_kernel(group: int):
    def kernel(x_ref, w_ref, sl_ref, sh_ref, lo_ref, hi_ref, acc_l, acc_h):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_l[...] = jnp.zeros_like(acc_l)
            acc_h[...] = jnp.zeros_like(acc_h)

        tk, tn = w_ref.shape
        # Mosaic cannot legalize 16-bit shifts (arith.shli on i16); do the
        # byte split in i32 — the experiment then only tests whether 16-bit
        # HBM/VMEM loads beat int8 loads, not 16-bit ALU density.
        w16 = w_ref[...].astype(jnp.int32)
        lo = ((w16 << 24) >> 24).astype(jnp.bfloat16)  # sign-extended low byte
        hi = ((w16 << 16) >> 24).astype(jnp.bfloat16)  # sign-extended high byte
        sl = sl_ref[...].astype(jnp.bfloat16)[:, None, :]
        sh = sh_ref[...].astype(jnp.bfloat16)[:, None, :]
        wl = (lo.reshape(tk // group, group, tn) * sl).reshape(tk, tn)
        wh = (hi.reshape(tk // group, group, tn) * sh).reshape(tk, tn)
        x = x_ref[...]
        acc_l[...] += jnp.dot(x, wl, preferred_element_type=jnp.float32)
        acc_h[...] += jnp.dot(x, wh, preferred_element_type=jnp.float32)

        @pl.when(ki == pl.num_programs(2) - 1)
        def _():
            lo_ref[...] = acc_l[...]
            hi_ref[...] = acc_h[...]
    return kernel


@functools.partial(jax.jit, static_argnames=("group", "bm", "bn", "bk"))
def qmatmul_pair(x, codes16, scale, *, group=32, bm=16, bn=512, bk=1024):
    """x (M,K) @ packed int16 codes (K, N/2) -> f32 (M, N).

    scale f32/bf16 (K//group, N); output column j of the low half comes from
    the low byte of packed column j, column j + N/2 from the high byte.
    """
    m, k = x.shape
    k2, nh = codes16.shape
    assert k == k2
    n = nh * 2
    grid = (m // bm, nh // bn, k // bk)
    sg = bk // group

    lo, hi = pl.pallas_call(
        _pair_kernel(group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((sg, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((sg, bn), lambda i, j, kk: (kk, j + nh // bn)),
        ],
        out_specs=[pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
                   pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j))],
        out_shape=[jax.ShapeDtypeStruct((m, nh), jnp.float32),
                   jax.ShapeDtypeStruct((m, nh), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n + (k // group) * n * 2,
            transcendentals=0),
    )(x.astype(jnp.bfloat16), codes16, scale, scale)
    return jnp.concatenate([lo, hi], axis=1)


def pack_pairs(codes: np.ndarray) -> np.ndarray:
    """int8 (K, N) -> int16 (K, N/2): low byte = cols [0, N/2), high byte =
    cols [N/2, N)."""
    k, n = codes.shape
    lo = codes[:, : n // 2].astype(np.uint8).astype(np.uint16)
    hi = codes[:, n // 2:].astype(np.uint8).astype(np.uint16)
    return (lo | (hi << 8)).astype(np.uint16).view(np.int16)


def _fetch_floor():
    """Axon tunnel round-trip floor (dispatch + tiny fetch).

    NOTE: under the axon tunnel, block_until_ready() resolves lazily — only
    a D2H fetch (np.asarray) actually forces execution, so all timing here
    is fetch-to-fetch."""
    z = jnp.zeros((4,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(z))
    best = 1e9
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(f(z + np.float32(i)))
        best = min(best, time.perf_counter() - t0)
    return best


def _time_scan(step, x, ws, iters=3, repeats=8):
    L = jax.tree_util.tree_leaves(ws)[0].shape[0]

    @jax.jit
    def run(x, ws):
        def outer(c, _):
            def body(c, w):
                y = step(c, w)
                return (c + y[:, : c.shape[1]] * 1e-12).astype(c.dtype), ()
            c, _ = lax.scan(body, c, ws)
            return c, ()
        c, _ = lax.scan(outer, x, None, length=repeats)
        return c[:1, :4]

    np.asarray(run(x, ws))       # compile + warmup (forced by the fetch)
    floor = _fetch_floor()
    best = 1e9
    for i in range(iters):
        # fresh input each run: the axon tunnel content-dedups identical
        # executions, so a repeated identical call would return cached
        xi = x + np.float32(i + 1) * 1e-3
        t0 = time.perf_counter()
        np.asarray(run(xi, ws))
        best = min(best, time.perf_counter() - t0)
    return max(best - floor, 1e-9) / (L * repeats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=14336)
    ap.add_argument("--layers", type=int, default=64)
    ap.add_argument("--group", type=int, default=32)
    ap.add_argument("--variants", default="int8-f32s,int8-bf16s,int16-pair,xla-bf16")
    args = ap.parse_args()
    m, k, n, L, g = args.m, args.k, args.n, args.layers, args.group

    rng = np.random.default_rng(0)
    codes = rng.integers(-127, 128, (L, k, n), dtype=np.int8)
    scale = (rng.standard_normal((L, k // g, n)) * 0.01).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    gb = k * n / 1e9          # int8 code bytes per matmul

    results = {}
    for variant in args.variants.split(","):
        if variant == "int8-f32s":
            ws = (jnp.asarray(codes), jnp.asarray(scale))
            step = lambda c, w: qmatmul(c, w[0], w[1], group=g)
        elif variant == "int8-bf16s":
            ws = (jnp.asarray(codes), jnp.asarray(scale, jnp.bfloat16))
            step = lambda c, w: qmatmul(c, w[0], w[1], group=g)
        elif variant == "int16-pair":
            packed = np.stack([pack_pairs(codes[i]) for i in range(L)])
            ws = (jnp.asarray(packed), jnp.asarray(scale, jnp.bfloat16))
            step = lambda c, w: qmatmul_pair(c, w[0], w[1], group=g, bm=m)
        elif variant == "xla-bf16":
            dense = (codes.astype(np.float32)
                     * np.repeat(scale, g, axis=1)).astype(jnp.bfloat16)
            ws = (jnp.asarray(dense),)
            step = lambda c, w: jnp.dot(c, w[0],
                                        preferred_element_type=jnp.float32)
        else:
            raise SystemExit(f"unknown variant {variant}")
        t = _time_scan(step, x, ws)
        bytes_streamed = gb if variant != "xla-bf16" else 2 * gb
        results[variant] = (t * 1e6, bytes_streamed / t)
        print(f"{variant:12s}  {t*1e6:8.1f} us/matmul   "
              f"{bytes_streamed/t:7.1f} GB/s streamed   "
              f"({gb/t:7.1f} G weights/s)")
    return results


if __name__ == "__main__":
    main()
