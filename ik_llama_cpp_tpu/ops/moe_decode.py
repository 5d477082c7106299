"""Decode-specialized fused MoE expert kernels (small-batch token generation).

The TPU analogue of the reference's `iqk_moe_fused_up_gate` TG path
(ggml/src/ggml.c:18593) and the `-ooae` only-active-experts copy
(ggml/src/ggml-backend.cpp:2044-2133): at batch<=8 only the routed experts'
weights are streamed from HBM, once, via scalar-prefetched expert ids — no
token sorting, no ragged grid, no dynamic grid sizes.  Two Pallas calls per
MoE layer:

  1. ``moe_decode_gate_up`` — grid (FF-tiles, pairs, K-tiles); each (token,
     expert) pair streams its expert's gate+up planar int8 codes tile by
     tile, dequantizes on the VPU, matvecs on the MXU, and applies the
     activation at the last K step, emitting h (pairs, FF).
  2. ``moe_decode_down`` — grid (E-tiles, tokens, top_k, FF-tiles); streams
     the down codes of each pair and accumulates the routing-weighted sum
     straight into the (tokens, E) output.

The small per-pair activations (x, h, out) ride along as full-array VMEM
blocks (their index maps only move with the K/FF/E tile index), and the
kernel selects the pair's row with a program-id dynamic slice — TPU block
shapes must keep sublane dims 8-aligned, so single-row blocks are not an
option.  Weights never materialize dequantized in HBM; traffic is exactly
the active experts' bytes (x pairs).  The ragged PP kernel
(`ops/moe_qmm.py`) remains the prefill path; `ops/moe.py` dispatches
between them by batch size.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _act(g, u, activation: str, act_limit: float):
    if activation == "swiglu_oai":
        alpha, limit = 1.702, 7.0
        gc = jnp.minimum(g, limit)
        uc = jnp.clip(u, -limit, limit)
        return gc * jax.nn.sigmoid(alpha * gc) * (uc + 1.0)
    if activation == "silu":
        if act_limit > 0.0:
            return (jnp.minimum(g * jax.nn.sigmoid(g), act_limit)
                    * jnp.clip(u, -act_limit, act_limit))
        return (g * jax.nn.sigmoid(g)) * u
    return jax.nn.gelu(g, approximate=True) * u


def _gate_up_kernel(group: int, activation: str, act_limit: float,
                    has_bias: bool):
    def kernel(ids_ref, x_ref, gc_ref, gs_ref, uc_ref, us_ref, *rest):
        if has_bias:
            gb_ref, ub_ref, h_ref, accg, accu = rest
        else:
            h_ref, accg, accu = rest
        p_i = pl.program_id(1)
        k_i = pl.program_id(2)
        k_last = pl.num_programs(2) - 1

        @pl.when(k_i == 0)
        def _():
            accg[...] = jnp.zeros_like(accg)
            accu[...] = jnp.zeros_like(accu)

        tk, tf = gc_ref.shape
        pq = x_ref.shape[0]
        # Mosaic cannot dynamically slice unaligned sublanes — select the
        # pair's row with a masked cross-sublane sum instead (cheap next to
        # the tile dequant).
        rows = lax.broadcasted_iota(jnp.int32, (pq, 1), 0)
        x = jnp.sum(jnp.where(rows == p_i, x_ref[...], 0), axis=0,
                    keepdims=True)                      # (1, tk)
        wg = gc_ref[...].astype(jnp.bfloat16).reshape(tk // group, group, tf)
        wg = (wg * gs_ref[...].astype(jnp.bfloat16)[:, None, :]).reshape(
            tk, tf)
        accg[0:1, :] += jnp.dot(x, wg, preferred_element_type=jnp.float32)
        wu = uc_ref[...].astype(jnp.bfloat16).reshape(tk // group, group, tf)
        wu = (wu * us_ref[...].astype(jnp.bfloat16)[:, None, :]).reshape(
            tk, tf)
        accu[0:1, :] += jnp.dot(x, wu, preferred_element_type=jnp.float32)

        @pl.when(k_i == k_last)
        def _():
            g, u = accg[0:1, :], accu[0:1, :]
            if has_bias:
                g = g + gb_ref[...].astype(jnp.float32)
                u = u + ub_ref[...].astype(jnp.float32)
            val = _act(g, u, activation, act_limit).astype(jnp.bfloat16)
            # masked row write: the h block stays resident for the whole
            # FF-tile sweep, so each pair's row is written exactly once
            hrows = lax.broadcasted_iota(jnp.int32, h_ref.shape, 0)
            h_ref[...] = jnp.where(hrows == p_i, val, h_ref[...])
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("group", "activation", "act_limit", "block_f",
                     "block_k", "interpret"),
)
def moe_decode_gate_up(
    xp,            # bf16 (P, K) per-pair inputs (token rows repeated top_k x)
    ids,           # i32 (P,) expert id per pair
    gate_c, gate_s,  # int8 (G, K, FF), (G, K//group, FF)
    up_c, up_s,
    gate_b=None, up_b=None,   # optional (G, FF) per-expert biases
    *,
    group: int = 32,
    activation: str = "silu",
    act_limit: float = 0.0,
    block_f: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Fused dequant gate/up matvec + activation for routed pairs.

    Returns h bf16 (P, FF).  Streams exactly the ``ids``-selected experts'
    gate/up codes from HBM (scalar-prefetched indices), so HBM traffic is
    P x (2*K*FF) int8 bytes + scales.
    """
    p, k = xp.shape
    g, k2, f = gate_c.shape
    assert k == k2 and up_c.shape == (g, k, f)
    has_bias = gate_b is not None

    tk = min(block_k, _round_up(k, max(256, group)))
    tf = min(block_f, _round_up(f, 128))
    kp, fp = _round_up(k, tk), _round_up(f, tf)
    pq = _round_up(p, 8)
    if (kp, fp) != (k, f):
        pad_c = ((0, 0), (0, kp - k), (0, fp - f))
        pad_s = ((0, 0), (0, (kp - k) // group), (0, fp - f))
        gate_c = jnp.pad(gate_c, pad_c)
        gate_s = jnp.pad(gate_s, pad_s)
        up_c = jnp.pad(up_c, pad_c)
        up_s = jnp.pad(up_s, pad_s)
        if has_bias and fp != f:
            gate_b = jnp.pad(gate_b, ((0, 0), (0, fp - f)))
            up_b = jnp.pad(up_b, ((0, 0), (0, fp - f)))
    if (pq, kp) != (p, k):
        xp = jnp.pad(xp, ((0, pq - p), (0, kp - k)))

    def x_map(fi, pi, ki, ids):
        return 0, ki

    def w_map(fi, pi, ki, ids):
        return ids[pi], ki, fi

    def s_map(fi, pi, ki, ids):
        return ids[pi], ki, fi

    def b_map(fi, pi, ki, ids):
        return ids[pi], fi

    def h_map(fi, pi, ki, ids):
        return 0, fi

    in_specs = [
        pl.BlockSpec((pq, tk), x_map),
        pl.BlockSpec((None, tk, tf), w_map),
        pl.BlockSpec((None, tk // group, tf), s_map),
        pl.BlockSpec((None, tk, tf), w_map),
        pl.BlockSpec((None, tk // group, tf), s_map),
    ]
    args = [xp.astype(jnp.bfloat16), gate_c, gate_s, up_c, up_s]
    if has_bias:
        in_specs += [pl.BlockSpec((None, tf), b_map),
                     pl.BlockSpec((None, tf), b_map)]
        args += [gate_b, up_b]

    grid = (fp // tf, p, kp // tk)
    h = pl.pallas_call(
        _gate_up_kernel(group, activation, act_limit, has_bias),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((pq, tf), h_map),
            scratch_shapes=[pltpu.VMEM((8, tf), jnp.float32),
                            pltpu.VMEM((8, tf), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((pq, fp), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * p * kp * fp,
            bytes_accessed=2 * p * kp * fp + p * fp * 2,
            transcendentals=p * fp,
        ),
        interpret=interpret,
    )(ids.astype(jnp.int32), *args)
    if (pq, fp) != (p, f):
        h = h[:p, :f]
    return h


def _down_kernel(group: int, top_k: int):
    # grid = (E-tiles, tokens, top_k, FF-tiles): token/expert/FF axes are
    # INNER to the E-tile axis so every revisit of the (full-tokens, te)
    # output block is consecutive and the accumulator stays coherent.
    def kernel(ids_ref, h_ref, dc_ref, ds_ref, out_ref, acc):
        t_i = pl.program_id(1)
        e_i = pl.program_id(2)
        f_i = pl.program_id(3)
        first = (e_i == 0) & (f_i == 0)
        last = ((e_i == top_k - 1)
                & (f_i == pl.num_programs(3) - 1))

        @pl.when(first)
        def _():
            acc[...] = jnp.zeros_like(acc)

        tf, te = dc_ref.shape
        pq = h_ref.shape[0]
        rows = lax.broadcasted_iota(jnp.int32, (pq, 1), 0)
        h = jnp.sum(jnp.where(rows == t_i * top_k + e_i, h_ref[...], 0),
                    axis=0, keepdims=True)               # (1, tf)
        w = dc_ref[...].astype(jnp.bfloat16).reshape(tf // group, group, te)
        w = (w * ds_ref[...].astype(jnp.bfloat16)[:, None, :]).reshape(
            tf, te)
        acc[0:1, :] += jnp.dot(h, w, preferred_element_type=jnp.float32)

        @pl.when(last)
        def _():
            orows = lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
            out_ref[...] = jnp.where(orows == t_i, acc[0:1, :], out_ref[...])
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("group", "top_k", "block_e", "block_f", "interpret"),
)
def moe_decode_down(
    hw,            # bf16 (P, FF) routing-weight-scaled activations
    ids,           # i32 (P,) expert id per pair, P == T * top_k
    down_c, down_s,  # int8 (G, FF, E), (G, FF//group, E)
    *,
    top_k: int,
    group: int = 32,
    block_e: int = 2048,
    block_f: int = 1024,
    interpret: bool = False,
):
    """Routing-weighted down-projection sum: returns f32 (T, E).

    ``hw`` rows must already carry the routing weight (h * w per pair) so the
    kernel's accumulation over the top_k axis directly produces
    sum_e w_e * (h_e @ W_down[e]).
    """
    pp, f = hw.shape
    g, f2, e = down_c.shape
    assert f == f2 and pp % top_k == 0
    t = pp // top_k

    tf = min(block_f, _round_up(f, max(256, group)))
    te = min(block_e, _round_up(e, 128))
    fp, ep = _round_up(f, tf), _round_up(e, te)
    pq = _round_up(pp, 8)
    tq = _round_up(t, 8)
    if (fp, ep) != (f, e):
        down_c = jnp.pad(down_c, ((0, 0), (0, fp - f), (0, ep - e)))
        down_s = jnp.pad(down_s,
                         ((0, 0), (0, (fp - f) // group), (0, ep - e)))
    if (pq, fp) != (pp, f):
        hw = jnp.pad(hw, ((0, pq - pp), (0, fp - f)))

    def h_map(ni, ti, ei, fi, ids):
        return 0, fi

    def w_map(ni, ti, ei, fi, ids):
        return ids[ti * top_k + ei], fi, ni

    def out_map(ni, ti, ei, fi, ids):
        return 0, ni

    grid = (ep // te, t, top_k, fp // tf)
    out = pl.pallas_call(
        _down_kernel(group, top_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((pq, tf), h_map),
                pl.BlockSpec((None, tf, te), w_map),
                pl.BlockSpec((None, tf // group, te), w_map),
            ],
            out_specs=pl.BlockSpec((tq, te), out_map),
            scratch_shapes=[pltpu.VMEM((8, te), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((tq, ep), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * pp * fp * ep,
            bytes_accessed=pp * fp * ep + t * ep * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids.astype(jnp.int32), hw.astype(jnp.bfloat16), down_c, down_s)
    if (tq, ep) != (t, e):
        out = out[:t, :e]
    return out


# ---------------------------------------------------------------------------
# int8 x int8 MXU variants (round 5)
# ---------------------------------------------------------------------------
# The bf16-dequant kernels above stream expert codes at ~350 GB/s on v5e —
# the per-weight VPU convert+mul chain is the ceiling (PERF_NOTES.md), which
# left MoE decode at 51.5% of its HBM roofline while the DENSE decode path
# reached ~95% by switching to supergroup int8 MXU dots (ops/qmatmul.py
# qmatmul_i8). These kernels apply the same design to the routed-expert
# matvecs: experts stored as supergroup-256 re-coded int8 + f32 scales
# (models/weights.py requants at load), activations quantized per
# (row, supergroup) on the fly, int32 MXU dots with a rank-1 (sx outer sw)
# correction — 2 VPU ops per OUTPUT per supergroup instead of 2 per WEIGHT.
# The analogue of the reference's Q8_K-activation int8 expert GEMM
# (iqk_mul_mat.cpp:246-308 applied through iqk_moe_fused_up_gate).
#
# The dot runs over ALL 8 resident pair rows (padded) against the current
# pair's expert tile — int8 MXU dots need >= 8 sublanes (an M=1 int8 dot
# collapses to ~80 GB/s, tools/microbench_i8m.py); the extra rows are free
# because the kernel is HBM-bound, and the wrong-pair rows are masked at the
# final write.

SUPERGROUP = 256


def _gate_up_kernel_i8(activation: str, act_limit: float, has_bias: bool,
                       nsg_blk: int):
    def kernel(ids_ref, xq_ref, xst_ref, gc_ref, gs_ref, uc_ref, us_ref,
               *rest):
        if has_bias:
            gb_ref, ub_ref, h_ref, accg, accu = rest
        else:
            h_ref, accg, accu = rest
        p_i = pl.program_id(1)
        k_i = pl.program_id(2)
        k_last = pl.num_programs(2) - 1

        @pl.when(k_i == 0)
        def _():
            accg[...] = jnp.zeros_like(accg)
            accu[...] = jnp.zeros_like(accu)

        for g in range(nsg_blk):
            xg = xq_ref[:, g * SUPERGROUP:(g + 1) * SUPERGROUP]
            sx = xst_ref[g, :][:, None]                    # (pq, 1) f32
            pg = jax.lax.dot_general(
                xg, gc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accg[...] += pg.astype(jnp.float32) * (sx * gs_ref[g, :][None, :])
            pu = jax.lax.dot_general(
                xg, uc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accu[...] += pu.astype(jnp.float32) * (sx * us_ref[g, :][None, :])

        @pl.when(k_i == k_last)
        def _():
            g, u = accg[...], accu[...]
            if has_bias:
                g = g + gb_ref[...].astype(jnp.float32)
                u = u + ub_ref[...].astype(jnp.float32)
            val = _act(g, u, activation, act_limit).astype(jnp.bfloat16)
            hrows = lax.broadcasted_iota(jnp.int32, h_ref.shape, 0)
            h_ref[...] = jnp.where(hrows == p_i, val, h_ref[...])
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("activation", "act_limit", "block_f", "block_k",
                     "interpret"),
)
def moe_decode_gate_up_i8(
    xq,            # int8 (P, K) quantized per-pair inputs
    xst,           # f32 (K//256, P) activation scales TRANSPOSED
    ids,           # i32 (P,) expert id per pair
    gate_c, gate_sw,  # int8 (G, K, FF), f32 (G, K//256, FF)
    up_c, up_sw,
    gate_b=None, up_b=None,
    *,
    activation: str = "silu",
    act_limit: float = 0.0,
    block_f: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
):
    """int8 MXU fused gate/up matvec + activation for routed pairs.

    Returns h bf16 (P, FF). K and FF must be multiples of 256/128."""
    p, k = xq.shape
    g, k2, f = gate_c.shape
    assert k == k2 and up_c.shape == (g, k, f) and k % SUPERGROUP == 0
    assert xst.shape == (k // SUPERGROUP, p)
    has_bias = gate_b is not None

    # xst blocks are (nsg_blk, pq) with nsg_blk = tk/256 on the SUBLANE dim:
    # either one k-tile spans the whole (padded) K so the block equals the
    # full dim, or nsg_blk must be a multiple of 8 (tk % 2048 == 0)
    k_sg = _round_up(k, SUPERGROUP)
    tk = k_sg if k_sg <= block_k else max(2048, block_k // 2048 * 2048)
    tf = min(block_f, _round_up(f, 128))
    kp, fp = _round_up(k, tk), _round_up(f, tf)
    pq = _round_up(p, 8)
    nsg_blk = tk // SUPERGROUP
    if (kp, fp) != (k, f):
        pad_c = ((0, 0), (0, kp - k), (0, fp - f))
        pad_s = ((0, 0), (0, (kp - k) // SUPERGROUP), (0, fp - f))
        gate_c = jnp.pad(gate_c, pad_c)
        gate_sw = jnp.pad(gate_sw, pad_s)
        up_c = jnp.pad(up_c, pad_c)
        up_sw = jnp.pad(up_sw, pad_s)
        if has_bias and fp != f:
            gate_b = jnp.pad(gate_b, ((0, 0), (0, fp - f)))
            up_b = jnp.pad(up_b, ((0, 0), (0, fp - f)))
    if (pq, kp) != (p, k):
        xq = jnp.pad(xq, ((0, pq - p), (0, kp - k)))
        xst = jnp.pad(xst, ((0, (kp - k) // SUPERGROUP), (0, pq - p)))

    in_specs = [
        pl.BlockSpec((pq, tk), lambda fi, pi, ki, ids: (0, ki)),
        pl.BlockSpec((nsg_blk, pq), lambda fi, pi, ki, ids: (ki, 0)),
        pl.BlockSpec((None, tk, tf), lambda fi, pi, ki, ids: (ids[pi], ki, fi)),
        pl.BlockSpec((None, nsg_blk, tf),
                     lambda fi, pi, ki, ids: (ids[pi], ki, fi)),
        pl.BlockSpec((None, tk, tf), lambda fi, pi, ki, ids: (ids[pi], ki, fi)),
        pl.BlockSpec((None, nsg_blk, tf),
                     lambda fi, pi, ki, ids: (ids[pi], ki, fi)),
    ]
    args = [xq, xst, gate_c, gate_sw, up_c, up_sw]
    if has_bias:
        b_map = lambda fi, pi, ki, ids: (ids[pi], fi)  # noqa: E731
        in_specs += [pl.BlockSpec((None, tf), b_map),
                     pl.BlockSpec((None, tf), b_map)]
        args += [gate_b, up_b]

    grid = (fp // tf, p, kp // tk)
    h = pl.pallas_call(
        _gate_up_kernel_i8(activation, act_limit, has_bias, nsg_blk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((pq, tf), lambda fi, pi, ki, ids: (0, fi)),
            scratch_shapes=[pltpu.VMEM((pq, tf), jnp.float32),
                            pltpu.VMEM((pq, tf), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((pq, fp), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * pq * kp * fp,
            bytes_accessed=2 * p * kp * fp + p * fp * 2,
            transcendentals=p * fp,
        ),
        interpret=interpret,
    )(ids.astype(jnp.int32), *args)
    if (pq, fp) != (p, f):
        h = h[:p, :f]
    return h


def _down_kernel_i8(top_k: int, nsg_blk: int):
    def kernel(ids_ref, hq_ref, hst_ref, dc_ref, dsw_ref, out_ref, acc):
        t_i = pl.program_id(1)
        e_i = pl.program_id(2)
        f_i = pl.program_id(3)
        first = (e_i == 0) & (f_i == 0)
        last = ((e_i == top_k - 1)
                & (f_i == pl.num_programs(3) - 1))

        @pl.when(first)
        def _():
            acc[...] = jnp.zeros_like(acc)

        pq = hq_ref.shape[0]
        p = t_i * top_k + e_i
        rows = lax.broadcasted_iota(jnp.int32, (pq, 1), 0)
        for g in range(nsg_blk):
            hg = hq_ref[:, g * SUPERGROUP:(g + 1) * SUPERGROUP]
            part = jax.lax.dot_general(
                hg, dc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)          # (pq, te)
            contrib = part.astype(jnp.float32) * (
                hst_ref[g, :][:, None] * dsw_ref[g, :][None, :])
            # fold ONLY the current pair's row into the token accumulator
            acc[0:1, :] += jnp.sum(jnp.where(rows == p, contrib, 0.0),
                                   axis=0, keepdims=True)

        @pl.when(last)
        def _():
            orows = lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
            out_ref[...] = jnp.where(orows == t_i, acc[0:1, :], out_ref[...])
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "block_e", "block_f", "interpret"),
)
def moe_decode_down_i8(
    hq,            # int8 (P, FF) quantized weighted activations
    hst,           # f32 (FF//256, P) activation scales TRANSPOSED
    ids,           # i32 (P,) expert id per pair, P == T * top_k
    down_c, down_sw,  # int8 (G, FF, E), f32 (G, FF//256, E)
    *,
    top_k: int,
    block_e: int = 2048,
    block_f: int = 1024,
    interpret: bool = False,
):
    """int8 MXU routing-weighted down-projection sum: returns f32 (T, E).

    ``hq`` rows must already carry the routing weight (folded in before
    quantization) so the top_k accumulation directly produces
    sum_e w_e * (h_e @ W_down[e])."""
    pp, f = hq.shape
    g, f2, e = down_c.shape
    assert f == f2 and pp % top_k == 0 and f % SUPERGROUP == 0
    assert hst.shape == (f // SUPERGROUP, pp)
    t = pp // top_k

    # hst blocks are (nsg_blk, pq): same sublane rule as the gate/up kernel
    f_sg = _round_up(f, SUPERGROUP)
    tf = f_sg if f_sg <= block_f else max(2048, block_f // 2048 * 2048)
    te = min(block_e, _round_up(e, 128))
    fp, ep = _round_up(f, tf), _round_up(e, te)
    pq = _round_up(pp, 8)
    tq = _round_up(t, 8)
    nsg_blk = tf // SUPERGROUP
    if (fp, ep) != (f, e):
        down_c = jnp.pad(down_c, ((0, 0), (0, fp - f), (0, ep - e)))
        down_sw = jnp.pad(down_sw,
                          ((0, 0), (0, (fp - f) // SUPERGROUP), (0, ep - e)))
    if (pq, fp) != (pp, f):
        hq = jnp.pad(hq, ((0, pq - pp), (0, fp - f)))
        hst = jnp.pad(hst, ((0, (fp - f) // SUPERGROUP), (0, pq - pp)))

    grid = (ep // te, t, top_k, fp // tf)
    out = pl.pallas_call(
        _down_kernel_i8(top_k, nsg_blk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((pq, tf), lambda ni, ti, ei, fi, ids: (0, fi)),
                pl.BlockSpec((nsg_blk, pq),
                             lambda ni, ti, ei, fi, ids: (fi, 0)),
                pl.BlockSpec((None, tf, te),
                             lambda ni, ti, ei, fi, ids:
                             (ids[ti * top_k + ei], fi, ni)),
                pl.BlockSpec((None, nsg_blk, te),
                             lambda ni, ti, ei, fi, ids:
                             (ids[ti * top_k + ei], fi, ni)),
            ],
            out_specs=pl.BlockSpec((tq, te),
                                   lambda ni, ti, ei, fi, ids: (0, ni)),
            scratch_shapes=[pltpu.VMEM((8, te), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((tq, ep), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * pq * fp * ep,
            bytes_accessed=pp * fp * ep + t * ep * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids.astype(jnp.int32), hq, hst, down_c, down_sw)
    if (tq, ep) != (t, e):
        out = out[:t, :e]
    return out


def _fused_kernel_i8(activation: str, act_limit: float, top_k: int,
                     nsg_k: int, nsg_f: int, has_bias: bool):
    """One grid step = one routed (token, expert) pair, whole expert slab.

    Streams gate+up+down of pair p's expert in a single step, computes
    h = act(x @ gate, x @ up) for all resident rows (M=8 keeps the int8
    MXU fed; only row p is valid), requantizes h per supergroup IN-KERNEL,
    runs the down matvec, and folds row p (routing weight already in h via
    wts) into its token's accumulator row. No intermediate h round-trip to
    HBM, no second pallas launch, no XLA glue between the halves — the
    full iqk_moe_fused_up_gate analogue (ggml/src/ggml.c:18593) in one
    kernel."""
    def kernel(ids_ref, xq_ref, xst_ref, wts_ref, gc_ref, gs_ref, uc_ref,
               us_ref, dc_ref, dsw_ref, *rest):
        if has_bias:
            gb_ref, ub_ref, out_ref, acc = rest
        else:
            out_ref, acc = rest
        p_i = pl.program_id(0)
        n_p = pl.num_programs(0)
        pq = xq_ref.shape[0]

        @pl.when(p_i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        # ---- gate/up: supergroup int8 MXU dots over all resident rows ----
        tf = gc_ref.shape[1]
        accg = jnp.zeros((pq, tf), jnp.float32)
        accu = jnp.zeros((pq, tf), jnp.float32)
        for g in range(nsg_k):
            xg = xq_ref[:, g * SUPERGROUP:(g + 1) * SUPERGROUP]
            sx = xst_ref[g, :][:, None]                    # (pq, 1) f32
            pg = jax.lax.dot_general(
                xg, gc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accg += pg.astype(jnp.float32) * (sx * gs_ref[g, :][None, :])
            pu = jax.lax.dot_general(
                xg, uc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accu += pu.astype(jnp.float32) * (sx * us_ref[g, :][None, :])
        g_, u_ = accg, accu
        if has_bias:
            g_ = g_ + gb_ref[...].astype(jnp.float32)
            u_ = u_ + ub_ref[...].astype(jnp.float32)
        h = _act(g_, u_, activation, act_limit)            # (pq, FF) f32
        # routing weight folded BEFORE requantization, rounded through
        # bf16 exactly like the two-kernel path (bf16 h -> f32 * w -> bf16
        # -> quantize), so both paths and the i8 oracle agree bit-for-bit
        h = (h.astype(jnp.bfloat16).astype(jnp.float32)
             * wts_ref[0, :][:, None]).astype(jnp.bfloat16
                                              ).astype(jnp.float32)

        # ---- in-kernel per-supergroup requantization of h ----------------
        te = dc_ref.shape[1]
        dacc = jnp.zeros((pq, te), jnp.float32)
        for g in range(nsg_f):
            hg = h[:, g * SUPERGROUP:(g + 1) * SUPERGROUP]
            amax = jnp.max(jnp.abs(hg), axis=1, keepdims=True)
            sc = amax / 127.0
            inv = jnp.where(sc > 0, 1.0 / jnp.where(sc > 0, sc, 1.0), 0.0)
            hq = jnp.clip(jnp.round(hg * inv), -127, 127).astype(jnp.int8)
            part = jax.lax.dot_general(
                hq, dc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)          # (pq, te)
            dacc += part.astype(jnp.float32) * (
                sc * dsw_ref[g, :][None, :])

        # ---- fold ONLY pair p's row into its token's accumulator row -----
        rows = lax.broadcasted_iota(jnp.int32, (pq, 1), 0)
        val = jnp.sum(jnp.where(rows == p_i, dacc, 0.0), axis=0,
                      keepdims=True)                        # (1, te)
        t_i = p_i // top_k
        orows = lax.broadcasted_iota(jnp.int32, acc.shape, 0)
        acc[...] += jnp.where(orows == t_i, val, 0.0)

        @pl.when(p_i == n_p - 1)
        def _():
            out_ref[...] = acc[...]
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "activation", "act_limit", "interpret"),
)
def moe_decode_fused_i8(
    xq,            # int8 (P, K) quantized per-pair inputs
    xst,           # f32 (K//256, P) activation scales TRANSPOSED
    ids,           # i32 (P,) expert id per pair, P == T * top_k
    wts,           # f32 (P,) routing weight per pair (1.0 if pre-folded)
    gate_c, gate_sw,  # int8 (G, K, FF), f32 (G, K//256, FF)
    up_c, up_sw,
    down_c, down_sw,  # int8 (G, FF, E), f32 (G, FF//256, E)
    gate_b=None, up_b=None,
    *,
    top_k: int,
    activation: str = "silu",
    act_limit: float = 0.0,
    interpret: bool = False,
):
    """Single-kernel routed MoE FFN for decode: returns f32 (T, E).

    Whole expert slabs per grid step — returns None (caller falls back to
    the two-kernel path) when a slab set does not fit the VMEM budget or
    shapes are not supergroup-aligned."""
    p, k = xq.shape
    g, k2, f = gate_c.shape
    e = down_c.shape[2]
    if not (k == k2 and down_c.shape[1] == f
            and k % SUPERGROUP == 0 and f % SUPERGROUP == 0
            and f % 128 == 0 and e % 128 == 0 and p % top_k == 0):
        return None
    # VMEM budget: 3 double-buffered int8 slabs + h/acc scratch under ~64 MB
    slab = 2 * k * f + f * e
    if 2 * slab > 64 * 2**20:
        return None
    t = p // top_k
    pq = _round_up(p, 8)
    tq = _round_up(t, 8)
    if pq != p:
        xq = jnp.pad(xq, ((0, pq - p), (0, 0)))
        xst = jnp.pad(xst, ((0, 0), (0, pq - p)))
        wts = jnp.pad(wts, (0, pq - p))
    has_bias = gate_b is not None

    nsg_k = k // SUPERGROUP
    nsg_f = f // SUPERGROUP

    in_specs = [
        pl.BlockSpec((pq, k), lambda pi, ids: (0, 0)),
        pl.BlockSpec((nsg_k, pq), lambda pi, ids: (0, 0)),
        pl.BlockSpec((1, pq), lambda pi, ids: (0, 0)),
        pl.BlockSpec((None, k, f), lambda pi, ids: (ids[pi], 0, 0)),
        pl.BlockSpec((None, nsg_k, f), lambda pi, ids: (ids[pi], 0, 0)),
        pl.BlockSpec((None, k, f), lambda pi, ids: (ids[pi], 0, 0)),
        pl.BlockSpec((None, nsg_k, f), lambda pi, ids: (ids[pi], 0, 0)),
        pl.BlockSpec((None, f, e), lambda pi, ids: (ids[pi], 0, 0)),
        pl.BlockSpec((None, nsg_f, e), lambda pi, ids: (ids[pi], 0, 0)),
    ]
    args = [xq, xst, wts.astype(jnp.float32).reshape(1, pq),
            gate_c, gate_sw, up_c, up_sw, down_c, down_sw]
    if has_bias:
        in_specs += [pl.BlockSpec((None, f), lambda pi, ids: (ids[pi], 0)),
                     pl.BlockSpec((None, f), lambda pi, ids: (ids[pi], 0))]
        args += [gate_b, up_b]

    out = pl.pallas_call(
        _fused_kernel_i8(activation, act_limit, top_k, nsg_k, nsg_f,
                         has_bias),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(p,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tq, e), lambda pi, ids: (0, 0)),
            scratch_shapes=[pltpu.VMEM((tq, e), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((tq, e), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=pq * (4 * k * f + 2 * f * e),
            bytes_accessed=p * (2 * k * f + f * e) + t * e * 4,
            transcendentals=p * f,
        ),
        interpret=interpret,
    )(ids.astype(jnp.int32), *args)
    return out[:t]


def moe_decode_i8_ref(x, w, idx, experts, *, activation="silu",
                      act_limit: float = 0.0, weight_before_ffn: bool = False):
    """jnp oracle for the int8 decode path: the SAME activation quantization
    and exact-int32-dot + f32-correction numerics as the Pallas kernels, so
    CPU runs and TPU runs of a supergroup-expert model agree bit-for-bit
    on the matmul results (activation-quant error included in both)."""
    from .qmatmul import quantize_activations
    t, k = idx.shape
    ids = idx.reshape(-1)
    xp = jnp.repeat(x.astype(jnp.bfloat16), k, axis=0)
    if weight_before_ffn:
        xp = xp * w.reshape(-1)[:, None].astype(jnp.bfloat16)
    xq, xs = quantize_activations(xp)           # (P, K) i8, (P, K/256) f32

    def i8mm(q, qs, codes, sw):
        # per-pair exact int dot with rank-1 corrections
        p, kk = q.shape
        nsg = kk // SUPERGROUP
        qg = q.astype(jnp.int32).reshape(p, nsg, SUPERGROUP)
        wg = codes.astype(jnp.int32).reshape(p, nsg, SUPERGROUP, -1)
        part = jnp.einsum("pgs,pgsn->pgn", qg, wg).astype(jnp.float32)
        return jnp.einsum("pgn,pg,pgn->pn", part, qs.astype(jnp.float32),
                          sw.astype(jnp.float32))

    g = i8mm(xq, xs, experts.gate[ids], experts.gate_s[ids])
    u = i8mm(xq, xs, experts.up[ids], experts.up_s[ids])
    if experts.gate_b is not None:
        g = g + experts.gate_b[ids].astype(jnp.float32)
        u = u + experts.up_b[ids].astype(jnp.float32)
    h = _act(g, u, activation, act_limit).astype(jnp.bfloat16)
    if not weight_before_ffn:
        h = (h.astype(jnp.float32)
             * w.reshape(-1)[:, None]).astype(jnp.bfloat16)
    hq, hs = quantize_activations(h)
    y = i8mm(hq, hs, experts.down[ids], experts.down_s[ids])
    y = y.reshape(t, k, -1)
    out = jnp.sum(y, axis=1)
    if experts.down_b is not None:
        db = experts.down_b[ids].reshape(t, k, -1).astype(jnp.float32)
        if weight_before_ffn:
            out = out + jnp.sum(db, axis=1)
        else:
            out = out + jnp.sum(db * w[:, :, None], axis=1)
    return out


def moe_decode_ref(x, w, idx, experts, *, activation="silu",
                   act_limit: float = 0.0, weight_before_ffn: bool = False):
    """jnp oracle: dense gather-dequant per (token, expert) pair."""
    t, k = idx.shape
    ids = idx.reshape(-1)

    def dq(codes, scale, group):
        # kernel numerics: the whole dequant chain runs in bf16 (int8 codes
        # are exact in bf16; the scale is rounded once) — same convention as
        # ragged_qmatmul_ref
        s = jnp.repeat(scale, group, axis=1).astype(jnp.bfloat16)
        return codes.astype(jnp.bfloat16) * s

    gate = dq(experts.gate[ids], experts.gate_s[ids], experts.gate_group)
    up = dq(experts.up[ids], experts.up_s[ids], experts.up_group)
    down = dq(experts.down[ids], experts.down_s[ids], experts.down_group)
    xp = jnp.repeat(x.astype(jnp.bfloat16), k, axis=0)
    if weight_before_ffn:
        xp = xp * w.reshape(-1)[:, None].astype(jnp.bfloat16)
    g = jnp.einsum("pk,pkf->pf", xp, gate,
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("pk,pkf->pf", xp, up,
                   preferred_element_type=jnp.float32)
    if experts.gate_b is not None:
        g = g + experts.gate_b[ids].astype(jnp.float32)
        u = u + experts.up_b[ids].astype(jnp.float32)
    h = _act(g, u, activation, act_limit).astype(jnp.bfloat16)
    if not weight_before_ffn:
        # kernel numerics: the routing weight is folded into h (bf16) before
        # the down matvec, and the top_k sum runs unweighted in f32
        h = (h.astype(jnp.float32)
             * w.reshape(-1)[:, None]).astype(jnp.bfloat16)
    y = jnp.einsum("pf,pfe->pe", h, down,
                   preferred_element_type=jnp.float32)
    y = y.reshape(t, k, -1)
    out = jnp.sum(y, axis=1)
    if experts.down_b is not None:
        db = experts.down_b[ids].reshape(t, k, -1).astype(jnp.float32)
        if weight_before_ffn:
            out = out + jnp.sum(db, axis=1)
        else:
            out = out + jnp.sum(db * w[:, :, None], axis=1)
    return out
