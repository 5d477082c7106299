"""Ragged (grouped) fused dequant-matmul — quantized MoE expert GEMM.

The TPU replacement for the reference's quantized expert matmuls:
`iqk_moe_fused_up_gate` (ggml/src/iqk/iqk_mul_mat.h:74, dispatched from
ggml.c:18593) and the CUDA indirect MMQ path (ggml-cuda/mmq_id.cu).
Experts stay in HBM as planar int8 codes + f32 group scales (quant/planar.py)
— ~1.06-1.25 bytes/weight instead of 2 — and are dequantized on the VPU
inside the kernel, tile by tile, feeding bf16 to the MXU.

Kernel structure: tokens are pre-sorted by routed expert (CSR-style
`group_sizes`), and the m-dimension is processed in `tm`-row tiles that may
span group boundaries. Each grid step owns one (m-tile, group) pair; tiles
revisited by several groups merge through a masked store. This step-mapping
scheme follows the public Megablocks/`jax.experimental.pallas.ops.tpu.megablox`
grouped-matmul design; the dequant epilogue, padding strategy and phantom
tail group are ours.

`ragged_qmatmul_ref` is the jnp oracle used by differential tests (the
analogue of test-backend-ops.cpp CPU-vs-backend comparison).
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


def ragged_qmatmul_ref(x, codes, scale, group_sizes, *, group: int = 32):
    """jnp oracle: per-group x[rows_g] @ dequant(codes[g], scale[g]).

    x: (M, K); codes: int8 (G, K, N); scale: f32 (G, K//group, N);
    group_sizes: i32 (G,) with sum == M. Numerics match the kernel: the whole
    dequant chain runs in bf16 (int8 codes are exact in bf16; the scale is
    rounded once) — measured 7x faster than an f32 chain on v5e, at the cost
    of <=2^-9 relative weight error, far below the quantization error itself.
    """
    w = codes.astype(jnp.bfloat16) * jnp.repeat(scale, group,
                                                axis=1).astype(jnp.bfloat16)
    return lax.ragged_dot(x.astype(jnp.bfloat16), w,
                          group_sizes.astype(jnp.int32),
                          preferred_element_type=jnp.float32)


def _metadata(group_sizes, m_padded: int, tm: int, n_groups: int):
    """Step mapping for the ragged m-dimension.

    Returns (offs, step_group, step_tile, num_steps):
      offs:       (n_groups+2,) CSR row offsets incl. a phantom tail group
                  covering the zero padding rows;
      step_group: (smax,) group id per grid step (phantom id == n_groups);
      step_tile:  (smax,) m-tile id per grid step, non-decreasing so output
                  tiles are only revisited consecutively;
      num_steps:  dynamic number of real steps (grid size).
    """
    gs = group_sizes.astype(jnp.int32)
    total = jnp.sum(gs)
    # phantom group owns the padding rows so that sum(sizes) == m_padded
    gs = jnp.concatenate([gs, (m_padded - total)[None]])
    g_all = n_groups + 1

    ends = jnp.cumsum(gs)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32), ends])
    starts = offs[:-1]
    r_end = ((ends + tm - 1) // tm) * tm
    r_start = (starts // tm) * tm
    tiles_per = jnp.where(gs == 0, 0, (r_end - r_start) // tm)

    tiles_m = m_padded // tm
    smax = tiles_m + g_all - 1
    step_group = jnp.repeat(jnp.arange(g_all, dtype=jnp.int32), tiles_per,
                            total_repeat_length=smax)
    # one owned visit per tile, plus one revisit per non-empty group that
    # starts mid-tile
    starts_mid = (starts % tm != 0) & (gs > 0)
    tile_of_start = jnp.where(starts_mid, starts // tm, tiles_m)
    extra = jnp.bincount(tile_of_start, length=tiles_m + 1)[:tiles_m]
    visits = 1 + extra.astype(jnp.int32)
    step_tile = jnp.repeat(jnp.arange(tiles_m, dtype=jnp.int32), visits,
                           total_repeat_length=smax)
    num_steps = jnp.sum(tiles_per)
    return offs, step_group, step_tile, num_steps


SUPERGROUP = 256


def ragged_qmatmul_i8_ref(xq, xs, codes, sw, group_sizes):
    """jnp oracle for the int8 ragged kernel: exact int32 dots per supergroup
    with rank-1 f32 scale corrections — the same numerics as the Pallas
    kernel AND the XLA path, so CPU/TPU MoE prefill agree bit-for-bit.

    xq: int8 (M, K); xs: f32 (M, K/256); codes: int8 (G, K, N);
    sw: f32 (G, K/256, N); group_sizes: i32 (G,).
    """
    m, k = xq.shape
    nsg = k // SUPERGROUP
    # expand each row's expert weights via the group assignment
    ends = jnp.cumsum(group_sizes.astype(jnp.int32))
    rid = jnp.sum(jnp.arange(m)[:, None] >= ends[None, :], axis=1)
    rid = jnp.minimum(rid, codes.shape[0] - 1)
    xg = xq.astype(jnp.int32).reshape(m, nsg, SUPERGROUP)
    wg = codes.astype(jnp.int32)[rid].reshape(m, nsg, SUPERGROUP, -1)
    part = jnp.einsum("mgs,mgsn->mgn", xg, wg).astype(jnp.float32)
    return jnp.einsum("mgn,mg,mgn->mn", part, xs.astype(jnp.float32),
                      sw.astype(jnp.float32)[rid])


def _kernel_i8(nsg_blk: int):
    def kernel(offs_ref, gid_ref, tid_ref, xq_ref, xst_ref, c_ref, sw_ref,
               out_ref, acc_ref):
        sid = pl.program_id(1)
        k_i = pl.program_id(2)
        k_last = pl.num_programs(2) - 1

        @pl.when(k_i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # per-supergroup int8 MXU dots with rank-1 f32 corrections — the
        # grouped-expert variant of qmatmul_i8_mxu (ops/qmatmul.py): MXU at
        # its doubled int8 rate, 2 VPU ops per OUTPUT per supergroup
        for g in range(nsg_blk):
            part = lax.dot_general(
                xq_ref[:, g * SUPERGROUP:(g + 1) * SUPERGROUP],
                c_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            corr = xst_ref[g, :][:, None] * sw_ref[g, :][None, :]
            acc_ref[...] += part.astype(jnp.float32) * corr

        @pl.when(k_i == k_last)
        def _():
            gid = gid_ref[sid]
            row0 = tid_ref[sid] * acc_ref.shape[0]
            rows = row0 + lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0)
            mask = (rows >= offs_ref[gid]) & (rows < offs_ref[gid + 1])
            out_ref[...] = jnp.where(mask, acc_ref[...], out_ref[...])
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret"),
)
def ragged_qmatmul_i8(
    xq,
    xst,
    codes,
    sw,
    group_sizes,
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 2048,
    interpret: bool = False,
):
    """Grouped int8 x int8 MXU matmul: (M, K) x (G, K, N) -> f32 (M, N).

    The MoE PREFILL path for supergroup-256 requantized experts
    (models/llama.py expert load): activations quantized per
    (row, supergroup), int32 MXU dots, rank-1 (sx outer sw) correction —
    the grouped analogue of the reference's Q8_K int8 expert GEMM
    (iqk_mul_mat.cpp:246-308 via iqk_moe_fused_up_gate / mmq_id.cu).

    xq: int8 (M, K) rows sorted by group; xst: f32 (K/256, M) activation
    scales TRANSPOSED (per-supergroup slices must land on the sublane dim);
    codes: int8 (G, K, N); sw: f32 (G, K/256, N); group_sizes i32 (G,).
    """
    m, k = xq.shape
    g, k2, n = codes.shape
    assert k == k2 and k % SUPERGROUP == 0, (xq.shape, codes.shape)
    assert xst.shape == (k // SUPERGROUP, m), (xst.shape,)
    assert sw.shape == (g, k // SUPERGROUP, n), (sw.shape,)

    # tm lane-aligned to 128: xst blocks are (nsg, tm) so tm is a LANE dim
    tm = min(block_m, _round_up(m, 128))
    # scale blocks are (nsg_blk, .) with nsg_blk = tk/256 on the SUBLANE dim:
    # either one k-tile spans the whole K (block == full dim, any nsg_blk) or
    # nsg_blk must be a multiple of 8 (tk % 2048 == 0)
    k_sg = _round_up(k, SUPERGROUP)
    if k_sg <= block_k:
        tk = k_sg
    else:
        tk = max(2048, block_k // 2048 * 2048)
    tn = min(block_n, _round_up(n, 128))
    mp, kp, np_ = _round_up(m, tm), _round_up(k, tk), _round_up(n, tn)
    nsg_blk = tk // SUPERGROUP

    if (mp, kp) != (m, k):
        xq = jnp.pad(xq, ((0, mp - m), (0, kp - k)))
    if xst.shape != (kp // SUPERGROUP, mp):
        xst = jnp.pad(xst, ((0, (kp - k) // SUPERGROUP), (0, mp - m)))
    if (kp, np_) != (k, n):
        codes = jnp.pad(codes, ((0, 0), (0, kp - k), (0, np_ - n)))
        sw = jnp.pad(sw, ((0, 0), (0, (kp - k) // SUPERGROUP), (0, np_ - n)))

    offs, step_group, step_tile, num_steps = _metadata(group_sizes, mp, tm, g)

    def x_map(n_i, s, k_i, offs, gid, tid):
        return tid[s], k_i

    def xs_map(n_i, s, k_i, offs, gid, tid):
        return k_i, tid[s]

    def w_map(n_i, s, k_i, offs, gid, tid):
        return jnp.minimum(gid[s], g - 1), k_i, n_i

    def out_map(n_i, s, k_i, offs, gid, tid):
        return tid[s], n_i

    grid = (np_ // tn, num_steps, kp // tk)
    out = pl.pallas_call(
        _kernel_i8(nsg_blk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tk), x_map),
                pl.BlockSpec((nsg_blk, tm), xs_map),
                pl.BlockSpec((None, tk, tn), w_map),
                pl.BlockSpec((None, nsg_blk, tn), w_map),
            ],
            out_specs=pl.BlockSpec((tm, tn), out_map),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=mp * kp + kp * np_
            + (kp // SUPERGROUP) * (mp + np_) * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(offs, step_group, step_tile, xq, xst, codes, sw)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def _kernel(group: int, n_groups: int):
    def kernel(offs_ref, gid_ref, tid_ref, x_ref, c_ref, s_ref, out_ref,
               acc_ref):
        sid = pl.program_id(1)
        k_i = pl.program_id(2)
        k_last = pl.num_programs(2) - 1

        @pl.when(k_i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        tk, tn = c_ref.shape
        w = c_ref[...].astype(jnp.bfloat16).reshape(tk // group, group, tn)
        w = (w * s_ref[...].astype(jnp.bfloat16)[:, None, :]).reshape(tk, tn)
        acc_ref[...] += jnp.dot(x_ref[...], w,
                                preferred_element_type=jnp.float32)

        @pl.when(k_i == k_last)
        def _():
            gid = gid_ref[sid]
            row0 = tid_ref[sid] * acc_ref.shape[0]
            rows = row0 + lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0)
            mask = (rows >= offs_ref[gid]) & (rows < offs_ref[gid + 1])
            out_ref[...] = jnp.where(mask, acc_ref[...], out_ref[...])
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "block_k", "interpret"),
)
def ragged_qmatmul(
    x,
    codes,
    scale,
    group_sizes,
    *,
    group: int = 32,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
):
    """Grouped fused dequant-matmul: (M, K) x int8 (G, K, N) -> f32 (M, N).

    Rows of ``x`` must be sorted by group; ``group_sizes`` (G,) gives each
    group's row count (sum <= M; trailing rows are padding and produce
    undefined output rows). scale: f32 (G, K//group, N).
    """
    m, k = x.shape
    g, k2, n = codes.shape
    assert k == k2, (x.shape, codes.shape)
    assert scale.shape == (g, k // group, n), (scale.shape,)

    tm = min(block_m, _round_up(m, 16))
    tk = min(block_k, _round_up(k, max(256, group)))
    tn = min(block_n, _round_up(n, 128))
    assert tk % group == 0, (tk, group)
    mp, kp, np_ = _round_up(m, tm), _round_up(k, tk), _round_up(n, tn)

    x = x.astype(jnp.bfloat16)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        codes = jnp.pad(codes, ((0, 0), (0, kp - k), (0, np_ - n)))
        scale = jnp.pad(scale, ((0, 0), (0, (kp - k) // group), (0, np_ - n)))

    offs, step_group, step_tile, num_steps = _metadata(group_sizes, mp, tm, g)

    def x_map(n_i, s, k_i, offs, gid, tid):
        return tid[s], k_i

    def w_map(n_i, s, k_i, offs, gid, tid):
        return jnp.minimum(gid[s], g - 1), k_i, n_i

    def out_map(n_i, s, k_i, offs, gid, tid):
        return tid[s], n_i

    grid = (np_ // tn, num_steps, kp // tk)
    out = pl.pallas_call(
        _kernel(group, g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tk), x_map),
                pl.BlockSpec((None, tk, tn), w_map),
                pl.BlockSpec((None, tk // group, tn), w_map),
            ],
            out_specs=pl.BlockSpec((tm, tn), out_map),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=mp * kp * 2 + kp * np_ + (kp // group) * np_ * 4
            + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(offs, step_group, step_tile, x, codes, scale)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


# ---------------------------------------------------------------------------
# Capacity-bucketed fused MoE prefill (round 5)
# ---------------------------------------------------------------------------
# The megablox-style ragged kernels above pay (tiles_m + G) grid steps PER
# MATMUL (x3 per layer), each doing full tm-row MXU work for the one group
# that owns a fraction of the tile — at the Qwen3-30B shape (4096 routed
# rows over 128 experts, ~32 rows each with tm=256) that is ~8x redundant
# compute plus ~430 grid-step fixed costs per layer, measured at 6.5% MFU
# (BENCH_r05 moe_pp_mfu_pct).  This kernel instead:
#   * gathers the sorted rows into (G, R, K) capacity buckets (R ~ 1.25x
#     the mean rows/expert, 8-aligned);
#   * runs ONE grid step per NON-EMPTY expert (dynamic grid length via a
#     scalar-prefetched expert-id list) streaming that expert's gate+up+
#     down slabs exactly once;
#   * computes the whole FFN in-kernel (supergroup int8 MXU dots, act,
#     in-kernel h requantization, down dots) writing the (R, E) out block
#     directly — no cross-step accumulator, no tile revisits;
#   * leaves overflow rows (routing skew beyond R) to the ragged kernels,
#     whose dynamic step count makes an empty overflow pass ~free.
# The i8 numerics are identical to ragged_qmatmul_i8 + the XLA act chain
# (same quantize points), so outputs are bit-compatible with the decode
# fused kernel and the CPU oracle.
# Reference analogue: iqk_moe_fused_up_gate (iqk_mul_mat.h:74) / mmq_id.cu.


def _fused_prefill_kernel(activation: str, act_limit: float, nsg_k: int,
                          nsg_f: int):
    from .moe_decode import _act

    def kernel(eids_ref, xg_ref, xst_ref, gc_ref, gs_ref, uc_ref, us_ref,
               dc_ref, dsw_ref, out_ref):
        del eids_ref
        r = xg_ref.shape[0]
        tf = gc_ref.shape[1]
        accg = jnp.zeros((r, tf), jnp.float32)
        accu = jnp.zeros((r, tf), jnp.float32)
        for g in range(nsg_k):
            xgs = xg_ref[:, g * SUPERGROUP:(g + 1) * SUPERGROUP]
            sx = xst_ref[g, :][:, None]
            pg = lax.dot_general(
                xgs, gc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accg += pg.astype(jnp.float32) * (sx * gs_ref[g, :][None, :])
            pu = lax.dot_general(
                xgs, uc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accu += pu.astype(jnp.float32) * (sx * us_ref[g, :][None, :])
        h = _act(accg, accu, activation, act_limit)
        # same quantize points as the XLA chain: h rounds through bf16,
        # then per-(row, supergroup) absmax int8
        h = h.astype(jnp.bfloat16).astype(jnp.float32)

        te = dc_ref.shape[1]
        acc = jnp.zeros((r, te), jnp.float32)
        for g in range(nsg_f):
            hg = h[:, g * SUPERGROUP:(g + 1) * SUPERGROUP]
            amax = jnp.max(jnp.abs(hg), axis=1, keepdims=True)
            sc = amax / 127.0
            inv = jnp.where(sc > 0, 1.0 / jnp.where(sc > 0, sc, 1.0), 0.0)
            hq = jnp.clip(jnp.round(hg * inv), -127, 127).astype(jnp.int8)
            part = lax.dot_general(
                hq, dc_ref[g * SUPERGROUP:(g + 1) * SUPERGROUP, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += part.astype(jnp.float32) * (sc * dsw_ref[g, :][None, :])
        out_ref[...] = acc
    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("capacity", "activation", "act_limit", "interpret"),
)
def fused_moe_prefill_i8(
    xg,            # int8 (G, R, K) capacity-bucketed rows (zero-padded)
    xst,           # f32 (G, K//256, R) activation scales, R on the lane dim
    eids,          # i32 (G,) expert id per grid step (non-empty first)
    n_live,        # i32 scalar: number of non-empty experts (grid length)
    gate_c, gate_sw,  # int8 (G, K, FF), f32 (G, K//256, FF)
    up_c, up_sw,
    down_c, down_sw,  # int8 (G, FF, E), f32 (G, FF//256, E)
    *,
    capacity: int,
    activation: str = "silu",
    act_limit: float = 0.0,
    interpret: bool = False,
):
    """Whole-FFN fused prefill over capacity buckets: returns f32 (G, R, E).

    Only the first ``n_live`` eids are visited; out blocks of experts not
    visited are UNDEFINED — callers must never read rows of empty experts.
    Returns None when the expert slabs exceed the VMEM budget (the ragged
    path handles those models)."""
    g, r, k = xg.shape
    f = gate_c.shape[2]
    e = down_c.shape[2]
    if not (r == capacity and k % SUPERGROUP == 0 and f % SUPERGROUP == 0
            and r % 8 == 0 and f % 128 == 0 and e % 128 == 0
            and k % 128 == 0):
        return None
    slab = 2 * k * f + f * e
    if 2 * slab > 64 * 2**20:
        return None
    nsg_k = k // SUPERGROUP
    nsg_f = f // SUPERGROUP

    out = pl.pallas_call(
        _fused_prefill_kernel(activation, act_limit, nsg_k, nsg_f),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_live,),
            in_specs=[
                pl.BlockSpec((None, r, k), lambda s, eids: (eids[s], 0, 0)),
                pl.BlockSpec((None, nsg_k, r),
                             lambda s, eids: (eids[s], 0, 0)),
                pl.BlockSpec((None, k, f), lambda s, eids: (eids[s], 0, 0)),
                pl.BlockSpec((None, nsg_k, f),
                             lambda s, eids: (eids[s], 0, 0)),
                pl.BlockSpec((None, k, f), lambda s, eids: (eids[s], 0, 0)),
                pl.BlockSpec((None, nsg_k, f),
                             lambda s, eids: (eids[s], 0, 0)),
                pl.BlockSpec((None, f, e), lambda s, eids: (eids[s], 0, 0)),
                pl.BlockSpec((None, nsg_f, e),
                             lambda s, eids: (eids[s], 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, r, e),
                                   lambda s, eids: (eids[s], 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((g, r, e), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=g * r * (4 * k * f + 2 * f * e),
            bytes_accessed=g * (2 * k * f + f * e) + g * r * (k + e * 4),
            transcendentals=g * r * f,
        ),
        interpret=interpret,
    )(eids.astype(jnp.int32), xg, xst, gate_c, gate_sw, up_c, up_sw,
      down_c, down_sw)
    return out
