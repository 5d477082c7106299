"""Pallas flash attention for TPU — replaces the reference's CPU
iqk_flash_attn_noalibi (iqk_flash_attn.cpp) and CUDA fattn-*.cu.

Online-softmax tiled attention over a fixed-capacity KV cache:
  * grid (B*H, T/TQ, S/TS) with the KV dimension innermost; running max /
    sum-exp / accumulator live in VMEM scratch across the KV sweep
  * causal + cache-length + sliding-window masking, optional logit softcap
    (same semantics as llm_build_kqv, llama-build-context.cpp:2011-2055)
  * GQA: the q->kv head mapping happens in the BlockSpec index maps, so KV
    tiles are fetched once per kv-head group
  * fully masked KV tiles are skipped (no MXU work) via pl.when

The jnp fallback (ops/attention.attend) is the differential-test oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _make_tile_clamp(ts: int, tq: int, h: int, swa: int, attn_chunk: int):
    """KV-tile index clamp for the BlockSpec index maps.

    Dead tiles (beyond the cache fill / after the causal frontier / entirely
    before the SWA window or llama4 chunk) are mapped to the nearest live
    tile: Pallas skips the DMA when consecutive grid steps resolve to the
    same block index, so attention HBM traffic scales with the FILLED cache
    (bounded by the window), not its capacity — the fix for TG throughput
    degrading with context (reference sweep-bench behaviour)."""
    def clamp(bh, i, j, qpos, kvlen):
        batch = bh // h
        q_lo = qpos[batch] + i * tq
        last = jnp.minimum((kvlen[batch] - 1) // ts,
                           (q_lo + tq - 1) // ts)
        first = jnp.int32(0)
        if swa > 0:
            first = jnp.maximum(first, (q_lo - swa + 1) // ts)
        if attn_chunk > 0:
            first = jnp.maximum(first, (q_lo // attn_chunk)
                                * attn_chunk // ts)
        return jnp.clip(j, jnp.maximum(first, 0), jnp.maximum(last, 0))
    return clamp


def _fa_kernel(qpos_ref, kvlen_ref, *rest, scale, softcap, swa, tq, ts, d,
               dv, h, has_sinks=False, attn_chunk=0):
    if has_sinks:
        sinks_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref = rest
        sinks_ref = None
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    head = pl.program_id(0) % h

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if has_sinks:
            # attention sink (gpt-oss): an extra per-head logit in the
            # softmax denominator == online-softmax state initialized to
            # m = sink, l = 1 (ggml_flash_attn_ext_add_sinks semantics)
            sk = sinks_ref[head]
            m_ref[:] = jnp.full_like(m_ref, sk)
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

    batch = pl.program_id(0) // h
    q_pos0 = qpos_ref[batch]
    kv_len = kvlen_ref[batch]
    i = pl.program_id(1)

    q_rows = q_pos0 + i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 0)
    k_cols = j * ts + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
    mask = (k_cols <= q_rows) & (k_cols < kv_len)
    if swa > 0:
        mask &= k_cols > q_rows - swa
    if attn_chunk > 0:
        # llama4 chunked attention (llama.cpp:5334 pos_chunk_start)
        mask &= k_cols >= (q_rows // attn_chunk) * attn_chunk

    # skip fully-masked tiles: first key of tile > last query position, or
    # tile beyond cache fill, or tile entirely before the SWA window /
    # llama4 chunk of every query row in this q-tile
    tile_live = (j * ts <= q_pos0 + i * tq + tq - 1) & (j * ts < kv_len)
    if swa > 0:
        tile_live &= j * ts + ts - 1 > q_pos0 + i * tq - swa
    if attn_chunk > 0:
        tile_live &= (j * ts + ts - 1
                      >= ((q_pos0 + i * tq) // attn_chunk) * attn_chunk)

    @pl.when(tile_live)
    def _():
        q = q_ref[0].astype(jnp.float32)          # (TQ, D)
        k = k_ref[0].astype(jnp.float32)          # (TS, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0:1]                    # (TQ, 1)
        m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)           # (TQ, 1)
        p = jnp.exp(s - m_new)                    # (TQ, TS)
        l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + p.sum(axis=1, keepdims=True)
        v = v_ref[0].astype(jnp.float32)          # (TS, D)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nj - 1)
    def _():
        denom = jnp.where(l_ref[:, 0:1] > 0, l_ref[:, 0:1], 1.0)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "swa_window", "attn_chunk", "block_q", "block_kv",
                     "interpret"),
)
def flash_attention(q, k, v, q_pos0, kv_len, *, scale: float,
                    softcap: float = 0.0, swa_window: int = 0,
                    attn_chunk: int = 0, sinks=None,
                    block_q: int = 512, block_kv: int = 2048,
                    interpret: bool = False):
    """q: (B, T, H, D); k, v: (B, S, Hkv, D).

    q_pos0, kv_len: scalars or (B,) vectors (int32) — per-sequence start
    position and cache fill, enabling mixed continuous-batching steps.
    Queries at absolute positions q_pos0..q_pos0+T-1 attend causally to cache
    entries < kv_len. Returns (B, T, H, D) in q.dtype.
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    hkv = k.shape[2]
    dv = v.shape[3]  # may differ from d (MLA: Dk=192, Dv=128)
    rep = h // hkv

    tq = min(block_q, max(8, 1 << (t - 1).bit_length()))
    # decode shapes: small KV tiles so traffic overshoots the cache fill by
    # at most one tile (the tile clamp skips dead-tile DMAs entirely)
    ts = min(block_kv if t > 16 else 512, s)
    dp = -(-max(d, 128) // 128) * 128    # pad head dims to lane width
    dvp = -(-max(dv, 128) // 128) * 128

    # layout: (B*H, T, D) for q, (B*Hkv, S, D) for kv
    qr = jnp.pad(q.transpose(0, 2, 1, 3).reshape(b * h, t, d),
                 ((0, 0), (0, (-t) % tq), (0, dp - d)))
    kr = jnp.pad(k.transpose(0, 2, 1, 3).reshape(b * hkv, s, d),
                 ((0, 0), (0, (-s) % ts), (0, dp - d)))
    vr = jnp.pad(v.transpose(0, 2, 1, 3).reshape(b * hkv, s, dv),
                 ((0, 0), (0, (-s) % ts), (0, dvp - dv)))
    tpad = qr.shape[1]
    spad = kr.shape[1]

    grid = (b * h, tpad // tq, spad // ts)

    clamp = _make_tile_clamp(ts, tq, h, swa_window, attn_chunk)

    def q_map(bh, i, j, qpos, kvlen):
        return bh, i, 0

    def kv_map(bh, i, j, qpos, kvlen, _rep=rep, _h=h, _hkv=hkv):
        return ((bh // _h) * _hkv + (bh % _h) // _rep,
                clamp(bh, i, j, qpos, kvlen), 0)

    def o_map(bh, i, j, qpos, kvlen):
        return bh, i, 0

    args_prefix = [
        jnp.broadcast_to(jnp.asarray(q_pos0, jnp.int32).reshape(-1), (b,)),
        jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,)),
    ]
    in_specs = []
    if sinks is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # sinks (H,)
        args_prefix.append(jnp.asarray(sinks, jnp.float32).reshape(h))
    in_specs += [
        pl.BlockSpec((1, tq, dp), q_map),
        pl.BlockSpec((1, ts, dp), kv_map),
        pl.BlockSpec((1, ts, dvp), kv_map),
    ]

    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, softcap=softcap,
                          swa=swa_window, attn_chunk=attn_chunk,
                          tq=tq, ts=ts, d=dp, dv=dvp, h=h,
                          has_sinks=sinks is not None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, tq, dvp), o_map),
            scratch_shapes=[
                pltpu.VMEM((tq, dvp), jnp.float32),
                pltpu.VMEM((tq, 128), jnp.float32),
                pltpu.VMEM((tq, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tpad, dvp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args_prefix, qr, kr, vr)

    out = out[:, :t, :dv].reshape(b, h, t, dv).transpose(0, 2, 1, 3)
    return out


def _fa_q8_kernel(qpos_ref, kvlen_ref, *rest, scale, softcap, swa, tq, ts,
                  d, dv, h, hkv, has_sinks=False, attn_chunk=0):
    """Same online-softmax loop, KV tiles arrive as int8 + per-row scales.

    Scale blocks span the WHOLE (B*Hkv) row axis (a (1, ts) block is not a
    legal Mosaic tile when B*Hkv > 1: the sublane dim must be divisible by
    8 or equal the array dim) — the kernel picks its kv-head row here."""
    if has_sinks:
        (sinks_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
         o_ref, acc_ref, m_ref, l_ref) = rest
    else:
        (q_ref, k_ref, ks_ref, v_ref, vs_ref,
         o_ref, acc_ref, m_ref, l_ref) = rest
        sinks_ref = None
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    head = pl.program_id(0) % h

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if has_sinks:
            # attention sink (gpt-oss) with quantized KV: same
            # m = sink, l = 1 initialization as the dense kernel; matches
            # the reference's FA handling of sinks + quantized caches
            # (iqk_flash_attn.cpp:121-149)
            m_ref[:] = jnp.full_like(m_ref, sinks_ref[head])
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

    batch = pl.program_id(0) // h
    q_pos0 = qpos_ref[batch]
    kv_len = kvlen_ref[batch]
    i = pl.program_id(1)
    # this program's row in the (B*Hkv, ts) scale blocks; computed at kernel
    # top level (program_id is not bindable inside a pl.when body under
    # interpret mode)
    kvrow = batch * hkv + (pl.program_id(0) % h) // (h // hkv)

    q_rows = q_pos0 + i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 0)
    k_cols = j * ts + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
    mask = (k_cols <= q_rows) & (k_cols < kv_len)
    if swa > 0:
        mask &= k_cols > q_rows - swa
    if attn_chunk > 0:
        # llama4 chunked attention (llama.cpp:5334 pos_chunk_start)
        mask &= k_cols >= (q_rows // attn_chunk) * attn_chunk
    tile_live = (j * ts <= q_pos0 + i * tq + tq - 1) & (j * ts < kv_len)
    if swa > 0:
        tile_live &= j * ts + ts - 1 > q_pos0 + i * tq - swa
    if attn_chunk > 0:
        tile_live &= (j * ts + ts - 1
                      >= ((q_pos0 + i * tq) // attn_chunk) * attn_chunk)

    @pl.when(tile_live)
    def _():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32) * ks_ref[kvrow][:, None]  # (TS, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + p.sum(axis=1, keepdims=True)
        v = v_ref[0].astype(jnp.float32) * vs_ref[kvrow][:, None]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nj - 1)
    def _():
        denom = jnp.where(l_ref[:, 0:1] > 0, l_ref[:, 0:1], 1.0)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "swa_window", "attn_chunk", "block_q", "block_kv",
                     "interpret"),
)
def flash_attention_q8(q, k_q, k_s, v_q, v_s, q_pos0, kv_len, *, scale: float,
                       softcap: float = 0.0, swa_window: int = 0,
                       attn_chunk: int = 0, sinks=None,
                       block_q: int = 512, block_kv: int = 2048,
                       interpret: bool = False):
    """FA over an int8 quantized KV cache with per-(token, head) scales.

    k_q/v_q: int8 (B, S, Hkv, D*); k_s/v_s: f32 (B, S, Hkv).
    """
    b, t, h, d = q.shape
    s = k_q.shape[1]
    hkv = k_q.shape[2]
    dv = v_q.shape[3]
    rep = h // hkv

    tq = min(block_q, max(8, 1 << (t - 1).bit_length()))
    ts = min(block_kv if t > 16 else 512, s)
    assert ts % 128 == 0 or interpret, "q8 KV needs block_kv multiple of 128"
    dp = -(-max(d, 128) // 128) * 128
    dvp = -(-max(dv, 128) // 128) * 128

    qr = jnp.pad(q.transpose(0, 2, 1, 3).reshape(b * h, t, d),
                 ((0, 0), (0, (-t) % tq), (0, dp - d)))
    kr = jnp.pad(k_q.transpose(0, 2, 1, 3).reshape(b * hkv, s, d),
                 ((0, 0), (0, (-s) % ts), (0, dp - d)))
    vr = jnp.pad(v_q.transpose(0, 2, 1, 3).reshape(b * hkv, s, dv),
                 ((0, 0), (0, (-s) % ts), (0, dvp - dv)))
    ksr = jnp.pad(k_s.transpose(0, 2, 1).reshape(b * hkv, s),
                  ((0, 0), (0, (-s) % ts)))
    vsr = jnp.pad(v_s.transpose(0, 2, 1).reshape(b * hkv, s),
                  ((0, 0), (0, (-s) % ts)))
    tpad = qr.shape[1]
    spad = kr.shape[1]
    grid = (b * h, tpad // tq, spad // ts)

    clamp = _make_tile_clamp(ts, tq, h, swa_window, attn_chunk)

    def q_map(bh, i, j, qpos, kvlen):
        return bh, i, 0

    def kv_map(bh, i, j, qpos, kvlen, _rep=rep, _h=h, _hkv=hkv):
        return ((bh // _h) * _hkv + (bh % _h) // _rep,
                clamp(bh, i, j, qpos, kvlen), 0)

    def o_map(bh, i, j, qpos, kvlen):
        return bh, i, 0

    args_prefix = [
        jnp.broadcast_to(jnp.asarray(q_pos0, jnp.int32).reshape(-1), (b,)),
        jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,)),
    ]
    in_specs = []
    if sinks is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # sinks (H,)
        args_prefix.append(jnp.asarray(sinks, jnp.float32).reshape(h))
    def kvs_map_all(bh, i, j, qpos, kvlen):
        # whole (B*Hkv) row axis per block: a (1, ts) scale tile is not a
        # legal Mosaic block when B*Hkv > 1 (sublane dim must divide 8 or
        # equal the array dim); the kernel indexes its kv-head row
        return 0, clamp(bh, i, j, qpos, kvlen)

    in_specs += [
        pl.BlockSpec((1, tq, dp), q_map),
        pl.BlockSpec((1, ts, dp), kv_map),
        pl.BlockSpec((b * hkv, ts), kvs_map_all),
        pl.BlockSpec((1, ts, dvp), kv_map),
        pl.BlockSpec((b * hkv, ts), kvs_map_all),
    ]

    out = pl.pallas_call(
        functools.partial(_fa_q8_kernel, scale=scale, softcap=softcap,
                          attn_chunk=attn_chunk, has_sinks=sinks is not None,
                          swa=swa_window, tq=tq, ts=ts, d=dp, dv=dvp, h=h,
                          hkv=hkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, tq, dvp), o_map),
            scratch_shapes=[
                pltpu.VMEM((tq, dvp), jnp.float32),
                pltpu.VMEM((tq, 128), jnp.float32),
                pltpu.VMEM((tq, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tpad, dvp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args_prefix, qr, kr, ksr, vr, vsr)

    return out[:, :t, :dv].reshape(b, h, t, dv).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Decode-specialized flash attention over the NATIVE cache layout
# ---------------------------------------------------------------------------

def _pow2_tile(s: int, cap: int = 1024, floor: int = 128) -> int:
    """Largest power-of-two divisor of ``s`` in [floor, cap] (0 if none)."""
    ts = cap
    while ts >= floor:
        if s % ts == 0:
            return ts
        ts //= 2
    return 0


def _fa_dec_kernel(qpos_ref, kvlen_ref, lyr_ref, *rest, scale, softcap, swa,
                   t, ts, hkv, g, rows, rows_pad, d, dv, has_sinks=False,
                   quant="none", attn_chunk=0, dh=0):
    """TG/spec-verify attention kernel reading (S, Hkv, D) cache tiles.

    One DMA per KV tile serves every q head: the GQA groups are packed into
    the row dimension (row = head*g + r, token = row % t), so KV HBM traffic
    is 1x the filled cache instead of (H/Hkv)x, there are no per-step
    transpose/pad copies of the capacity-sized cache, and the grid is
    (B, S/ts) instead of (B*H, ..) — the analogue of the reference's TG fattn
    path (iqk_flash_attn.cpp) which also walks the cache once per kv head.

    The cache refs carry a leading LAYER axis (block size 1, selected by the
    prefetched ``lyr_ref`` scalar): kernels DMA tiles straight out of the
    model's whole stacked (L, B, S, Hkv, D) cache, so the decode step never
    materializes a per-layer slice of it (at 4k context those slice+restack
    copies were ~3 GB/token — the tg@4096 droop).
    """
    if quant != "none":
        if has_sinks:
            (sinkrow_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
             acc_ref, m_ref, l_ref) = rest
        else:
            (q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
             acc_ref, m_ref, l_ref) = rest
            sinkrow_ref = None
    else:
        if has_sinks:
            (sinkrow_ref, q_ref, k_ref, v_ref, o_ref,
             acc_ref, m_ref, l_ref) = rest
        else:
            q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref = rest
            sinkrow_ref = None
        ks_ref = vs_ref = None
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    batch = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if has_sinks:
            # per-row sink logit (expanded head->row outside): m=sink, l=1
            m_ref[:] = jnp.broadcast_to(sinkrow_ref[0][:, None], m_ref.shape)
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

    q_pos0 = qpos_ref[batch]
    kv_len = kvlen_ref[batch]

    tile_live = (j * ts <= q_pos0 + t - 1) & (j * ts < kv_len)
    if swa > 0:
        tile_live &= j * ts + ts - 1 > q_pos0 - swa
    if attn_chunk > 0:
        tile_live &= j * ts + ts - 1 >= (q_pos0 // attn_chunk) * attn_chunk

    @pl.when(tile_live)
    def _():
        # mask/iota work INSIDE the live guard: dead grid steps (clamped
        # tiles over unfilled capacity) must cost scalars only — per-step
        # vector work on dead tiles was ~40% of the tg@4096 step time
        row_i = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, ts), 0)
        q_rows = q_pos0 + row_i % t
        k_cols = j * ts + jax.lax.broadcasted_iota(jnp.int32,
                                                   (rows_pad, ts), 1)
        mask = (k_cols <= q_rows) & (k_cols < kv_len) & (row_i < rows)
        if swa > 0:
            mask &= k_cols > q_rows - swa
        if attn_chunk > 0:
            mask &= k_cols >= (q_rows // attn_chunk) * attn_chunk
        q = q_ref[0].astype(jnp.float32)              # (rows_pad, D)
        # per-head scores: K tile is (ts, hkv, D); unrolled over kv heads
        parts = []
        for hh in range(hkv):
            qh = q[hh * g:(hh + 1) * g] if hkv > 1 else q
            if quant == "q4":
                # packed nibbles: low = dims [0, dh), high = [dh, 2*dh)
                pk = k_ref[0, 0, :, hh, :].astype(jnp.int32)
                sc = ks_ref[0, 0, :, hh][:, None]
                lo = ((pk & 0x0F) - 8).astype(jnp.float32) * sc
                hi = ((pk >> 4) - 8).astype(jnp.float32) * sc
                parts.append(
                    jax.lax.dot_general(qh[:, :dh], lo,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(qh[:, dh:2 * dh], hi,
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32))
                continue
            if quant == "nl4":
                # IQ4_NL nibbles: binary-select LUT (no TPU gather needed)
                from .kv_quant import lut16_select
                pk = k_ref[0, 0, :, hh, :].astype(jnp.int32) & 0xFF
                sc = ks_ref[0, 0, :, hh][:, None]
                lo = lut16_select(pk & 0x0F) * sc
                hi = lut16_select((pk >> 4) & 0x0F) * sc
                parts.append(
                    jax.lax.dot_general(qh[:, :dh], lo,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(qh[:, dh:2 * dh], hi,
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32))
                continue
            if quant == "q6":
                # two-bit-plane unpack (ops/kv_quant.py q6 layout)
                from .kv_quant import unpack_kv_q6
                kh = (unpack_kv_q6(k_ref[0, 0, :, hh, :]).astype(jnp.float32)
                      * ks_ref[0, 0, :, hh][:, None])
                parts.append(jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
                continue
            kh = k_ref[0, 0, :, hh, :].astype(jnp.float32)   # (ts, D)
            if quant == "q8":
                kh = kh * ks_ref[0, 0, :, hh][:, None]
            parts.append(jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))      # (g, ts)
        s = parts[0] if hkv == 1 else jnp.concatenate(parts, axis=0)
        if s.shape[0] != rows_pad:
            s = jnp.pad(s, ((0, rows_pad - s.shape[0]), (0, 0)))
        s = s * scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                        # (rows_pad, ts)
        l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + p.sum(axis=1, keepdims=True)
        outs = []
        for hh in range(hkv):
            ph = p[hh * g:(hh + 1) * g] if hkv > 1 else p[:rows_pad]
            if quant == "q4":
                pv = v_ref[0, 0, :, hh, :].astype(jnp.int32)
                sv = vs_ref[0, 0, :, hh][:, None]
                vlo = ((pv & 0x0F) - 8).astype(jnp.float32) * sv
                vhi = ((pv >> 4) - 8).astype(jnp.float32) * sv
                pb = ph.astype(jnp.bfloat16)
                outs.append(jnp.concatenate(
                    [jax.lax.dot(pb, vlo.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32),
                     jax.lax.dot(pb, vhi.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)],
                    axis=1))
                continue
            if quant == "nl4":
                from .kv_quant import lut16_select
                pv = v_ref[0, 0, :, hh, :].astype(jnp.int32) & 0xFF
                sv = vs_ref[0, 0, :, hh][:, None]
                vlo = lut16_select(pv & 0x0F) * sv
                vhi = lut16_select((pv >> 4) & 0x0F) * sv
                pb = ph.astype(jnp.bfloat16)
                outs.append(jnp.concatenate(
                    [jax.lax.dot(pb, vlo.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32),
                     jax.lax.dot(pb, vhi.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)],
                    axis=1))
                continue
            if quant == "q6":
                from .kv_quant import unpack_kv_q6
                vh = (unpack_kv_q6(v_ref[0, 0, :, hh, :]).astype(jnp.float32)
                      * vs_ref[0, 0, :, hh][:, None])
                outs.append(jax.lax.dot(ph.astype(jnp.bfloat16),
                                        vh.astype(jnp.bfloat16),
                                        preferred_element_type=jnp.float32))
                continue
            vh = v_ref[0, 0, :, hh, :].astype(jnp.float32)
            if quant == "q8":
                vh = vh * vs_ref[0, 0, :, hh][:, None]
            if quant == "q8":
                outs.append(jax.lax.dot(ph.astype(jnp.bfloat16),
                                        vh.astype(jnp.bfloat16),
                                        preferred_element_type=jnp.float32))
            else:
                outs.append(jax.lax.dot(
                    ph, vh, preferred_element_type=jnp.float32))
        o = outs[0] if hkv == 1 else jnp.concatenate(outs, axis=0)
        if o.shape[0] != rows_pad:
            o = jnp.pad(o, ((0, rows_pad - o.shape[0]), (0, 0)))
        acc_ref[:] = acc_ref[:] * alpha + o
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nj - 1)
    def _():
        denom = jnp.where(l_ref[:, 0:1] > 0, l_ref[:, 0:1], 1.0)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _fa_decode_common(q, k, v, k_s, v_s, q_pos0, kv_len, *, scale, softcap,
                      swa_window, attn_chunk, sinks, block_kv, interpret,
                      layer=0):
    b, t, h, d = q.shape
    if k.ndim == 4:
        # per-layer slab: view as a 1-layer stack (free reshape)
        k, v = k[None], v[None]
        if k_s is not None:
            k_s, v_s = k_s[None], v_s[None]
        layer = 0
    s = k.shape[2]
    hkv = k.shape[3]
    dv = v.shape[4]
    g = (h // hkv) * t                      # q rows per kv head
    rows = h * t
    rows_pad = max(8, -(-rows // 8) * 8)
    if k_s is None:
        qmode = "none"
    elif k.dtype == jnp.uint8 and 4 * k.shape[4] == 3 * d:
        qmode = "q6"            # two-bit-plane codec: 3D/4 stored bytes
        dv = (4 * dv) // 3
        if d != dv or d % 4:
            return None
    elif k.dtype == jnp.uint8:
        qmode = "q4"            # packed nibbles: D stored as D/2 bytes
        dv = 2 * dv             # v.shape[-1] is the packed width
        if d != dv or d % 2:
            return None
    elif 2 * k.shape[4] == d:
        qmode = "nl4"           # IQ4_NL nibbles: int8-stored D/2 bytes
        dv = 2 * dv
        if d != dv or d % 2:
            return None
    else:
        qmode = "q8"

    dp0 = -(-max(d, 128) // 128) * 128
    dvp0 = -(-max(dv, 128) // 128) * 128
    # VMEM guard: K+V tiles (double-buffered) under ~24 MB of the 128 MB
    # VMEM. Bigger tiles matter: each grid step costs ~8 us of fixed
    # overhead per layer, so at 4k context a 512-row tile spends more time
    # stepping than streaming (tg@4096 probe, PERF_NOTES round 4)
    bytes_pp = {"none": 2, "q8": 1, "q4": 0.5, "q6": 0.75,
                "nl4": 0.5}[qmode]
    per_row = hkv * (dp0 + dvp0) * bytes_pp
    cap = block_kv
    while cap > 128 and cap * per_row * 2 > 24 * 2**20:
        cap //= 2
    ts = _pow2_tile(s, cap)
    if ts == 0:
        return None                          # caller falls back to tiled FA
    dp = -(-max(d, 128) // 128) * 128
    dvp = -(-max(dv, 128) // 128) * 128
    if dp != d or dvp != dv:
        return None                          # odd head dims: use generic FA

    # rows packed head-major: (B, T, H, D) -> (B, Hkv, rep, T, D) -> rows
    rep = h // hkv
    qr = q.transpose(0, 2, 1, 3).reshape(b, hkv, rep, t, d)
    qr = qr.reshape(b, rows, d)
    if rows_pad != rows:
        qr = jnp.pad(qr, ((0, 0), (0, rows_pad - rows), (0, 0)))

    grid = (b, s // ts)

    def clamp(bb, j, qpos, kvlen):
        q_lo = qpos[bb]
        last = jnp.minimum((kvlen[bb] - 1) // ts, (q_lo + t - 1) // ts)
        first = jnp.int32(0)
        if swa_window > 0:
            first = jnp.maximum(first, (q_lo - swa_window + 1) // ts)
        if attn_chunk > 0:
            first = jnp.maximum(first,
                                (q_lo // attn_chunk) * attn_chunk // ts)
        return jnp.clip(j, jnp.maximum(first, 0), jnp.maximum(last, 0))

    def q_map(bb, j, qpos, kvlen, lyr):
        return bb, 0, 0

    def kv_map(bb, j, qpos, kvlen, lyr):
        return lyr[0], bb, clamp(bb, j, qpos, kvlen), 0, 0

    def kvs_map(bb, j, qpos, kvlen, lyr):
        return lyr[0], bb, clamp(bb, j, qpos, kvlen), 0

    def o_map(bb, j, qpos, kvlen, lyr):
        return bb, 0, 0

    args = [
        jnp.broadcast_to(jnp.asarray(q_pos0, jnp.int32).reshape(-1), (b,)),
        jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32).reshape(-1), (b,)),
        jnp.asarray(layer, jnp.int32).reshape(1),
    ]
    in_specs = []
    if sinks is not None:
        # expand per-head sinks to per-row (head-major packing)
        sinkrow = jnp.repeat(jnp.asarray(sinks, jnp.float32).reshape(h), t)
        sinkrow = jnp.pad(sinkrow, (0, rows_pad - rows))
        in_specs.append(pl.BlockSpec((1, rows_pad),
                                     lambda bb, j, qpos, kvlen, lyr: (0, 0)))
        args.append(sinkrow.reshape(1, rows_pad))
    in_specs.append(pl.BlockSpec((1, rows_pad, dp), q_map))
    args.append(qr)
    # stored K/V width per row (packed codecs carry their packed width)
    kd = {"q4": d // 2, "nl4": d // 2, "q6": 3 * d // 4}.get(qmode, dp)
    vd = {"q4": dv // 2, "nl4": dv // 2, "q6": 3 * dv // 4}.get(qmode, dvp)
    if qmode != "none":
        in_specs += [
            pl.BlockSpec((1, 1, ts, hkv, kd), kv_map),
            pl.BlockSpec((1, 1, ts, hkv), kvs_map),
            pl.BlockSpec((1, 1, ts, hkv, vd), kv_map),
            pl.BlockSpec((1, 1, ts, hkv), kvs_map),
        ]
        args += [k, k_s, v, v_s]
    else:
        in_specs += [
            pl.BlockSpec((1, 1, ts, hkv, kd), kv_map),
            pl.BlockSpec((1, 1, ts, hkv, vd), kv_map),
        ]
        args += [k, v]

    out = pl.pallas_call(
        functools.partial(_fa_dec_kernel, scale=scale, softcap=softcap,
                          swa=swa_window, attn_chunk=attn_chunk, t=t, ts=ts,
                          hkv=hkv, g=g, rows=rows, rows_pad=rows_pad,
                          d=dp, dv=dvp, has_sinks=sinks is not None,
                          quant=qmode, dh=d // 2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, rows_pad, dvp), o_map),
            scratch_shapes=[
                pltpu.VMEM((rows_pad, dvp), jnp.float32),
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows_pad, dvp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    out = out[:, :rows, :dv].reshape(b, hkv, rep, t, dv)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, t, h, dv)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "swa_window", "attn_chunk",
                     "block_kv", "interpret"),
)
def flash_attention_decode(q, k, v, q_pos0, kv_len, layer=0, *,
                           scale: float,
                           softcap: float = 0.0, swa_window: int = 0,
                           attn_chunk: int = 0, sinks=None,
                           block_kv: int = 2048, interpret: bool = False):
    """Decode/spec-verify FA over the native (B, S, Hkv, D) cache layout —
    or, with 5-D k/v, over the model's WHOLE stacked (L, B, S, Hkv, D)
    cache with ``layer`` selecting the layer inside the kernel's index
    maps (no per-layer slice of the capacity-sized cache is ever
    materialized; the decode step stays copy-free at any context).

    Requires S divisible by a power-of-two tile >=128 and 128-aligned head
    dims; returns None when the shape is unsupported (caller falls back)."""
    return _fa_decode_common(q, k, v, None, None, q_pos0, kv_len,
                             scale=scale, softcap=softcap,
                             swa_window=swa_window, attn_chunk=attn_chunk,
                             sinks=sinks, block_kv=block_kv,
                             interpret=interpret, layer=layer)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "swa_window", "attn_chunk",
                     "block_kv", "interpret"),
)
def flash_attention_decode_q8(q, k_q, k_s, v_q, v_s, q_pos0, kv_len,
                              layer=0, *,
                              scale: float, softcap: float = 0.0,
                              swa_window: int = 0, attn_chunk: int = 0,
                              sinks=None, block_kv: int = 2048,
                              interpret: bool = False):
    """Decode FA over the quantized native-layout cache (q8/q4/q6 codecs;
    4-D per-layer slabs or the 5-D stacked cache + ``layer``)."""
    return _fa_decode_common(q, k_q, v_q, k_s, v_s, q_pos0, kv_len,
                             scale=scale, softcap=softcap,
                             swa_window=swa_window, attn_chunk=attn_chunk,
                             sinks=sinks, block_kv=block_kv,
                             interpret=interpret, layer=layer)
