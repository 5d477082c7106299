"""Decode-FA + KV-append microbench: locate the tg@4096 droop.

8B geometry: H=32, Hkv=8, D=128, L=32. Times per-layer decode attention at
fill 512 vs 4096 and the stacked-cache append, all scan-amortized with
rotating inputs (tunnel dedup + VMEM-residency safe: the KV cache is far
bigger than VMEM at 4k).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, HKV, D, L = 1, 32, 8, 128, 32


def timed_scan(step, carry0, n=4, inner=32):
    """step(carry, i) -> carry; times inner steps inside one jit."""
    @jax.jit
    def rep(c0):
        def body(c, i):
            return step(c, i), None
        c, _ = jax.lax.scan(body, c0, jnp.arange(inner, dtype=jnp.int32))
        return jax.tree_util.tree_map(
            lambda a: a.reshape(-1)[0].astype(jnp.float32)
            if hasattr(a, 'reshape') else a, c)
    out = rep(carry0)
    jax.block_until_ready(out)
    ts = []
    for i in range(n):
        c = jax.tree_util.tree_map(
            lambda a: a + np.asarray(i + 1, a.dtype).item()
            if a.dtype != jnp.int32 else a, carry0)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        jax.block_until_ready(rep(c))
        ts.append(time.perf_counter() - t0)
    floor = 0.029
    return (min(ts) - floor) / inner


def bench_fa(fill, cap):
    from ik_llama_cpp_tpu.ops.flash_attention import flash_attention_decode
    # device-generated (H2D through the tunnel is ~1 GB/s; a 4k cache is
    # ~0.5 GB — uploading it would dominate the run)
    kk = jax.random.split(jax.random.PRNGKey(0), 3)
    k = (jax.random.normal(kk[0], (L, B, cap, HKV, D)) * 0.1
         ).astype(jnp.bfloat16)
    v = (jax.random.normal(kk[1], (L, B, cap, HKV, D)) * 0.1
         ).astype(jnp.bfloat16)
    q0 = jax.random.normal(kk[2], (B, 1, H, D)).astype(jnp.bfloat16)

    npv = jnp.full((B,), fill - 1, jnp.int32)
    kvl = jnp.full((B,), fill, jnp.int32)

    def step(q, i):
        # all L layers via a scan over the stacked cache (ONE lowering)
        def layer(o, kv_l):
            kl, vl = kv_l
            return flash_attention_decode(o, kl, vl, npv, kvl,
                                          scale=0.088), None
        o, _ = jax.lax.scan(layer, q, (k, v))
        return o

    t = timed_scan(step, q0, inner=8)
    gb = 2 * fill * HKV * D * 2 * L / 1e9
    print(f"fa_decode fill={fill:5d} cap={cap:5d}: {t*1e3:7.3f} ms/tok-layerx{L}"
          f"  kv={gb*1e3:.0f} MB  {gb/t:6.1f} GB/s", flush=True)


def bench_append(cap):
    kk = jax.random.split(jax.random.PRNGKey(1), 2)
    k = (jax.random.normal(kk[0], (L, B, cap, HKV, D)) * 0.1
         ).astype(jnp.bfloat16)
    new = (jax.random.normal(kk[1], (L, B, 1, HKV, D)) * 0.1
           ).astype(jnp.bfloat16)

    def step(kc, i):
        return jax.lax.dynamic_update_slice(
            kc, new + i.astype(jnp.bfloat16), (0, 0, i, 0, 0))

    t = timed_scan(step, k, inner=32)
    print(f"kv append (donated)  cap={cap:5d}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    bench_fa(512, 1024)
    bench_fa(4096, 4224)
    bench_fa(4096, 4096)
    bench_append(4224)
