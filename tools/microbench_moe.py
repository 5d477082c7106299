"""MoE decode microbench — per-layer decode-path MoE FFN time on the chip.

Tunnel-aware methodology (matches bench.py): the axon tunnel dispatches
asynchronously — ``block_until_ready`` returns at RTT without waiting, and
the only true synchronization is a VALUE fetch (~23 ms fixed). So each
variant chains R layer applications INSIDE one jit (x -> moe -> x), makes
the result depend on every step, fetches one scalar, and reports
(total - scalar_floor) / R. Expert sets alternate per chain step so XLA
cannot park slabs in VMEM.

At the bench.py MoE scale (128 experts, E=2048, FF=768, top_k=8,
SUPERGROUP int8): per-layer expert traffic 38.3 MB -> 44.3 us HBM floor at
864 GB/s. Usage: python tools/microbench_moe.py [R]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402


def timed_value(mkargs, fn, reps=5):
    """min wall time of fn(*mkargs(i)), synchronized by a VALUE fetch.

    mkargs must return DIFFERENT argument values per i: the tunnel
    memoizes (executable, args) -> result, so identical calls return
    cached results at RTT speed."""
    float(np.asarray(fn(*mkargs(-1))))          # warm/compile
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(*mkargs(i))))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    NE, E, FF, K = 128, 2048, 768, 8
    T = 1

    from ik_llama_cpp_tpu.ops.moe import QuantExpertWeights, moe_ffn

    key = jax.random.PRNGKey(0)

    def expert_set(i):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        c = lambda k, s: jax.random.randint(k, s, -127, 128, dtype=jnp.int8)
        s = lambda k, s_: jnp.abs(jax.random.normal(k, s_) * 0.008
                                  ).astype(jnp.float32)
        return QuantExpertWeights(
            gate=c(ks[0], (NE, E, FF)), gate_s=s(ks[1], (NE, E // 256, FF)),
            up=c(ks[2], (NE, E, FF)), up_s=s(ks[3], (NE, E // 256, FF)),
            down=c(ks[4], (NE, FF, E)), down_s=s(ks[5], (NE, FF // 256, E)),
            gate_group=256, up_group=256, down_group=256)

    sets = [expert_set(i) for i in range(2)]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((T, E)), jnp.bfloat16)
    wr = jnp.asarray(rng.standard_normal((E, NE)) * 0.05, jnp.bfloat16)

    floor = timed_value(lambda i: (jnp.float32(i),),
                        jax.jit(lambda s: s + 1.0))
    print(f"sync-fetch floor: {floor * 1e3:.2f} ms")

    per_layer = NE and (K * (2 * E * FF + FF * E)
                        + K * (2 * (E // 256) * FF + (FF // 256) * E) * 4)
    print(f"per-layer expert traffic {per_layer / 1e6:.1f} MB; "
          f"floor at 864 GB/s = {per_layer / 864e9 * 1e6:.1f} us")

    def chain(r):
        @jax.jit
        def f(x, s0, sets):
            # sets passed as ARGS: closed-over arrays would be baked into
            # the HLO as constants (1.2 GB remote-compile upload -> the
            # axon tunnel's HTTP 413 limit)
            # unique-arg seed must actually FLOW into the result (a *0
            # seed is folded out and the memoized result gets reused)
            x = x + s0.astype(jnp.bfloat16) * 1e-3
            for i in range(r):
                logits = (x @ wr).astype(jnp.float32)
                out = moe_ffn(x, logits, sets[i % 2], K, norm_topk=True)
                x = (x + out.astype(jnp.bfloat16) * 0.01)
            return jnp.sum(x.astype(jnp.float32))
        return f

    def measure(tag):
        f1, fR = chain(1), chain(R)
        t1 = timed_value(lambda i: (x0, jnp.float32(i), sets), f1)
        tR = timed_value(lambda i: (x0, jnp.float32(i), sets), fR)
        per = (tR - t1) / (R - 1)
        print(f"chained moe_ffn[{tag}]: 1-layer {t1 * 1e3:.2f} ms, "
              f"{R}-layer {tR * 1e3:.2f} ms -> {per * 1e6:.1f} us/layer "
              f"({per_layer / per / 1e9:.0f} GB/s of expert bytes, "
              f"{per_layer / 864e9 / per * 100:.1f}% of HBM roofline)")
        return per

    # A/B: single-kernel fused decode vs two-kernel chain (new jit closure
    # per setting -> the IK_MOE_FUSED trace-time branch re-evaluates)
    import os
    os.environ["IK_MOE_FUSED_TG"] = "1"
    measure("tg fused")
    os.environ["IK_MOE_FUSED_TG"] = "0"
    measure("tg 2-kernel")
    del os.environ["IK_MOE_FUSED_TG"]

    # Prefill A/B at the bench shape: T rows, top-k pairs sorted+ragged
    T_PP = 512
    xp0 = jnp.asarray(rng.standard_normal((T_PP, E)), jnp.bfloat16)
    pp_bytes = per_layer  # same expert slab traffic; activations extra

    def chain_pp(r):
        @jax.jit
        def f(x, s0, sets):
            x = x + s0.astype(jnp.bfloat16) * 1e-3
            for i in range(r):
                logits = (x @ wr).astype(jnp.float32)
                out = moe_ffn(x, logits, sets[i % 2], K, norm_topk=True)
                x = (x + out.astype(jnp.bfloat16) * 0.01)
            return jnp.sum(x.astype(jnp.float32))
        return f

    def measure_pp(tag):
        f1, fR = chain_pp(1), chain_pp(R)
        t1 = timed_value(lambda i: (xp0, jnp.float32(i), sets), f1)
        tR = timed_value(lambda i: (xp0, jnp.float32(i), sets), fR)
        per = (tR - t1) / (R - 1)
        # PP compute-bound metric: routed FLOPs/layer vs bf16 peak
        flops = T_PP * K * 3 * 2 * E * FF
        print(f"chained moe_ffn[{tag}]: {per * 1e6:.1f} us/layer "
              f"({T_PP / per:.0f} tok/s-layer, "
              f"{flops / per / 197e12 * 100:.1f}% bf16-MFU, "
              f"{pp_bytes / per / 1e9:.0f} GB/s)")
        return per

    os.environ["IK_MOE_FUSED"] = "1"
    measure_pp("pp fused")
    os.environ["IK_MOE_FUSED"] = "0"
    measure_pp("pp ragged")
    del os.environ["IK_MOE_FUSED"]


if __name__ == "__main__":
    main()
