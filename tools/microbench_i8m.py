"""Probe: qmatmul_i8 rate vs M (round-4 decode/PP dispatch design).

The decode scan runs M=1 matmuls; spec-verify M=9; prefill M=512. The
round-3 microbench measured only M=16 (824 GB/s). This times the SAME
supergroup int8 path at the shapes the runtime actually issues, plus
M-padded variants, to pick the QLinearI8 dispatch policy.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.microbench_decode import timed
from ik_llama_cpp_tpu.ops.qmatmul import (qmatmul_i8, quantize_activations,
                                          qmatmul, SUPERGROUP)

K, N = 4096, 14336
G = 32


def main():
    rng = np.random.default_rng(0)
    # >= 400 MB of distinct weights so they must re-stream from HBM
    n_w = max(1, int(np.ceil(400e6 / (K * N))))
    codes_l, sw_l, sc_l = [], [], []
    for _ in range(n_w):
        codes_l.append(jnp.asarray(rng.integers(-127, 128, (K, N), np.int8)))
        sw_l.append(jnp.asarray(rng.random((K // SUPERGROUP, N), np.float32)))
        sc_l.append(jnp.asarray(rng.random((K // G, N)).astype(np.float32),
                                jnp.bfloat16))
    gbytes = K * N / 1e9

    for m in (1, 8, 9, 16, 512):
        x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)

        def f_i8(xv, c, s):
            xq, xs = quantize_activations(xv.astype(jnp.float32))
            return qmatmul_i8(xq, xs, c, s)

        t = timed(f_i8, x, codes_l, sw_l, n=3, inner=64)
        print(f"i8      M={m:4d}: {t*1e6:9.1f} us  {gbytes/t:7.1f} GB/s")

        if m < 8:
            def f_i8pad(xv, c, s, pad=8 - m):
                xq, xs = quantize_activations(xv.astype(jnp.float32))
                xq = jnp.pad(xq, ((0, pad), (0, 0)))
                xs = jnp.pad(xs, ((0, pad), (0, 0)))
                return qmatmul_i8(xq, xs, c, s)[:m]

            t = timed(f_i8pad, x, codes_l, sw_l, n=3, inner=64)
            print(f"i8 pad8 M={m:4d}: {t*1e6:9.1f} us  {gbytes/t:7.1f} GB/s")

    # prefill comparison: pallas bf16-dequant on supergroup scales
    m = 512
    x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)

    def f_pl(xv, c, s):
        return qmatmul(xv, c, s, group=G)

    t = timed(f_pl, x, codes_l, sc_l, n=3, inner=64)
    flops = 2 * m * K * N
    print(f"pallas  M={m:4d}: {t*1e6:9.1f} us  {gbytes/t:7.1f} GB/s  "
          f"{flops/t/394e12*100:5.1f}% bf16-MFU")


if __name__ == "__main__":
    main()
