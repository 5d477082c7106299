"""Multi-host tensor-parallel proof — the analogue of the reference's
multi-node RPC/MPI serving (rpc-server + --rpc, ggml/src/ggml-rpc.cpp),
expressed the JAX way: one controller process per host,
jax.distributed.initialize for the coordination service, a GLOBAL device
mesh spanning every process, and the SAME pjit/shard_map tensor-parallel
forward used single-host (parallel/tp.py) running unchanged on top.

Run one process per "host" (CPU devices stand in for per-host chips; on
real pods the same code spans ICI/DCN):

    python -m ik_llama_cpp_tpu.tools.multihost_proof \
        --coordinator 127.0.0.1:29517 --num-processes 2 --process-id 0 \
        --gguf tiny.gguf --local-devices 2

Every process must be launched with the same arguments except
--process-id. Each prints the (replicated) logits checksum — identical
across processes, and identical to the single-host run.
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:29517")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--local-devices", type=int, default=2,
                    help="virtual CPU devices per process (0 = real chips)")
    args = ap.parse_args(argv)

    if args.local_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}")
    import jax
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    import jax.numpy as jnp
    import numpy as np

    from ..gguf.reader import load_gguf
    from ..models.config import config_from_gguf
    from ..runtime.generate import LOADERS, FORWARDS, CACHES
    from ..parallel.mesh import make_mesh, shard_params
    from ..parallel.tp import make_tp_forward

    n_global = jax.device_count()
    print(f"[proc {args.process_id}] local={jax.local_device_count()} "
          f"global={n_global}", flush=True)

    gg = load_gguf(args.gguf)
    cfg = config_from_gguf(gg.metadata)
    # every process loads the full weights host-side; device_put with the
    # global NamedSharding slices out only this process's addressable
    # shards (single-controller-per-host SPMD — no host ever materializes
    # another host's shard on device)
    params = LOADERS[cfg.arch](gg, cfg, use_quant=True, fuse=False)
    mesh = make_mesh((1, n_global))
    params = shard_params(params, mesh)

    fwd = make_tp_forward(cfg, mesh, params, fwd=FORWARDS[cfg.arch])
    kv = CACHES[cfg.arch](cfg, 1, 64)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import kv_spec
    kv = jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, kv_spec() if a.ndim == 5 else P())),
        kv)

    tokens = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
    logits, kv = fwd(params, tokens, kv, jnp.int32(0))
    # reshard to fully-replicated so each controller can read the values
    rep = jax.jit(lambda a: a,
                  out_shardings=NamedSharding(mesh, P()))(logits)
    row = np.asarray(rep.addressable_data(0))[0, -1, :8].astype(np.float32)
    print(f"[proc {args.process_id}] logits[:8] = "
          f"{np.round(row, 4).tolist()}", flush=True)
    checksum = jax.jit(lambda a: jnp.sum(jnp.abs(a)),
                       out_shardings=NamedSharding(mesh, P()))(logits)
    print(f"[proc {args.process_id}] checksum = "
          f"{float(np.asarray(checksum.addressable_data(0))):.4f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
