"""Multi-host serving: host 0 runs HTTP + the slot loop, follower
processes run a lockstep worker loop.

This is the TPU-native replacement for the reference's multi-node RPC
serving (rpc-server + --rpc, ggml/src/ggml-rpc.cpp:94-111): where the
reference ships tensor ops to remote backends over TCP, JAX multi-host
SPMD requires every controller process to issue the SAME jitted program
in the same order — so the only thing that ever crosses the wire
host-side is a tiny step descriptor (op, shapes, token ids), broadcast
from host 0 with ``multihost_utils.broadcast_one_to_all``. The actual
tensor traffic (activations at TP reduction points) rides ICI/DCN inside
XLA collectives, never through Python.

Protocol per engine step:
  host 0:   pack(op, rows, bucket, width, toks, idx, n_past) -> broadcast
            -> run the jitted SPMD call
  follower: broadcast (as receiver) -> decode -> run the SAME jitted call

Every descriptor is a fixed-shape int32 buffer so the broadcast itself
compiles exactly once.
"""
from __future__ import annotations

import numpy as np

from ..models.llama import KVCache
from ..runtime.generate import PREFILL_BUCKETS
from .engine import BatchEngine

OP_SHUTDOWN = 0
OP_PREFILL = 1        # single-slot chunk: rows=1
OP_PREFILL_MANY = 2   # batched multi-slot chunk
OP_DECODE = 3         # 1-token batched decode, all slots
OP_SPEC = 4           # speculative verify step, width = 1 + spec_n

_HDR = 8  # op, rows, bucket, width, reserved*4


class StepChannel:
    """Fixed-shape host-0 -> all broadcast of step descriptors."""

    def __init__(self, n_slots: int, spec_n: int = 0):
        self.n_slots = n_slots
        self.max_w = max(PREFILL_BUCKETS[-1], 1 + spec_n)
        # hdr + toks + idx + n_past + aux (per-row last_ix for prefill)
        self.size = _HDR + n_slots * (self.max_w + 3)
        self._zeros = np.zeros((self.size,), np.int32)

    def _bcast(self, buf: np.ndarray) -> np.ndarray:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.broadcast_one_to_all(buf))

    def send(self, op: int, *, rows: int = 0, bucket: int = 0, width: int = 0,
             toks: np.ndarray | None = None, idx: np.ndarray | None = None,
             n_past: np.ndarray | None = None,
             aux: np.ndarray | None = None) -> None:
        buf = self._zeros.copy()
        buf[0:4] = (op, rows, bucket, width)
        o = _HDR
        if toks is not None:
            t = np.asarray(toks, np.int32)
            flat = np.zeros((self.n_slots, self.max_w), np.int32)
            flat[: t.shape[0], : t.shape[1]] = t
            buf[o : o + flat.size] = flat.ravel()
        o += self.n_slots * self.max_w
        if idx is not None:
            a = np.asarray(idx, np.int32).ravel()
            buf[o : o + a.size] = a
        o += self.n_slots
        if n_past is not None:
            a = np.asarray(n_past, np.int32).ravel()
            buf[o : o + a.size] = a
        o += self.n_slots
        if aux is not None:
            a = np.asarray(aux, np.int32).ravel()
            buf[o : o + a.size] = a
        self._bcast(buf)

    def recv(self) -> dict:
        buf = self._bcast(self._zeros)
        op, rows, bucket, width = (int(x) for x in buf[0:4])
        o = _HDR
        toks = buf[o : o + self.n_slots * self.max_w].reshape(
            self.n_slots, self.max_w)
        o += self.n_slots * self.max_w
        idx = buf[o : o + self.n_slots]
        o += self.n_slots
        n_past = buf[o : o + self.n_slots]
        o += self.n_slots
        aux = buf[o : o + self.n_slots]
        return {"op": op, "rows": rows, "bucket": bucket, "width": width,
                "toks": toks, "idx": idx, "n_past": n_past, "aux": aux}


def put_cache_on_mesh(kv, mesh):
    """device_put every cache leaf with a global-mesh sharding: attention
    K/V (L, B, S, Hkv, D) kv-head-sharded when divisible, everything else
    (scales, SSM conv/state rows) replicated."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import MODEL_AXIS, kv_spec

    tp = mesh.shape[MODEL_AXIS]

    def put(a):
        if a is None:
            return None
        spec = P()
        if getattr(a, "ndim", 0) == 5 and a.shape[3] % tp == 0:
            spec = kv_spec()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, kv, is_leaf=lambda x: x is None)


class DistributedEngine(BatchEngine):
    """BatchEngine whose jitted call sites are mirrored on every process.

    On host 0 each jit getter returns a wrapper that first broadcasts the
    step descriptor; followers never construct wrappers (worker_loop calls
    the raw BatchEngine jits after decoding each descriptor)."""

    def __init__(self, runtime, chan: StepChannel, **kw):
        if kw.get("spec") and runtime.recurrent:
            raise NotImplementedError(
                "speculative decoding on recurrent models is not supported "
                "multi-host (state replay is a host-0-only control flow)")
        super().__init__(runtime, **kw)
        assert runtime.mesh is not None, "distributed serving requires a mesh"
        self.chan = chan
        self.kv = put_cache_on_mesh(self.kv, runtime.mesh)

    def _is_leader(self) -> bool:
        import jax
        return jax.process_index() == 0

    # ------------------------------------------------------ wrapped jits
    def _prefill(self, bucket: int):
        fn = super()._prefill(bucket)
        if not self._is_leader():
            return fn

        def wrapped(params, toks, kv, slot_idx, n_past, last_ix):
            self.chan.send(OP_PREFILL, rows=1, bucket=bucket,
                           toks=np.asarray(toks),
                           idx=[int(slot_idx)], n_past=[int(n_past)],
                           aux=[int(last_ix)])
            return fn(params, toks, kv, slot_idx, n_past, last_ix)

        return wrapped

    def _prefill_many(self, n_rows: int, bucket: int):
        fn = super()._prefill_many(n_rows, bucket)
        if not self._is_leader():
            return fn

        def wrapped(params, toks, kv, idx, n_past, last_ix):
            self.chan.send(OP_PREFILL_MANY, rows=n_rows, bucket=bucket,
                           toks=np.asarray(toks), idx=np.asarray(idx),
                           n_past=np.asarray(n_past),
                           aux=np.asarray(last_ix))
            return fn(params, toks, kv, idx, n_past, last_ix)

        return wrapped

    def _decode_topk(self):
        # multi-host SPMD requires every controller to issue the SAME
        # jitted program; the top-K readback variant is a different program
        # the followers don't know about — use the plain decode everywhere
        return None

    def _spec_decode_topk(self):
        # same rule for the speculative-verify top-K variant: followers run
        # the plain OP_SPEC program, so host 0 must too
        return None

    def _decode(self):
        fn = super()._decode()
        if not self._is_leader():
            return fn

        def wrapped(params, toks, kv, n_past):
            self.chan.send(OP_DECODE, rows=self.n_slots, width=1,
                           toks=np.asarray(toks), n_past=np.asarray(n_past))
            return fn(params, toks, kv, n_past)

        return wrapped

    def _spec_decode(self):
        fn = super()._spec_decode()
        if not self._is_leader():
            return fn

        def wrapped(params, toks, kv, n_past):
            self.chan.send(OP_SPEC, rows=self.n_slots,
                           width=int(toks.shape[1]),
                           toks=np.asarray(toks), n_past=np.asarray(n_past))
            return fn(params, toks, kv, n_past)

        return wrapped

    # ----------------------------------------------------- host-0-only IO
    def _context_shift(self, slot):
        """In-place K-shift mutates the cache OUTSIDE a broadcast step, so
        multi-host always takes the re-prefill fallback (state is host-side
        only; the re-prefill itself broadcasts as normal PREFILL ops)."""
        n_keep = min(slot.n_prompt, self.capacity // 4)
        n_rest = slot.n_past - n_keep
        n_discard = n_rest // 2
        slot.tokens = slot.tokens[:n_keep] + slot.tokens[n_keep + n_discard:]
        slot.n_prompt = len(slot.tokens)
        slot.cache_tokens = []
        slot.n_past = 0
        slot.n_shifts += 1
        from .engine import SlotState
        slot.state = SlotState.PREFILL

    def save_slot(self, idx, path):
        raise NotImplementedError("slot save/restore is host-0-local state "
                                  "and is not supported multi-host yet")

    def restore_slot(self, idx, path):
        raise NotImplementedError("slot save/restore is host-0-local state "
                                  "and is not supported multi-host yet")

    def stop(self):
        super().stop()
        if self._is_leader():
            self.chan.send(OP_SHUTDOWN)


def worker_loop(engine: DistributedEngine) -> None:
    """Follower-process main loop: decode each broadcast descriptor and
    issue the identical jitted SPMD call (jits compile to the same program
    as host 0's — same shapes, same dtypes, same HLO)."""
    import jax.numpy as jnp

    chan = engine.chan
    params = engine.rt.params
    while True:
        m = chan.recv()
        op = m["op"]
        if op == OP_SHUTDOWN:
            return
        if op == OP_PREFILL:
            fn = BatchEngine._prefill(engine, m["bucket"])
            _, engine.kv = fn(params,
                              jnp.asarray(m["toks"][:1, : m["bucket"]]),
                              engine.kv, jnp.int32(m["idx"][0]),
                              jnp.int32(m["n_past"][0]),
                              jnp.int32(m["aux"][0]))
        elif op == OP_PREFILL_MANY:
            fn = BatchEngine._prefill_many(engine, m["rows"], m["bucket"])
            _, engine.kv = fn(
                params, jnp.asarray(m["toks"][: m["rows"], : m["bucket"]]),
                engine.kv, jnp.asarray(m["idx"][: m["rows"]]),
                jnp.asarray(m["n_past"][: m["rows"]]),
                jnp.asarray(m["aux"][: m["rows"]]))
        elif op == OP_DECODE:
            fn = BatchEngine._decode(engine)
            _, engine.kv = fn(params, jnp.asarray(m["toks"][:, :1]),
                              engine.kv, jnp.asarray(m["n_past"]))
        elif op == OP_SPEC:
            fn = BatchEngine._spec_decode(engine)
            _, engine.kv = fn(params,
                              jnp.asarray(m["toks"][:, : m["width"]]),
                              engine.kv, jnp.asarray(m["n_past"]))
        else:  # unknown op: protocol error — stop rather than desync
            raise RuntimeError(f"unknown multihost op {op}")
