"""Layer-split pipeline parallelism — the ``-sm layer`` analogue.

The reference's layer split mode assigns each device a CONTIGUOUS range of
transformer layers and runs them in sequence, activations hopping device to
device (llama.cpp `llama_split_mode::LLAMA_SPLIT_MODE_LAYER`;
llama-load-tensors.cpp buft selection per-layer via tensor_split ratios).
It is the capacity play: a model that does not fit one device's memory runs
across several with only a (B, T, E) activation transfer per boundary.

TPU-native version: each stage's weights and its KV-cache slice are
device_put on one chip; each stage is an independently jitted call of the
SAME `models.llama.forward` over its block slice (`layer_offset` keeps
per-layer config lookups absolute). The host chains stages; because jax
dispatch is asynchronous, chunked prefill overlaps across stages GPipe-style
with no explicit scheduler: chunk c+1 on stage s depends only on chunk c's
stage-s KV, so XLA runs stage s (chunk c+1) while stage s+1 processes
chunk c.

Contrast with parallel/tp.py (-sm graph): TP splits every tensor and needs
an all-reduce per layer; layer split needs one point-to-point transfer per
stage boundary and zero collectives — the right trade when the interconnect
is thin or devices are heterogeneous, and the only option when a single
layer fits but the model doesn't.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..models import llama as llama_mod
from ..models.config import ModelConfig
from ..models.llama import KVCache

# non-block params that belong to the FIRST stage (embedding side)
_HEAD_OF_STREAM = ("tok_embd", "pos_embd", "tok_norm", "tok_norm_b")
# non-block params that belong to the LAST stage (lm-head side)
_TAIL_OF_STREAM = ("output_norm", "output_norm_b", "output", "output_b")


def stage_bounds(n_layer: int, n_stages: int,
                 split: list[float] | None = None) -> list[tuple[int, int]]:
    """Contiguous [lo, hi) layer ranges per stage.

    ``split`` mirrors the reference's --tensor-split proportions: layer
    counts proportional to the given weights (for heterogeneous-memory
    devices); default is an even split with remainders on the EARLY stages
    (the last stage also holds the lm head)."""
    assert 1 <= n_stages <= n_layer, (n_stages, n_layer)
    if split:
        assert len(split) == n_stages
        tot = float(sum(split))
        # largest-remainder apportionment, every stage >= 1 layer
        want = [n_layer * s / tot for s in split]
        counts = [max(1, int(w)) for w in want]
        while sum(counts) > n_layer:
            counts[counts.index(max(counts))] -= 1
        rema = sorted(range(n_stages), key=lambda i: want[i] - counts[i],
                      reverse=True)
        k = 0
        while sum(counts) < n_layer:
            counts[rema[k % n_stages]] += 1
            k += 1
    else:
        base, extra = divmod(n_layer, n_stages)
        counts = [base + (1 if i < extra else 0) for i in range(n_stages)]
    bounds, lo = [], 0
    for c in counts:
        bounds.append((lo, lo + c))
        lo += c
    assert lo == n_layer
    return bounds


def split_stage_params(params: dict, bounds: list[tuple[int, int]]
                       ) -> list[dict]:
    """Slice a llama params dict into per-stage dicts.

    Stage 0 keeps the embedding-side tensors, the last stage the lm-head
    side; every stage gets its contiguous `blocks` slice (and its rows of a
    control vector, if any). Leaves are shared by reference here — actual
    per-device placement happens in PipelineRunner via device_put."""
    n_stages = len(bounds)
    out = []
    for s, (lo, hi) in enumerate(bounds):
        sp: dict[str, Any] = {"blocks": params["blocks"][lo:hi]}
        if s == 0:
            for k in _HEAD_OF_STREAM:
                if k in params:
                    sp[k] = params[k]
        if s == n_stages - 1:
            for k in _TAIL_OF_STREAM:
                if k in params:
                    sp[k] = params[k]
        if "cvec" in params:
            sp["cvec"] = params["cvec"][lo:hi]
        out.append(sp)
    return out


def split_cache(kv: KVCache, bounds: list[tuple[int, int]]) -> list[KVCache]:
    """Slice a full-model KVCache into per-stage layer ranges."""
    return [KVCache(
        kv.k[lo:hi], kv.v[lo:hi],
        None if kv.k_scale is None else kv.k_scale[lo:hi],
        None if kv.v_scale is None else kv.v_scale[lo:hi],
    ) for lo, hi in bounds]


def merge_cache(kvs: list[KVCache]) -> KVCache:
    """Concatenate per-stage caches back to a full-model cache (state
    save/restore interop with runtime/state.py)."""
    cat = partial(jnp.concatenate, axis=0)
    return KVCache(
        cat([c.k for c in kvs]), cat([c.v for c in kvs]),
        None if kvs[0].k_scale is None else cat([c.k_scale for c in kvs]),
        None if kvs[0].v_scale is None else cat([c.v_scale for c in kvs]))


class PipelineRunner:
    """Chained per-stage jits over a list of devices.

    __call__(tokens, kvs, n_past) -> (logits, kvs) mirrors the single-chip
    forward contract so the surrounding runtime (sampling, speculative,
    server slots) is oblivious to the split.

    ``tp`` > 1 composes layer split with tensor parallelism: each stage is a
    (1, tp) submesh running the shard_map TP forward over its layer slice
    (heads/FFN columns split, psum at reduction points — parallel/tp.py's
    scheme), so a model can span n_stages × tp chips — the 2-D
    (pipe, model) sharding of the scaling-book recipe. The activation
    stream is replicated within a stage and hops between stage meshes.
    """

    def __init__(self, cfg: ModelConfig, params: dict, *,
                 n_stages: int | None = None, devices=None,
                 split: list[float] | None = None,
                 logits_last_only: bool = False, donate_kv: bool = True,
                 tp: int = 1):
        if devices is None:
            devices = jax.devices()
            if n_stages is not None:
                devices = devices[:n_stages * tp]
        self.devices = list(devices)
        assert len(self.devices) % tp == 0, (len(self.devices), tp)
        n_stages = len(self.devices) // tp
        self.tp = tp
        self.cfg = cfg
        self.bounds = stage_bounds(cfg.n_layer, n_stages, split)
        stage_dicts = split_stage_params(params, self.bounds)
        last = n_stages - 1

        if tp == 1:
            self.meshes = [None] * n_stages
            self._placements = list(self.devices)
            self.stage_params = [jax.device_put(sp, d)
                                 for sp, d in zip(stage_dicts, self.devices)]
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .mesh import make_mesh, shard_params
            self.meshes = [
                make_mesh((1, tp), devices=self.devices[s * tp:(s + 1) * tp])
                for s in range(n_stages)]
            self._placements = [NamedSharding(m, P()) for m in self.meshes]
            self.stage_params = [shard_params(sp, m)
                                 for sp, m in zip(stage_dicts, self.meshes)]

        self._fns = []
        for s, (lo, hi) in enumerate(self.bounds):
            fkw = dict(layer_offset=lo, return_raw_stream=(s != last),
                       logits_last_only=(logits_last_only and s == last))
            if tp == 1:
                fwd = partial(llama_mod.forward, cfg=cfg, **fkw)

                if s == 0:
                    def f0(params, tokens, kv, n_past, _fwd=fwd):
                        return _fwd(params, tokens=tokens, kv=kv,
                                    n_past=n_past)
                    fn = f0
                else:
                    def fs(params, tokens, kv, n_past, stream, _fwd=fwd):
                        return _fwd(params, tokens=tokens, kv=kv,
                                    n_past=n_past, inputs_embeds=stream)
                    fn = fs
            else:
                fn = self._make_tp_stage(s, fkw)
            donate = (2,) if donate_kv else ()
            self._fns.append(jax.jit(fn, donate_argnums=donate))

    def _make_tp_stage(self, s: int, fkw: dict):
        """shard_map TP forward over stage s's (1, tp) submesh."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from .mesh import MODEL_AXIS, kv_spec, param_specs
        from .tp import local_config

        cfg_local = local_config(self.cfg, self.tp)
        mesh = self.meshes[s]
        pspecs = param_specs(self.stage_params[s])
        cache_spec = KVCache(kv_spec(), kv_spec())
        rep3 = P(None, None, None)

        def per_shard(params, tokens, kv, n_past, stream=None):
            return llama_mod.forward(params, cfg_local, tokens, kv, n_past,
                                     tp_axis=MODEL_AXIS,
                                     inputs_embeds=stream, **fkw)

        first = s == 0
        in_specs = (pspecs, P(None, None), cache_spec, P()) + \
            (() if first else (rep3,))
        sharded = shard_map(per_shard, mesh=mesh,
                            in_specs=in_specs,
                            out_specs=(rep3, cache_spec),
                            check_rep=False)
        if first:
            return lambda params, tokens, kv, n_past: \
                sharded(params, tokens, kv, n_past)
        return lambda params, tokens, kv, n_past, stream: \
            sharded(params, tokens, kv, n_past, stream)

    @property
    def n_stages(self) -> int:
        return len(self.devices) // self.tp

    def init_cache(self, batch: int = 1, capacity: int = 512,
                   quant: bool | str = False) -> list[KVCache]:
        full = KVCache.create(self.cfg, batch, capacity, quant=quant)
        parts = split_cache(full, self.bounds)
        if self.tp == 1:
            return [jax.device_put(c, d)
                    for c, d in zip(parts, self._placements)]
        from jax.sharding import NamedSharding
        from .mesh import kv_spec
        return [jax.device_put(c, NamedSharding(m, kv_spec()))
                for c, m in zip(parts, self.meshes)]

    def __call__(self, tokens, kvs: list[KVCache], n_past):
        """One forward over all stages. kvs is updated in place (list)."""
        stream = None
        out = None
        for s, fn in enumerate(self._fns):
            if s == 0:
                out, kvs[s] = fn(self.stage_params[s], tokens, kvs[s], n_past)
            else:
                stream = jax.device_put(stream, self._placements[s])
                out, kvs[s] = fn(self.stage_params[s], tokens, kvs[s],
                                 n_past, stream)
            stream = out
        return out, kvs

    def split_row_cache(self, row: KVCache) -> list[KVCache]:
        """Slice a full-model single-row cache into per-stage layer ranges
        placed on the stage devices (slot restore interop)."""
        return [jax.device_put(c, d) for c, d in
                zip(split_cache(row, self.bounds), self.devices)]

    def prefill_chunked(self, tokens, kvs: list[KVCache], n_past: int,
                        chunk: int):
        """Pipelined long-prompt prefill: feed `chunk`-token slices through
        the stage chain. Async dispatch overlaps chunk c+1 on stage s with
        chunk c on stage s+1 (the GPipe schedule emerges from the KV-carry
        dependency structure alone). Returns the LAST chunk's logits.

        tokens length must be a multiple of chunk (callers pad; the runtime
        buckets prompts anyway)."""
        b, t = tokens.shape
        assert t % chunk == 0, (t, chunk)
        logits = None
        for c in range(t // chunk):
            piece = tokens[:, c * chunk:(c + 1) * chunk]
            logits, kvs = self(piece, kvs, n_past + c * chunk)
        return logits, kvs


class PipelineBatchFwd:
    """Batched-server steps under -sm layer (server/engine.py adapter).

    Reproduces the engine's three jit families — batched decode / spec
    verify (full batch, per-row n_past), and slot-row prefill (gather rows
    by slot index, run the stack, scatter rows back) — as per-stage jits
    chained across the stage devices, the same host-hop scheme as
    PipelineRunner. Each stage's gather/scatter runs on that stage's chip;
    only the (rows, T, E) activation stream crosses devices.
    """

    def __init__(self, runner: PipelineRunner):
        assert runner.tp == 1, \
            "batched-server pp x tp composition not wired yet"
        self.r = runner
        self._jits: dict = {}

    def _fn(self, stage: int, gather: bool):
        key = (stage, gather)
        if key in self._jits:
            return self._jits[key]
        r = self.r
        lo, hi = r.bounds[stage]
        last = stage == len(r.bounds) - 1
        fwd = partial(llama_mod.forward, cfg=r.cfg, layer_offset=lo,
                      return_raw_stream=not last)

        if not gather:
            def step(params, tokens, kv, n_past, stream=None):
                return fwd(params, tokens=tokens, kv=kv, n_past=n_past,
                           inputs_embeds=stream)
        else:
            def step(params, tokens, kv, slot_idx, n_past, last_ix,
                     stream=None):
                kv_rows = jax.tree_util.tree_map(
                    lambda a: jnp.take(a, slot_idx, axis=1), kv)
                out, kv_rows = fwd(params, tokens=tokens, kv=kv_rows,
                                   n_past=n_past, inputs_embeds=stream)
                kv2 = jax.tree_util.tree_map(
                    lambda a, rr: a.at[:, slot_idx].set(rr.astype(a.dtype)),
                    kv, kv_rows)
                if last:
                    out = jnp.take_along_axis(
                        out, last_ix[:, None, None], axis=1)[:, 0]
                return out, kv2

        self._jits[key] = jax.jit(step)
        return self._jits[key]

    def _chain(self, gather: bool, tokens, kvs, *args):
        stream = None
        out = None
        for s in range(len(self.r.bounds)):
            fn = self._fn(s, gather)
            if stream is not None:
                stream = jax.device_put(stream, self.r.devices[s])
            out, kvs[s] = fn(self.r.stage_params[s], tokens, kvs[s], *args,
                             stream=stream)
            stream = out
        return out, kvs

    def decode(self, tokens, kvs, n_past):
        """(B, T) batch, per-row n_past -> (logits (B, T, V), kvs)."""
        return self._chain(False, tokens, kvs, n_past)

    def prefill_rows(self, tokens, kvs, slot_idx, n_past, last_ix):
        """Gathered slot rows -> (last-position logits (rows, V), kvs)."""
        return self._chain(True, tokens, kvs, slot_idx, n_past, last_ix)
