"""Session state save/restore — analogue of llama_state_* (llama.h:961-1040)
and the server's /slots save/restore.

Serializes (tokens, n_past, KV cache contents up to n_past) to a file so a
session can resume without re-prefilling — the equivalent of
llama_state_save_file / llama_state_load_file and per-sequence
llama_state_seq_* (only the valid prefix of the cache is stored).
"""
from __future__ import annotations

import io
import json
import struct
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..models.llama import KVCache

MAGIC = b"IKTPUST1"


def _merge_stage_list(kv: list) -> KVCache:
    """-sm layer sessions carry a list of per-stage caches on different
    devices; gather to the default device and merge to the full-model
    layout so state files are interchangeable with single-chip runs."""
    import jax
    from ..parallel.pp import merge_cache
    dev = jax.devices()[0]
    return merge_cache([jax.device_put(c, dev) for c in kv])


def save_state(path, tokens: list[int], n_past: int, kv: KVCache) -> None:
    if isinstance(kv, list):
        kv = _merge_stage_list(kv)
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {
        "tokens": list(map(int, tokens)),
        "n_past": int(n_past),
        "quantized": kv.quantized,
        "k_dtype": str(kv.k.dtype),
        "capacity": int(kv.capacity),
    }
    mb = json.dumps(meta).encode()
    buf.write(struct.pack("<I", len(mb)))
    buf.write(mb)

    def dump(arr):
        # store only the valid prefix along the S axis (axis=2)
        a = np.asarray(arr[:, :, :n_past])
        buf.write(struct.pack("<I", len(a.shape)))
        buf.write(struct.pack(f"<{len(a.shape)}q", *a.shape))
        dt = a.dtype.str.encode()
        buf.write(struct.pack("<I", len(dt)))
        buf.write(dt)
        if a.dtype == jnp.bfloat16:
            a = a.view(np.uint16)
        buf.write(np.ascontiguousarray(a).tobytes())

    import ml_dtypes  # noqa: F401  (bfloat16 numpy support ships with jax)
    for arr in (kv.k, kv.v):
        dump(arr)
    if kv.quantized:
        for arr in (kv.k_scale, kv.v_scale):
            dump(arr)
    Path(path).write_bytes(buf.getvalue())


def read_state_meta(path) -> dict | None:
    """Read just the header (tokens, n_past, capacity, …) of a state file
    without materializing the KV payload — used by the server's saved-prompt
    listing (server.cpp list_saved_prompts reads magic+count+tokens only).
    Returns None if the file is not a state file."""
    try:
        with open(path, "rb") as f:
            if f.read(8) != MAGIC:
                return None
            (mlen,) = struct.unpack("<I", f.read(4))
            if mlen > 1 << 24:
                return None
            return json.loads(f.read(mlen))
    except (OSError, ValueError, struct.error):
        return None


def load_state(path, kv: KVCache):
    if isinstance(kv, list):
        # restore through the merged layout, then re-split to the stages'
        # layer ranges and home devices (state files are layout-neutral)
        import jax
        from ..parallel.pp import split_cache
        bounds, devs, lo = [], [], 0
        for c in kv:
            n = c.k.shape[0]
            bounds.append((lo, lo + n))
            devs.append(next(iter(c.k.devices())))
            lo += n
        tokens, n_past, full = load_state(path, _merge_stage_list(kv))
        return tokens, n_past, [jax.device_put(c, d) for c, d in
                                zip(split_cache(full, bounds), devs)]
    return _load_state_single(path, kv)


def _load_state_single(path, kv: KVCache):
    """Restore into a fresh cache of at least the saved length.

    Returns (tokens, n_past, kv)."""
    raw = Path(path).read_bytes()
    assert raw[:8] == MAGIC, "not a state file"
    off = 8
    (mlen,) = struct.unpack_from("<I", raw, off)
    off += 4
    meta = json.loads(raw[off:off + mlen])
    off += mlen

    def read():
        nonlocal off
        (nd,) = struct.unpack_from("<I", raw, off)
        off += 4
        shape = struct.unpack_from(f"<{nd}q", raw, off)
        off += 8 * nd
        (dl,) = struct.unpack_from("<I", raw, off)
        off += 4
        dts = raw[off:off + dl].decode()
        off += dl
        import ml_dtypes
        dt = np.dtype(np.uint16) if dts == "<V2" or "bfloat16" in dts else np.dtype(dts)
        count = int(np.prod(shape))
        a = np.frombuffer(raw, dt, count, off).reshape(shape)
        off += count * dt.itemsize
        if dts == "<V2" or "bfloat16" in dts:
            a = a.view(ml_dtypes.bfloat16)
        return a

    n_past = meta["n_past"]
    k = read()
    v = read()
    assert kv.capacity >= n_past, "cache too small for saved state"
    new_k = jnp.asarray(np.asarray(kv.k).copy())
    new_k = new_k.at[:, :, :n_past].set(jnp.asarray(k))
    new_v = jnp.asarray(np.asarray(kv.v).copy())
    new_v = new_v.at[:, :, :n_past].set(jnp.asarray(v))
    ks = vs = None
    if meta["quantized"]:
        ksa = read()
        vsa = read()
        ks = kv.k_scale.at[:, :, :n_past].set(jnp.asarray(ksa))
        vs = kv.v_scale.at[:, :, :n_past].set(jnp.asarray(vsa))
    return meta["tokens"], n_past, KVCache(new_k, new_v, ks, vs)
