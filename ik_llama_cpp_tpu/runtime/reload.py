"""On-demand tensor reload — the analogue of the reference's llama-reload
(src/llama-reload.cpp, llama_reload_changed_tensors @ include/llama.h:1635):
pick up tensors that changed on disk (an overwritten / re-quantized /
finetune-patched GGUF) into the LIVE model without restarting or
recompiling.

TPU-native design: model weights are pytree leaves of pure jitted
functions, so a reload is an atomic leaf swap — same shapes and dtypes mean
every compiled executable stays valid (no buffer re-binding machinery like
the reference's detach/fallback states). Changed tensors are detected by
file mtime, then per-tensor CRCs over the mmap'd data; mappable tensors are
patched individually, anything else triggers a full loader pass.
"""
from __future__ import annotations

import os
import zlib
from typing import Any

import numpy as np


# GGUF blk.N.<suffix> -> llama-family param key (models/llama.py loader)
_BLK_KEY = {
    "attn_q.weight": ("wq", "linear"),
    "attn_k.weight": ("wk", "linear"),
    "attn_v.weight": ("wv", "linear"),
    "attn_qkv.weight": ("wqkv", "linear"),
    "attn_output.weight": ("wo", "linear"),
    "ffn_gate.weight": ("ffn_gate", "linear"),
    "ffn_up.weight": ("ffn_up", "linear"),
    "ffn_down.weight": ("ffn_down", "linear"),
    "attn_norm.weight": ("attn_norm", "dense"),
    "ffn_norm.weight": ("ffn_norm", "dense"),
}
_TOP_KEY = {
    "output.weight": ("output", "linear"),
    "output_norm.weight": ("output_norm", "dense"),
}


def _crc(info) -> int:
    # tensor data is an mmap-backed uint8 view; crc32 streams at ~1 GB/s
    return zlib.crc32(info.data)


class ReloadInfo:
    """Per-tensor source bookkeeping (reference tensor_reload_source:
    path/offset/nbytes/mtime, llama-reload-info.h:16-49)."""

    def __init__(self, path: str, gg):
        self.path = str(path)
        st = os.stat(self.path)
        self.mtime_ns = st.st_mtime_ns
        self.crcs = {name: _crc(ti) for name, ti in gg.tensors.items()}

    def file_changed(self) -> bool:
        try:
            return os.stat(self.path).st_mtime_ns != self.mtime_ns
        except OSError:
            return False

    def changed_tensors(self, new_gg) -> list[str]:
        out = []
        for name, ti in new_gg.tensors.items():
            if self.crcs.get(name) != _crc(ti):
                out.append(name)
        return out


def reload_changed_tensors(rt) -> bool:
    """Re-read tensors whose on-disk bytes changed into ``rt.params``.

    Returns True if anything was reloaded. Requires the runtime to have
    been created with ``track_reload=True`` (which records per-tensor CRCs
    at load time, the analogue of snapshot_all_reload_tensors)."""
    info: ReloadInfo | None = getattr(rt, "_reload_info", None)
    if info is None:
        raise RuntimeError("runtime was not created with track_reload=True")
    if not info.file_changed():
        return False

    from ..gguf.reader import load_gguf
    from ..models.weights import load_linear, load_dense
    from ..runtime.generate import LOADERS

    new_gg = load_gguf(info.path)
    changed = info.changed_tensors(new_gg)
    st = os.stat(info.path)
    if not changed:
        info.mtime_ns = st.st_mtime_ns
        return False

    patched: list[str] = []
    full_reload = False
    for name in changed:
        t = new_gg.tensors[name]
        if name in _TOP_KEY:
            key, kind = _TOP_KEY[name]
            if key in rt.params:
                rt.params[key] = (load_linear(t) if kind == "linear"
                                  else load_dense(t))
                patched.append(name)
                continue
        if name.startswith("blk."):
            parts = name.split(".", 2)
            il, suffix = int(parts[1]), parts[2]
            hit = _BLK_KEY.get(suffix)
            if hit is not None and il < len(rt.params.get("blocks", [])):
                key, kind = hit
                blk = rt.params["blocks"][il]
                if key in blk and not isinstance(blk[key], (list, tuple)):
                    # fused models merge q/k/v — a lone attn_q has no leaf
                    # of its own; fall through to the full reload
                    if kind == "linear" and key in blk:
                        blk[key] = load_linear(t)
                        patched.append(name)
                        continue
                    if kind == "dense":
                        blk[key] = load_dense(t)
                        patched.append(name)
                        continue
        full_reload = True

    if full_reload:
        # unmapped tensor (fused projection, expert stack, embeddings, a
        # non-llama-family arch): rebuild the whole param tree — the
        # reference's FALLBACK path, still without restarting the process
        loader = LOADERS[rt.cfg.arch]
        rt.params = loader(new_gg, rt.cfg, **getattr(rt, "_loader_kw", {}))

    info.crcs = {name: _crc(ti) for name, ti in new_gg.tensors.items()}
    info.mtime_ns = st.st_mtime_ns
    return True
