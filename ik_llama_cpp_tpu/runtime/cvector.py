"""Control vectors (activation steering) — load/apply + generator.

GGUF control-vector format matches the reference's cvector-generator output
(examples/cvector-generator): ``general.architecture = "controlvector"``,
one f32 tensor ``direction.<il>`` of size n_embd per steered layer.

Application: each layer's output gains ``scale * direction[il]``
(llama_control_vector::apply_to at the l_out hook in every reference graph).

Generation: mean-difference / PCA over hidden-state diffs between positive
and negative prompts (cvector-generator.cpp's pca/mean modes).
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import load_gguf
from ..gguf.writer import GGUFWriter
from ..models.weights import dequant_tensor


def load_control_vector(path: str | Path, n_layer: int, n_embd: int,
                        *, scale: float = 1.0,
                        layer_start: int = 0, layer_end: int = -1) -> np.ndarray:
    """Returns a dense (n_layer, n_embd) f32 array, zero outside the steered
    range (llama_control_vector_load + layer_start/end semantics)."""
    gg = load_gguf(path)
    out = np.zeros((n_layer, n_embd), np.float32)
    if layer_end < 0:
        layer_end = n_layer
    for name, info in gg.tensors.items():
        if not name.startswith("direction."):
            continue
        il = int(name.split(".")[1])
        # reference direction tensors are 1-indexed (applied to layer il-1)
        idx = il - 1
        if 0 <= idx < n_layer and layer_start <= idx < layer_end:
            out[idx] = dequant_tensor(info).reshape(-1)[:n_embd] * scale
    return out


def apply_control_vector(params: dict, cvec: np.ndarray) -> dict:
    params["cvec"] = jnp.asarray(cvec, jnp.float32)
    return params


def remove_control_vector(params: dict) -> dict:
    params.pop("cvec", None)
    return params


def write_control_vector(path: str | Path, directions: np.ndarray) -> Path:
    """directions: (n_layer, n_embd); layer il stored as direction.(il+1)."""
    w = GGUFWriter(path, arch="controlvector")
    for il, d in enumerate(directions):
        if np.any(d != 0):
            w.add_tensor(f"direction.{il + 1}", d.astype(np.float32))
    w.write()
    return Path(path)


def generate_control_vector(runtime, positive: list[str], negative: list[str],
                            *, method: str = "pca") -> np.ndarray:
    """cvector-generator analogue: per-layer principal direction of
    (positive - negative) hidden-state differences at the last token."""
    cfg = runtime.cfg
    diffs = [[] for _ in range(cfg.n_layer)]
    for pos, neg in zip(positive, negative):
        hp = runtime.layer_hiddens(runtime.tokenizer.encode(pos))
        hn = runtime.layer_hiddens(runtime.tokenizer.encode(neg))
        for il in range(cfg.n_layer):
            diffs[il].append(hp[il][-1] - hn[il][-1])
    out = np.zeros((cfg.n_layer, cfg.n_embd), np.float32)
    for il in range(cfg.n_layer):
        d = np.stack(diffs[il])          # (n_pairs, E)
        if method == "mean" or d.shape[0] == 1:
            v = d.mean(axis=0)
        else:
            dc = d - d.mean(axis=0, keepdims=True)
            _, _, vt = np.linalg.svd(dc, full_matrices=False)
            v = vt[0]
            # orient the principal axis along the mean difference
            if np.dot(v, d.mean(axis=0)) < 0:
                v = -v
        n = np.linalg.norm(v)
        if n > 0:
            out[il] = v / n
    return out
