"""Importance-matrix tool — analogue of llama-imatrix (examples/imatrix/).

Collects per-column mean-squared activations at every linear's input over a
calibration text and stores them in the reference's binary .dat format
(IMatrixCollector::save_imatrix, imatrix.cpp:613):

  i32 n_entries
  per entry: i32 len, name bytes, i32 ncall, i32 nval, f32 values[nval]
  i32 last_call, i32 len, prompt filename bytes

Values in the file are (sum/count)*ncall per column, exactly like the
reference; quantizers consume them as relative column weights.

Usage: python -m ik_llama_cpp_tpu.tools.imatrix --gguf m.gguf --text f.txt -o imatrix.dat
"""
from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np


def save_imatrix(path, stats: dict[str, tuple[np.ndarray, int]],
                 last_call: int, prompt_file: str = "") -> None:
    """stats: name -> (sum_of_squares per column (already averaged*ncall), ncall)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(stats)))
        for name, (vals, ncall) in stats.items():
            raw = name.encode("utf-8")
            f.write(struct.pack("<i", len(raw)))
            f.write(raw)
            f.write(struct.pack("<i", ncall))
            vals = np.asarray(vals, np.float32)
            f.write(struct.pack("<i", vals.size))
            f.write(vals.tobytes())
        f.write(struct.pack("<i", last_call))
        pf = prompt_file.encode("utf-8")
        f.write(struct.pack("<i", len(pf)))
        f.write(pf)


def load_imatrix(path) -> dict[str, np.ndarray]:
    """Returns name -> per-column weights (f32). Reference parser semantics."""
    raw = Path(path).read_bytes()
    off = 0

    def ri():
        nonlocal off
        v = struct.unpack_from("<i", raw, off)[0]
        off += 4
        return v

    n_entries = ri()
    out = {}
    for _ in range(n_entries):
        ln = ri()
        name = raw[off:off + ln].decode("utf-8")
        off += ln
        ncall = ri()
        nval = ri()
        vals = np.frombuffer(raw, np.float32, nval, off).copy()
        off += 4 * nval
        if ncall > 0:
            vals /= ncall
        out[name] = vals
    return out


def collect_imatrix(rt, text: str, n_ctx: int = 512, n_chunks: int = -1,
                    verbose: bool = True) -> dict[str, tuple[np.ndarray, int]]:
    """Run the model over the text accumulating sum(x^2) at linear inputs.

    Uses the instrumented forward (collect_stats=True): each chunk is one
    "call" in the reference's counting.
    """
    import jax
    import jax.numpy as jnp
    from ..models import llama as llama_mod
    from ..models.llama import KVCache

    tokens = rt.tokenizer.encode(text, add_bos=False, parse_special=False)
    n_chunk_max = len(tokens) // n_ctx
    n_chunk = n_chunk_max if n_chunks < 0 else min(n_chunks, n_chunk_max)
    if n_chunk == 0:
        raise ValueError("calibration text too short")

    cfg = rt.cfg

    @jax.jit
    def run(params, toks, kv):
        return llama_mod.forward(params, cfg, toks, kv, jnp.int32(0),
                                 collect_stats=True)

    acc: dict[str, np.ndarray] = {}
    for i in range(n_chunk):
        chunk = tokens[i * n_ctx:(i + 1) * n_ctx]
        if rt.tokenizer.add_bos and rt.tokenizer.bos_id >= 0:
            chunk = [rt.tokenizer.bos_id] + chunk[1:]
        kv = KVCache.create(cfg, 1, n_ctx)
        toks = jnp.asarray(np.asarray(chunk, np.int32)[None, :])
        _, _, stats = run(rt.params, toks, kv)
        for name, v in stats.items():
            v = np.asarray(v, np.float64)
            acc[name] = acc.get(name, 0) + v
        if verbose:
            print(f"[{i + 1}/{n_chunk}]", end=" ", flush=True, file=sys.stderr)
    if verbose:
        print(file=sys.stderr)
    # file value = (sum/count)*ncall with count = tokens seen = n_chunk*n_ctx
    return {name: ((v / (n_chunk * n_ctx)) * n_chunk).astype(np.float32)
            for name, v in acc.items()}, n_chunk


def layer_similarity(rt, text: str, n_ctx: int = 128) -> list[float]:
    """--layer-similarity: cosine similarity between each layer's input and
    output hidden states (imatrix.cpp's layer-importance heuristic — low
    similarity = the layer changes the representation more)."""
    ids = rt.tokenizer.encode(text)[:n_ctx]
    hs = rt.layer_hiddens(ids)              # (L, T, E) — l_out per layer
    sims = []
    prev = None
    for il in range(hs.shape[0]):
        cur = hs[il]
        if prev is None:
            sims.append(1.0)
        else:
            num = float((prev * cur).sum())
            den = float(np.linalg.norm(prev) * np.linalg.norm(cur)) + 1e-12
            sims.append(num / den)
        prev = cur
    return sims


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("-o", "--output", default="imatrix.dat")
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=-1)
    ap.add_argument("--layer-similarity", action="store_true")
    args = ap.parse_args(argv)

    from ..runtime.generate import Runtime
    rt = Runtime.from_gguf(args.gguf)
    text = open(args.text, encoding="utf-8").read()
    if args.layer_similarity:
        sims = layer_similarity(rt, text, min(args.n_ctx, 128))
        for il, s in enumerate(sims):
            print(f"layer {il:3d}: cos-sim(l_in, l_out) = {s:.4f}")
    stats, ncall = collect_imatrix(rt, text, args.n_ctx, args.chunks)
    save_imatrix(args.output, {k: (v, ncall) for k, v in stats.items()},
                 ncall, args.text)
    print(f"stored {len(stats)} entries after {ncall} chunks in {args.output}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
