"""Legacy Meta-LLaMA checkpoint converter — examples/convert_legacy_llama.py
analogue (the original convert.py), Meta `.pth` path.

Reads params.json + consolidated.NN.pth shard(s) and writes a llama GGUF.
Meta tensor names map 1:1 (no q/k permute — only HF layouts need the
rope-half permute, convert_legacy_llama.py:1104 applies it to
``model.layers.*`` names only).  Multi-shard checkpoints are merged with
the classic column/row-parallel concat rules.  Vocab comes from a
sentencepiece ``tokenizer.model`` or, with ``--vocab-gguf``, is copied
from an existing GGUF.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

# shard-merge axis per Meta tensor stem (classic convert.py logic):
# column-parallel weights concat on rows (0), row-parallel on cols (1),
# norms are replicated (None)
_SHARD_AXIS = {
    "tok_embeddings.weight": 1,
    "output.weight": 0,
    "attention.wq.weight": 0,
    "attention.wk.weight": 0,
    "attention.wv.weight": 0,
    "attention.wo.weight": 1,
    "feed_forward.w1.weight": 0,
    "feed_forward.w2.weight": 1,
    "feed_forward.w3.weight": 0,
    "attention_norm.weight": None,
    "ffn_norm.weight": None,
    "norm.weight": None,
}

_NAME_MAP = {
    "tok_embeddings.weight": "token_embd.weight",
    "norm.weight": "output_norm.weight",
    "output.weight": "output.weight",
    "attention.wq.weight": "attn_q.weight",
    "attention.wk.weight": "attn_k.weight",
    "attention.wv.weight": "attn_v.weight",
    "attention.wo.weight": "attn_output.weight",
    "attention_norm.weight": "attn_norm.weight",
    "feed_forward.w1.weight": "ffn_gate.weight",
    "feed_forward.w2.weight": "ffn_down.weight",
    "feed_forward.w3.weight": "ffn_up.weight",
    "ffn_norm.weight": "ffn_norm.weight",
}


def _stem(name: str) -> str:
    return name.split(".", 2)[2] if name.startswith("layers.") else name


def load_meta_checkpoint(model_dir: str):
    """Returns (params dict, {meta tensor name: np.float32 array})."""
    import torch
    d = Path(model_dir)
    params = json.loads((d / "params.json").read_text())
    shards = sorted(d.glob("consolidated.*.pth")) or \
        sorted(d.glob("consolidated.pth"))
    if not shards:
        raise FileNotFoundError(f"no consolidated.*.pth under {model_dir}")
    loaded = [torch.load(s, map_location="cpu", weights_only=True)
              for s in shards]
    merged: dict[str, np.ndarray] = {}
    for name in loaded[0]:
        axis = _SHARD_AXIS.get(_stem(name))
        if len(loaded) == 1 or axis is None:
            t = loaded[0][name]
        else:
            t = __import__("torch").cat([sh[name] for sh in loaded],
                                        dim=axis)
        merged[name] = t.to(dtype=__import__("torch").float32).numpy()
    return params, merged


def load_spm_vocab(path: str):
    """tokenizer.model via sentencepiece -> (tokens, scores, types)."""
    import sentencepiece as spm
    sp = spm.SentencePieceProcessor(model_file=str(path))
    tokens, scores, types = [], [], []
    for i in range(sp.vocab_size()):
        tokens.append(sp.id_to_piece(i))
        scores.append(sp.get_score(i))
        if sp.is_unknown(i):
            types.append(2)
        elif sp.is_control(i):
            types.append(3)
        elif sp.is_byte(i):
            types.append(6)
        else:
            types.append(1)
    return tokens, scores, types


def load_gguf_vocab(path: str):
    from ..gguf.reader import load_gguf
    md = load_gguf(path).metadata
    return (md["tokenizer.ggml.tokens"],
            list(md.get("tokenizer.ggml.scores",
                        [0.0] * len(md["tokenizer.ggml.tokens"]))),
            list(md.get("tokenizer.ggml.token_type",
                        [1] * len(md["tokenizer.ggml.tokens"]))))


def convert(model_dir: str, output: str, *, vocab_model: str | None = None,
            vocab_gguf: str | None = None, ctx: int = 4096) -> Path:
    from ..gguf.writer import GGUFWriter
    params, wt = load_meta_checkpoint(model_dir)
    dim = params["dim"]
    n_head = params["n_heads"]
    n_kv = params.get("n_kv_heads", n_head)
    n_layer = params["n_layers"]
    n_ff = wt["layers.0.feed_forward.w1.weight"].shape[0]
    vocab_size = wt["tok_embeddings.weight"].shape[0]

    if vocab_gguf:
        tokens, scores, types = load_gguf_vocab(vocab_gguf)
    elif vocab_model:
        tokens, scores, types = load_spm_vocab(vocab_model)
    else:
        tm = Path(model_dir) / "tokenizer.model"
        if not tm.exists():
            raise FileNotFoundError(
                "no tokenizer.model; pass --vocab-model or --vocab-gguf")
        tokens, scores, types = load_spm_vocab(str(tm))
    tokens, scores, types = (tokens[:vocab_size], scores[:vocab_size],
                             types[:vocab_size])

    w = GGUFWriter(output, arch="llama")
    w.add("general.name", Path(model_dir).name or "legacy-llama")
    w.add("llama.block_count", n_layer)
    w.add("llama.context_length", ctx)
    w.add("llama.embedding_length", dim)
    w.add("llama.feed_forward_length", int(n_ff))
    w.add("llama.attention.head_count", n_head)
    w.add("llama.attention.head_count_kv", n_kv)
    w.add("llama.attention.layer_norm_rms_epsilon",
          float(params.get("norm_eps", 1e-5)))
    w.add("llama.rope.freq_base", float(params.get("rope_theta", 10000.0)))
    w.add("llama.rope.dimension_count", dim // n_head)
    w.add("llama.vocab_size", int(vocab_size))
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", list(tokens))
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)

    for name, arr in wt.items():
        if name.endswith("rope.freqs") or "inner_attention" in name:
            continue                      # derived / inference-only extras
        if name.startswith("layers."):
            il = int(name.split(".")[1])
            stem = _NAME_MAP.get(_stem(name))
            if stem is None:
                continue                  # unknown per-layer extra
            out_name = f"blk.{il}." + stem
        else:
            out_name = _NAME_MAP.get(name)
            if out_name is None:
                continue
        w.add_tensor(out_name, arr.astype(np.float32))
    w.write()
    return Path(output)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir", help="dir with params.json + "
                                      "consolidated.*.pth")
    ap.add_argument("--outfile", "-o", required=True)
    ap.add_argument("--vocab-model", help="sentencepiece tokenizer.model")
    ap.add_argument("--vocab-gguf", help="copy vocab from this GGUF")
    ap.add_argument("--ctx", type=int, default=4096)
    args = ap.parse_args(argv)
    out = convert(args.model_dir, args.outfile,
                  vocab_model=args.vocab_model, vocab_gguf=args.vocab_gguf,
                  ctx=args.ctx)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
