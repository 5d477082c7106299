"""llama2.c checkpoint importer — examples/convert-llama2c-to-ggml analogue.

Reads a karpathy llama2.c binary checkpoint (7-int32 Config header
``dim hidden_dim n_layers n_heads n_kv_heads vocab_size seq_len`` followed
by f32 weight blocks in the fixed order of convert-llama2c-to-ggml.cpp:
152-170; negative vocab_size means an unshared classifier head) plus the
matching tokenizer.bin (per token: f32 score, int32 length, utf-8 bytes)
and writes a llama-arch GGUF loadable by this runtime.  Weight
orientation matches the reference's convert_weights_ak_to_gg (row-major
(out, in), no q/k permutation).
"""
from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np


def read_checkpoint(path: str):
    """Returns (config dict, weights dict of f32 arrays)."""
    data = Path(path).read_bytes()
    dim, hidden, n_layers, n_heads, n_kv, vocab, seq_len = \
        struct.unpack_from("<7i", data, 0)
    shared = vocab > 0                      # convert-llama2c-to-ggml.cpp:893
    vocab = abs(vocab)
    n_kv = n_kv if 0 < n_kv <= n_heads else n_heads
    kv_dim = dim * n_kv // n_heads
    off = 28

    def take(*shape):
        nonlocal off
        n = int(np.prod(shape))
        arr = np.frombuffer(data, np.float32, n, off).reshape(shape)
        off += 4 * n
        return arr

    w = {
        "tok_embd": take(vocab, dim),
        "rms_att": take(n_layers, dim),
        "wq": take(n_layers, dim, dim),
        "wk": take(n_layers, kv_dim, dim),
        "wv": take(n_layers, kv_dim, dim),
        "wo": take(n_layers, dim, dim),
        "rms_ffn": take(n_layers, dim),
        "w1": take(n_layers, hidden, dim),
        "w2": take(n_layers, dim, hidden),
        "w3": take(n_layers, hidden, dim),
        "rms_final": take(dim),
    }
    off += 4 * seq_len * (dim // n_heads)    # skipped freq_cis_real/imag
    w["wcls"] = w["tok_embd"] if shared else take(vocab, dim)
    cfg = dict(dim=dim, hidden_dim=hidden, n_layers=n_layers,
               n_heads=n_heads, n_kv_heads=n_kv, vocab_size=vocab,
               seq_len=seq_len)
    return cfg, w


def read_tokenizer_bin(path: str, vocab_size: int):
    """karpathy tokenizer.bin: int32 max_token_length, then per token
    f32 score + int32 len + bytes. Returns (tokens, scores, types);
    types use the llama.cpp token-type ints (1 normal, 2 unknown,
    3 control, 6 byte)."""
    data = Path(path).read_bytes()
    off = 4
    tokens, scores, types = [], [], []
    for i in range(vocab_size):
        (score,) = struct.unpack_from("<f", data, off)
        off += 4
        (ln,) = struct.unpack_from("<i", data, off)
        off += 4
        raw = data[off:off + ln]
        off += ln
        text = raw.decode("utf-8", errors="replace")
        if text.startswith("<0x") and text.endswith(">") and len(text) == 6:
            typ = 6                      # BYTE
        elif text == "<unk>" or i == 0:
            typ = 2                      # UNKNOWN
        elif text in ("<s>", "</s>") or i in (1, 2):
            typ = 3                      # CONTROL
        else:
            typ = 1                      # NORMAL
        tokens.append(text)
        scores.append(score)
        types.append(typ)
    return tokens, scores, types


def convert(checkpoint: str, tokenizer: str, output: str) -> Path:
    from ..gguf.writer import GGUFWriter
    cfg, wt = read_checkpoint(checkpoint)
    tokens, scores, types = read_tokenizer_bin(tokenizer, cfg["vocab_size"])

    head_dim = cfg["dim"] // cfg["n_heads"]
    w = GGUFWriter(output, arch="llama")
    w.add("general.name", Path(checkpoint).stem)
    w.add("llama.block_count", cfg["n_layers"])
    w.add("llama.context_length", cfg["seq_len"])
    w.add("llama.embedding_length", cfg["dim"])
    w.add("llama.feed_forward_length", cfg["hidden_dim"])
    w.add("llama.attention.head_count", cfg["n_heads"])
    w.add("llama.attention.head_count_kv", cfg["n_kv_heads"])
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("llama.rope.dimension_count", head_dim)
    w.add("llama.vocab_size", cfg["vocab_size"])
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)

    w.add_tensor("token_embd.weight", wt["tok_embd"].astype(np.float32))
    w.add_tensor("output_norm.weight", wt["rms_final"].astype(np.float32))
    w.add_tensor("output.weight", wt["wcls"].astype(np.float32))
    for il in range(cfg["n_layers"]):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", wt["rms_att"][il])
        w.add_tensor(p + "attn_q.weight", wt["wq"][il])
        w.add_tensor(p + "attn_k.weight", wt["wk"][il])
        w.add_tensor(p + "attn_v.weight", wt["wv"][il])
        w.add_tensor(p + "attn_output.weight", wt["wo"][il])
        w.add_tensor(p + "ffn_norm.weight", wt["rms_ffn"][il])
        w.add_tensor(p + "ffn_gate.weight", wt["w1"][il])
        w.add_tensor(p + "ffn_down.weight", wt["w2"][il])
        w.add_tensor(p + "ffn_up.weight", wt["w3"][il])
    w.write()
    return Path(output)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--copy-vocab-from-model", "--tokenizer", required=True,
                    dest="tokenizer", help="karpathy tokenizer.bin")
    ap.add_argument("--llama2c-model", required=True, dest="checkpoint")
    ap.add_argument("--llama2c-output-model", "-o", required=True,
                    dest="output")
    args = ap.parse_args(argv)
    out = convert(args.checkpoint, args.tokenizer, args.output)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
