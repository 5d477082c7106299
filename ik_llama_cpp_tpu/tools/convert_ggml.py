"""Legacy GGML/GGMF/GGJT -> GGUF converter — the analogue of the
reference's ``convert_llama_ggml_to_gguf.py``.

Pre-GGUF llama.cpp model files (2023 era) come in three container
generations, identified by magic:

* ``lmgg`` — GGML v0: no version field, vocab without scores, unpadded
  tensor data.
* ``fmgg`` — GGMF v1: version field, vocab WITH f32 scores, unpadded.
* ``tjgg`` — GGJT v1-3: version field, scored vocab, tensor data aligned
  to 32 bytes (the mmap era).

All share the 7-field u32 hyperparameter header
``(n_vocab, n_embd, n_mult, n_head, n_layer, n_rot, ftype)`` and the
original Meta-LLaMA tensor names (``layers.N.attention.wq.weight`` …),
which map onto GGUF names via the same table as the ``.pth`` converter
(`convert_legacy._NAME_MAP`).

Quantized payloads are passed through byte-for-byte when the block
formats match today's definitions; that is only true from GGJT v3 on
(Q4/Q8 block layouts changed in v3, everything changed in v2), so the
same eligibility rules as the reference's ``validate_conversion``
(convert_llama_ggml_to_gguf.py:168) apply.

Usage:
    python -m ik_llama_cpp_tpu.tools.convert_ggml input.bin -o out.gguf
        [--gqa N] [--eps E] [--context-length N]
"""
from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np

from ..gguf.constants import GEOMETRY, GGMLType
from ..gguf.writer import GGUFWriter
from .convert_legacy import _NAME_MAP, _stem

# GGMLFType enum (llama.h pre-GGUF); value -> representative tensor types
_FTYPE_NAMES = {
    0: "ALL_F32", 1: "MOSTLY_F16", 2: "MOSTLY_Q4_0", 3: "MOSTLY_Q4_1",
    4: "MOSTLY_Q4_1_SOME_F16", 7: "MOSTLY_Q8_0", 8: "MOSTLY_Q5_0",
    9: "MOSTLY_Q5_1", 10: "MOSTLY_Q2_K", 11: "MOSTLY_Q3_K_S",
    12: "MOSTLY_Q3_K_M", 13: "MOSTLY_Q3_K_L", 14: "MOSTLY_Q4_K_S",
    15: "MOSTLY_Q4_K_M", 16: "MOSTLY_Q5_K_S", 17: "MOSTLY_Q5_K_M",
    18: "MOSTLY_Q6_K",
}

_FMT_GGML, _FMT_GGMF, _FMT_GGJT = 0, 1, 2
_FMT_NAMES = {_FMT_GGML: "GGML", _FMT_GGMF: "GGMF", _FMT_GGJT: "GGJT"}


class LegacyGGML:
    """Parsed legacy-container model: header, vocab, tensor directory."""

    def __init__(self, data: bytes | memoryview):
        self.data = memoryview(data)
        self.tensors: list[dict] = []   # {name, dims(ggml ne), dtype, off, nbytes}
        self.vocab: list[tuple[bytes, float]] = []
        self._parse()

    # -- header -------------------------------------------------------
    def _parse(self):
        d, off = self.data, 0
        magic = bytes(d[0:4])
        if magic == b"GGUF":
            raise ValueError("already a GGUF file — nothing to convert")
        if magic == b"lmgg":
            self.fmt, self.version, off = _FMT_GGML, 1, 4
        elif magic == b"fmgg":
            self.fmt = _FMT_GGMF
            (self.version,) = struct.unpack_from("<I", d, 4)
            if self.version != 1:
                raise ValueError(f"unexpected GGMF version {self.version}")
            off = 8
        elif magic == b"tjgg":
            self.fmt = _FMT_GGJT
            (self.version,) = struct.unpack_from("<I", d, 4)
            if not 1 <= self.version <= 3:
                raise ValueError(f"unexpected GGJT version {self.version}")
            off = 8
        else:
            raise ValueError(f"unrecognized magic {magic!r} (not a legacy "
                             "GGML/GGMF/GGJT model file)")
        (self.n_vocab, self.n_embd, self.n_mult, self.n_head,
         self.n_layer, self.n_rot, ftype) = struct.unpack_from("<7I", d, off)
        off += 28
        if ftype not in _FTYPE_NAMES:
            raise ValueError(f"invalid ftype {ftype}")
        self.ftype = ftype
        off = self._parse_vocab(off)
        while off < len(d):
            off = self._parse_tensor(off)
        t0 = next((t for t in self.tensors
                   if t["name"] == b"layers.0.feed_forward.w1.weight"), None)
        if t0 is None:
            raise ValueError("missing layer 0 feed-forward tensor "
                             "(is this a LLaMA model?)")
        self.n_ff = t0["dims"][1]

    def _parse_vocab(self, off: int) -> int:
        d = self.data
        scored = self.fmt > _FMT_GGML
        for _ in range(self.n_vocab):
            (ln,) = struct.unpack_from("<I", d, off)
            off += 4
            text = bytes(d[off:off + ln])
            off += ln
            score = 0.0
            if scored:
                (score,) = struct.unpack_from("<f", d, off)
                off += 4
            self.vocab.append((text, score))
        return off

    def _parse_tensor(self, off: int) -> int:
        d = self.data
        n_dims, name_len, dtype = struct.unpack_from("<3I", d, off)
        if not 0 <= n_dims <= 4 or name_len >= 4096:
            raise ValueError(f"corrupt tensor header at offset {off}")
        off += 12
        dims = struct.unpack_from(f"<{n_dims}I", d, off)   # ggml ne order
        off += 4 * n_dims
        name = bytes(d[off:off + name_len])
        off += name_len
        if self.fmt > _FMT_GGMF:                            # GGJT: 32B align
            off = (off + 31) & ~31
        ty = GGMLType(dtype)
        geo = GEOMETRY[ty]
        n_elems = int(np.prod(dims)) if dims else 1
        nbytes = n_elems // geo.block_elems * geo.block_bytes
        self.tensors.append({"name": name, "dims": dims, "dtype": ty,
                             "off": off, "nbytes": nbytes})
        return off + nbytes

    # -- eligibility (convert_llama_ggml_to_gguf.py:168) ---------------
    def validate_conversion(self):
        ft = self.ftype
        if self.fmt < _FMT_GGJT or self.version < 2:
            if ft not in (0, 1):
                raise ValueError(
                    "quantization block formats changed in GGJTv2; only "
                    "unquantized (F32/F16) files older than GGJTv2 convert")
        elif self.fmt == _FMT_GGJT and self.version == 2:
            if ft in (2, 3, 4, 7):
                raise ValueError("Q4 and Q8 block formats changed in GGJTv3;"
                                 f" cannot convert a GGJTv2 {_FTYPE_NAMES[ft]}"
                                 " file")


def _gguf_vocab(model: LegacyGGML):
    """Legacy vocab -> (tokens, scores, types) with the reference's
    UNK/BOS/EOS/byte-token fixups (convert_llama_ggml_to_gguf.py:297)."""
    tokens, scores, types = [], [], []
    for tokid, (vb, score) in enumerate(model.vocab):
        tt = 1                               # NORMAL
        if tokid == 0:
            vb, tt = b"<unk>", 2             # UNKNOWN
        elif tokid in (1, 2):
            vb, tt = (b"<s>" if tokid == 1 else b"</s>"), 3   # CONTROL
        elif len(vb) == 0:
            tt = 3
        elif 3 <= tokid <= 258 and len(vb) == 1:
            vb, tt = f"<0x{vb[0]:02X}>".encode(), 6           # BYTE
        else:
            vb = vb.replace(b" ", b"\xe2\x96\x81")
        tokens.append(vb.decode("utf-8", errors="replace"))
        scores.append(score)
        types.append(tt)
    return tokens, scores, types


def convert(input_path, output_path, *, gqa: int = 1, eps: float = 5e-6,
            context_length: int = 2048, name: str | None = None) -> Path:
    data = Path(input_path).read_bytes()
    model = LegacyGGML(data)
    model.validate_conversion()
    print(f"* {_FMT_NAMES[model.fmt]}v{model.version} "
          f"{_FTYPE_NAMES[model.ftype]}: n_vocab={model.n_vocab} "
          f"n_embd={model.n_embd} n_head={model.n_head} "
          f"n_layer={model.n_layer} n_ff={model.n_ff}", file=sys.stderr)

    # GQA: the legacy header has no n_head_kv; like the reference, derive
    # it from the user-provided --gqa ratio
    if gqa == 1:
        n_kv = model.n_head
    else:
        n_kv = next((x for x in range(1, 256)
                     if model.n_head / x == float(gqa)), None)
        if n_kv is None:
            raise ValueError(f"cannot derive n_head_kv from GQA ratio {gqa}")

    w = GGUFWriter(output_path, arch="llama")
    w.add("general.name", name or Path(input_path).name)
    w.add("general.description",
          f"converted from legacy {_FMT_NAMES[model.fmt]}v{model.version} "
          f"{_FTYPE_NAMES[model.ftype]} format")
    w.add("general.file_type", int(model.ftype))
    w.add("llama.context_length", int(context_length))
    w.add("llama.embedding_length", model.n_embd)
    w.add("llama.block_count", model.n_layer)
    w.add("llama.feed_forward_length", int(model.n_ff))
    w.add("llama.rope.dimension_count", model.n_embd // model.n_head)
    w.add("llama.attention.head_count", model.n_head)
    w.add("llama.attention.head_count_kv", n_kv)
    w.add("llama.attention.layer_norm_rms_epsilon", float(eps))
    w.add("llama.vocab_size", model.n_vocab)

    tokens, scores, types = _gguf_vocab(model)
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.pre", "default")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)

    for t in model.tensors:
        tname = t["name"].decode("utf-8", errors="replace")
        if tname.endswith("rope.freqs") or "inner_attention" in tname:
            continue
        if tname.startswith("layers."):
            il = int(tname.split(".")[1])
            stem = _NAME_MAP.get(_stem(tname))
            if stem is None:
                continue
            out_name = f"blk.{il}.{stem}"
        else:
            out_name = _NAME_MAP.get(tname)
            if out_name is None:
                continue
        payload = bytes(model.data[t["off"]: t["off"] + t["nbytes"]])
        # quantized data is block-compatible from GGJTv3 on: raw passthrough
        w.add_tensor(out_name, payload, shape=tuple(t["dims"]),
                     ggml_type=t["dtype"])
    w.write()
    return Path(output_path)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="convert a legacy GGML/GGMF/GGJT llama model to GGUF")
    ap.add_argument("input", help="legacy .bin model file")
    ap.add_argument("--outfile", "-o", required=True)
    ap.add_argument("--gqa", type=int, default=1,
                    help="grouped-query attention factor (70B llama2: 8)")
    ap.add_argument("--eps", type=float, default=5e-6,
                    help="RMS norm epsilon (llama2: 1e-5)")
    ap.add_argument("--context-length", "-c", type=int, default=2048)
    ap.add_argument("--model-name", "-m", default=None)
    args = ap.parse_args(argv)
    out = convert(args.input, args.outfile, gqa=args.gqa, eps=args.eps,
                  context_length=args.context_length, name=args.model_name)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
