"""Tokenizer CLI — examples/tokenize analogue.

Usage:
  python -m ik_llama_cpp_tpu.tools.tokenize -m model.gguf -p "text" [--ids]
  python -m ik_llama_cpp_tpu.tools.tokenize -m model.gguf -f file.txt --count
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

from ..gguf.reader import load_gguf
from ..runtime.tokenizer import tokenizer_from_gguf


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt")
    ap.add_argument("-f", "--file")
    ap.add_argument("--ids", action="store_true", help="print raw id array only")
    ap.add_argument("--count", action="store_true", help="print token count only")
    ap.add_argument("--no-bos", action="store_true")
    args = ap.parse_args(argv)

    text = args.prompt if args.prompt is not None else (
        Path(args.file).read_text() if args.file else sys.stdin.read())
    tok = tokenizer_from_gguf(load_gguf(args.model).metadata)
    ids = tok.encode(text, add_bos=not args.no_bos)
    if args.count:
        print(len(ids))
    elif args.ids:
        print(ids)
    else:
        for i in ids:
            piece = tok.decode([i])
            print(f"{i:6d} -> {piece!r}")


if __name__ == "__main__":
    main()
