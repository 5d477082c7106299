"""GBNF grammar validator CLI — examples/gbnf-validator analogue.

Parses a grammar, then (optionally) checks an input string against it,
reporting the first offending character position on failure
(gbnf-validator.cpp print_error_message semantics).

Usage:
  python -m ik_llama_cpp_tpu.tools.gbnf_validator grammar.gbnf [input.txt]
  echo '{"a": 1}' | python -m ik_llama_cpp_tpu.tools.gbnf_validator g.gbnf -
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path


def validate(gbnf: str, text: str):
    """Returns (ok, err_pos): ok=True iff the grammar parses, accepts every
    char of ``text``, and can terminate at its end."""
    from ..runtime.grammar import Grammar
    g = Grammar(gbnf)
    for i, ch in enumerate(text):
        if not g.accept_char(ord(ch)):
            return False, i
    if not g.done:
        return False, len(text)
    return True, -1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("grammar", help="GBNF grammar file")
    ap.add_argument("input", nargs="?",
                    help="input file ('-' or omitted = stdin); when absent "
                         "and stdin is a tty, only the grammar is checked")
    args = ap.parse_args(argv)

    gbnf = Path(args.grammar).read_text()
    from ..runtime.grammar import GBNFParseError, Grammar
    try:
        Grammar(gbnf)
    except (GBNFParseError, KeyError) as e:
        print(f"grammar is INVALID: {e}", file=sys.stderr)
        return 1
    if args.input is None and sys.stdin.isatty():
        print("grammar is valid")
        return 0
    text = (sys.stdin.read() if args.input in (None, "-")
            else Path(args.input).read_text())
    ok, pos = validate(gbnf, text)
    if ok:
        print("input string is valid according to the grammar")
        return 0
    ctx = text[max(0, pos - 20): pos]
    print(f"input string is INVALID: error at position {pos} "
          f"(after ...{ctx!r})", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
