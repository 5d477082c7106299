"""Prompt-lookup (n-gram cache) tools — examples/lookup analogue.

``create`` tokenizes a corpus into a binary n-gram cache, ``merge`` folds
caches together, ``stats`` prints entry counts — the lookup-create /
lookup-merge / lookup-stats binaries.  The cache FILE format is the
reference's (common/ngram-cache.cpp:196-254): per entry a fixed
LLAMA_NGRAM_MAX=4 int32 n-gram (-1 padded), int32 part size, then
(int32 token, int32 count) pairs — caches written here load in the
reference and vice versa.  Lookup *decoding* itself is the ``ngram-cache``
speculative stage (runtime/speculative.py NgramCacheDraft), which accepts
the static/dynamic caches these tools produce.
"""
from __future__ import annotations

import argparse
import struct
import sys

NGRAM_MAX = 4   # common/ngram-cache.h LLAMA_NGRAM_MAX


def save_ngram_cache(cache: dict, path: str) -> None:
    """cache: {tuple(tokens): {token: count}} with 1 <= len(key) <= 4."""
    with open(path, "wb") as f:
        for ngram, part in cache.items():
            if not part:
                continue
            padded = list(ngram)[:NGRAM_MAX]
            padded += [-1] * (NGRAM_MAX - len(padded))
            f.write(struct.pack(f"<{NGRAM_MAX}i", *padded))
            f.write(struct.pack("<i", len(part)))
            for tok, cnt in part.items():
                f.write(struct.pack("<ii", tok, cnt))


def load_ngram_cache(path: str) -> dict:
    cache: dict = {}
    with open(path, "rb") as f:
        data = f.read()
    off, n = 0, len(data)
    while off + 4 * NGRAM_MAX + 4 <= n:
        raw = struct.unpack_from(f"<{NGRAM_MAX}i", data, off)
        off += 4 * NGRAM_MAX
        (ntok,) = struct.unpack_from("<i", data, off)
        off += 4
        key = tuple(t for t in raw if t != -1)
        part = cache.setdefault(key, {})
        for _ in range(ntok):
            tok, cnt = struct.unpack_from("<ii", data, off)
            off += 8
            part[tok] = part.get(tok, 0) + cnt
    return cache


def merge_ngram_caches(target: dict, add: dict) -> dict:
    """common_ngram_cache_merge: counts accumulate."""
    for ngram, part in add.items():
        tgt = target.setdefault(ngram, {})
        for tok, cnt in part.items():
            tgt[tok] = tgt.get(tok, 0) + cnt
    return target


def build_cache_from_tokens(tokens: list[int], *, ngram_min: int = 1,
                            ngram_max: int = NGRAM_MAX) -> dict:
    from ..runtime.speculative import NgramCacheDraft
    cache: dict = {}
    NgramCacheDraft.update_cache(cache, tokens, ngram_min, ngram_max,
                                 len(tokens))
    return cache


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("create", help="tokenize a corpus into a cache")
    c.add_argument("--gguf", required=True, help="model (for the tokenizer)")
    c.add_argument("--text", required=True)
    c.add_argument("-o", "--output", required=True)
    m = sub.add_parser("merge", help="merge caches (counts accumulate)")
    m.add_argument("inputs", nargs="+")
    m.add_argument("-o", "--output", required=True)
    s = sub.add_parser("stats", help="entry counts per n-gram size")
    s.add_argument("input")
    args = ap.parse_args(argv)

    if args.cmd == "create":
        from ..gguf.reader import load_gguf
        from ..runtime.tokenizer import tokenizer_from_gguf
        tok = tokenizer_from_gguf(load_gguf(args.gguf).metadata)
        text = open(args.text).read()
        ids = tok.encode(text)
        cache = build_cache_from_tokens(ids)
        save_ngram_cache(cache, args.output)
        print(f"saved {len(cache)} n-gram entries from "
              f"{len(ids)} tokens to {args.output}")
    elif args.cmd == "merge":
        out: dict = {}
        for p in args.inputs:
            merge_ngram_caches(out, load_ngram_cache(p))
        save_ngram_cache(out, args.output)
        print(f"merged {len(args.inputs)} caches -> "
              f"{len(out)} entries in {args.output}")
    else:
        cache = load_ngram_cache(args.input)
        by_n: dict[int, int] = {}
        for k in cache:
            by_n[len(k)] = by_n.get(len(k), 0) + 1
        for nn in sorted(by_n):
            print(f"{nn}-grams: {by_n[nn]}")
        print(f"total entries: {len(cache)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
