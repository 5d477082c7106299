"""Tokenizers built from GGUF vocab metadata: SPM (sentencepiece-BPE) and
GPT-2-style byte-level BPE.

Behavioral contract mirrors the reference's llm_tokenizer_spm / llm_tokenizer_bpe
(src/llama-vocab.cpp): same greedy bigram merges with vocab scores (SPM), same
byte-to-unicode table and merge ranks (BPE), same special-token splitting and
byte fallback. Validated against the reference's golden fixtures
(/root/reference/models/ggml-vocab-*.gguf{,.inp,.out}).
"""
from __future__ import annotations

import heapq
import re
from dataclasses import dataclass
from typing import Iterable

import numpy as np

# token types (llama.h llama_token_type)
TT_UNDEFINED, TT_NORMAL, TT_UNKNOWN, TT_CONTROL, TT_USER_DEFINED, TT_UNUSED, TT_BYTE = range(7)

_SPACE = "▁"  # ▁


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte->unicode bijection (tiktoken/gpt2 convention)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_BYTE_ENC = _bytes_to_unicode()
_BYTE_DEC = {v: k for k, v in _BYTE_ENC.items()}

# pre-tokenizer regexes, keyed by tokenizer.ggml.pre (llama-vocab.cpp
# llm_tokenizer_bpe ctor). Python `regex` isn't guaranteed; translate the
# common ones to `re`-compatible patterns (no \p{...} — use unicode classes).
import unicodedata


def _cat(ch):
    return unicodedata.category(ch)


class _Pretok:
    """Implements the gpt2 / llama3 style splitting without the regex module."""

    def __init__(self, kind: str):
        self.kind = kind

    def __call__(self, text: str) -> list[str]:
        if self.kind == "llama3":
            return self._llama3(text)
        return self._gpt2(text)

    # gpt2: 's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+
    def _gpt2(self, text: str) -> list[str]:
        out = []
        i, n = 0, len(text)
        while i < n:
            ch = text[i]
            # contractions
            if ch == "'" and i + 1 < n:
                for suf in ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d"):
                    if text.startswith(suf, i):
                        out.append(suf)
                        i += len(suf)
                        break
                else:
                    out.append(self._punct_run(text, i)[0])
                    i += len(out[-1])
                continue
            j = i
            lead = ""
            if ch == " " and i + 1 < n and not text[i + 1].isspace():
                lead = " "
                j = i + 1
                ch = text[j]
            if _cat(ch).startswith("L"):
                k = j
                while k < n and _cat(text[k]).startswith("L"):
                    k += 1
                out.append(lead + text[j:k])
                i = k
            elif _cat(ch).startswith("N"):
                k = j
                while k < n and _cat(text[k]).startswith("N"):
                    k += 1
                out.append(lead + text[j:k])
                i = k
            elif ch.isspace():
                # \s+(?!\S) or \s+
                k = i
                while k < n and text[k].isspace():
                    k += 1
                if k < n and k - i > 1:
                    out.append(text[i:k - 1])
                    i = k - 1
                else:
                    out.append(text[i:k])
                    i = k
            else:
                run, _ = self._punct_run(text, j)
                out.append(lead + run)
                i = j + len(run)
        return out

    def _punct_run(self, text, i):
        n = len(text)
        k = i
        while k < n and not text[k].isspace() and not _cat(text[k]).startswith(("L", "N")):
            k += 1
        return text[i:k], k

    # llama3: (?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+
    def _llama3(self, text: str) -> list[str]:
        out = []
        i, n = 0, len(text)
        while i < n:
            ch = text[i]
            low = text[i:i + 4].lower()
            matched = False
            for suf in ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d"):
                if low.startswith(suf) and ch == "'":
                    out.append(text[i:i + len(suf)])
                    i += len(suf)
                    matched = True
                    break
            if matched:
                continue
            # [^\r\n\p{L}\p{N}]?\p{L}+
            j = i
            if ch not in "\r\n" and not _cat(ch).startswith(("L", "N")):
                if i + 1 < n and _cat(text[i + 1]).startswith("L"):
                    j = i + 1
            if j < n and _cat(text[j]).startswith("L"):
                k = j
                while k < n and _cat(text[k]).startswith("L"):
                    k += 1
                out.append(text[i:k])
                i = k
                continue
            # \p{N}{1,3}
            if _cat(ch).startswith("N"):
                k = min(i + 3, n)
                j = i
                while j < k and _cat(text[j]).startswith("N"):
                    j += 1
                out.append(text[i:j])
                i = j
                continue
            #  ?[^\s\p{L}\p{N}]+[\r\n]*
            j = i
            lead = ""
            if ch == " ":
                nxt = text[i + 1] if i + 1 < n else ""
                if nxt and not nxt.isspace() and not _cat(nxt).startswith(("L", "N")):
                    lead = " "
                    j = i + 1
            if j < n and not text[j].isspace() and not _cat(text[j]).startswith(("L", "N")):
                k = j
                while k < n and not text[k].isspace() and not _cat(text[k]).startswith(("L", "N")):
                    k += 1
                while k < n and text[k] in "\r\n":
                    k += 1
                out.append(lead + text[j:k] if not lead else " " + text[j:k])
                i = k
                continue
            # \s*[\r\n]+
            if ch.isspace():
                k = i
                while k < n and text[k].isspace():
                    k += 1
                seg = text[i:k]
                if "\n" in seg or "\r" in seg:
                    # greedy \s*[\r\n]+ : trailing whitespace after last newline
                    last = max(seg.rfind("\n"), seg.rfind("\r"))
                    if last + 1 < len(seg):
                        out.append(seg[:last + 1])
                        i += last + 1
                        continue
                    out.append(seg)
                    i = k
                    continue
                # \s+(?!\S) / \s+
                if k < n and k - i > 1:
                    out.append(text[i:k - 1])
                    i = k - 1
                else:
                    out.append(text[i:k])
                    i = k
                continue
            out.append(ch)
            i += 1
        return out


@dataclass
class Tokenizer:
    model: str                    # 'llama' (spm) | 'gpt2' (bpe)
    tokens: list[str]
    scores: np.ndarray | None
    token_types: np.ndarray | None
    merges: list[str] | None
    bos_id: int = -1
    eos_id: int = -1
    unk_id: int = -1
    pad_id: int = -1
    add_bos: bool = True
    add_eos: bool = False
    add_space_prefix: bool = True
    pre: str = "default"
    fim_pre_id: int = -1      # fill-in-middle specials (llama.h FIM tokens)
    fim_suf_id: int = -1
    fim_mid_id: int = -1
    chat_template: str | None = None

    def __post_init__(self):
        self.vocab = {t: i for i, t in enumerate(self.tokens)}
        self.byte_tokens: dict[int, int] = {}
        if self.token_types is not None:
            for i, tt in enumerate(self.token_types):
                if tt == TT_BYTE:
                    s = self.tokens[i]
                    if s.startswith("<0x") and s.endswith(">"):
                        self.byte_tokens[int(s[3:-1], 16)] = i
        self.specials = []
        if self.token_types is not None:
            for i, tt in enumerate(self.token_types):
                if tt in (TT_CONTROL, TT_USER_DEFINED) and self.tokens[i]:
                    self.specials.append(self.tokens[i])
        self.specials.sort(key=len, reverse=True)
        if self.merges:
            self.merge_ranks = {}
            for rank, m in enumerate(self.merges):
                a, _, b = m.partition(" ")
                self.merge_ranks[(a, b)] = rank
        self._pretok = _Pretok("llama3" if self.pre in ("llama3", "llama-v3", "llama-bpe") else "gpt2")

    # ------------------------------------------------------------------ SPM
    def _spm_encode_piece(self, text: str) -> list[int]:
        # symbols = utf-8 characters; greedy best-score bigram merge
        syms = list(text)
        if not syms:
            return []
        scores = self.scores
        heap = []

        def try_pair(i, j, left_idx):
            pair = "".join(syms_txt[i:j + 1])
            tid = self.vocab.get(pair)
            return tid

        # linked-list merge like the reference
        syms_txt = syms
        nxt = list(range(1, len(syms) + 1))
        prv = list(range(-1, len(syms) - 1))
        alive = [True] * len(syms)
        text_of = syms[:]

        def push(i):
            j = nxt[i]
            if j >= len(syms) or not alive[i]:
                return
            merged = text_of[i] + text_of[j]
            tid = self.vocab.get(merged)
            if tid is not None and scores is not None:
                heapq.heappush(heap, (-float(scores[tid]), i, merged))

        for i in range(len(syms)):
            push(i)
        while heap:
            negscore, i, merged = heapq.heappop(heap)
            if not alive[i]:
                continue
            j = nxt[i]
            if j >= len(syms) or not alive[j] or text_of[i] + text_of[j] != merged:
                continue
            text_of[i] = merged
            alive[j] = False
            nxt[i] = nxt[j]
            if nxt[i] < len(syms):
                prv[nxt[i]] = i
            push(i)
            if prv[i] >= 0:
                push(prv[i])
        out = []
        i = 0
        while i < len(syms):
            if alive[i]:
                piece = text_of[i]
                tid = self.vocab.get(piece)
                if tid is not None:
                    out.append(tid)
                else:
                    for byte in piece.encode("utf-8"):
                        out.append(self.byte_tokens.get(byte, self.unk_id))
                i = nxt[i]
            else:
                i += 1
        return out

    def _encode_spm(self, text: str) -> list[int]:
        if not text:
            return []
        raw = text
        if self.add_space_prefix and raw:
            raw = " " + raw
        raw = raw.replace(" ", _SPACE)
        return self._spm_encode_piece(raw)

    # ------------------------------------------------------------------ BPE
    def _bpe_word(self, word: str) -> list[int]:
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.merge_ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best:best + 2] = [parts[best] + parts[best + 1]]
        out = []
        for p in parts:
            tid = self.vocab.get(p)
            if tid is not None:
                out.append(tid)
            else:
                for chu in p:
                    tid = self.vocab.get(chu)
                    if tid is not None:
                        out.append(tid)
                    elif self.unk_id >= 0:
                        out.append(self.unk_id)
        return out

    def _encode_bpe(self, text: str) -> list[int]:
        out = []
        for frag in self._pretok(text):
            mapped = "".join(_BYTE_ENC[b] for b in frag.encode("utf-8"))
            out.extend(self._bpe_word(mapped))
        return out

    # ------------------------------------------------------------- public
    def encode(self, text: str, *, add_bos: bool | None = None,
               add_eos: bool | None = None, parse_special: bool = True) -> list[int]:
        add_bos = self.add_bos if add_bos is None else add_bos
        add_eos = self.add_eos if add_eos is None else add_eos
        core = self._encode_with_specials(text) if parse_special else self._encode_raw(text)
        ids = ([self.bos_id] if (add_bos and self.bos_id >= 0) else []) + core
        if add_eos and self.eos_id >= 0:
            ids.append(self.eos_id)
        return ids

    def _encode_raw(self, text: str) -> list[int]:
        if self.model == "llama":
            return self._encode_spm(text)
        return self._encode_bpe(text)

    def _encode_with_specials(self, text: str) -> list[int]:
        if not self.specials:
            return self._encode_raw(text)
        pattern = "|".join(re.escape(s) for s in self.specials)
        out = []
        pos = 0
        for m in re.finditer(pattern, text):
            if m.start() > pos:
                out.extend(self._encode_raw(text[pos:m.start()]))
            out.append(self.vocab[m.group(0)])
            pos = m.end()
        if pos < len(text):
            out.extend(self._encode_raw(text[pos:]))
        return out

    def decode(self, ids: Iterable[int]) -> str:
        if self.model == "llama":
            buf = bytearray()
            for i in ids:
                tt = self.token_types[i] if self.token_types is not None else TT_NORMAL
                piece = self.tokens[i]
                if tt == TT_BYTE:
                    buf.append(int(piece[3:-1], 16))
                else:
                    buf.extend(piece.replace(_SPACE, " ").encode("utf-8"))
            return buf.decode("utf-8", errors="replace")
        buf = bytearray()
        for i in ids:
            piece = self.tokens[i]
            tt = self.token_types[i] if self.token_types is not None else TT_NORMAL
            if tt in (TT_CONTROL, TT_USER_DEFINED):
                buf.extend(piece.encode("utf-8"))
            else:
                buf.extend(bytes(_BYTE_DEC.get(c, ord(" ")) for c in piece))
        return buf.decode("utf-8", errors="replace")


def tokenizer_from_gguf(md: dict) -> Tokenizer:
    tokens = [str(t) for t in md["tokenizer.ggml.tokens"]]
    scores = md.get("tokenizer.ggml.scores")
    token_types = md.get("tokenizer.ggml.token_type")
    merges = md.get("tokenizer.ggml.merges")
    if merges is not None and not isinstance(merges, list):
        merges = [str(m) for m in merges]

    def geti(key, default=-1):
        v = md.get(key, default)
        return int(v.item() if hasattr(v, "item") else v)

    def getb(key, default):
        v = md.get(key, default)
        return bool(v.item() if hasattr(v, "item") else v)

    model = str(md.get("tokenizer.ggml.model", "llama"))
    return Tokenizer(
        model=model,
        tokens=tokens,
        scores=None if scores is None else np.asarray(scores),
        token_types=None if token_types is None else np.asarray(token_types),
        merges=merges,
        bos_id=geti("tokenizer.ggml.bos_token_id"),
        eos_id=geti("tokenizer.ggml.eos_token_id"),
        unk_id=geti("tokenizer.ggml.unknown_token_id"),
        pad_id=geti("tokenizer.ggml.padding_token_id"),
        add_bos=getb("tokenizer.ggml.add_bos_token", model == "llama"),
        add_eos=getb("tokenizer.ggml.add_eos_token", False),
        add_space_prefix=getb("tokenizer.ggml.add_space_prefix", True),
        pre=str(md.get("tokenizer.ggml.pre", "default")),
        fim_pre_id=geti("tokenizer.ggml.fim_pre_token_id",
                        geti("tokenizer.ggml.prefix_token_id")),
        fim_suf_id=geti("tokenizer.ggml.fim_suf_token_id",
                        geti("tokenizer.ggml.suffix_token_id")),
        fim_mid_id=geti("tokenizer.ggml.fim_mid_token_id",
                        geti("tokenizer.ggml.middle_token_id")),
        chat_template=(str(md["tokenizer.chat_template"])
                       if "tokenizer.chat_template" in md else None),
    )
