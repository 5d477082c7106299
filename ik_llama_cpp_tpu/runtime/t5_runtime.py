"""Encoder-decoder runtime for the T5 family — the analogue of the
reference's llama_encode + llama_decode split (llama.cpp is_encoding path;
examples/main's dec_start_token handling).

Decoder-only models run through runtime.generate.Runtime; T5 needs a
two-stage flow: encode the prompt once, then autoregressively decode
starting from decoder_start_token_id with cross-attention into the cached
encoder output.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import load_gguf
from ..models.config import ModelConfig, config_from_gguf
from ..models import t5 as t5_mod
from .tokenizer import Tokenizer, tokenizer_from_gguf


@dataclass
class T5Runtime:
    cfg: ModelConfig
    tokenizer: Tokenizer
    params: Any
    interpret: bool = False
    _fns: dict = field(default_factory=dict)

    @classmethod
    def from_gguf(cls, path, *, use_quant: bool = True,
                  interpret: bool = False):
        gg = load_gguf(path)
        cfg = config_from_gguf(gg.metadata)
        assert cfg.arch in ("t5", "t5encoder"), cfg.arch
        tok = tokenizer_from_gguf(gg.metadata)
        params = t5_mod.load_t5_params(gg, cfg, use_quant=use_quant)
        return cls(cfg=cfg, tokenizer=tok, params=params, interpret=interpret)

    @property
    def dec_start_id(self) -> int:
        ds = self.cfg.extra.get("dec_start", -1)
        if ds >= 0:
            return ds
        return self.tokenizer.pad_id if self.tokenizer.pad_id >= 0 else 0

    # -------------------------------------------------------------- encoder
    def encode(self, text_or_ids) -> np.ndarray:
        """Run the encoder; returns (T, E) f32 hidden states (the analogue
        of llama_encode + llama_get_embeddings)."""
        ids = (self.tokenizer.encode(text_or_ids)
               if isinstance(text_or_ids, str) else list(text_or_ids))
        if "encode" not in self._fns:
            self._fns["encode"] = jax.jit(
                lambda p, tk: t5_mod.encode(p, self.cfg, tk,
                                            interpret=self.interpret))
        out = self._fns["encode"](self.params, jnp.asarray([ids], jnp.int32))
        return np.asarray(out)[0]

    # -------------------------------------------------------------- decoder
    def decoder_logits(self, dec_ids, enc_out) -> np.ndarray:
        """All-position decoder logits given encoder output — the parity
        harness entry point."""
        kv = t5_mod.make_cache(self.cfg, 1, max(32, len(dec_ids)))
        if "decode" not in self._fns:
            self._fns["decode"] = jax.jit(
                lambda p, tk, kv, eo: t5_mod.forward(
                    p, self.cfg, tk, kv, 0, enc_out=eo,
                    interpret=self.interpret))
        logits, _ = self._fns["decode"](
            self.params, jnp.asarray([dec_ids], jnp.int32), kv,
            jnp.asarray(enc_out)[None].astype(jnp.float32))
        return np.asarray(logits)[0]

    def generate_greedy(self, prompt: str, max_new_tokens: int = 32):
        """encode(prompt) -> greedy decode from dec_start_token."""
        enc_ids = self.tokenizer.encode(prompt)
        enc_out = self.encode(enc_ids)
        dec = [self.dec_start_id]
        eos = self.tokenizer.eos_id
        for _ in range(max_new_tokens):
            logits = self.decoder_logits(dec, enc_out)
            nxt = int(np.argmax(logits[len(dec) - 1]))
            if nxt == eos:
                break
            dec.append(nxt)
        return enc_ids, dec[1:]
