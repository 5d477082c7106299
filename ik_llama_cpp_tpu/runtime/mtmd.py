"""Multimodal runtime — examples/mtmd analogue: splice vision/audio-encoder
outputs into the text stream as embedding tokens.

Prompts use the ``<__image__>`` / ``<__audio__>`` markers
(mtmd_default_marker): text segments are tokenized and embedded normally;
each marker is replaced by the encoder projector's output embeddings (CLIP
patch tokens for images, whisper-encoder frames for audio); the combined
(T, E) embedding sequence is prefilled through the model's
``inputs_embeds`` path (llama_batch.embd), then generation continues
token-by-token.
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from .generate import Runtime, PREFILL_BUCKETS, _bucket, FORWARDS
from .sampling import SamplerParams, SamplerState, sample as sample_token

DEFAULT_MARKER = "<__image__>"
AUDIO_MARKER = "<__audio__>"


def _embed_step(rt: Runtime, chunk: int):
    key = ("embd_in", chunk)
    if key not in rt._step_fns:
        fwd = FORWARDS[rt.cfg.arch]
        cfg, interp = rt.cfg, rt.interpret

        @jax.jit
        def step(params, embds, kv, n_past):
            tokens = jnp.zeros(embds.shape[:2], jnp.int32)
            return fwd(params, cfg, tokens, kv, n_past, interpret=interp,
                       inputs_embeds=embds, logits_last_only=False)

        rt._step_fns[key] = step
    return rt._step_fns[key]


def build_mm_embeds(rt: Runtime, prompt: str, images: list,
                    encoder, marker: str = DEFAULT_MARKER,
                    audio_encoder=None) -> np.ndarray:
    """Tokenize text segments + encode media -> (T, E) f32 embeddings.

    ``images`` holds the media items in marker order: PIL images / (H,W,3)
    arrays for ``<__image__>`` markers, 1-D float32 16 kHz sample arrays for
    ``<__audio__>`` markers. ``encoder`` serves image markers,
    ``audio_encoder`` audio markers (either may be None when that marker
    kind is absent)."""
    pieces = re.split(f"({re.escape(marker)}|{re.escape(AUDIO_MARKER)})",
                      prompt)
    segments = pieces[0::2]
    markers = pieces[1::2]
    if len(markers) != len(images):
        raise ValueError(f"prompt has {len(markers)} media markers but "
                         f"{len(images)} media items were supplied")
    tok_embd = np.asarray(rt.params["tok_embd"], np.float32)
    parts = []
    for i, seg in enumerate(segments):
        if seg:
            ids = rt.tokenizer.encode(seg, add_bos=(i == 0))
            parts.append(tok_embd[np.asarray(ids)])
        elif i == 0 and rt.tokenizer.add_bos and rt.tokenizer.bos_id >= 0:
            parts.append(tok_embd[np.asarray([rt.tokenizer.bos_id])])
        if i < len(markers):
            if markers[i] == AUDIO_MARKER:
                if audio_encoder is None:
                    raise ValueError("audio marker but no audio encoder "
                                     "(mmproj without an audio tower?)")
                mm_embd = audio_encoder.encode(
                    np.asarray(images[i], np.float32))
            else:
                if encoder is None:
                    raise ValueError("image marker but no vision encoder")
                mm_embd = encoder.encode(images[i])       # (P, E_text)
            if mm_embd.shape[1] != tok_embd.shape[1]:
                raise ValueError(
                    f"projector dim {mm_embd.shape[1]} != model n_embd "
                    f"{tok_embd.shape[1]} — wrong mmproj for this model?")
            parts.append(mm_embd)
    return np.concatenate(parts, axis=0).astype(np.float32)


def eval_embeds(rt: Runtime, embds: np.ndarray, kv, n_past: int = 0):
    """Prefill a (T, E) embedding sequence; returns (last_logits, kv, n_past)."""
    t = embds.shape[0]
    i = 0
    last = None
    while i < t:
        chunk = embds[i:i + PREFILL_BUCKETS[-1]]
        b = _bucket(len(chunk))
        padded = np.zeros((1, b, embds.shape[1]), np.float32)
        padded[0, :len(chunk)] = chunk
        step = _embed_step(rt, b)
        logits, kv = step(rt.params, jnp.asarray(padded), kv, jnp.int32(n_past))
        last = np.asarray(logits[0, len(chunk) - 1])
        n_past += len(chunk)
        i += len(chunk)
    return last, kv, n_past


def generate_mm(rt: Runtime, prompt: str, images: list, encoder, *,
                max_new_tokens: int = 64, sampler: SamplerParams | None = None,
                seed: int = 0, capacity: int = 2048,
                marker: str = DEFAULT_MARKER,
                audio_encoder=None) -> tuple[int, list[int]]:
    """Multimodal generation; returns (n_prompt_positions, generated ids)."""
    sampler = sampler or SamplerParams(temp=0.0)
    embds = build_mm_embeds(rt, prompt, images, encoder, marker,
                            audio_encoder=audio_encoder)
    capacity = max(capacity, embds.shape[0] + max_new_tokens + 8)
    kv = rt.new_cache(1, capacity)
    logits, kv, n_past = eval_embeds(rt, embds, kv, 0)
    rng = np.random.default_rng(seed)
    state = SamplerState()
    out: list[int] = []
    for _ in range(max_new_tokens):
        tok = sample_token(logits, sampler, rng, history=out, state=state)
        out.append(int(tok))
        if tok == rt.tokenizer.eos_id:
            break
        lg, kv, n_past = rt.eval_tokens([int(tok)], kv, n_past)
        logits = lg[-1]
    return embds.shape[0], out
