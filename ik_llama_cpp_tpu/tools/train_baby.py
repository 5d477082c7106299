"""Toy training loop — examples/baby-llama analogue, TPU-first.

The reference's baby-llama builds a small llama from scratch and trains it
with ggml's autograd + Adam (baby-llama.cpp, common/train.cpp).  Here the
same model IS the inference model: float GGUF weights load as DenseLinear
pytree leaves, the standard `models.llama.forward` is differentiable end to
end (dynamic_update_slice KV writes included), so training is jax.grad over
the serving graph + optax.adamw, jit-compiled — no separate training stack.

Usage (synthesizes a copy-task corpus when --text is omitted):
  python -m ik_llama_cpp_tpu.tools.train_baby --gguf f32-model.gguf \
      --steps 50 --seq-len 32 --batch 4 -o trained.gguf
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def loss_fn(params, cfg, tokens, rt):
    """Next-token cross entropy over a fresh (differentiable) KV cache."""
    import jax.numpy as jnp
    from ..models import llama as llama_mod
    b, t = tokens.shape
    kv = llama_mod.KVCache.create(cfg, b, t)
    logits, _ = llama_mod.forward(params, cfg, tokens[:, :-1], kv, 0)
    # numerically stable log-softmax evaluated only at the target logit
    m = logits.max(axis=-1, keepdims=True)
    lse = m[..., 0] + jnp.log(jnp.exp(logits - m).sum(axis=-1))
    tgt = jnp.take_along_axis(logits, tokens[:, 1:, None], axis=-1)[..., 0]
    return (lse - tgt).mean()


def make_batches(ids: np.ndarray, batch: int, seq_len: int, rng):
    starts = rng.integers(0, max(1, len(ids) - seq_len - 1), batch)
    return np.stack([ids[s: s + seq_len] for s in starts]).astype(np.int32)


def train(rt, corpus_ids, *, steps: int = 50, batch: int = 4,
          seq_len: int = 32, lr: float = 1e-3, seed: int = 0,
          log=print):
    """Returns (trained params, [losses]). rt must hold float weights
    (DenseLinear leaves — quantized codes have no gradient)."""
    import jax
    import optax
    from ..models import weights as _W
    cfg = rt.cfg
    ids = np.asarray(corpus_ids, np.int32)
    rng = np.random.default_rng(seed)

    tx = optax.adamw(lr)
    params = rt.params
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg, tokens, rt))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    # force the XLA attention path for the whole training trace: the Pallas
    # flash-attention kernels have no VJP rule (inference-only by design),
    # while ops.attention.attend differentiates end to end
    prev = _W._USE_PALLAS
    _W.set_use_pallas(False)
    try:
        for it in range(steps):
            tokens = make_batches(ids, batch, seq_len + 1, rng)
            params, opt_state, loss = step(params, opt_state, tokens)
            losses.append(float(loss))
            if it % 10 == 0 or it == steps - 1:
                log(f"step {it:4d}  loss {losses[-1]:.4f}")
    finally:
        _W.set_use_pallas(prev)
    return params, losses


def export_f32_gguf(params, cfg, src_gguf_path, out_path):
    """Write trained params back out as an f32 GGUF (standard llama tensor
    names), copying all metadata from the source file — the baby-llama
    'save the trained checkpoint' step. Supports the standard dense-llama
    param layout (DenseLinear leaves + norm arrays + tok_embd)."""
    from ..gguf.reader import load_gguf
    from ..gguf.writer import GGUFWriter

    src = load_gguf(str(src_gguf_path))
    w = GGUFWriter(str(out_path), arch=cfg.arch)
    for k, v in src.metadata.items():
        if k == "general.architecture":
            continue
        w.add(k, v)

    def lin(name, obj):
        # DenseLinear holds (K, N) with K = contraction dim; GGUF rows are
        # output neurons: store (N, K) row-major with ne = (K, N)
        arr = np.asarray(obj.w, np.float32).T
        w.add_tensor(name, np.ascontiguousarray(arr),
                     shape=(arr.shape[1], arr.shape[0]))

    def dense(name, a):
        w.add_tensor(name, np.ascontiguousarray(np.asarray(a, np.float32)))

    dense("token_embd.weight", params["tok_embd"])
    dense("output_norm.weight", params["output_norm"])
    if "output" in params:
        lin("output.weight", params["output"])
    for i, blk in enumerate(params["blocks"]):
        p = f"blk.{i}."
        dense(p + "attn_norm.weight", blk["attn_norm"])
        dense(p + "ffn_norm.weight", blk["ffn_norm"])
        lin(p + "attn_q.weight", blk["wq"])
        lin(p + "attn_k.weight", blk["wk"])
        lin(p + "attn_v.weight", blk["wv"])
        lin(p + "attn_output.weight", blk["wo"])
        lin(p + "ffn_gate.weight", blk["ffn_gate"])
        lin(p + "ffn_up.weight", blk["ffn_up"])
        lin(p + "ffn_down.weight", blk["ffn_down"])
    w.write()
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True, help="float (f32/f16) model")
    ap.add_argument("--text", help="training corpus (default: synthetic)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("-o", "--output", help="write the trained model as an "
                    "f32 GGUF (round-trips through the normal loader)")
    args = ap.parse_args(argv)

    from ..runtime.generate import Runtime
    # fuse=False keeps separate q/k/v tensors so the export maps 1:1
    rt = Runtime.from_gguf(args.gguf, use_quant=False, fuse=False)
    if args.text:
        ids = rt.tokenizer.encode(open(args.text).read())
    else:
        ids = rt.tokenizer.encode("the quick brown fox jumps over the lazy "
                                  "dog " * 64)
    params, losses = train(rt, ids, steps=args.steps, batch=args.batch,
                           seq_len=args.seq_len, lr=args.lr)
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    if args.output:
        export_f32_gguf(params, rt.cfg, args.gguf, args.output)
        print(f"saved {args.output}")
    return 0 if losses[-1] < losses[0] else 1


if __name__ == "__main__":
    sys.exit(main())
