"""llama-cli equivalent: one-shot generation or interactive REPL.

Usage:
  python -m ik_llama_cpp_tpu.tools.cli -m model.gguf -p "prompt" -n 64 --temp 0.7
  python -m ik_llama_cpp_tpu.tools.cli -m model.gguf -i            # interactive
"""
from __future__ import annotations

import argparse
import sys
import time

from ..runtime.generate import Runtime
from ..runtime.sampling import SamplerParams


def main(argv=None):
    ap = argparse.ArgumentParser(prog="llama-cli (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("-s", "--seed", type=int, default=-1)
    ap.add_argument("-i", "--interactive", action="store_true")
    ap.add_argument("-ctk", "--cache-type",
                    choices=["bf16", "q8", "q6", "q4", "iq4_nl"], default="bf16")
    ap.add_argument("--cache-type-first", metavar="CODEC:N",
                    help="override codec for the FIRST N layers, e.g. "
                         "'q8:1' (llama.h first/last KV-type overrides)")
    ap.add_argument("--cache-type-last", metavar="CODEC:N",
                    help="override codec for the LAST N layers")
    ap.add_argument("-khad", "--k-hadamard", action="store_true",
                    help="Hadamard-rotate K (+q) before KV quantization "
                         "(outlier taming; reference -khad)")
    ap.add_argument("-vhad", "--v-hadamard", action="store_true",
                    help="Hadamard-rotate V before KV quantization "
                         "(reference -vhad)")
    ap.add_argument("--swa-compress", action="store_true",
                    help="ring caches on sliding-window layers "
                         "(llama.cpp --swa-compress)")
    ap.add_argument("--i8-mxu", action="store_true",
                    help="int8 x int8 MXU matmuls with on-the-fly "
                         "activation quantization (Q8_K-activation "
                         "analogue; supergroup-requantized weights)")
    ap.add_argument("--lookahead", action="store_true",
                    help="lookahead decoding (Jacobi window + n-gram "
                         "verification, examples/lookahead)")
    ap.add_argument("--profile-dir", metavar="DIR",
                    help="capture a jax.profiler (XPlane) trace of the run "
                         "into DIR; view with tensorboard/xprof")
    ap.add_argument("--prompt-cache", help="session file: restore the KV state "
                    "if it exists, save it after generation (main.cpp "
                    "--prompt-cache parity)")
    ap.add_argument("-sml", "--layer-split", type=int, default=0,
                    help="-sm layer analogue: contiguous layer ranges over "
                    "N chips, one activation hop per boundary "
                    "(parallel/pp.py; capacity over collectives)")
    args = ap.parse_args(argv)

    t0 = time.time()
    if args.i8_mxu:
        from ..models.weights import set_i8_mxu
        set_i8_mxu(True)
    kvq = False if args.cache_type == "bf16" else args.cache_type
    if args.cache_type_first or args.cache_type_last:
        spec = {"type": args.cache_type if kvq else "q8"}
        for key, v in (("first", args.cache_type_first),
                       ("last", args.cache_type_last)):
            if v:
                codec, _, n = v.partition(":")
                spec[key] = codec
                spec["n_" + key] = int(n or 1)
        kvq = spec
    rt = Runtime.from_gguf(args.model, kv_quant=kvq,
                           swa_compress=args.swa_compress,
                           layer_split=args.layer_split,
                           k_hadamard=args.k_hadamard,
                           v_hadamard=args.v_hadamard)
    print(f"model loaded in {time.time() - t0:.1f}s "
          f"(arch={rt.cfg.arch}, n_layer={rt.cfg.n_layer}, "
          f"n_embd={rt.cfg.n_embd}, vocab={rt.cfg.n_vocab})", file=sys.stderr)

    sampler = SamplerParams(temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                            min_p=args.min_p, penalty_repeat=args.repeat_penalty)
    seed = args.seed if args.seed >= 0 else int(time.time()) % 2**31

    def run(prompt: str):
        import os
        import numpy as np
        from ..runtime.sampling import SamplerState, sample as sample_token
        from ..runtime.state import load_state, save_state
        if args.lookahead:
            from ..runtime.lookahead import generate_lookahead
            t1 = time.time()
            _, out, st = generate_lookahead(
                rt, prompt, args.n_predict, sampler=sampler, seed=seed,
                capacity=args.ctx_size)
            dt = time.time() - t1
            print(rt.tokenizer.decode(out))
            print(f"\n[lookahead: {len(out)} tokens, {len(out) / dt:.2f} "
                  f"tok/s, {st.n_rounds} rounds, "
                  f"{100 * st.accept_rate:.1f}% gram-accepted]",
                  file=sys.stderr)
            return
        t1 = time.time()
        ids = rt.tokenizer.encode(prompt)
        kv = rt.new_cache(1, args.ctx_size)
        n_past = 0
        prefix = 0
        if args.prompt_cache and os.path.exists(args.prompt_cache):
            cached_ids, n_past, kv = load_state(args.prompt_cache, kv)
            for a_, b_ in zip(cached_ids, ids):
                if a_ != b_:
                    break
                prefix += 1
            prefix = min(prefix, n_past, len(ids) - 1)
            n_past = prefix
            print(f"session: reused {prefix} cached tokens", file=sys.stderr)
        logits, kv, n_past = rt.eval_tokens(ids[prefix:], kv, n_past)
        rng = np.random.default_rng(seed)
        st = SamplerState()
        out = []
        for _ in range(args.n_predict):
            tok = sample_token(logits[-1], sampler, rng, history=ids + out,
                               state=st)
            out.append(int(tok))
            if tok == rt.tokenizer.eos_id:
                break
            logits, kv, n_past = rt.eval_tokens([int(tok)], kv, n_past)
        if args.prompt_cache:
            save_state(args.prompt_cache, ids + out, n_past, kv)
        dt = time.time() - t1
        text = rt.tokenizer.decode(out)
        print(text)
        print(f"\n[{len(ids)} prompt + {len(out)} generated tokens, "
              f"{len(out) / dt:.2f} tok/s]", file=sys.stderr)

    import contextlib
    from ..runtime.timings import trace
    prof = trace(args.profile_dir) if args.profile_dir \
        else contextlib.nullcontext()
    with prof:
        if args.interactive:
            print("interactive mode — empty line to exit", file=sys.stderr)
            while True:
                try:
                    line = input("> ")
                except (EOFError, KeyboardInterrupt):
                    break
                if not line.strip():
                    break
                run(line)
        else:
            run(args.prompt)
    if args.profile_dir:
        print(f"profiler trace written to {args.profile_dir}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
