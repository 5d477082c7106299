"""Minimal library usage — the examples/simple analogue.

The smallest end-to-end program: load a GGUF, tokenize a prompt, evaluate
it, and greedily decode N tokens with direct calls (no sampler chain, no
server) — the same teaching role as examples/simple/simple.cpp.

    python examples/simple.py model.gguf "Hello my name is" 16
"""
import sys

import numpy as np

from ik_llama_cpp_tpu.runtime.generate import Runtime


def main():
    model_path = sys.argv[1]
    prompt = sys.argv[2] if len(sys.argv) > 2 else "Hello my name is"
    n_predict = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    # 1. load the model (mmap + dequant-to-planar + jit warmup)
    rt = Runtime.from_gguf(model_path)

    # 2. tokenize
    ids = rt.tokenizer.encode(prompt)
    print(f"prompt tokens: {ids}", file=sys.stderr)

    # 3. allocate a KV cache and evaluate the prompt
    kv = rt.new_cache(batch=1, capacity=len(ids) + n_predict)
    logits, kv, n_past = rt.eval_tokens(ids, kv, 0)

    # 4. greedy decode loop
    out = []
    for _ in range(n_predict):
        tok = int(np.argmax(logits[-1]))
        if rt.tokenizer.eos_id is not None and tok == rt.tokenizer.eos_id:
            break
        out.append(tok)
        logits, kv, n_past = rt.eval_tokens([tok], kv, n_past)

    print(rt.tokenizer.decode(ids), end="")
    print(rt.tokenizer.decode(out))
    print(f"\n[{len(out)} tokens generated]", file=sys.stderr)


if __name__ == "__main__":
    main()
