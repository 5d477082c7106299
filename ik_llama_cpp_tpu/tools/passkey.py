"""Long-context passkey retrieval test — examples/passkey analogue.

Buries a random number at a chosen depth inside junk text, asks the model to
repeat it, and checks the generation. Exercises long-context attention +
cache handling end-to-end.

Usage:
  python -m ik_llama_cpp_tpu.tools.passkey -m model.gguf [--junk 250]
      [--pos 0.5] [-c 8192]
"""
from __future__ import annotations

import argparse
import random

from ..runtime.generate import Runtime
from ..runtime.sampling import SamplerParams


def build_prompt(passkey: int, n_junk: int, pos_frac: float) -> str:
    junk = ("The grass is green. The sky is blue. The sun is yellow. "
            "Here we go. There and back again. ")
    key = (f" The pass key is {passkey}. Remember it. "
           f"{passkey} is the pass key. ")
    n_before = int(n_junk * pos_frac)
    return ("There is an important info hidden inside a lot of irrelevant "
            "text. Find it and memorize it. I will quiz you about the "
            "important information there.\n"
            + junk * n_before + key + junk * (n_junk - n_before)
            + "\n What is the pass key? The pass key is")


def run(rt: Runtime, n_junk: int = 250, pos_frac: float = 0.5,
        ctx: int = 8192, seed: int = 0) -> tuple[bool, str, int]:
    passkey = random.Random(seed).randint(10000, 99999)
    prompt = build_prompt(passkey, n_junk, pos_frac)
    _, out = rt.generate(prompt, max_new_tokens=16,
                         sampler=SamplerParams(temp=0.0), capacity=ctx)
    text = rt.tokenizer.decode(out)
    return str(passkey) in text, text, passkey


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--junk", type=int, default=250)
    ap.add_argument("--pos", type=float, default=0.5)
    ap.add_argument("-c", "--ctx", type=int, default=8192)
    ap.add_argument("-s", "--seed", type=int, default=0)
    args = ap.parse_args(argv)
    rt = Runtime.from_gguf(args.model)
    ok, text, key = run(rt, args.junk, args.pos, args.ctx, args.seed)
    print(f"passkey={key} output={text!r}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
