"""Intermediate-tensor dump — examples/eval-callback analogue.

Runs a prompt and dumps every layer's hidden state (plus final-norm output
and logits) to an .npz, printing per-tensor summaries like the reference's
ggml_backend_sched_eval_callback dumper.

Usage:
  python -m ik_llama_cpp_tpu.tools.eval_callback -m model.gguf -p "text"
      [-o dump.npz]
"""
from __future__ import annotations

import argparse

import numpy as np

from ..runtime.generate import Runtime


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="Hello world")
    ap.add_argument("-o", "--out", default="")
    args = ap.parse_args(argv)

    rt = Runtime.from_gguf(args.model)
    ids = rt.tokenizer.encode(args.prompt)
    hiddens = rt.layer_hiddens(ids)           # (L, T, E)
    logits = rt.all_position_logits(ids)

    dump = {}
    for il in range(hiddens.shape[0]):
        h = hiddens[il]
        dump[f"l_out-{il}"] = h
        print(f"l_out-{il}: shape {h.shape} dtype f32 "
              f"min {h.min():+.4f} max {h.max():+.4f} "
              f"mean {h.mean():+.4f} rms {np.sqrt((h ** 2).mean()):.4f}")
    dump["result_output"] = logits
    print(f"result_output: shape {logits.shape} "
          f"min {logits.min():+.4f} max {logits.max():+.4f}")
    if args.out:
        np.savez_compressed(args.out, tokens=np.asarray(ids, np.int32), **dump)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
