"""Multi-client decoding simulation — examples/parallel analogue.

Simulates N clients firing S question sequences at the continuous-batching
engine (parallel.cpp: clients submit, slots process in parallel, per-client
latency + aggregate throughput are reported).  Exercises slot reuse,
queueing beyond the slot count, and mixed prompt/decode batching — the
stress shape the reference uses to validate its batch scheduler.

Usage:
  python -m ik_llama_cpp_tpu.tools.parallel_sim -m model.gguf \
      --parallel 4 --sequences 16 -n 32
"""
from __future__ import annotations

import argparse
import queue
import sys
import threading
import time

DEFAULT_QUESTIONS = [
    "What is the meaning of life?",
    "Tell me an interesting fact about llamas.",
    "What is the best way to cook a steak?",
    "Are you familiar with the Special Theory of Relativity?",
    "Recommend some interesting books to read.",
    "What is the best way to learn a new language?",
    "How to get a job at Google?",
    "If you could have any superpower, what would it be?",
    "I want to learn how to play the piano.",
]


def run_sim(engine, tokenizer, *, n_sequences: int, n_predict: int,
            questions=None, seed: int = 0, log=print):
    """Returns per-sequence stats dicts; blocks until every sequence
    finishes."""
    from ..runtime.sampling import SamplerParams
    from ..server.engine import Request
    questions = questions or DEFAULT_QUESTIONS
    results = [None] * n_sequences
    done = threading.Semaphore(0)

    def client(i):
        q: queue.Queue = queue.Queue()
        prompt = questions[i % len(questions)]
        ids = tokenizer.encode(prompt)
        t0 = time.perf_counter()
        req = Request(prompt_ids=ids, n_predict=n_predict,
                      sampler=SamplerParams(temp=0.0), seed=seed + i,
                      stream_queue=q, id=i)
        engine.submit(req)
        first = None
        n_out = 0
        while True:
            tok, piece, fin = q.get()
            if tok >= 0:
                n_out += 1
                if first is None:
                    first = time.perf_counter()
            if fin:
                break
        t1 = time.perf_counter()
        results[i] = {"id": i, "prompt": prompt, "n_prompt": len(ids),
                      "n_decoded": n_out,
                      "t_first_s": round((first or t1) - t0, 3),
                      "t_total_s": round(t1 - t0, 3)}
        done.release()

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_sequences)]
    for t in threads:
        t.start()
    for _ in range(n_sequences):
        done.acquire()
    wall = time.perf_counter() - t_start
    tot_p = sum(r["n_prompt"] for r in results)
    tot_d = sum(r["n_decoded"] for r in results)
    log(f"run parameters: n_parallel = {engine.n_slots}, "
        f"n_sequences = {n_sequences}")
    for r in results:
        log(f"  seq {r['id']:3d}: prompt {r['n_prompt']:4d} t, decoded "
            f"{r['n_decoded']:4d} t, ttft {r['t_first_s']:6.3f}s, total "
            f"{r['t_total_s']:6.3f}s")
    log(f"total: {tot_p} prompt + {tot_d} decoded tokens in {wall:.2f}s "
        f"= {(tot_p + tot_d) / wall:.2f} t/s aggregate")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-np", "--parallel", type=int, default=4)
    ap.add_argument("-ns", "--sequences", type=int, default=8)
    ap.add_argument("-n", "--n-predict", type=int, default=32)
    ap.add_argument("-c", "--ctx-size", type=int, default=1024)
    ap.add_argument("-f", "--file", help="file with one question per line")
    args = ap.parse_args(argv)

    from ..runtime.generate import Runtime
    from ..server.engine import BatchEngine
    rt = Runtime.from_gguf(args.model)
    engine = BatchEngine(rt, n_slots=args.parallel, capacity=args.ctx_size)
    engine.start()
    questions = None
    if args.file:
        questions = [ln.strip() for ln in open(args.file) if ln.strip()]
    try:
        run_sim(engine, rt.tokenizer, n_sequences=args.sequences,
                n_predict=args.n_predict, questions=questions)
    finally:
        engine.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
