"""HTTP server load benchmark — the examples/server/bench (k6 script)
analogue.

Fires N streaming completion requests at a running server with bounded
concurrency and reports the SLO metrics the reference's k6 scenario
tracks (llama_prompt_tokens / llama_completion_tokens rates, time-to-
first-token and per-request duration percentiles, failure count).

Usage:
    python -m ik_llama_cpp_tpu.tools.server_bench --url 127.0.0.1:8080 \
        -n 32 -c 8 --max-tokens 32 [--prompt-tokens 64] [--json]
"""
from __future__ import annotations

import argparse
import asyncio
import json
import random
import sys
import time


async def _one_request(session_get, url: str, body: dict, out: list):
    import aiohttp
    t0 = time.perf_counter()
    ttft = None
    n_tokens = 0
    try:
        async with session_get().post(f"{url}/completion",
                                      json=body) as resp:
            if resp.status != 200:
                out.append({"ok": False, "status": resp.status})
                return
            async for raw in resp.content:
                line = raw.decode("utf-8", "replace").strip()
                if not line.startswith("data: "):
                    continue
                if ttft is None:
                    ttft = time.perf_counter() - t0
                try:
                    doc = json.loads(line[6:])
                except json.JSONDecodeError:
                    continue
                if doc.get("content"):
                    n_tokens += 1
                if doc.get("stop"):
                    break
        out.append({"ok": True, "ttft": ttft or 0.0,
                    "dur": time.perf_counter() - t0, "n_tokens": n_tokens})
    except Exception as e:
        out.append({"ok": False, "error": str(e)})


def _pct(xs, q):
    if not xs:
        return 0.0
    xs = sorted(xs)
    i = min(len(xs) - 1, int(q * (len(xs) - 1) + 0.5))
    return xs[i]


async def run_bench(url: str, n_requests: int, concurrency: int,
                    max_tokens: int, prompt_tokens: int,
                    seed: int = 0) -> dict:
    import aiohttp
    rng = random.Random(seed)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    sem = asyncio.Semaphore(concurrency)
    out: list[dict] = []
    async with aiohttp.ClientSession() as session:
        async def bounded(i):
            prompt = " ".join(rng.choices(words, k=max(1, prompt_tokens)))
            body = {"prompt": prompt, "n_predict": max_tokens,
                    "stream": True, "temperature": 0.8, "seed": i,
                    "ignore_eos": True}
            async with sem:
                await _one_request(lambda: session, url, body, out)

        t0 = time.perf_counter()
        await asyncio.gather(*(bounded(i) for i in range(n_requests)))
        wall = time.perf_counter() - t0

    ok = [r for r in out if r.get("ok")]
    total_tokens = sum(r["n_tokens"] for r in ok)
    return {
        "requests": n_requests,
        "concurrency": concurrency,
        "succeeded": len(ok),
        "failed": len(out) - len(ok),
        "wall_s": round(wall, 3),
        "req_per_s": round(len(ok) / wall, 2) if wall else 0.0,
        "tokens_per_s": round(total_tokens / wall, 2) if wall else 0.0,
        "ttft_ms": {"p50": round(_pct([r["ttft"] for r in ok], .5) * 1e3, 1),
                    "p95": round(_pct([r["ttft"] for r in ok], .95) * 1e3, 1)},
        "duration_ms": {"p50": round(_pct([r["dur"] for r in ok], .5) * 1e3, 1),
                        "p95": round(_pct([r["dur"] for r in ok], .95) * 1e3, 1)},
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description="server load benchmark")
    ap.add_argument("--url", default="127.0.0.1:8080")
    ap.add_argument("-n", "--requests", type=int, default=16)
    ap.add_argument("-c", "--concurrency", type=int, default=4)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--prompt-tokens", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    url = args.url if args.url.startswith("http") else f"http://{args.url}"
    res = asyncio.run(run_bench(url, args.requests, args.concurrency,
                                args.max_tokens, args.prompt_tokens,
                                seed=args.seed))
    if args.json:
        print(json.dumps(res))
    else:
        print(f"{res['succeeded']}/{res['requests']} ok, "
              f"{res['failed']} failed in {res['wall_s']}s "
              f"({res['req_per_s']} req/s, {res['tokens_per_s']} tok/s)")
        print(f"TTFT p50/p95: {res['ttft_ms']['p50']} / "
              f"{res['ttft_ms']['p95']} ms")
        print(f"duration p50/p95: {res['duration_ms']['p50']} / "
              f"{res['duration_ms']['p95']} ms")
    return res


if __name__ == "__main__":
    main()
