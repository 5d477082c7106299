"""Multi-client simulation test (examples/parallel analogue): more
sequences than slots, all must finish, and single-client output must match
the same request run alone (continuous batching is transparent)."""
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.server.engine import BatchEngine
from ik_llama_cpp_tpu.tools.parallel_sim import run_sim


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    p = make_tiny_llama_gguf(tmp_path_factory.mktemp("par") / "m.gguf",
                             seed=9)
    rt = Runtime.from_gguf(p)
    eng = BatchEngine(rt, n_slots=2, capacity=192)
    eng.start()
    yield eng
    eng.stop()


def test_more_sequences_than_slots(engine):
    results = run_sim(engine, engine.rt.tokenizer, n_sequences=5,
                      n_predict=8, log=lambda *_: None)
    assert len(results) == 5
    for r in results:
        assert r is not None and r["n_decoded"] >= 1
        assert r["t_first_s"] <= r["t_total_s"]


def test_batched_matches_solo(engine):
    """Greedy output for one prompt is identical whether it runs alone or
    alongside other slots (per-slot KV isolation)."""
    import queue
    from ik_llama_cpp_tpu.runtime.sampling import SamplerParams
    from ik_llama_cpp_tpu.server.engine import Request

    def run_one(prompt, concurrent):
        qs = []
        for i, p in enumerate([prompt] + concurrent):
            q = queue.Queue()
            engine.submit(Request(
                prompt_ids=engine.rt.tokenizer.encode(p), n_predict=8,
                sampler=SamplerParams(temp=0.0), stream_queue=q, id=i))
            qs.append(q)
        outs = []
        for q in qs:
            toks = []
            while True:
                tok, _, fin = q.get()
                if tok >= 0:
                    toks.append(tok)
                if fin:
                    break
            outs.append(toks)
        return outs[0]

    solo = run_one("Once upon a time", [])
    busy = run_one("Once upon a time", ["The weather today is",
                                        "In a galaxy far"])
    assert solo == busy
