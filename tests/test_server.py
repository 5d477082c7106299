"""Server integration tests: boots the real HTTP server on a tiny model and
exercises the endpoints (the analogue of examples/server/tests BDD features)."""
import json
import socket
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import pytest

from fixtures import make_tiny_llama_gguf

REPO = Path(__file__).resolve().parent.parent


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def req(port, path, body=None, raw=False):
    url = f"http://127.0.0.1:{port}{path}"
    if body is None:
        r = urllib.request.urlopen(url, timeout=30)
    else:
        r = urllib.request.urlopen(urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}), timeout=60)
    data = r.read()
    return data if raw else json.loads(data)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    work = tmp_path_factory.mktemp("srv")
    model = make_tiny_llama_gguf(work / "m.gguf", seed=1)
    port = free_port()
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "PYTHONPATH": str(REPO)}
    proc = subprocess.Popen(
        [sys.executable, "-m", "ik_llama_cpp_tpu.server", "--gguf", str(model),
         "--port", str(port), "--parallel", "2", "--ctx-size", "256",
         "--slot-save-path", str(work),
         "--sql-save-file", str(work / "sessions.db")],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    for _ in range(120):
        try:
            req(port, "/health")
            break
        except Exception:
            if proc.poll() is not None:
                raise RuntimeError(proc.stderr.read().decode()[-2000:])
            time.sleep(0.5)
    else:
        proc.kill()
        raise RuntimeError("server did not start")
    yield port
    proc.terminate()


def test_health_props_models(server):
    assert req(server, "/health")["status"] == "ok"
    props = req(server, "/props")
    assert props["arch"] == "llama" and props["n_parallel"] == 2
    models = req(server, "/v1/models")
    assert models["data"][0]["object"] == "model"


def test_tokenize_roundtrip(server):
    r = req(server, "/tokenize", {"content": "Hello world"})
    assert isinstance(r["tokens"], list) and len(r["tokens"]) > 2
    d = req(server, "/detokenize", {"tokens": r["tokens"]})
    assert "Hello" in d["content"]


def test_completion(server):
    r = req(server, "/completion",
            {"prompt": "Once upon", "n_predict": 6, "temperature": 0})
    assert r["stop"] is True
    assert r["tokens_predicted"] >= 1


def test_oai_chat_completion(server):
    r = req(server, "/v1/chat/completions",
            {"messages": [{"role": "user", "content": "Hi"}],
             "max_tokens": 5, "temperature": 0})
    assert r["object"] == "chat.completion"
    assert r["choices"][0]["message"]["role"] == "assistant"
    assert r["usage"]["completion_tokens"] >= 1


def test_responses_api(server):
    r = req(server, "/v1/responses",
            {"input": "Hi", "max_output_tokens": 5, "temperature": 0})
    assert r["object"] == "response" and r["status"] == "completed"
    msg = [o for o in r["output"] if o["type"] == "message"]
    assert msg and msg[0]["role"] == "assistant"
    assert msg[0]["content"][0]["type"] == "output_text"
    assert r["usage"]["output_tokens"] >= 1


def test_responses_api_stream(server):
    url = f"http://127.0.0.1:{server}/v1/responses"
    body = json.dumps({"input": [{"role": "user", "content": "Hi"}],
                       "max_output_tokens": 4, "stream": True}).encode()
    r = urllib.request.urlopen(urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}),
        timeout=60)
    events = [e for e in r.read().decode().split("\n\n") if e.strip()]
    names = [e.split("\n", 1)[0].removeprefix("event: ") for e in events]
    assert names[0] == "response.created"
    assert "response.output_text.delta" in names
    assert names[-1] == "response.completed"   # no [DONE] for this API
    for e in events:                            # every data line is json
        json.loads(e.split("data: ", 1)[1])


def test_responses_api_error(server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        req(server, "/v1/responses",
            {"input": "x", "previous_response_id": "r_1"})
    assert ei.value.code == 400


def test_version_and_props_simple(server):
    v = req(server, "/version")
    assert v["version"] == 4 and v["features"]["sql"] is True
    p = req(server, "/v1/props")
    assert p["model_name"] and "modalities" in p
    assert req(server, "/models")["data"][0]["object"] == "model"


def test_saved_prompt_management(server):
    req(server, "/completion", {"prompt": "Saved prompt", "n_predict": 2})
    req(server, "/slots/0?action=save", {"filename": "t_mgmt.bin"})
    names = [f["filename"] for f in req(server, "/list")]
    assert "t_mgmt.bin" in names
    listing = req(server, "/slots/list")
    assert any(s["token_count"] > 0 for s in listing)
    req(server, "/rename_prompt", {"old_filename": "t_mgmt.bin",
                                   "new_filename": "t_mgmt2.bin"})
    names = [f["filename"] for f in req(server, "/list")]
    assert "t_mgmt2.bin" in names and "t_mgmt.bin" not in names
    r = req(server, "/delete_prompt", {"filename": "t_mgmt2.bin"})
    assert r["status"] == "deleted"
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        req(server, "/delete_prompt", {"filename": "../etc/passwd"})
    assert ei.value.code == 400


def test_session_db(server):
    req(server, "/save", {"storeName": "sessions", "key": "s1",
                          "data": {"msgs": [1, 2]}})
    req(server, "/save", {"storeName": "names", "key": "s1",
                          "data": "My chat"})
    assert req(server, "/load", {"storeName": "sessions",
                                 "key": "s1"})["result"] == {"msgs": [1, 2]}
    assert req(server, "/sessions", {})["result"] == {"s1": "My chat"}
    req(server, "/rename", {"key": "s1", "newName": "Renamed"})
    assert req(server, "/sessions", {})["result"]["s1"] == "Renamed"
    assert "s1" in req(server, "/all", {"storeName": "sessions"})["result"]
    req(server, "/delete", {"storeName": "sessions", "key": "s1"})
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        req(server, "/load", {"storeName": "sessions", "key": "s1"})
    assert req(server, "/vacuum")["ok"] is True


def test_control_vectors(server, tmp_path):
    import numpy as np
    from ik_llama_cpp_tpu.runtime.cvector import write_control_vector
    props = req(server, "/props")
    dirs = np.ones((props["n_layer"], props["n_embd"]), np.float32) * 0.01
    cv_path = str(write_control_vector(tmp_path / "cv.gguf", dirs))
    r = req(server, "/control-vectors/load", {"path": cv_path, "scale": 0.5})
    assert r["success"] is True
    lst = req(server, "/control-vectors")
    assert lst[0]["scale"] == 0.5 and lst[0]["applied"] is True
    # steering changes the generated logits path but must not crash decode
    out = req(server, "/completion",
              {"prompt": "steered", "n_predict": 2, "temperature": 0})
    assert out["tokens_predicted"] >= 1
    req(server, "/control-vectors/apply", [{"id": 0, "scale": 0.0}])
    assert req(server, "/control-vectors")[0]["applied"] is False
    assert req(server, "/control-vectors/unload", {"id": 0})["success"]
    assert req(server, "/control-vectors") == []


def test_anthropic_messages(server):
    r = req(server, "/v1/messages",
            {"messages": [{"role": "user", "content": "Hi"}], "max_tokens": 4})
    assert r["type"] == "message"
    assert r["content"][0]["type"] == "text"


def test_concurrent_requests(server):
    import concurrent.futures as cf
    def one(i):
        return req(server, "/v1/completions",
                   {"prompt": f"Request {i}", "max_tokens": 8, "seed": i})
    with cf.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(one, range(4)))
    for r in results:
        assert r["choices"][0]["finish_reason"] == "stop"
    m = req(server, "/metrics", raw=True).decode()
    assert "llamacpp:requests_total" in m


def test_streaming(server):
    url = f"http://127.0.0.1:{server}/v1/completions"
    body = json.dumps({"prompt": "Stream", "max_tokens": 4, "stream": True}).encode()
    r = urllib.request.urlopen(urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}), timeout=60)
    events = r.read().decode().strip().split("\n\n")
    assert events[-1] == "data: [DONE]"
    assert len(events) >= 2


def test_embeddings_native(server):
    r = req(server, "/embeddings", {"content": "hello world"})
    e = r["embedding"]
    assert len(e) == 64 or len(e) > 8          # n_embd of tiny fixture
    import math
    assert abs(sum(x * x for x in e) - 1.0) < 1e-3   # normalized


def test_oai_embeddings(server):
    r = req(server, "/v1/embeddings", {"input": ["a b c", "d e f"]})
    assert r["object"] == "list" and len(r["data"]) == 2
    assert r["data"][1]["index"] == 1
    assert r["usage"]["prompt_tokens"] > 0


def test_rerank(server):
    r = req(server, "/rerank",
            {"query": "apple fruit", "documents": ["apple pie", "quantum physics"],
             "top_n": 2})
    assert len(r["results"]) == 2
    scores = [x["relevance_score"] for x in r["results"]]
    assert scores == sorted(scores, reverse=True)


def test_apply_template(server):
    r = req(server, "/apply-template",
            {"messages": [{"role": "user", "content": "Hi"}]})
    assert "Hi" in r["prompt"]


def test_infill_no_fim_tokens(server):
    # tiny fixture has no FIM specials -> clean 400, not a crash
    import urllib.error
    try:
        req(server, "/infill", {"input_prefix": "def f(", "input_suffix": "\n"})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_slot_save_restore_endpoint(server):
    # generate something into slot 0 first
    req(server, "/completion", {"prompt": "persist me", "n_predict": 3,
                                "temperature": 0})
    r = req(server, "/slots/0?action=save", {"filename": "t_slot0.bin"})
    assert r["n_saved"] >= 1
    r2 = req(server, "/slots/0?action=erase", {})
    assert r2["n_erased"] >= 1
    r3 = req(server, "/slots/0?action=restore", {"filename": "t_slot0.bin"})
    assert r3["n_restored"] == r["n_saved"]


def test_anthropic_count_tokens(server):
    r = req(server, "/v1/messages/count_tokens",
            {"messages": [{"role": "user", "content": "Hello there"}]})
    assert r["input_tokens"] > 2


def test_anthropic_streaming(server):
    url = f"http://127.0.0.1:{server}/v1/messages"
    body = json.dumps({"messages": [{"role": "user", "content": "Hi"}],
                       "max_tokens": 4, "stream": True}).encode()
    r = urllib.request.urlopen(urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}), timeout=60)
    text = r.read().decode()
    assert "event: message_start" in text
    assert "event: content_block_delta" in text
    assert "event: message_stop" in text


def test_api_key_auth(tmp_path_factory):
    model = make_tiny_llama_gguf(tmp_path_factory.mktemp("auth") / "m.gguf", seed=1)
    port = free_port()
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "PYTHONPATH": str(REPO)}
    import subprocess, sys
    proc = subprocess.Popen(
        [sys.executable, "-m", "ik_llama_cpp_tpu.server", "--gguf", str(model),
         "--port", str(port), "--api-key", "sekrit"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        for _ in range(120):
            try:
                req(port, "/health")
                break
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError(proc.stderr.read().decode()[-2000:])
                time.sleep(0.5)
        # no key -> 401
        import urllib.error
        try:
            req(port, "/props")
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401
        # with key -> ok
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/props",
            headers={"Authorization": "Bearer sekrit"}), timeout=30)
        assert json.loads(r.read())["arch"] == "llama"
    finally:
        proc.terminate()


def test_anthropic_tool_use_roundtrip(server):
    # tool_result block in input must flatten without error
    r = req(server, "/v1/messages",
            {"messages": [
                {"role": "user", "content": [{"type": "text", "text": "hi"}]},
                {"role": "assistant", "content": [
                    {"type": "tool_use", "id": "t1", "name": "f",
                     "input": {"x": 1}}]},
                {"role": "user", "content": [
                    {"type": "tool_result", "tool_use_id": "t1",
                     "content": [{"type": "text", "text": "42"}]}]},
            ],
             "tools": [{"name": "f", "description": "fn",
                        "input_schema": {"type": "object"}}],
             "max_tokens": 4})
    assert r["type"] == "message"
    assert r["content"][0]["type"] in ("text", "thinking", "tool_use")


def test_props_chat_template(server):
    p = req(server, "/props")
    assert "default_generation_settings" in p
    assert p["total_slots"] == 2


def test_engine_speculative_matches_plain(tmp_path):
    """BatchEngine with ngram self-speculation must produce the SAME greedy
    tokens as the plain decode loop, with draft tokens accepted (the
    reference's in-update_slots drafting, server-context.cpp:3564-3599)."""
    import queue as _q
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.runtime.sampling import SamplerParams
    from ik_llama_cpp_tpu.server.engine import BatchEngine, Request

    model = make_tiny_llama_gguf(tmp_path / "spec.gguf", seed=5)
    rt = Runtime.from_gguf(model)
    # a repetitive prompt so the ngram drafter has something to propose
    ids = rt.tokenizer.encode("one two three one two three one two three")

    def run(spec):
        eng = BatchEngine(rt, n_slots=2, capacity=256, spec=spec, spec_n=4)
        out_q = _q.Queue()
        eng.submit(Request(prompt_ids=list(ids), n_predict=24,
                           sampler=SamplerParams(temp=0.0),
                           stream_queue=out_q))
        eng.start()
        toks = []
        while True:
            tok, piece, done = out_q.get(timeout=120)
            toks.append(tok)
            if done:
                break
        eng.stop()
        return toks, eng

    plain, _ = run(None)
    spec, eng = run("ngram")
    assert spec == plain, (spec, plain)
    assert eng.n_draft_proposed > 0
    assert eng.n_draft_accepted > 0, "repetitive text must accept drafts"


def test_engine_speculative_recurrent_matches_plain(tmp_path):
    """BatchEngine speculative decoding on a RECURRENT (SSM) model: partial
    draft rejections must roll the per-slot recurrent state back via the
    checkpoint-replay path (_fix_recurrent_state) — greedy output must
    equal the plain decode loop exactly (the analogue of the reference's
    recurrent per-step checkpoints, speculative.h:27-35). Deterministic
    drafters force both the all-rejected and all-accepted branches."""
    import queue as _q
    from fixtures import make_tiny_mamba_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.runtime.sampling import SamplerParams
    from ik_llama_cpp_tpu.server.engine import BatchEngine, Request

    model = make_tiny_mamba_gguf(tmp_path / "specm.gguf", seed=5)
    rt = Runtime.from_gguf(model)
    assert rt.recurrent
    ids = [5, 9, 12, 5, 9, 12, 5, 9, 12, 5, 9]

    def run(drafter_factory, spec):
        eng = BatchEngine(rt, n_slots=2, capacity=256, spec=spec, spec_n=4)
        if drafter_factory is not None:
            eng._new_drafter = drafter_factory
        out_q = _q.Queue()
        eng.submit(Request(prompt_ids=list(ids), n_predict=20,
                           sampler=SamplerParams(temp=0.0),
                           stream_queue=out_q))
        eng.start()
        toks = []
        while True:
            tok, piece, done = out_q.get(timeout=180)
            toks.append(tok)
            if done:
                break
        eng.stop()
        return toks, eng

    plain, _ = run(None, None)

    class BadDraft:   # every draft rejected -> replay path every round
        def propose(self, tokens, n):
            return [0] * n

    class OracleDraft:  # drafts the true continuation -> full acceptance
        def propose(self, tokens, n):
            gen = len(tokens) - len(ids)
            return list(plain[gen:gen + n])

    rejected, eng_r = run(lambda: BadDraft(), "ngram")
    assert rejected == plain, (rejected, plain)
    assert eng_r.n_draft_proposed > 0
    assert eng_r.n_draft_accepted == 0 or rejected == plain

    accepted, eng_a = run(lambda: OracleDraft(), "ngram")
    assert accepted == plain, (accepted, plain)
    assert eng_a.n_draft_accepted > 0


def test_session_db_custom_store(server):
    """Any normalized store name gets its table created on demand instead
    of an unhandled sqlite OperationalError (regression)."""
    r = req(server, "/save", {"storeName": "mydata", "key": "k",
                              "data": {"v": 1}})
    assert r["ok"]
    assert req(server, "/load", {"storeName": "mydata",
                                 "key": "k"})["result"] == {"v": 1}


def test_cvec_apply_invalid_id_leaves_state(server):
    """A bad id in /control-vectors/apply must not zero the scales of the
    loaded vectors before failing (regression)."""
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        req(server, "/control-vectors/apply", [{"id": 99, "scale": 1.0}])
    assert e.value.code == 400


def test_profiler_endpoints(server, tmp_path_factory):
    """POST /profiler/start + /profiler/stop capture an XPlane trace of the
    live serving workload."""
    d = str(tmp_path_factory.mktemp("prof"))
    r = req(server, "/profiler/start", {"dir": d})
    assert r["success"]
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):   # double-start -> 400
        req(server, "/profiler/start", {"dir": d})
    req(server, "/v1/completions", {"prompt": "hi", "max_tokens": 2})
    r = req(server, "/profiler/stop", {})
    assert r["success"] and r["dir"] == d
    import pathlib
    assert any(pathlib.Path(d).rglob("*.xplane.pb"))
    with pytest.raises(urllib.error.HTTPError):   # stop when idle -> 400
        req(server, "/profiler/stop", {})


def test_grammar_constrained_completion(server):
    """Native `grammar` field constrains generation (server.cpp grammar
    param); output must match the GBNF exactly."""
    g = 'root ::= "yes" | "no"'
    r = req(server, "/completion", {"prompt": "Answer:", "grammar": g,
                                    "n_predict": 8, "temperature": 0.9})
    assert r["content"] in ("yes", "no"), r["content"]


def test_json_schema_response_format(server):
    """OpenAI response_format json_schema produces schema-valid JSON."""
    schema = {"type": "object", "properties": {"n": {"type": "integer"}},
              "required": ["n"]}
    r = req(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "give a number"}],
        "max_tokens": 48, "temperature": 0.9,
        "response_format": {"type": "json_schema",
                            "json_schema": {"schema": schema}}})
    out = r["choices"][0]["message"]["content"]
    doc = json.loads(out)
    assert isinstance(doc, dict) and isinstance(doc.get("n"), int), out


def test_invalid_grammar_is_400(server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        req(server, "/completion", {"prompt": "x",
                                    "grammar": 'foo ::= "a"'})  # no root
    assert e.value.code == 400


def test_completion_n_probs(server):
    """Native n_probs returns per-token top probabilities
    (completion_probabilities, server.cpp n_probs)."""
    r = req(server, "/completion", {"prompt": "hello", "n_predict": 3,
                                    "n_probs": 4, "temperature": 0.0,
                                    "ignore_eos": True})
    cp = r["completion_probabilities"]
    assert len(cp) == 3 and len(cp[0]["probs"]) == 4
    ps = [x["prob"] for x in cp[0]["probs"]]
    assert ps == sorted(ps, reverse=True) and 0 <= ps[0] <= 1
    # greedy: the chosen token is the top-1 candidate
    assert cp[0]["content"] == cp[0]["probs"][0]["tok_str"]


def test_oai_logprobs(server):
    """OpenAI completions `logprobs: N` and chat `logprobs+top_logprobs`."""
    r = req(server, "/v1/completions", {"prompt": "hi", "max_tokens": 2,
                                        "logprobs": 3, "temperature": 0.0,
                                        "ignore_eos": True})
    lp = r["choices"][0]["logprobs"]
    # top_logprobs is a {token_str: logprob} dict — identical decoded
    # strings (byte-fallback tokens on the tiny vocab) may collide
    assert len(lp["tokens"]) == 2 and 1 <= len(lp["top_logprobs"][0]) <= 3, r
    assert lp["token_logprobs"][0] <= 0.0

    r = req(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}], "max_tokens": 2,
        "logprobs": True, "top_logprobs": 2, "temperature": 0.0,
        "ignore_eos": True})
    entries = r["choices"][0]["logprobs"]["content"]
    assert len(entries) == 2 and len(entries[0]["top_logprobs"]) == 2, r


def test_ignore_eos_and_min_keep(server):
    """ignore_eos keeps generating past EOS; min_keep floors truncation."""
    r = req(server, "/completion", {"prompt": "x", "n_predict": 8,
                                    "ignore_eos": True, "temperature": 0.0})
    assert r["tokens_predicted"] == 8
    r = req(server, "/completion", {"prompt": "x", "n_predict": 4,
                                    "top_k": 1, "min_keep": 3,
                                    "temperature": 0.9, "seed": 7})
    assert r["tokens_predicted"] == 4


def test_banned_strings_rewind(server):
    """banned_strings rewinds and resamples so the output avoids the
    phrase (server-context.cpp rewind feature)."""
    r0 = req(server, "/completion", {"prompt": "the quick", "n_predict": 10,
                                     "temperature": 0.0, "ignore_eos": True})
    base = r0["content"]
    if len(base) < 6:
        pytest.skip("no usable text")
    banned = base[2:5]
    r1 = req(server, "/completion", {"prompt": "the quick", "n_predict": 10,
                                     "temperature": 0.0, "ignore_eos": True,
                                     "banned_strings": [banned]})
    assert banned.lower() not in r1["content"].lower(), (banned, r1)


def test_misc_request_fields(server):
    """cache_prompt=false, post_sampling_probs, timings_per_token,
    penalize_nl, reasoning_budget_tokens alias."""
    # post-sampling probs: entries come from the surviving candidate set
    r = req(server, "/completion", {"prompt": "hello", "n_predict": 2,
                                    "n_probs": 3, "temperature": 0.8,
                                    "post_sampling_probs": True,
                                    "ignore_eos": True, "seed": 5})
    cp = r["completion_probabilities"]
    assert len(cp) == 2 and 0 < cp[0]["probs"][0]["prob"] <= 1
    # cache_prompt=false still generates deterministically
    r1 = req(server, "/completion", {"prompt": "abc def", "n_predict": 3,
                                     "temperature": 0.0,
                                     "cache_prompt": False,
                                     "ignore_eos": True})
    r2 = req(server, "/completion", {"prompt": "abc def", "n_predict": 3,
                                     "temperature": 0.0,
                                     "ignore_eos": True})
    assert r1["content"] == r2["content"]
    # penalize_nl parses without error
    req(server, "/completion", {"prompt": "x", "n_predict": 2,
                                "repeat_penalty": 1.5,
                                "penalize_nl": False, "ignore_eos": True})
    # timings_per_token adds per-chunk timings in the stream
    raw = req(server, "/completion", {"prompt": "x", "n_predict": 2,
                                      "stream": True, "ignore_eos": True,
                                      "timings_per_token": True}, raw=True)
    assert b'"timings"' in raw and b"predicted_per_second" in raw


def test_tool_choice_required_forces_call(server):
    """tool_choice 'required' grammar-forces a schema-valid tool call that
    the parser extracts (reference lazy tool-call grammars)."""
    tools = [{"type": "function", "function": {
        "name": "get_weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"enum": ["paris", "tokyo"]}},
                       "required": ["city"]}}}]
    r = req(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "weather in Paris?"}],
        "tools": tools, "tool_choice": "required",
        "max_tokens": 96, "temperature": 0.9, "seed": 3})
    choice = r["choices"][0]
    calls = choice["message"].get("tool_calls")
    assert calls, r
    assert calls[0]["function"]["name"] == "get_weather"
    args = json.loads(calls[0]["function"]["arguments"])
    assert args.get("city") in ("paris", "tokyo")
    assert choice["finish_reason"] == "tool_calls"


def test_server_bench_tool(server):
    """tools.server_bench drives the live server and reports SLO metrics
    (examples/server/bench k6-scenario analogue)."""
    import asyncio
    from ik_llama_cpp_tpu.tools.server_bench import run_bench
    res = asyncio.run(run_bench(f"http://127.0.0.1:{server}", 4, 2, 4, 8))
    assert res["succeeded"] == 4 and res["failed"] == 0, res
    assert res["tokens_per_s"] > 0 and res["ttft_ms"]["p50"] > 0


def test_anthropic_tool_choice_any(server):
    """Anthropic tool_choice {'type': 'any'} grammar-forces a tool_use
    block with schema-valid input."""
    r = req(server, "/v1/messages", {
        "messages": [{"role": "user", "content": "weather?"}],
        "tools": [{"name": "get_weather", "description": "d",
                   "input_schema": {
                       "type": "object",
                       "properties": {"city": {"enum": ["paris", "tokyo"]}},
                       "required": ["city"]}}],
        "tool_choice": {"type": "any"},
        "max_tokens": 96, "temperature": 0.9})
    blocks = [b for b in r["content"] if b["type"] == "tool_use"]
    assert blocks and blocks[0]["name"] == "get_weather", r
    assert blocks[0]["input"]["city"] in ("paris", "tokyo")
    assert r["stop_reason"] == "tool_use"
