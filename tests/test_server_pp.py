"""Batched server under -sm layer: the HTTP server + BatchEngine run with
the model layer-split over 4 virtual devices and must produce the same
greedy completion as single-device serving (server/engine.py PipelineBatchFwd
path, parallel/pp.py)."""
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


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _req(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    if body is None:
        r = urllib.request.urlopen(url, timeout=30)
    else:
        r = urllib.request.urlopen(urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}), timeout=120)
    return json.loads(r.read())


def _boot(model, extra):
    port = _free_port()
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "PYTHONPATH": str(REPO)}
    proc = subprocess.Popen(
        [sys.executable, "-m", "ik_llama_cpp_tpu.server", "--gguf",
         str(model), "--port", str(port), "--parallel", "2",
         "--ctx-size", "256", *extra],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    for _ in range(240):
        try:
            _req(port, "/health")
            return proc, port
        except Exception:
            if proc.poll() is not None:
                raise RuntimeError(proc.stderr.read().decode()[-2000:])
            time.sleep(0.5)
    proc.kill()
    raise RuntimeError("server did not start")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("srvpp") / "m8.gguf", seed=1, n_layer=8)


def _complete(port, prompt, n):
    return _req(port, "/completion", {
        "prompt": prompt, "n_predict": n,
        "temperature": 0.0, "cache_prompt": False})["content"]


def test_server_layer_split_matches_single(model):
    proc1, port1 = _boot(model, [])
    try:
        ref = _complete(port1, "hello world", 8)
    finally:
        proc1.kill()
    proc2, port2 = _boot(model, ["-sml", "4"])
    try:
        got = _complete(port2, "hello world", 8)
        # a second, longer request exercises multi-chunk prefill + slots
        got2 = _complete(port2, "hello world " * 20, 4)
        assert isinstance(got2, str) and len(got2) > 0
    finally:
        proc2.kill()
    assert got == ref


def test_engine_slot_save_restore_under_pp(model, tmp_path):
    """BatchEngine slot state IO composes per-stage rows (state files stay
    layout-neutral) under -sm layer."""
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.server.engine import BatchEngine, Request

    import queue as _q
    from ik_llama_cpp_tpu.runtime.sampling import SamplerParams

    rt = Runtime.from_gguf(model, layer_split=4)
    eng = BatchEngine(rt, n_slots=2, capacity=128)
    sq: _q.Queue = _q.Queue()
    req = Request(prompt_ids=rt.tokenizer.encode("hello world"), n_predict=4,
                  sampler=SamplerParams(temp=0.0), stream_queue=sq)
    eng.submit(req)
    eng.start()
    out = []
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            tok, _txt, done = sq.get(timeout=1.0)
        except _q.Empty:
            continue
        if tok is not None:
            out.append(tok)
        if done:
            break
    eng.stop()
    assert len(out) >= 1
    saved = eng.save_slot(0, tmp_path / "s0.state")
    assert saved["n_saved"] >= 1
    restored = eng.restore_slot(1, tmp_path / "s0.state")
    assert restored["n_restored"] == saved["n_saved"]
    assert eng.slots[1].cache_tokens == eng.slots[0].cache_tokens
