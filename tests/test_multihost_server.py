"""Multi-host SERVING end-to-end: the HTTP server runs under
jax.distributed with 2 controller processes (2 virtual CPU devices each),
host 0 serves HTTP while the follower replays each broadcast step
descriptor in lockstep (server/multihost.py). The greedy completion must
be identical to a single-host server on the same model — the TPU-native
answer to the reference's rpc-server multi-node serving
(ggml/src/ggml-rpc.cpp:94-111)."""
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


def req(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    if body is None:
        r = urllib.request.urlopen(url, timeout=60)
    else:
        r = urllib.request.urlopen(urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}), timeout=120)
    return json.loads(r.read())


def _wait_health(port, procs, timeout_s=180):
    for _ in range(int(timeout_s * 2)):
        try:
            req(port, "/health")
            return
        except Exception:
            for p in procs:
                if p.poll() is not None:
                    out = p.stdout.read().decode()[-3000:]
                    for q in procs:
                        q.kill()
                    raise RuntimeError(f"server died:\n{out}")
            time.sleep(0.5)
    for p in procs:
        p.kill()
    raise RuntimeError("server did not become healthy")


@pytest.mark.slow
def test_multihost_server_matches_single_host(tmp_path):
    model = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=7, n_head_kv=4)
    base_env = {"PALLAS_AXON_POOL_IPS": "", "HOME": "/root",
                "PATH": "/usr/bin:/bin:/usr/local/bin",
                "PYTHONPATH": str(REPO)}
    body = {"prompt": "Once upon a time", "n_predict": 12, "temperature": 0}

    # ---- single-host reference run (1 process, 1 virtual device)
    port1 = free_port()
    env1 = dict(base_env, JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=1")
    ref_proc = subprocess.Popen(
        [sys.executable, "-m", "ik_llama_cpp_tpu.server", "--gguf", str(model),
         "--port", str(port1), "--parallel", "2", "--ctx-size", "256"],
        cwd=REPO, env=env1, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        _wait_health(port1, [ref_proc])
        ref = req(port1, "/completion", body)
    finally:
        ref_proc.terminate()
    assert ref["tokens_predicted"] == 12

    # ---- 2-process distributed run (2 virtual devices each -> tp=4)
    port2 = free_port()
    coord = f"127.0.0.1:{free_port()}"
    env2 = dict(base_env, JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "ik_llama_cpp_tpu.server",
             "--gguf", str(model), "--port", str(port2), "--parallel", "2",
             "--ctx-size", "256",
             "--distributed", f"{coord},2,{i}"],
            cwd=REPO, env=env2, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    try:
        _wait_health(port2, procs)
        got = req(port2, "/completion", body)
        # a second request exercises prompt-cache reuse + a fresh slot
        got2 = req(port2, "/completion", body)
    finally:
        procs[0].terminate()  # SIGTERM -> run_app returns -> OP_SHUTDOWN
        try:
            procs[1].wait(timeout=60)
        except subprocess.TimeoutExpired:
            procs[1].kill()
            pytest.fail("follower did not exit on shutdown broadcast")
        procs[0].wait(timeout=30)

    assert got["content"] == ref["content"], (got["content"], ref["content"])
    assert got2["content"] == ref["content"]
    assert procs[1].returncode == 0


def test_step_channel_roundtrip_spec():
    """StepChannel pack/unpack: OP_SPEC descriptors must carry width, token
    rows, and n_past losslessly (single-process: broadcast_one_to_all is an
    identity with one host)."""
    import numpy as np
    from ik_llama_cpp_tpu.server.multihost import StepChannel, OP_SPEC

    chan_tx = StepChannel(n_slots=3, spec_n=4)
    chan_rx = StepChannel(n_slots=3, spec_n=4)
    sent = {}
    orig = chan_tx._bcast

    def capture(buf):
        sent["buf"] = buf
        return buf
    chan_tx._bcast = capture
    chan_rx._bcast = lambda z: sent["buf"]

    toks = np.arange(15, dtype=np.int32).reshape(3, 5)
    n_past = np.asarray([7, 11, 13], np.int32)
    chan_tx.send(OP_SPEC, rows=3, width=5, toks=toks, n_past=n_past)
    m = chan_rx.recv()
    assert m["op"] == OP_SPEC and m["rows"] == 3 and m["width"] == 5
    np.testing.assert_array_equal(m["toks"][:, :5], toks)
    np.testing.assert_array_equal(m["n_past"], n_past)


def test_worker_loop_rejects_unknown_op():
    """A protocol error must STOP the follower (desync is unrecoverable),
    not silently continue (rpc-server RPC_STATUS_ASSERT analogue)."""
    import numpy as np
    import pytest as _pytest
    from ik_llama_cpp_tpu.server import multihost as mh

    class FakeChan:
        def recv(self):
            return {"op": 99, "rows": 0, "bucket": 0, "width": 0,
                    "toks": np.zeros((1, 1), np.int32),
                    "idx": np.zeros(1, np.int32),
                    "n_past": np.zeros(1, np.int32),
                    "aux": np.zeros(1, np.int32)}

    class FakeEngine:
        chan = FakeChan()
        class rt:
            params = {}

    with _pytest.raises(RuntimeError, match="unknown multihost op"):
        mh.worker_loop(FakeEngine())


@pytest.mark.slow
def test_multihost_spec_and_cancel(tmp_path):
    """OP_SPEC under multi-host + client-cancel hardening: a speculative
    2-process server must (a) produce the same greedy text as single-host,
    (b) survive a client that disconnects mid-stream and keep serving
    (follower stays in lockstep), (c) shut the follower down cleanly."""
    import http.client

    model = make_tiny_llama_gguf(tmp_path / "ms.gguf", seed=9, n_head_kv=4)
    base_env = {"PALLAS_AXON_POOL_IPS": "", "HOME": "/root",
                "PATH": "/usr/bin:/bin:/usr/local/bin",
                "PYTHONPATH": str(REPO)}
    body = {"prompt": "Once upon a time", "n_predict": 12, "temperature": 0}

    # single-host reference (same spec settings)
    port1 = free_port()
    env1 = dict(base_env, JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=1")
    ref_proc = subprocess.Popen(
        [sys.executable, "-m", "ik_llama_cpp_tpu.server", "--gguf", str(model),
         "--port", str(port1), "--parallel", "2", "--ctx-size", "256",
         "--spec", "suffix", "--spec-n", "4"],
        cwd=REPO, env=env1, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        _wait_health(port1, [ref_proc])
        ref = req(port1, "/completion", body)
    finally:
        ref_proc.terminate()

    port2 = free_port()
    coord = f"127.0.0.1:{free_port()}"
    env2 = dict(base_env, JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "ik_llama_cpp_tpu.server",
             "--gguf", str(model), "--port", str(port2), "--parallel", "2",
             "--ctx-size", "256", "--spec", "suffix", "--spec-n", "4",
             "--distributed", f"{coord},2,{i}"],
            cwd=REPO, env=env2, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    try:
        _wait_health(port2, procs)
        got = req(port2, "/completion", body)
        assert got["content"] == ref["content"], (got["content"],
                                                  ref["content"])

        # client cancel mid-stream: open a streaming completion, read one
        # chunk, slam the connection shut
        conn = http.client.HTTPConnection("127.0.0.1", port2, timeout=60)
        conn.request("POST", "/completion", json.dumps(
            {"prompt": "Once upon a time", "n_predict": 200,
             "temperature": 0, "stream": True}),
            {"Content-Type": "application/json"})
        resp = conn.getresponse()
        resp.read(64)
        conn.sock.close()          # abrupt disconnect

        # the engine must keep serving in lockstep after the cancel
        got2 = req(port2, "/completion", body)
        assert got2["content"] == ref["content"]
        assert procs[1].poll() is None, "follower died after client cancel"
    finally:
        procs[0].terminate()
        try:
            procs[1].wait(timeout=60)
        except subprocess.TimeoutExpired:
            procs[1].kill()
            pytest.fail("follower did not exit on shutdown broadcast")
        procs[0].wait(timeout=30)
    assert procs[1].returncode == 0
