"""Multi-host (multi-process) tensor parallelism: two controller
processes, a global mesh over both, the standard TP forward on top —
logits must match the single-host run exactly (tools/multihost_proof.py;
the TPU-native replacement for the reference's rpc-server multi-node
path, ggml/src/ggml-rpc.cpp)."""
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf


@pytest.mark.slow
def test_two_process_tp_matches_single_host(tmp_path):
    model = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=11, n_head_kv=4)

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "ik_llama_cpp_tpu.tools.multihost_proof",
             "--coordinator", "127.0.0.1:29531",
             "--num-processes", "2", "--process-id", str(i),
             "--gguf", str(model), "--local-devices", "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd="/root/repo")
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-800:]

    logits = []
    for o in outs:
        m = re.search(r"logits\[:8\] = \[([^\]]+)\]", o)
        assert m, o[-500:]
        logits.append([float(x) for x in m.group(1).split(",")])
        assert "global=4" in o
    # both processes see identical replicated logits
    np.testing.assert_allclose(logits[0], logits[1], rtol=1e-5)

    # single-host reference on the same model
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "os.environ['PALLAS_AXON_POOL_IPS']=''\n"
        "import jax.numpy as jnp, numpy as np\n"
        "from ik_llama_cpp_tpu.runtime.generate import Runtime\n"
        f"rt = Runtime.from_gguf({str(model)!r})\n"
        "lg = rt.all_position_logits([1, 5, 9, 12])\n"
        "print('REF', np.round(lg[-1][:8], 4).tolist())\n"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, timeout=300, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()[-500:]
    m = re.search(r"REF \[([^\]]+)\]", r.stdout.decode())
    ref = [float(x) for x in m.group(1).split(",")]
    np.testing.assert_allclose(logits[0], ref, rtol=1e-3, atol=1e-3)
