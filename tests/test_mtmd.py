"""Multimodal tests: CLIP encoder shapes/determinism, embedding splice,
end-to-end image-conditioned generation (examples/mtmd analogue)."""
import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf, make_tiny_mmproj_gguf
from ik_llama_cpp_tpu.models.clip import ClipEncoder
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.mtmd import build_mm_embeds, generate_mm


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("mm")
    model = make_tiny_llama_gguf(d / "text.gguf", seed=3)
    mmproj = make_tiny_mmproj_gguf(d / "mmproj.gguf", seed=4)
    return Runtime.from_gguf(model), ClipEncoder(mmproj)


def _img(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)


def test_clip_encode_shape(setup):
    rt, enc = setup
    out = enc.encode(_img())
    assert out.shape == (enc.n_patch_tokens, rt.cfg.n_embd)
    assert np.all(np.isfinite(out))
    # determinism
    np.testing.assert_array_equal(out, enc.encode(_img()))


def test_clip_different_images_differ(setup):
    _, enc = setup
    assert np.abs(enc.encode(_img(0)) - enc.encode(_img(1))).max() > 1e-4


def test_build_mm_embeds_splice(setup):
    rt, enc = setup
    prompt = "describe <__image__> please"
    embds = build_mm_embeds(rt, prompt, [_img()], enc)
    n_text = len(rt.tokenizer.encode("describe ")) + \
        len(rt.tokenizer.encode(" please", add_bos=False))
    assert embds.shape == (n_text + enc.n_patch_tokens, rt.cfg.n_embd)


def test_marker_count_mismatch(setup):
    rt, enc = setup
    with pytest.raises(ValueError):
        build_mm_embeds(rt, "no marker here", [_img()], enc)


def test_generate_mm_end_to_end(setup):
    rt, enc = setup
    n_prompt, out = generate_mm(rt, "what is <__image__>?", [_img()], enc,
                                max_new_tokens=4, capacity=128)
    assert n_prompt > enc.n_patch_tokens
    assert len(out) >= 1


def test_image_changes_generation_logits(setup):
    rt, enc = setup
    from ik_llama_cpp_tpu.runtime.mtmd import eval_embeds
    e1 = build_mm_embeds(rt, "a <__image__> b", [_img(0)], enc)
    e2 = build_mm_embeds(rt, "a <__image__> b", [_img(1)], enc)
    kv1 = rt.new_cache(1, 128)
    kv2 = rt.new_cache(1, 128)
    l1, _, _ = eval_embeds(rt, e1, kv1)
    l2, _, _ = eval_embeds(rt, e2, kv2)
    assert np.abs(l1 - l2).max() > 1e-4


def test_server_multimodal(tmp_path_factory):
    """Boot the server with --mmproj and send a base64 image chat request."""
    import base64
    import io
    import json
    import socket
    import subprocess
    import sys
    import time
    import urllib.request
    from pathlib import Path
    from PIL import Image

    REPO = Path(__file__).resolve().parent.parent
    d = tmp_path_factory.mktemp("mmsrv")
    model = make_tiny_llama_gguf(d / "text.gguf", seed=3)
    mmproj = make_tiny_mmproj_gguf(d / "mmproj.gguf", seed=4)

    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "PYTHONPATH": str(REPO)}
    proc = subprocess.Popen(
        [sys.executable, "-m", "ik_llama_cpp_tpu.server", "--gguf", str(model),
         "--mmproj", str(mmproj), "--port", str(port), "--ctx-size", "256"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        for _ in range(120):
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=5)
                break
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError(proc.stderr.read().decode()[-2000:])
                time.sleep(0.5)
        buf = io.BytesIO()
        Image.fromarray(_img()).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        body = {"messages": [{"role": "user", "content": [
            {"type": "text", "text": "what is this?"},
            {"type": "image_url", "image_url":
             {"url": f"data:image/png;base64,{b64}"}}]}],
            "max_tokens": 4, "temperature": 0}
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}), timeout=120)
        resp = json.loads(r.read())
        assert resp["object"] == "chat.completion"
        assert resp["usage"]["prompt_tokens"] > 4   # includes patch tokens
    finally:
        proc.terminate()
