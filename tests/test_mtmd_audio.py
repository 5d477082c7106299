"""Audio multimodal tests — examples/mtmd audio path analogue: whisper-style
conv encoder (models/clip.py AudioEncoder) with golden parity against the
reference libmtmd on the same GGUF + samples, embedding splice via the
<__audio__> marker, and the server's OpenAI input_audio route."""
import os
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from fixtures import make_tiny_audio_mmproj_gguf, make_tiny_llama_gguf
from ik_llama_cpp_tpu.models.clip import AudioEncoder

REFBUILD = Path("/tmp/refbuild")
REF = Path("/root/reference")
AUDIO_EMBD = Path("/tmp/audio_embd_harness")
LDPATH = f"{REFBUILD}/src:{REFBUILD}/ggml/src:{REFBUILD}/examples/mtmd"
ref_available = (REFBUILD / "src/libllama.so").exists()


def _samples(seconds: float = 1.0, seed: int = 0) -> np.ndarray:
    """Deterministic test signal: two sine tones + a little noise."""
    sr = 16000
    t = np.arange(int(sr * seconds), dtype=np.float32) / sr
    rng = np.random.default_rng(seed)
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 1234 * t)
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def build_audio_embd() -> bool:
    """Compile the libmtmd-based embedding-dump harness (builds the mtmd
    shared library on first use)."""
    if AUDIO_EMBD.exists():
        return True
    if not (REFBUILD / "examples/mtmd/libmtmd.so").exists():
        r = subprocess.run(["make", "-C", str(REFBUILD), "mtmd", "-j4"],
                           capture_output=True)
        if r.returncode != 0:
            return False
    src = Path(__file__).parent.parent / "tools/golden_gen/audio_embd.cpp"
    r = subprocess.run(
        ["g++", "-O2", f"-I{REF}/include", f"-I{REF}/ggml/include",
         f"-I{REF}/examples/mtmd", f"-I{REF}/vendor", str(src),
         f"-L{REFBUILD}/src", f"-L{REFBUILD}/ggml/src",
         f"-L{REFBUILD}/examples/mtmd",
         "-lmtmd", "-lllama", "-lggml", "-lm", "-o", str(AUDIO_EMBD)],
        capture_output=True)
    return r.returncode == 0


def ref_audio_embd(text_model, mmproj, samples) -> list[np.ndarray]:
    spath = "/tmp/_audio_samples.f32"
    opath = "/tmp/_audio_embd.bin"
    np.asarray(samples, np.float32).tofile(spath)
    env = dict(os.environ, LD_LIBRARY_PATH=LDPATH)
    r = subprocess.run([str(AUDIO_EMBD), str(text_model), str(mmproj),
                        spath, opath], env=env, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    raw = Path(opath).read_bytes()
    n_chunks, = struct.unpack("<I", raw[:4])
    off = 4
    out = []
    for _ in range(n_chunks):
        nt, ne = struct.unpack("<II", raw[off:off + 8])
        off += 8
        out.append(np.frombuffer(raw, np.float32, nt * ne, off).reshape(nt, ne))
        off += 4 * nt * ne
    return out


needs_ref = pytest.mark.skipif(
    not (ref_available and build_audio_embd()),
    reason="reference mtmd build unavailable")


def test_audio_encoder_shape_and_determinism(tmp_path):
    mmproj = make_tiny_audio_mmproj_gguf(tmp_path / "a.gguf")
    enc = AudioEncoder(mmproj)
    out = enc.encode(_samples())
    # 3000-frame chunk -> conv stride 2 -> 1500 -> qwen2a avgpool -> 750
    assert out.shape == (750, 64)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out, enc.encode(_samples()))
    assert np.abs(enc.encode(_samples(seed=1)) - out).max() > 1e-4


@needs_ref
@pytest.mark.parametrize("projector,stack", [
    ("qwen2a", 0), ("ultravox", 4), ("voxtral", 2)])
def test_audio_encoder_reference_parity(tmp_path, projector, stack):
    """Golden parity vs the reference's whisper preprocessor + clip audio
    graph + projector (mtmd_encode_chunk embeddings on the same GGUF).

    n_embd=64/4 heads: the reference's CPU attention misbehaves at head
    size 8 (same <64 kernel floor as its FA path), and its expected-token
    formula requires (1500/stack_factor) and (750/stack_factor) to be
    integral — stack factors chosen accordingly."""
    mmproj = make_tiny_audio_mmproj_gguf(
        tmp_path / f"{projector}.gguf", n_embd=64, projector=projector,
        stack_factor=stack)
    text = make_tiny_llama_gguf(tmp_path / "text.gguf", seed=3)
    samples = _samples()
    ref = np.concatenate(ref_audio_embd(text, mmproj, samples), axis=0)
    ours = AudioEncoder(mmproj).encode(samples)
    assert ref.shape == ours.shape
    cc = np.corrcoef(ref.reshape(-1), ours.reshape(-1))[0, 1]
    assert cc > 0.9999, cc
    assert np.abs(ref - ours).max() < 5e-2 * max(1.0, np.abs(ref).max())


@needs_ref
def test_audio_multi_chunk_parity(tmp_path):
    """>30 s of audio -> 2 chunks, each encoded independently."""
    mmproj = make_tiny_audio_mmproj_gguf(tmp_path / "a.gguf", n_embd=64)
    text = make_tiny_llama_gguf(tmp_path / "text.gguf", seed=3)
    samples = _samples(seconds=31.0)
    ref_chunks = ref_audio_embd(text, mmproj, samples)
    assert len(ref_chunks) == 2
    ref = np.concatenate(ref_chunks, axis=0)
    ours = AudioEncoder(mmproj).encode(samples)
    assert ref.shape == ours.shape
    cc = np.corrcoef(ref.reshape(-1), ours.reshape(-1))[0, 1]
    assert cc > 0.9999, cc


def test_build_mm_embeds_audio_splice(tmp_path):
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.runtime.mtmd import build_mm_embeds
    rt = Runtime.from_gguf(make_tiny_llama_gguf(tmp_path / "t.gguf", seed=3))
    enc = AudioEncoder(make_tiny_audio_mmproj_gguf(tmp_path / "a.gguf"))
    embds = build_mm_embeds(rt, "transcribe <__audio__> now", [_samples()],
                            None, audio_encoder=enc)
    n_text = len(rt.tokenizer.encode("transcribe ")) + \
        len(rt.tokenizer.encode(" now", add_bos=False))
    assert embds.shape == (n_text + 750, rt.cfg.n_embd)
    with pytest.raises(ValueError):
        build_mm_embeds(rt, "no marker", [_samples()], None,
                        audio_encoder=enc)
    with pytest.raises(ValueError):   # audio marker without an audio tower
        build_mm_embeds(rt, "a <__audio__> b", [_samples()], None)


def test_generate_mm_audio_end_to_end(tmp_path):
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.runtime.mtmd import generate_mm
    rt = Runtime.from_gguf(make_tiny_llama_gguf(tmp_path / "t.gguf", seed=3))
    enc = AudioEncoder(make_tiny_audio_mmproj_gguf(tmp_path / "a.gguf"))
    n_prompt, out = generate_mm(rt, "hear <__audio__>?", [_samples()], None,
                                audio_encoder=enc, max_new_tokens=4,
                                capacity=1024)
    assert n_prompt > 750
    assert len(out) >= 1


def test_server_input_audio(tmp_path_factory):
    """Boot the server with an audio mmproj and send an OpenAI-format
    input_audio chat request (base64 PCM16 WAV)."""
    import base64
    import io
    import json
    import socket
    import sys
    import time
    import urllib.request
    import wave

    REPO = Path(__file__).resolve().parent.parent
    d = tmp_path_factory.mktemp("audiosrv")
    model = make_tiny_llama_gguf(d / "text.gguf", seed=3)
    mmproj = make_tiny_audio_mmproj_gguf(d / "mmproj.gguf", seed=4)

    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "PYTHONPATH": str(REPO)}
    proc = subprocess.Popen(
        [sys.executable, "-m", "ik_llama_cpp_tpu.server", "--gguf", str(model),
         "--mmproj", str(mmproj), "--port", str(port), "--ctx-size", "1100"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        for _ in range(120):
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                       timeout=5)
                break
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError(proc.stderr.read().decode()[-2000:])
                time.sleep(0.5)
        pcm = (_samples() * 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        b64 = base64.b64encode(buf.getvalue()).decode()
        body = {"messages": [{"role": "user", "content": [
            {"type": "text", "text": "what do you hear?"},
            {"type": "input_audio",
             "input_audio": {"data": b64, "format": "wav"}}]}],
            "max_tokens": 4, "temperature": 0}
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}), timeout=300)
        resp = json.loads(r.read())
        assert resp["object"] == "chat.completion"
        assert resp["usage"]["prompt_tokens"] > 750   # audio frames included
    finally:
        proc.terminate()
