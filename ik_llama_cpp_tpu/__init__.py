"""ik_llama_cpp_tpu — TPU-native quantized-LLM inference engine.

Public API:
    Runtime          — load a GGUF, generate/eval/embed (runtime/generate.py)
    BatchEngine      — continuous-batching slot engine (server/engine.py)
    Server           — HTTP server (server/app.py); `python -m
                       ik_llama_cpp_tpu.server --gguf model.gguf`
    SamplerParams    — sampler-chain configuration
    load_gguf        — low-level GGUF reader
"""

__version__ = "0.1.0"

from .gguf.reader import load_gguf                      # noqa: F401
from .runtime.sampling import SamplerParams             # noqa: F401


def __getattr__(name):
    # lazy imports: keep `import ik_llama_cpp_tpu` light (no jax warmup)
    if name == "Runtime":
        from .runtime.generate import Runtime
        return Runtime
    if name == "T5Runtime":
        from .runtime.t5_runtime import T5Runtime
        return T5Runtime
    if name == "BatchEngine":
        from .server.engine import BatchEngine
        return BatchEngine
    if name == "Server":
        from .server.app import Server
        return Server
    raise AttributeError(name)
