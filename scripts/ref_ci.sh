#!/usr/bin/env bash
# Reference-gated CI (the analogue of the reference's ci/run.sh):
#
#   1. builds the reference engine out-of-tree into /tmp/refbuild
#      (libllama.so + llama-perplexity + llama-quantize, CPU only)
#   2. runs the full test suite — the ~150 cross-engine parity tests that
#      skip without /tmp/refbuild (tests/test_cross_engine.py,
#      tests/test_quantize_*.py, tests/test_perplexity_parity.py, ...)
#      now execute
#   3. runs the GGUF-for-GGUF perplexity gate (tools/ppl_gate.py):
#      same GGUF file + same corpus through llama-perplexity and through
#      our engine; asserts |dPPL| <= PPL_TOL (reference protocol:
#      examples/perplexity/perplexity.cpp:779 "Final estimate")
#
# Usage: scripts/ref_ci.sh [--build-only|--test-only]
set -euo pipefail

REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/refbuild}
JOBS=${JOBS:-$(nproc)}
REPO="$(cd "$(dirname "$0")/.." && pwd)"

build_ref() {
    if [ -f "$BUILD/src/libllama.so" ] && [ -f "$BUILD/bin/llama-perplexity" ]; then
        echo "ref_ci: $BUILD already built"
        return
    fi
    cmake -B "$BUILD" -S "$REF" -G Ninja \
        -DCMAKE_BUILD_TYPE=Release \
        -DBUILD_SHARED_LIBS=ON \
        -DGGML_NATIVE=ON \
        -DLLAMA_BUILD_TESTS=OFF \
        -DLLAMA_BUILD_SERVER=OFF \
        -DLLAMA_CURL=OFF
    cmake --build "$BUILD" -j "$JOBS" \
        --target llama llama-perplexity llama-quantize llama-cli 2>/dev/null \
      || cmake --build "$BUILD" -j "$JOBS"
}

run_tests() {
    cd "$REPO"
    python -m pytest tests/ -q
}

run_ppl_gate() {
    cd "$REPO"
    # PYTHONPATH is REPLACED (not extended): drops any sitecustomize that
    # would route jax to a remote accelerator; the gate is a CPU comparison
    PYTHONPATH="$REPO" JAX_PLATFORMS=cpu python tools/ppl_gate.py
}

case "${1:-all}" in
    --build-only) build_ref ;;
    --test-only)  run_tests; run_ppl_gate ;;
    *)            build_ref; run_tests; run_ppl_gate ;;
esac
