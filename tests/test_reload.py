"""On-demand tensor reload (llama-reload / llama_reload_changed_tensors)."""
import shutil

import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime


def test_reload_changed_tensors(tmp_path):
    p1 = make_tiny_llama_gguf(tmp_path / "a.gguf", seed=1)
    p2 = make_tiny_llama_gguf(tmp_path / "b.gguf", seed=2)   # same shapes
    model = tmp_path / "live.gguf"
    shutil.copy(p1, model)
    rt = Runtime.from_gguf(model, track_reload=True)
    ids = list(range(10, 26))
    base = rt.all_position_logits(ids)

    # untouched file: no-op
    assert rt.reload_changed_tensors() is False

    # touch without content change: mtime differs, CRCs match
    model.touch()
    assert rt.reload_changed_tensors() is False

    # overwrite with different weights: live model must pick them up and
    # keep using the SAME compiled step functions (shapes unchanged)
    shutil.copy(p2, model)
    assert rt.reload_changed_tensors() is True
    after = rt.all_position_logits(ids)
    assert np.abs(after - base).max() > 1e-3

    # must match a fresh load of the new file
    rt2 = Runtime.from_gguf(p2)
    fresh = rt2.all_position_logits(ids)
    np.testing.assert_allclose(after, fresh, rtol=1e-5, atol=1e-5)


def test_reload_requires_tracking(tmp_path):
    p = make_tiny_llama_gguf(tmp_path / "x.gguf", seed=3)
    rt = Runtime.from_gguf(p)
    with pytest.raises(RuntimeError):
        rt.reload_changed_tensors()
