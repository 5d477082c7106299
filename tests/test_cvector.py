"""Control-vector tests: generate -> write -> load -> apply steering."""
import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.cvector import (
    apply_control_vector, generate_control_vector, load_control_vector,
    remove_control_vector, write_control_vector)
from ik_llama_cpp_tpu.runtime.generate import Runtime


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    p = make_tiny_llama_gguf(tmp_path_factory.mktemp("cv") / "m.gguf", seed=7)
    return Runtime.from_gguf(p)


def test_layer_hiddens_shape(rt):
    ids = rt.tokenizer.encode("hello world")
    hs = rt.layer_hiddens(ids)
    assert hs.shape == (rt.cfg.n_layer, len(ids), rt.cfg.n_embd)
    assert np.all(np.isfinite(hs))


def test_generate_roundtrip_and_apply(rt, tmp_path):
    pos = ["I am very happy today", "This is wonderful news"]
    neg = ["I am very sad today", "This is terrible news"]
    dirs = generate_control_vector(rt, pos, neg, method="pca")
    assert dirs.shape == (rt.cfg.n_layer, rt.cfg.n_embd)
    # unit-norm directions
    for il in range(rt.cfg.n_layer):
        assert abs(np.linalg.norm(dirs[il]) - 1.0) < 1e-5

    path = write_control_vector(tmp_path / "cv.gguf", dirs)
    loaded = load_control_vector(path, rt.cfg.n_layer, rt.cfg.n_embd, scale=2.0)
    np.testing.assert_allclose(loaded, dirs * 2.0, rtol=1e-6)

    ids = rt.tokenizer.encode("the weather")
    base = rt.all_position_logits(ids, capacity=64)
    apply_control_vector(rt.params, loaded)
    rt._step_fns.clear()
    steered = rt.all_position_logits(ids, capacity=64)
    assert np.abs(steered - base).max() > 1e-3    # steering changes logits

    remove_control_vector(rt.params)
    rt._step_fns.clear()
    restored = rt.all_position_logits(ids, capacity=64)
    np.testing.assert_allclose(restored, base, atol=1e-6)


def test_layer_range_masking(rt, tmp_path):
    dirs = np.ones((rt.cfg.n_layer, rt.cfg.n_embd), np.float32)
    path = write_control_vector(tmp_path / "cv2.gguf", dirs)
    loaded = load_control_vector(path, rt.cfg.n_layer, rt.cfg.n_embd,
                                 layer_start=1, layer_end=2)
    assert np.all(loaded[0] == 0)
    assert np.all(loaded[1] == 1)


def test_mean_method(rt):
    dirs = generate_control_vector(rt, ["good"], ["bad"], method="mean")
    assert dirs.shape == (rt.cfg.n_layer, rt.cfg.n_embd)
    assert np.linalg.norm(dirs[0]) > 0
