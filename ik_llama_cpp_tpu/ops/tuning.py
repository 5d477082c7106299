"""Kernel tile-tuning table — the TPU analogue of the reference's per-arch
kernel selection (iqk `MulMat::prepare` picks kernels per (type, Ny);
here tools/autotune.py MEASURES candidate Pallas tile configs on the real
device and stores the winners, which kernels consult at trace time).

The table is JSON: {kernel: {shape_key: {param: value}}}. Shape keys are
matched most-specific-first: ``m<bucket>_k<K>_n<N>`` then ``m<bucket>``.
M is bucketed (decode vs prefill shapes) because the engine's jit cache is
already keyed the same way. Lookups happen at jit-trace time on static
shapes, so a table change applies on the next trace.

Path: $IK_TUNE_FILE, else <repo>/tuning.json (absent = all defaults).
"""
from __future__ import annotations

import json
import os
from pathlib import Path

DEFAULT_PATH = Path(__file__).resolve().parent.parent.parent / "tuning.json"

_TABLE: dict | None = None


def _mbucket(m: int) -> int:
    for b in (16, 64, 256):
        if m <= b:
            return b
    return 512


def load(path=None, *, force: bool = False) -> dict:
    global _TABLE
    if _TABLE is None or force or path is not None:
        p = Path(path or os.environ.get("IK_TUNE_FILE") or DEFAULT_PATH)
        try:
            _TABLE = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            _TABLE = {}
    return _TABLE


def get(kernel: str, m: int, k: int, n: int) -> dict:
    """Best-known tile params for a kernel at (m, k, n); {} = defaults."""
    t = load().get(kernel, {})
    mb = _mbucket(m)
    for key in (f"m{mb}_k{k}_n{n}", f"m{mb}"):
        cfg = t.get(key)
        if cfg:
            return dict(cfg)
    return {}


def save(table: dict, path=None) -> Path:
    p = Path(path or os.environ.get("IK_TUNE_FILE") or DEFAULT_PATH)
    p.write_text(json.dumps(table, indent=1, sort_keys=True) + "\n")
    global _TABLE
    _TABLE = table
    return p
