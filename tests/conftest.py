"""Test configuration: force an 8-device virtual CPU mesh for sharding tests.

Must set XLA flags before jax initializes — keep this at the very top.
"""
import os

# Force CPU with 8 virtual devices. The environment's axon sitecustomize
# imports jax at interpreter start (reading JAX_PLATFORMS=axon from the env),
# so setting env vars here is too late for the platform choice — use
# jax.config.update instead. XLA_FLAGS is still honored at backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
