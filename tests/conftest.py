"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a faked 8-device CPU mesh — the analog
of testing multi-node behavior without a cluster. Must be set before
jax initializes.
"""

import os

# Force CPU even if the outer environment pins another platform: parity
# tests need fp32 math (TPU matmuls default to bf16 inputs) and the
# virtual 8-device mesh only exists on the host platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# jax may already be imported (and its config frozen from the ambient
# JAX_PLATFORMS) by the interpreter's sitecustomize — override directly.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_CFG = pathlib.Path("/root/reference/cfg")


@pytest.fixture(scope="session")
def ref_cfg_dir():
    if not REF_CFG.exists():
        pytest.skip("reference cfg directory not available")
    return REF_CFG
