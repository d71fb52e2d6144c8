"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a faked 8-device CPU mesh — the analog
of testing multi-node behavior without a cluster. Must be set before
jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_CFG = pathlib.Path("/root/reference/cfg")


@pytest.fixture(scope="session")
def ref_cfg_dir():
    if not REF_CFG.exists():
        pytest.skip("reference cfg directory not available")
    return REF_CFG
