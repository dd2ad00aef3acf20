"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes (SURVEY.md section 4 item 4:
fake multi-device testing via --xla_force_host_platform_device_count).
"""

import os
import sys
from pathlib import Path

# SAND_CRATE_TPU_TESTS=1 leaves the ambient (TPU) backend alone so the
# @pytest.mark.tpu compiled-kernel smoke tests can run on the chip:
#   SAND_CRATE_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q
_ON_TPU = os.environ.get("SAND_CRATE_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The axon TPU plugin (registered by sitecustomize before conftest runs)
    # installs jax-config hooks that force jax_platforms="axon,cpu", which
    # makes every test dispatch cross the slow TPU tunnel. Override via
    # jax.config — this wins over the hook and keeps the suite on the local
    # CPU mesh.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
for p in (str(REPO_ROOT), str(REPO_ROOT / "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def stirring_cup_config():
    from sand_crate_tpu import load_config

    return load_config(REPO_ROOT / "configs" / "stirring_cup.yaml")


@pytest.fixture(scope="session")
def wave_machine_config():
    from sand_crate_tpu import load_config

    return load_config(REPO_ROOT / "configs" / "wave_machine.yaml")
