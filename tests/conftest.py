"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on host-platform virtual devices exactly as the driver's dryrun does.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE_EXAMPLES = pathlib.Path("/root/reference/example")


@pytest.fixture(scope="session")
def fixture_classic_lame() -> bytes:
    p = REFERENCE_EXAMPLES / "classic_lame.mp3"
    if not p.exists():
        pytest.skip("classic_lame.mp3 fixture not available")
    return p.read_bytes()


@pytest.fixture(scope="session")
def fixture_mpeg2() -> bytes:
    p = REFERENCE_EXAMPLES / "mpeg2.mp3"
    if not p.exists():
        pytest.skip("mpeg2.mp3 fixture not available")
    return p.read_bytes()
