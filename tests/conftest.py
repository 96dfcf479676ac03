"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on host-platform virtual devices exactly as the driver's dryrun does.
"""

import os

# Force CPU regardless of the outer environment (it may pin a TPU platform
# through a sitecustomize that overrides the env var — hence config.update):
# the test suite validates numerics and sharding on a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax as _jax

_jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

# Persistent XLA compilation cache: first run compiles (~30-60 s per distinct
# chunk shape on CPU), subsequent runs are fast.
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU mesh"

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
