"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
the standard way — XLA's host-platform device-count override (SURVEY.md §4).
Must be set before JAX initializes.
"""

import os
import sys

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which is single-tenant — tests must never contend for it.
# sitecustomize pre-imports jax, so the env var alone is too late; the
# config must be updated in-process (before any backend initializes).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SPONZA_PATH = "/root/reference/models/sponza/Sponza.gltf"


@pytest.fixture(scope="session")
def sponza_model():
    from vkrt_tpu.scene import load_model
    # Low-res textures keep CPU test memory/time reasonable.
    return load_model(SPONZA_PATH, load_images=True, max_texture_dim=64)


@pytest.fixture(scope="session")
def sponza_flat(sponza_model):
    from vkrt_tpu.scene import flatten_model
    return flatten_model(sponza_model)


@pytest.fixture(scope="session")
def sponza_heap(sponza_model):
    from vkrt_tpu.scene import build_texture_heap
    return build_texture_heap(sponza_model.images)


@pytest.fixture()
def rng():
    # function-scoped: each test gets the same fresh stream, so outcomes
    # never depend on suite order (a shared stream caused a tolerance
    # flake that only appeared in full-suite runs)
    return np.random.default_rng(1234)
