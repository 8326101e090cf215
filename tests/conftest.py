"""Test configuration: force the LOCAL CPU backend with 8 virtual devices.

The container's sitecustomize registers the remote-TPU ("axon") PJRT plugin
and selects jax_platforms="axon,cpu"; tests must run on a genuine local CPU
backend (fast compiles, no tunnel latency) with 8 fake devices so
multi-chip sharding paths are exercised without hardware — the TPU-world
analog of testing multi-node without a cluster (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

SCENES = "/root/reference/RayTracingOnCPU/example-scenes-cg22"


@pytest.fixture(scope="session")
def test_scene_paths():
    base = f"{SCENES}/test"
    return dict(
        basedir=base,
        xml=f"{base}/back.xml",
        obj=f"{base}/back.obj",
        mtl=f"{base}/back.mtl",
    )


@pytest.fixture(scope="session")
def test_scene(test_scene_paths):
    from tinyraytracing_tpu.models.scene import load_scene

    p = test_scene_paths
    return load_scene(p["xml"], p["obj"], p["mtl"], p["basedir"])


@pytest.fixture(scope="session")
def test_scene_bvh(test_scene_paths):
    from tinyraytracing_tpu.models.scene import load_scene

    p = test_scene_paths
    return load_scene(p["xml"], p["obj"], p["mtl"], p["basedir"], with_bvh=True)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
