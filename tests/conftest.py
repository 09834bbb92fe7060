"""Test configuration: force an 8-device virtual CPU mesh so every test
exercises the real SPMD code paths (sharding, collectives) without TPU
hardware. (SURVEY.md §4: the reference has no distributed test harness at all —
this is a capability upgrade.)

Note: env vars are too late here (the container's sitecustomize imports jax at
interpreter start), so we use jax.config.update before any backend is created.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process, big compiles)")


@pytest.fixture(scope="session")
def mesh8():
    from simpleaicv_tpu.parallel import MeshConfig, make_mesh
    return make_mesh(MeshConfig(data=4, fsdp=2))
