"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware."""

import os

# NOTE: the axon TPU plugin in this image ignores JAX_PLATFORMS (plural);
# JAX_PLATFORM_NAME + an explicit config.update are required to get CPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA compiles each unique op graph once per
# machine instead of once per pytest run (cold compiles dominate runtime).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/test/scenes"
REFERENCE_IMAGES = "/root/reference/test/references"


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Free in-process executables after each test module.

    The full suite (~115 tests, hundreds of loaded CPU executables)
    segfaults the XLA CPU compiler inside backend_compile_and_load on a
    late big compile (test_scene_build::test_still_life_proxy_scene) —
    the same test passes in isolation, so the crash is accumulated
    in-process compiler/JIT state, not the graph itself.  Dropping the
    Python-side caches between modules releases the loaded executables
    (and their exec-page mappings); the persistent disk cache above
    makes the re-compiles cheap.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def cornell_scene_path():
    import os.path

    p = os.path.join(REFERENCE_SCENES, "cornell", "cornell_org.scene")
    if not os.path.exists(p):
        pytest.skip("reference cornell scene not available")
    return p
