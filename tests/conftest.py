"""Test environment: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (the JAX-idiomatic fake
backend; SURVEY.md §4 item 4).

A pytest plugin imports jax before this conftest runs, so env vars alone are
too late; jax backends initialize lazily, so the runtime config switch below
still takes effect as long as no array has touched a device yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the suite is compile-bound (the trainer
# fwd+bwd and renderer programs cost minutes of XLA CPU compile on one
# core); with the cache warm a full-suite run drops several-fold. The dir
# is gitignored — the first run on a fresh checkout populates it.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def zju_root(tmp_path_factory):
    """Fabricated on-disk ZJU tree, built ONCE per suite run: writing the
    21-camera 1024^2 jpeg/png tree costs ~25 s on this 1-core box and two
    test files need it (dataset e2e + real-data drill)."""
    from test_dataset_fixtures import build_zju_tree

    return build_zju_tree(tmp_path_factory.mktemp("zju"))
