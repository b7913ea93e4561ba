"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on the real TPU; tests must be hermetic and exercise the
multi-device sharding paths, so we force the CPU backend with 8 virtual
devices.  Note: this environment's sitecustomize force-selects the `axon` TPU
platform, so the env var alone is not enough — we must set the jax config
knob before any backend initializes.
"""

import os

import pytest

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent jit cache: repeat runs skip recompilation (the suite is
# compile-dominated on this 2-core box)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache-tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: exhaustive sweep / redundant parameterization; skipped unless "
        "RINGSNARK_SLOW=1.  The default tier keeps one representative case "
        "per code path; measured on this 2-core box it runs in ~6 min cold "
        "and ~3 min with a warm /root/jaxcache-tests compilation cache "
        "(timing recorded in DESIGN.md §test-tiers).",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RINGSNARK_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow sweep; set RINGSNARK_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
