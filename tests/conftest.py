"""Test configuration: force an 8-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4).

Note: the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel), so the
env var alone is not enough — we override via jax.config after import, which
takes effect because no backend has been initialised yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env vars)

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeated test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

# Modules dominated by end-to-end work (full fit() runs, subprocess CLIs,
# live HTTP servers, artifact export roundtrips, multi-process meshes).
# Auto-marked `slow` at collection so `pytest -m "not slow"` is the
# oracle-core smoke subset (numerics/oracle/unit tests, < 10 min on the
# 1-core dev host); the full suite (no filter) stays the CI-style gate.
# Membership measured with --durations on this host (CLAUDE.md records
# both runtimes).
_SLOW_MODULES = {
    "test_cli.py",
    "test_export.py",
    "test_integration.py",
    "test_multihost.py",
    "test_preemption.py",
    "test_rerank_serving.py",
    "test_resume.py",
    "test_server.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


def cpu_subprocess_env(**extra):
    """Environment for CPU-only subprocesses spawned by tests.

    Forces the cpu platform AND removes the TPU-plugin autoload trigger
    (PALLAS_AXON_POOL_IPS): when it is set, this machine's sitecustomize
    claims the shared TPU chip at *interpreter start* — before any user
    code runs — and that claim can block 100-300 s during chip contention
    windows. A subprocess that only ever wants CPU must not pay (or flake
    on) that claim. Harmless elsewhere: the variable simply isn't set.
    """
    env = {
        k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"
    }
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra)
    return env
