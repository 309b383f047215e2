"""Persistent XLA/Mosaic compilation cache for every CLI entry point.

TPU compiles of the train-epoch, eval, and serving programs can take
minutes (Mosaic cold compiles 200+ s); caching them on disk makes
process restarts — a new training run, a serving-host restart after a
zero-downtime deploy, a resumed soak — skip straight to execution. The
reference has no analogue (torch eager has no compile step to cache);
this is TPU-runtime machinery the framework owns.

One policy, shared by training (engine/runner.py), serving
(inference/server.py), and the offline inference CLIs: default to
/tmp/jax_cache, override with JAX_COMPILATION_CACHE_DIR, disable with
"" or "0".
"""

import os


def enable_compile_cache() -> str:
    """Point JAX's persistent compilation cache at a disk directory.

    Returns the directory used ("" when disabled via
    JAX_COMPILATION_CACHE_DIR="" or "0"). Safe to call repeatedly and
    before or after other jax.config updates; must run before the first
    compilation to have an effect on it.
    """
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    if not cache_dir or cache_dir == "0":
        return ""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even fast compiles: serving warmup touches many small bucket
    # shapes whose compiles are individually cheap but add up at startup
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
