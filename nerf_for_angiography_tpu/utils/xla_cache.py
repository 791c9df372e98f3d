"""Persistent XLA-executable cache enablement for the axon TPU backend.

JAX's persistent compilation cache gates on ``backend.platform in
("tpu", "gpu", "cpu", "neuron")`` (jax/_src/compilation_cache.py
``is_cache_used``). The tunneled TPU used here registers as platform
``"axon"``, so merely setting ``JAX_COMPILATION_CACHE_DIR`` never engages
the cache — every fresh process pays the full set of ~4-12 s remote
compiles (~150 s of a 20k-iteration quality run; benchmarks/QUALITY.md).

``enable_persistent_cache`` force-marks the cache as usable. This is safe
on backends without executable (de)serialization support: JAX wraps both
the cache read and the cache write in try/except that degrades to a
warning plus a normal compile (jax/_src/compiler.py ``_cache_read`` /
``_cache_write``), so the failure mode is exactly today's behavior.

Call it AFTER ``import jax`` and BEFORE the first compile, from every
TPU-facing entry point (bench.py, tools/quality_run.py, cli/*). Tests run
on CPU where the stock gate already allows caching; calling this there is
a no-op beyond marking the flag.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point the persistent compilation cache at ``path`` (default
    ``~/.jax_cache`` or ``$JAX_COMPILATION_CACHE_DIR``) and force-enable it
    for non-allowlisted platforms such as ``axon``. Returns the cache dir.
    """
    import jax
    from jax._src import compilation_cache as cc

    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache")
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # skip nothing: remote compiles are all multi-second, but the default
    # 1 s floor would also skip the handful of small host-side programs
    # whose re-compiles still ride the remote-compile round trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    with cc._cache_initialized_mutex:
        cc._cache_checked = True
        cc._cache_used = True
    return path
