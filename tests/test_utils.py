"""utils/ tests: persistent-cache enablement."""

import os


def test_enable_persistent_cache_force_enables(tmp_path):
    """The axon platform is off JAX's cache allowlist; the helper must
    point the cache at the dir, create it, and force the used flag so
    entries are written on the next compile."""
    import jax
    from jax._src import compilation_cache as cc

    from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

    d = str(tmp_path / "cache")
    got = enable_persistent_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert cc._cache_used and cc._cache_checked
    # a fresh compile actually lands an entry (CPU backend serializes);
    # drop the min-compile-time floor — warm-process CPU compiles are
    # faster than the 0.2 s production floor
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    jax.jit(lambda x: jnp.tanh(x) @ x.T)(jnp.ones((256, 256))).block_until_ready()
    assert os.listdir(d), "no cache entry written"
