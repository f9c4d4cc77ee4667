"""Persistent XLA compilation cache (compile times via the TPU tunnel are
high-variance; caching compiled executables across processes removes them)."""

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "READSB_TPU_JAX_CACHE", os.path.expanduser("~/.cache/readsb_tpu_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs
