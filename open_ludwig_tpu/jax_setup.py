"""Process-level JAX configuration: persistent compilation cache.

The solver's scan bodies are large (a few thousand HLO ops across the unrolled
multi-level schedule) and this platform's XLA compile times run into minutes,
so caching compiled executables across processes matters for every entry point
(runner, bench, tests on TPU).
"""

import os


def setup_jax_cache(path: str = None) -> None:
    import jax

    # honor JAX_PLATFORMS=cpu: on this platform the axon TPU plugin claims
    # the default backend regardless of the env var (observed: devices()
    # shows the tunnel TPU under JAX_PLATFORMS=cpu); the config update is
    # what actually pins the backend.  Every entry point (runner, bench,
    # tools) routes through here, so "prepend JAX_PLATFORMS=cpu" behaves
    # as documented.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    cache = path or os.environ.get(
        "OPEN_LUDWIG_JAX_CACHE", os.path.expanduser("~/.cache/open_ludwig_jax")
    )
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
