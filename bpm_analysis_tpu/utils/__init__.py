import os

from . import logging as logging_utils, profiling  # noqa: F401


def enable_persistent_compile_cache(cache_dir=None) -> None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    Compiles on the tunneled TPU go through a remote compiler and take tens
    of seconds; production front-ends (CLI/GUI/webapp) call this at startup
    so the pipeline programs compile once per shape ever.  ``JAX_COMPILATION_
    CACHE_DIR`` wins if set.  No-op on CPU backends: XLA:CPU AOT artifacts
    are machine-feature-specific and loading foreign entries risks SIGILL
    (see tests/conftest.py).
    """
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
        cache_dir = (os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir
                     or os.path.join(os.path.dirname(os.path.dirname(
                         os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # never let cache plumbing break an analysis run
        pass
