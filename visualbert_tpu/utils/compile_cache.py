"""Persistent XLA compilation cache.

The production train step is one large XLA program (12 unrolled layers ×
``steps_per_dispatch`` scan, fused optimizer); on the remote-TPU transport a
cold compile takes minutes. The reference pays an analogous one-time cost
per process via torch's eager CUDA kernel loading, but re-pays tracing on
every restart; here one line makes recompiles of an unchanged program a
disk read. Called by ``train_cli`` and ``bench.py`` before the first jit.

Opt out (or redirect) with VISUALBERT_JAX_CACHE=0 / =<dir>.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/visualbert_jax_cache"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache; returns the dir (or None
    when disabled). Safe to call more than once."""
    env = os.environ.get("VISUALBERT_JAX_CACHE")
    if env == "0":
        return None
    path = path or env or DEFAULT_DIR
    import jax

    # first caller wins: once a run has a cache dir (e.g. the test
    # conftest's), an in-process CLI invocation must not re-point it —
    # jax's cache singleton would ignore the change after first use
    # anyway, so honoring the original dir keeps config and reality equal
    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    if current:
        if current != path:
            import warnings

            warnings.warn(
                f"compilation cache already configured at {current!r}; "
                f"ignoring requested redirect to {path!r} (first caller wins "
                "— jax's cache singleton would not re-point after first use)",
                stacklevel=2,
            )
        return current
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # persist everything over 1s: the test suite's wall time is spread
        # over many 1-5s XLA-CPU compiles that a 5s threshold left cold
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # very old jax without the knobs — cache is best-effort
        return None
    return path
