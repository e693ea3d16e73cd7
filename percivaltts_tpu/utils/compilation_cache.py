"""Persistent XLA compilation cache for CLI entry points.

The reference (Keras) pays its graph-construction cost once per process and
amortizes it over a long run; this framework's CLI subcommands are separate
short processes, so every invocation would otherwise recompile the
generator/vocoder jit programs from scratch (tens of seconds per shape on
the tunneled v5e — the dominant cost of ``generate``/``synth`` runs).
Enabling JAX's persistent compilation cache makes every compile after the
first process-wide run a disk hit.

Opt out (or redirect) with the ``PERCIVAL_XLA_CACHE`` environment variable:
empty string disables, otherwise it overrides the cache directory
(default ``~/.cache/percivaltts_tpu/xla``).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Point JAX at the persistent compile cache. Returns the directory in
    use, or None when disabled. Must run before the first compilation (any
    time before works; earlier amortizes more)."""
    path = os.environ.get(
        "PERCIVAL_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "percivaltts_tpu", "xla"),
    )
    if not path:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
