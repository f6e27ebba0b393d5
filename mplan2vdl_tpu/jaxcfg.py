"""Central JAX configuration: x64 mode + persistent compilation cache.

The TPU compile wall (ROADMAP, measured with tools/bisect_compile.py) is
dominated by ``lax.sort`` lowerings: ~20-90 s of XLA compile time per sort
shape (sort1 38 s, sort4 90 s, nonzero-with-size 61 s at 1.5 M rows), with
only mild growth in n.  The single biggest practical cut is to never pay a
given compile twice: JAX's persistent compilation cache keys executables by
(HLO, flags, toolchain) and makes repeat compiles near-instant across
processes — exactly the bench/CLI usage pattern where the same 22 query
programs are rebuilt every run.

Enabled by default under ``~/.cache/mplan2vdl_tpu/xla`` (override with
``MPLAN2VDL_JAX_CACHE=<dir>``, disable with ``MPLAN2VDL_JAX_CACHE=0``).
"""

from __future__ import annotations

import os

import jax

jax.config.update("jax_enable_x64", True)

_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "mplan2vdl_tpu", "xla"
)


def setup_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at a local directory.

    Returns the cache dir, or None when disabled.  Idempotent; safe to call
    before or after backend initialization (the cache is consulted lazily at
    each compile).
    """
    cache_dir = os.environ.get("MPLAN2VDL_JAX_CACHE", _DEFAULT_CACHE)
    if cache_dir in ("", "0", "off", "none"):
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Sorts dominate; but even 1 s compiles are worth caching for the suite.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


setup_compilation_cache()
