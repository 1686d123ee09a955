"""Persistent XLA compilation cache.

Cold compiles of the flagship denoise-scan variants cost 8–16 min through
the remote-compile relay (docs/PERF.md), and every bench/tool process pays
them again. A persistent on-disk cache keyed by HLO lets a later process
(including the driver's round-end ``bench.py`` run) reuse executables
compiled here. Backends whose PJRT plugin cannot serialize executables
silently fall back to compiling — enabling this is never worse.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    """Idempotently turn on JAX's persistent compilation cache."""
    import jax

    d = cache_dir or os.environ.get(
        "FYC_COMPILE_CACHE_DIR", "/tmp/fyc_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # only persist compiles that are actually expensive
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # flag name varies across jax versions
        pass
    return d
