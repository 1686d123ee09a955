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

    # default under the repo (gitignored), not /tmp: the driver's round-end
    # bench runs in a LATER process on the same checkout, and /tmp does not
    # survive session restarts — a warm cache saves it ~10 min of relay
    # compile per variant
    repo_default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".cache", "jax_compile")
    d = cache_dir or os.environ.get("FYC_COMPILE_CACHE_DIR", repo_default)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # only persist compiles that are actually expensive
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # flag name varies across jax versions
        pass
    return d
