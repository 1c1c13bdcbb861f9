"""Persistent XLA compile cache shared by every entry point.

On the tunneled axon TPU backend a fresh process pays a full remote compile
per program (~100-200 s each; a runner compiles three: jitted init, the
train step / epoch scan, and the eval step).  With the persistent cache the
serialized executables are reused across processes — measured train-step
compile drops to ~3 s on a hit (BASELINE.md round-2 startup study).

Harmless no-op where the backend does not support executable
serialization, and on CPU (compiles there are fast but caching them is
still a small win for the 1-core test host).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at the repo-level ``.jax_cache/`` (or ``$CLIFFORDTPU_CACHE_DIR``).

    Must run before the first compilation; safe to call more than once.
    Returns the cache dir, or None if configuration failed.
    """
    import jax

    if path is None:
        path = os.environ.get("CLIFFORDTPU_CACHE_DIR")
    if path is None:
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(repo, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return path
    except Exception:  # pragma: no cover - config name drift across jax vers
        return None
