"""Persistent XLA compilation cache for the CLI entry points.

The reference's users run the pipeline as a subprocess per scan batch
(``/root/reference/seg_main.py`` shells out per stage), so every process
would otherwise re-trace and re-compile the same programs (~20-40 s on a
cold TPU).  Enabling JAX's persistent compilation cache makes warm CLI
starts load the compiled executable from disk instead.

Environment overrides:

* ``UMICS_COMPILE_CACHE=0`` disables the cache entirely.
* ``UMICS_COMPILE_CACHE_DIR=/path`` relocates it (default
  ``~/.cache/umics/xla_cache``).
"""

from __future__ import annotations

import logging
import os

__all__ = ["enable_compilation_cache"]

log = logging.getLogger(__name__)

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "umics", "xla_cache"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache; returns its path.

    Call before the first jitted execution (imports are fine).  No-op (returns
    None) when ``UMICS_COMPILE_CACHE=0`` or the directory cannot be created.
    """
    if os.environ.get("UMICS_COMPILE_CACHE", "1") in ("0", "false", "off"):
        return None
    path = cache_dir or os.environ.get("UMICS_COMPILE_CACHE_DIR", DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        log.warning("compilation cache disabled: cannot create %s", path)
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # CLI programs are few and large; cache everything (the defaults skip
    # sub-second compiles, which would exclude the small eval/resize kernels
    # that still dominate warm-start latency on a tunneled device)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
