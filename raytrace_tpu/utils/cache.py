"""Persistent XLA compilation cache.

The megakernel programs take minutes to compile on TPU (the whole bounce
loop is one Pallas kernel); a process restart should never pay that twice.
JAX's persistent cache stores serialized executables keyed on the traced
computation + compile options + backend, so a second process with the same
scene shape skips straight to execution.

The reference has no analogue (Rust ahead-of-time compiles its shaders at
build time via vulkano_shaders, shaders/src/lib.rs:8-46) — this is the
JIT-world equivalent of that build cache.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str:
    """Idempotently point JAX's persistent compilation cache at `path`
    (default: $RAYTRACE_TPU_CACHE or ~/.cache/raytrace_tpu/xla)."""
    global _enabled
    import jax

    cache_dir = (path
                 or os.environ.get("RAYTRACE_TPU_CACHE")
                 or os.path.join(os.path.expanduser("~"),
                                 ".cache", "raytrace_tpu", "xla"))
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Kernel compiles are the expensive ones, but cache everything that
    # took real compile effort; entry size is irrelevant on local disk.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
