"""JAX environment helpers: persistent compilation cache + backend setup.

The CLIs recompile the alignment pipeline on every process start; the
persistent compilation cache makes repeat invocations fast (XLA reloads
the compiled executable instead of re-tracing/compiling).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "GMAP_TPU_CACHE", os.path.expanduser("~/.cache/gmap_gsnap_tpu/jax")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these options


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Force the CPU backend (the ambient sitecustomize may pre-register
    a TPU backend); optionally with N virtual devices.  Must be called
    before any computation runs."""
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
