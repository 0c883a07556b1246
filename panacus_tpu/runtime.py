"""JAX runtime configuration: persistent compilation cache + device info.

CLI invocations are short-lived processes; the persistent compilation cache
makes every run after the first skip XLA compilation entirely.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("panacus")

_CONFIGURED = False


def configure_jax() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    cache_dir = os.environ.get(
        "PANACUS_TPU_JAX_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "panacus_tpu", "jax",
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover
        log.debug("could not enable jax compilation cache: %s", e)


def device_summary() -> str:
    import jax

    devs = jax.devices()
    return f"{len(devs)}x {devs[0].device_kind}" if devs else "no devices"
