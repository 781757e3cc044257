"""Platform selection. The environment's PJRT plugin prepends itself to
JAX_PLATFORMS, so env vars alone cannot force CPU; the runtime config switch
works as long as no backend has initialized."""

from __future__ import annotations

import jax


def select_platform(device: str) -> None:
    """device: 'tpu' (use the accelerator plugin) or 'cpu'."""
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # 'tpu': leave the plugin's default ordering (accelerator first)


def device_kind() -> str:
    return jax.devices()[0].device_kind
