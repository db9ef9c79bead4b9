"""Platform selection helpers.

The axon TPU plugin registers itself through sitecustomize and overrides
`JAX_PLATFORMS` via jax.config, so an explicit `JAX_PLATFORMS=cpu` in the
environment (virtual-device meshes, CI) is silently ignored. This restores
the documented env-var semantics before any engine spins up.
"""

from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    want = os.environ.get("JAX_PLATFORMS", "")
    if not want:
        return
    import jax

    if jax.config.jax_platforms != want:
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
        except Exception:
            pass
        jax.config.update("jax_platforms", want)
