"""Tiny vector helpers for device code.

``jnp.linalg.norm`` is a nested jit: inside a while-loop body XLA
materializes its [R, 1] keepdims output, which the (8, 128) tile layout
pads 128x — at 9M rays that is a 4.5 GB HLO temp PER normalize (observed
in the compiler's OOM dump).  These helpers are plain fused ops on [R]
shapes instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def norm(v):
    """Euclidean length along the last axis, shape [...]."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def normalize(v, eps=1e-20):
    """v / max(|v|, eps), broadcasting the [..] inverse into [.., 3]."""
    inv = 1.0 / jnp.maximum(norm(v), eps)
    return v * inv[..., None]
