"""Shared helpers for foundation-model implementations."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def init_from_specs(rng, specs) -> dict[str, jax.Array]:
    """Random-init a parameter dict from (name, shape, kind) specs.

    Kinds: ``ones`` / ``zeros`` / ``logit_scale`` (ln(1/0.07)) /
    ``logit_scale_siglip`` (ln 10) / ``embed`` (σ=0.02) / anything else →
    normal with σ = fan_in**-0.5. One scheme serves every tower; per-model
    differences live in the specs, not in copies of this loop.
    """
    params = {}
    for name, shape, kind in specs:
        rng, sub = jax.random.split(rng)
        if kind == "ones":
            params[name] = jnp.ones(shape, jnp.float32)
        elif kind == "zeros":
            params[name] = jnp.zeros(shape, jnp.float32)
        elif kind == "logit_scale":
            params[name] = jnp.asarray(math.log(1 / 0.07), jnp.float32)
        elif kind == "logit_scale_siglip":
            params[name] = jnp.asarray(math.log(10.0), jnp.float32)
        else:
            fan_in = shape[0] if len(shape) <= 2 else int(np.prod(shape[:-1]))
            std = 0.02 if kind == "embed" else fan_in**-0.5
            params[name] = jax.random.normal(sub, shape, jnp.float32) * std
    return params
