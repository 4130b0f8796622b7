"""Flat Euclidean manifold of (p, n) matrices.

Equivalent of Manopt's ``euclideanfactory(n, p)``
(manopt7.0/manopt/manifolds/euclidean/euclideanfactory.m), used by the
general primal/dual drivers (ManiSDP.m:53, ManiDSDP.m:60).  typicaldist
depends on the ACTIVE dimension n*p, so it takes the runtime active rank.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import frob_inner, frob_norm


class Euclidean:
    name = "euclidean"

    inner = staticmethod(frob_inner)
    norm = staticmethod(frob_norm)

    @staticmethod
    def proj(x, u):
        return u

    tangent = proj

    @staticmethod
    def transp(x1, x2, d):
        return d

    @staticmethod
    def retr(x, d):
        return x + d

    @staticmethod
    def zerovec(x):
        return jnp.zeros_like(x)

    @staticmethod
    def typicaldist(p, n):
        # sqrt(n*p) with the ACTIVE rank (euclideanfactory.m:57)
        return jnp.sqrt(jnp.asarray(p, dtype=jnp.float64) * n)

    @staticmethod
    def rand(key, p, n, p_pad=None, dtype=jnp.float64):
        p_pad = p if p_pad is None else p_pad
        y = jax.random.normal(key, (p, n), dtype=dtype)
        if p_pad > p:
            y = jnp.concatenate(
                [y, jnp.zeros((p_pad - p, n), dtype=dtype)], axis=0)
        return y

    @staticmethod
    def renormalize(y):
        return y
