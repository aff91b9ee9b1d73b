"""maybe_jit: functions that inline under an enclosing trace but run as
cached jax.jit programs when called eagerly.

Eager per-op dispatch in this environment is very slow, while nested-jit call
boundaries inside large traces slow XLA compilation — this decorator gives
both callers the fast path.
"""

from __future__ import annotations

import functools

import jax


def _has_tracer(tree) -> bool:
    return any(isinstance(leaf, jax.core.Tracer) for leaf in jax.tree_util.tree_leaves(tree))


def maybe_jit(fn=None, *, static_argnums=()):
    def deco(f):
        jitted = jax.jit(f, static_argnums=static_argnums)

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            if _has_tracer((args, kwargs)):
                return f(*args, **kwargs)
            return jitted(*args, **kwargs)

        wrapper.__wrapped_raw__ = f
        return wrapper

    return deco(fn) if fn is not None else deco
