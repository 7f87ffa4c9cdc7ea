"""Chunked-vmap helper.

`padded_map(fn, xs, batch_size)` is `jax.lax.map(fn, xs, batch_size=...)`
with the leading axis padded up to a multiple of the batch size (padding
replays element 0; its outputs are discarded).  Without padding, lax.map
compiles a *second* program for the remainder chunk — on CV workloads that
doubles compile time for no benefit.  One padded shape = one compilation,
at the cost of at most batch_size−1 wasted (tiny) fold fits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def padded_map(fn, xs, batch_size: int):
    """xs may be an array or a pytree of arrays sharing the leading axis."""
    n = jax.tree.leaves(xs)[0].shape[0]
    bs = max(1, min(batch_size, n))
    pad = (-n) % bs
    if pad:
        xs = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
            ),
            xs,
        )
    out = jax.lax.map(fn, xs, batch_size=bs)
    if pad:
        out = jax.tree.map(lambda o: o[:n], out)
    return out
