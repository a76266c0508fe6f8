"""Per-layer halo exchange along a mesh axis.

Sharded conv execution exchanges k//2 columns with each W-neighbour BEFORE
EVERY conv (not one big halo upfront): the monolithic network zero-pads each
layer's input at the image borders (SAME conv), and a layer's output inside a
pre-fetched halo region is NOT zero (relu(bias) leaks in), so only per-layer
exchange is bit-exact. A non-wrapping ppermute delivers zeros to shards with
no source — precisely the SAME-padding zeros at the true image edges.

For the integer path the exchange happens on the zero-point-SHIFTED tensor
(q - zero), because that is the domain in which the reference's F.conv2d
zero-pads (quan_func.py:289-293).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def halo_exchange_w(x, halo: int, axis):
    """(N, H, Wl, C) -> (N, H, Wl + 2*halo, C) along mesh axis `axis`.

    axis=None (or halo=0) means unsharded: plain zero extension.
    """
    if halo == 0:
        return x
    if axis is None:
        pad = jnp.zeros(x.shape[:2] + (halo,) + x.shape[3:], x.dtype)
        return jnp.concatenate([pad, x, pad], axis=2)
    n = lax.axis_size(axis)
    if n == 1:
        return halo_exchange_w(x, halo, None)
    send_right = [(i, i + 1) for i in range(n - 1)]   # my right edge -> their left halo
    send_left = [(i + 1, i) for i in range(n - 1)]    # my left edge -> their right halo
    left_halo = lax.ppermute(x[:, :, -halo:, :], axis, send_right)
    right_halo = lax.ppermute(x[:, :, :halo, :], axis, send_left)
    return jnp.concatenate([left_halo, x, right_halo], axis=2)
