"""Per-layer halo exchange along mesh axes.

Sharded conv execution exchanges k//2 rows/columns with each spatial
neighbour BEFORE EVERY conv (not one big halo upfront): the monolithic
network zero-pads each layer's input at the image borders (SAME conv), and a
layer's output inside a pre-fetched halo region is NOT zero (relu(bias)
leaks in), so only per-layer exchange is bit-exact. A non-wrapping ppermute
delivers zeros to shards with no source — precisely the SAME-padding zeros
at the true image edges.

For the integer path the exchange happens on the zero-point-SHIFTED tensor
(q - zero), because that is the domain in which the reference's F.conv2d
zero-pads (quan_func.py:289-293).

2D exchange (halo_exchange_2d) runs the H exchange first and the W exchange
on the H-EXTENDED tensor: the columns a W-neighbour sends then already
contain the rows it received from its own H-neighbour, so corner values
arrive from the diagonal neighbour in two hops — the standard trick that
avoids 8-way corner ppermutes. The reference's own tile walk is 2D
(output.py:42-65); this is its pod-scale analog.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def halo_exchange(x, halo: int, axis, dim: int = 2):
    """Extend array dim ``dim`` by ``halo`` on each side with neighbour data
    along mesh axis ``axis`` (None: zero extension, the unsharded limit).

    ``halo`` may exceed 1 (the packed (1,8) geometry under a k=5 kernel
    exchanges a 2-cell H halo, round 5); the exchange stays a single
    neighbour-to-neighbour ppermute as long as each shard owns at least
    ``halo`` elements along ``dim`` (asserted)."""
    if halo == 0:
        return x
    if axis is None:
        pad_shape = x.shape[:dim] + (halo,) + x.shape[dim + 1:]
        pad = jnp.zeros(pad_shape, x.dtype)
        return jnp.concatenate([pad, x, pad], axis=dim)
    n = lax.axis_size(axis)
    if n == 1:
        return halo_exchange(x, halo, None, dim)
    assert x.shape[dim] >= halo, (
        f"halo {halo} exceeds the local shard extent {x.shape[dim]} along "
        f"dim {dim} — a single-hop neighbour exchange cannot source it")
    send_right = [(i, i + 1) for i in range(n - 1)]  # my high edge -> their low halo
    send_left = [(i + 1, i) for i in range(n - 1)]   # my low edge -> their high halo
    hi_edge = [slice(None)] * x.ndim
    hi_edge[dim] = slice(x.shape[dim] - halo, None)
    lo_edge = [slice(None)] * x.ndim
    lo_edge[dim] = slice(None, halo)
    low_halo = lax.ppermute(x[tuple(hi_edge)], axis, send_right)
    high_halo = lax.ppermute(x[tuple(lo_edge)], axis, send_left)
    return jnp.concatenate([low_halo, x, high_halo], axis=dim)


def halo_exchange_w(x, halo: int, axis):
    """(N, H, Wl, C) -> (N, H, Wl + 2*halo, C) along mesh axis `axis`."""
    return halo_exchange(x, halo, axis, dim=2)


def halo_exchange_2d(x, halo, h_axis, w_axis):
    """(N, Hl, Wl, C) -> (N, Hl + 2*halo_h, Wl + 2*halo_w, C): H exchange,
    then W exchange of the extended tensor (corners via the diagonal
    neighbour in two hops). ``halo``: one int for both axes or an
    (halo_h, halo_w) pair — the packed (1,8) geometry exchanges 2 H-cells
    but 1 W-cell per k=5 layer."""
    halo_h, halo_w = (halo, halo) if isinstance(halo, int) else halo
    x = halo_exchange(x, halo_h, h_axis, dim=1)
    return halo_exchange(x, halo_w, w_axis, dim=2)
