"""Sequence-parallel multi-stage fusion (SURVEY.md §5 stretch goal).

The fusion attention contracts over fine time ``T_f``
(:func:`..ops.reweight.reweight_aggregate`); for very long videos the cached
fine-feature bank can exceed one chip's HBM.  Here ``T_f`` is sharded across
the mesh: each device computes partial numerator/denominator over its time
shard and a single ``psum`` over ICI combines them — the canonical
sequence-parallel decomposition of attention-like sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_EXACT = jax.lax.Precision.HIGHEST


def sequence_sharded_reweight(
    feat: jax.Array,    # (B, T_f, H, W, C) — T_f sharded over `axis`
    gate: jax.Array,    # (B, T_f, H, W)
    align: jax.Array,   # (B, T_f, T_c)
    mask: jax.Array,    # (B, T_f)
    mesh: Mesh,
    axis: str = "data",
    eps: float = 1e-6,
) -> jax.Array:
    """Reweight aggregation with the fine-time axis sharded across devices.

    Numerically identical to :func:`..ops.reweight.reweight_aggregate`
    (partial sums + one psum; the ``eps`` lands after the global reduction,
    matching ``x3d_coarse.py:224``).  Output is replicated.
    """

    def local(feat, gate, align, mask):
        am = gate * mask[:, :, None, None]
        dt = feat.dtype
        denom = jnp.einsum("bthw,btl->blhw", am, align, precision=_EXACT,
                           preferred_element_type=dt)
        numer = jnp.einsum("bthwc,bthw,btl->blhwc", feat, am, align,
                           precision=_EXACT, preferred_element_type=dt)
        denom = jax.lax.psum(denom, axis)
        numer = jax.lax.psum(numer, axis)
        return numer / (denom + eps)[..., None]

    seq = P(None, axis)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), seq),
        out_specs=P(),
    )(feat, gate, align, mask)


def shard_time(x: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Place an array with its time axis (axis 1) sharded over the mesh."""
    spec = [None] * x.ndim
    spec[1] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
