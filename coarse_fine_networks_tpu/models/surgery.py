"""Model surgery: head replacement for transfer learning and the multigrid
BN-split rebuild hook (functional equivalents of ``replace_logits``,
``x3d_fine.py:309-310`` / ``x3d_coarse.py:605-607``, and
``update_bn_splits_long_cycle``, ``x3d_fine.py:313-318``)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _dense_init(rng, in_dim: int, out_dim: int):
    """torch ``nn.Linear`` default init: U(-1/sqrt(in), 1/sqrt(in))."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / np.sqrt(in_dim)
    kernel = jax.random.uniform(k1, (in_dim, out_dim), jnp.float32,
                                -bound, bound)
    bias = jax.random.uniform(k2, (out_dim,), jnp.float32, -bound, bound)
    return kernel, bias


def replace_logits(params: Dict, n_classes: int, rng: jax.Array,
                   model_kind: str = "fine") -> Dict:
    """Swap the classifier head for a new class count.

    For the coarse model the logit-fusion layer ``rw6`` heads must also be
    rebuilt (``x3d_coarse.py:605-607``): its ``fc2``/``fc4`` output widths are
    class-dependent.
    """
    params = dict(params)
    k1, k2, k3 = jax.random.split(rng, 3)
    kernel, bias = _dense_init(k1, params["fc2"]["kernel"].shape[0], n_classes)
    params["fc2"] = {"kernel": kernel, "bias": bias}
    if model_kind == "coarse" and "rw6" in params:
        rw6 = dict(params["rw6"])
        for name, k in (("fc2", k2), ("fc4", k3)):
            in_dim = rw6[name]["kernel"].shape[0]
            kernel, bias = _dense_init(k, in_dim, n_classes)
            rw6[name] = {"kernel": kernel, "bias": bias}
        params["rw6"] = rw6
    return params


def set_bn_splits(batch_stats: Dict, num_splits: int) -> Dict:
    """Rebuild every SubBN's split running stats at an *absolute* split count
    (the long-cycle driver moves between phases whose split counts are not
    multiples of each other, so the relative :func:`update_bn_splits` cannot
    express a transition like 8 → 4)."""

    def rec(node):
        if isinstance(node, dict):
            if {"mean", "var", "split_mean", "split_var"} <= set(node.keys()):
                c = node["mean"].shape[0]
                out = dict(node)
                out["split_mean"] = jnp.zeros((num_splits * c,), jnp.float32)
                out["split_var"] = jnp.ones((num_splits * c,), jnp.float32)
                return out
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(batch_stats)


def update_bn_splits(batch_stats: Dict, scale: int) -> Dict:
    """Multigrid long-cycle hook: rebuild every SubBN's split running stats at
    ``num_splits * scale`` (fresh zeros/ones, like the reference's new
    ``nn.BatchNorm3d`` at ``x3d_fine.py:316-317``).

    Note the model's ``bn_splits`` attribute must be changed in lockstep
    (Flax modules are config-frozen, so construct a new module with the scaled
    ``bn_splits`` and use these stats).
    """

    def rec(node):
        if isinstance(node, dict):
            if {"mean", "var", "split_mean", "split_var"} <= set(node.keys()):
                c = node["mean"].shape[0]
                s = node["split_mean"].shape[0] // c
                out = dict(node)
                out["split_mean"] = jnp.zeros((s * scale * c,), jnp.float32)
                out["split_var"] = jnp.ones((s * scale * c,), jnp.float32)
                return out
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(batch_stats)
