"""Torch-exact SGD with momentum, weight decay, parameter groups and the
reference's MultiStep + warmup learning-rate policy.

Matches ``optim.SGD(momentum=0.9, weight_decay=1e-5)`` semantics
(``train_fine.py:130``): ``g += wd*p; buf = m*buf + g; p -= lr*buf``, with the
fusion parameter group (names containing ``rw``/``mix``) at 10× LR
(``train_coarse_fineFEAT.py:137-141``).  The learning rate is a traced scalar
argument, so warmup (``train_fine.py:258-263``) and MultiStepLR decays don't
retrigger compilation.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SGDState:
    momentum: Any  # pytree of momentum buffers, like params


def sgd_init(params) -> SGDState:
    return SGDState(momentum=jax.tree.map(jnp.zeros_like, params))


def fusion_lr_scale(path_key: str, scale: float = 10.0) -> float:
    """10× LR for fusion params, mirroring the reference's name-substring rule
    (``'rw' in name or 'mix' in name``, ``train_coarse_fineFEAT.py:139``)."""
    return scale if ("rw" in path_key or "mix" in path_key) else 1.0


def _lr_scales(params, scale_fn: Callable[[str], float] | None):
    if scale_fn is None:
        return jax.tree.map(lambda _: 1.0, params)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    scales = [scale_fn(jax.tree_util.keystr(k)) for k, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, scales)


def sgd_update(
    params,
    grads,
    state: SGDState,
    lr: jax.Array,
    momentum: float = 0.9,
    weight_decay: float = 1e-5,
    lr_scales=None,
):
    """One SGD step.  ``lr_scales`` is an optional pytree of per-leaf scalars
    (from :func:`_lr_scales`/:func:`fusion_lr_scale`)."""
    if lr_scales is None:
        lr_scales = jax.tree.map(lambda _: 1.0, params)

    def upd(p, g, buf, s):
        g = g + weight_decay * p
        buf = momentum * buf + g
        return p - (lr * s) * buf, buf

    out = jax.tree.map(upd, params, grads, state.momentum, lr_scales)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
    new_momentum = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, SGDState(momentum=new_momentum)


class MultiStepSchedule:
    """``MultiStepLR`` + linear warmup, host-side (mirrors
    ``train_fine.py:131, 258-263``).

    ``milestones`` are scheduler-epoch counts (one scheduler step per
    validation phase in the reference loop); call :meth:`epoch_step` after
    each val phase and :meth:`lr` per optimisation step.
    """

    def __init__(self, init_lr: float, milestones: Sequence[int],
                 gamma: float = 0.1, warmup_steps: int = 0):
        self.init_lr = init_lr
        self.milestones = sorted(milestones)
        self.gamma = gamma
        self.warmup_steps = warmup_steps
        self.epoch = 0

    def epoch_step(self) -> None:
        self.epoch += 1

    def in_warmup(self, step: int) -> bool:
        """The reference's ``lr_warmup`` window: ``start_after=1`` and
        ``cur_steps < warmup_steps`` (``train_fine.py:258-261``)."""
        return 1 < step < self.warmup_steps

    def lr(self, step: int) -> float:
        # lr_warmup() writes ``lr_scale * init_lr`` to every param group,
        # ignoring any MultiStepLR decay already applied
        # (``train_fine.py:258-263``) — it scales *init_lr*, not the decayed
        # LR.  (With the released configs warmup never spans a milestone, but
        # the semantics matter if it does.)
        if self.in_warmup(step):
            return self.init_lr * min(1.0, float(step + 1) / self.warmup_steps)
        decays = sum(1 for m in self.milestones if self.epoch >= m)
        return self.init_lr * (self.gamma ** decays)

    def state_dict(self) -> Dict[str, Any]:
        return {"epoch": self.epoch}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.epoch = int(d["epoch"])


class CosineSchedule:
    """Half-period cosine decay with linear warmup, per optimisation step.

    The Kinetics pretraining policy of the X3D recipe that produced the
    reference's pretrained trunk (``train_fine.py:104`` assumes such a
    checkpoint; the reference ships no pretraining code).  Step-indexed, so
    it resumes exactly from ``TrainState.step``; :meth:`epoch_step` is kept
    for interface parity with :class:`MultiStepSchedule` (cosine ignores
    scheduler epochs).
    """

    def __init__(self, init_lr: float, total_steps: int,
                 warmup_steps: int = 0, final_lr: float = 0.0):
        self.init_lr = init_lr
        self.total_steps = max(int(total_steps), 1)
        self.warmup_steps = warmup_steps
        self.final_lr = final_lr
        self.epoch = 0

    def epoch_step(self) -> None:
        self.epoch += 1

    def in_warmup(self, step: int) -> bool:
        return step < self.warmup_steps

    def lr(self, step: int) -> float:
        if self.warmup_steps and step < self.warmup_steps:
            return self.init_lr * float(step + 1) / self.warmup_steps
        span = max(self.total_steps - self.warmup_steps, 1)
        t = min(max(step - self.warmup_steps, 0) / span, 1.0)
        return self.final_lr + 0.5 * (self.init_lr - self.final_lr) * (
            1.0 + math.cos(math.pi * t))

    def state_dict(self) -> Dict[str, Any]:
        return {"epoch": self.epoch}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.epoch = int(d["epoch"])


def build_schedule(cfg, steps_per_epoch: int | None = None):
    """Schedule factory over ``DriverConfig``: ``lr_schedule='multistep'``
    (the reference's detection policy) or ``'cosine'`` (the Kinetics
    pretraining policy).  The cosine horizon is ``cfg.total_steps`` when
    set, else ``max_steps``, else ``max_epochs * steps_per_epoch``."""
    if cfg.lr_schedule == "cosine":
        total = cfg.total_steps or cfg.max_steps or (
            cfg.max_epochs * max(steps_per_epoch or 1, 1))
        return CosineSchedule(cfg.init_lr, total,
                              warmup_steps=cfg.warmup_steps,
                              final_lr=cfg.cosine_final_lr)
    if cfg.lr_schedule != "multistep":
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    return MultiStepSchedule(cfg.init_lr, cfg.lr_milestones,
                             warmup_steps=cfg.warmup_steps)
