"""Jitted train / eval steps for both streams.

The whole step — forward, logit upsampling to label rate, BCE losses,
backward, SGD update, BN-stat update — is one XLA program.  Under a
``jax.sharding.Mesh`` with the batch sharded on the ``data`` axis this is
data-parallel training: gradient/batch-norm reductions become ICI collectives
inserted by XLA (replacing the reference's ``nn.DataParallel``,
``train_fine.py:123``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.resample import linear_resize
from .losses import detection_loss
from .optim import fusion_lr_scale, _lr_scales, sgd_update
from .state import TrainState


def _forward_and_loss(model, params, batch_stats, batch, rng, train,
                      align_corners, mutable):
    """Shared forward: model → upsample logits to label length → masked probs
    → detection loss (train_fine.py:197-226)."""
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(train=train)
    rngs = {"dropout": rng} if train else None
    if "feats" in batch:
        args = (batch["clips"], batch["feats"], batch["feat_mask"],
                batch["meta"])
    else:
        args = (batch["clips"],)
    if train:
        logits, updates = model.apply(
            variables, *args, mutable=mutable, rngs=rngs, **kwargs
        )
        new_stats = updates["batch_stats"]
    else:
        logits = model.apply(variables, *args, rngs=rngs, **kwargs)
        new_stats = batch_stats

    tl = batch["labels"].shape[1]
    logits = linear_resize(logits, tl, align_corners=align_corners)
    probs = jax.nn.sigmoid(logits) * batch["masks"][:, :, None]
    total, cls, loc = detection_loss(probs, batch["labels"], batch["masks"])
    return total, (cls, loc, probs, new_stats)


def make_train_step(
    model,
    align_corners: bool = True,
    momentum: float = 0.9,
    weight_decay: float = 1e-5,
    fusion_lr_mult: Optional[float] = None,
    donate: bool = True,
    accum_steps: int = 1,
    grad_clip: Optional[float] = None,
) -> Callable:
    """Build the jitted train step.

    Args:
      align_corners: logit-upsampling convention — ``True`` for the fine driver
        (``train_fine.py:199``), ``False`` for the coarse driver
        (``train_coarse_fineFEAT.py:226``).
      fusion_lr_mult: if set, params whose path contains ``rw``/``mix`` train
        at ``lr * mult`` (``train_coarse_fineFEAT.py:137-141``).  The step
        also accepts a traced ``lr_fusion`` scalar that overrides
        ``lr * mult`` — the drivers use it to flatten the fusion group to the
        plain warmup LR, exactly as the reference's ``lr_warmup`` writes the
        same LR into *every* param group (``train_fine.py:258-263``).
      accum_steps: gradient accumulation — the reference's
        ``num_steps_per_update`` (``train_fine.py:65,226-232``).  When > 1 the
        batch pytree must carry a leading ``accum_steps`` micro-batch axis;
        one optimizer update is applied to the summed micro-grads of
        ``loss_i / accum_steps`` (identical math to the reference's
        ``loss.backward()`` per micro-batch + one ``optimizer.step()``), and
        BN running stats chain through the micro-batches in order, like
        ``num_steps_per_update`` sequential forwards do in torch.
      grad_clip: optional global-L2-norm gradient clip applied before the
        SGD update (``torch.nn.utils.clip_grad_norm_`` semantics: one scale
        factor ``clip / max(clip, |g|)`` over the whole grad pytree).  The
        reference never clips, so the default is off; it exists to bound the
        BN-scale-invariant drift of the coarse stream's fusion bias heads,
        which otherwise puts the usable fusion LR on a stability cliff
        (see tests/test_training_trajectory.py).
    """

    scale_fn = (
        functools.partial(fusion_lr_scale, scale=fusion_lr_mult)
        if fusion_lr_mult else None
    )

    def step(state: TrainState, batch: Dict[str, Any], lr: jax.Array,
             rng: jax.Array, lr_fusion: Optional[jax.Array] = None,
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params, stats, mb, mrng):
            return _forward_and_loss(model, params, stats, mb, mrng, True,
                                     align_corners, ["batch_stats"])

        if accum_steps == 1:
            (total, (cls, loc, probs, new_stats)), grads = jax.value_and_grad(
                lambda p: loss_fn(p, state.batch_stats, batch, rng),
                has_aux=True,
            )(state.params)
        else:
            def micro(carry, xs):
                stats, gacc, i = carry
                mb = xs
                mrng = jax.random.fold_in(rng, i)
                (tot_i, (cls_i, loc_i, probs_i, stats_i)), g = (
                    jax.value_and_grad(
                        lambda p: loss_fn(p, stats, mb, mrng), has_aux=True,
                    )(state.params)
                )
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (stats_i, gacc, i + 1), (tot_i, cls_i, loc_i, probs_i)

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, gsum, _), (tots, clss, locs, probs) = jax.lax.scan(
                micro, (state.batch_stats, g0, 0), batch)
            # grad of mean_i(loss_i / 1) / accum == the reference's
            # sum_i grad(loss_i / num_steps_per_update)
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            total, cls, loc = tots.mean(), clss.mean(), locs.mean()

        if grad_clip is not None:
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree.leaves(grads)))
            gscale = (grad_clip / jnp.maximum(gnorm, grad_clip)).astype(
                jnp.float32)
            grads = jax.tree.map(lambda g: (g * gscale).astype(g.dtype),
                                 grads)

        lr_scales = _lr_scales(state.params, scale_fn)
        if lr_fusion is None:
            eff_lr = jax.tree.map(lambda s: lr * s, lr_scales)
        else:
            eff_lr = jax.tree.map(
                lambda s: lr if s == 1.0 else lr_fusion, lr_scales)
        new_params, new_opt = sgd_update(
            state.params, grads, state.opt, jnp.float32(1.0),
            momentum=momentum, weight_decay=weight_decay, lr_scales=eff_lr,
        )
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt=new_opt,
            step=state.step + 1,
        )
        metrics = {"loss": total, "cls_loss": cls, "loc_loss": loc,
                   "probs": probs}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, align_corners: bool = True) -> Callable:
    """Eval step: running-stat BN (aggregate SubBN stats first —
    ``train_fine.py:157``), no dropout; returns loss terms and masked probs.

    Multi-crop max-reduction (``train_fine.py:204-207``) is applied when the
    batch carries ``crops > 1`` clips per sample: callers pass clips of shape
    ``(B*N, ...)`` and ``crops=N``; probs/logits are max-reduced over N.
    """

    def step(state: TrainState, batch: Dict[str, Any], crops: int = 1):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if "feats" in batch:
            args = (batch["clips"], batch["feats"], batch["feat_mask"],
                    batch["meta"])
        else:
            args = (batch["clips"],)
        logits = model.apply(variables, *args, train=False)
        tl = batch["labels"].shape[1]
        logits = linear_resize(logits, tl, align_corners=align_corners)
        if crops > 1:
            bn = logits.shape[0]
            logits = logits.reshape(bn // crops, crops, *logits.shape[1:])
            probs = jax.nn.sigmoid(logits)
            probs = jnp.max(probs, axis=1) * batch["masks"][:, :, None]
        else:
            probs = jax.nn.sigmoid(logits) * batch["masks"][:, :, None]
        total, cls, loc = detection_loss(probs, batch["labels"], batch["masks"])
        return {"loss": total, "cls_loss": cls, "loc_loss": loc, "probs": probs}

    return jax.jit(step, static_argnums=(2,))


def t_chunks(clips: jax.Array, t_lim: int):
    """Split a whole-video clip tensor into <=t_lim temporal windows
    (the chunked-inference bound, ``train_coarse_fineFEAT.py:215-224``)."""
    t = clips.shape[1]
    out = []
    for ti in range(0, t // t_lim + 1):
        part = clips[:, ti * t_lim : min(t, (ti + 1) * t_lim)]
        if part.shape[1]:
            out.append(part)
    return out


def crop_reduced_loss(logits: jax.Array, batch: Dict[str, Any], crops: int,
                      align_corners: bool) -> Dict[str, jax.Array]:
    """Eval tail shared with :func:`make_eval_step`: resize logits to label
    length, multi-crop max-reduce, masked probs, detection loss."""
    tl = batch["labels"].shape[1]
    logits = linear_resize(logits, tl, align_corners=align_corners)
    if crops > 1:
        bn = logits.shape[0]
        logits = logits.reshape(bn // crops, crops, *logits.shape[1:])
        probs = jnp.max(jax.nn.sigmoid(logits), axis=1)
    else:
        probs = jax.nn.sigmoid(logits)
    probs = probs * batch["masks"][:, :, None]
    total, cls, loc = detection_loss(probs, batch["labels"], batch["masks"])
    return {"loss": total, "cls_loss": cls, "loc_loss": loc, "probs": probs}


def jit_cache_size(fn) -> int:
    """Number of compiled programs held by a jitted callable (-1 if the
    runtime doesn't expose it) — the drivers log this after validation so
    shape-driven recompiles are visible."""
    try:
        return fn._cache_size()
    except Exception:
        return -1


def bn_aggregated(state: TrainState) -> TrainState:
    """Return a state with SubBN eval stats refreshed from split stats."""
    from ..models.layers import aggregate_sub_bn_stats

    return state.replace(batch_stats=aggregate_sub_bn_stats(state.batch_stats))
