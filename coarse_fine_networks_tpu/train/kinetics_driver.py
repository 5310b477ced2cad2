"""Kinetics-style pretraining driver (clip-level single-label classification).

The reference's transfer recipe starts from an already-pretrained Kinetics
X3D checkpoint (``train_fine.py:104-107``) but ships no pretraining code.
This driver trains :class:`..models.FineNet` with ``task='class'`` (global
average pooling over T×H×W, ``x3d_fine.py:252-253``) under softmax
cross-entropy, and saves checkpoints that ``DriverConfig.kinetics_ckpt``
partial-restores into the detection drivers (the 400→157 head swap —
``replace_logits``, ``train_fine.py:111``).

At-scale recipe knobs (the policy the reference's pretrained trunk came
from): ``lr_schedule='cosine'`` (half-period cosine + warmup),
``label_smoothing`` on the softmax CE, and ``multigrid=True`` to drive the
X3D long-cycle schedule through pretraining (frames/crop/batch cycle with
SubBN split rebuilds at phase boundaries — the same machinery as the fine
detection driver, ``x3d_fine.py:313-318``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..data.kinetics import KineticsDataset, collate_kinetics
from ..data.loader import PrefetchLoader
from ..models import FineNet
from ..parallel import make_mesh, shard_batch
from ..parallel.mesh import replicate
from ..utils import get_logger
from .common import preemption_guard, prepare_clips, save_train_state
from .common import maybe_resume
from .config import DriverConfig
from .fine_driver import build_transforms
from .multigrid import LongCycleSchedule
from .optim import build_schedule, sgd_update
from .state import TrainState
from .steps import bn_aggregated, jit_cache_size

log = get_logger()

PREFIX = "kinetics_x3d"


def _class_batch(batch, dtype=jnp.float32):
    return {
        "clips": prepare_clips(batch, train=True, dtype=dtype),
        "labels": jnp.asarray(batch["labels"]),
    }


def smoothed_ce(logits: jax.Array, labels: jax.Array,
                smoothing: float = 0.0) -> jax.Array:
    """Per-sample label-smoothed softmax cross-entropy.

    ``(1-eps)·NLL(target) + eps·mean_c(-log p_c)`` — the uniform-smoothing
    form of the Kinetics pretraining recipe.  ``smoothing=0`` is plain CE.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if smoothing == 0.0:
        return nll
    return (1.0 - smoothing) * nll + smoothing * (-logp.mean(axis=1))


def make_class_train_step(model, momentum: float = 0.9,
                          weight_decay: float = 5e-5,
                          label_smoothing: float = 0.0):
    """Jitted softmax-CE train step (fwd+bwd+SGD+BN update in one program)."""

    def step(state: TrainState, batch, lr, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["clips"], True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            logits = logits[:, 0].astype(jnp.float32)   # (B, n_classes)
            ce = smoothed_ce(logits, batch["labels"], label_smoothing)
            return ce.mean(), (upd["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = sgd_update(
            state.params, grads, state.opt, lr, momentum=momentum,
            weight_decay=weight_decay)
        acc = jnp.mean(
            (jnp.argmax(logits, axis=1) == batch["labels"]).astype(
                jnp.float32))
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "acc": acc}

    return jax.jit(step, donate_argnums=(0,))


def make_class_eval_step(model):
    def step(state: TrainState, batch):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["clips"], False)
        logits = logits[:, 0].astype(jnp.float32)
        ce = smoothed_ce(logits, batch["labels"])
        acc = (jnp.argmax(logits, axis=1) == batch["labels"]).astype(
            jnp.float32)
        return {"loss": ce.mean(), "acc": acc.mean()}

    return jax.jit(step)


def run(cfg: DriverConfig) -> Dict[str, float]:
    """Preemption-guarded pretraining loop; ``cfg.anno`` points at the
    Kinetics-style JSON (see ``data/kinetics.py``)."""
    from ..utils.hw import enable_compilation_cache

    enable_compilation_cache()
    state_box = {"state": None, "sched": None}
    with preemption_guard(cfg, PREFIX, state_box):
        return _run_impl(cfg, state_box)


def _run_impl(cfg: DriverConfig, state_box) -> Dict[str, float]:
    train_t, val_t = build_transforms(cfg)
    common = dict(frames=cfg.frames, gamma_tau=cfg.gamma_tau,
                  min_frames=cfg.min_frames, crop_size=cfg.crop_size)
    train_ds = KineticsDataset(cfg.anno, "training", cfg.root,
                               spatial_transform=train_t, **common)
    val_ds = KineticsDataset(cfg.anno, "validation", cfg.root,
                             spatial_transform=val_t, **common)
    log.info("kinetics train %d val %d videos", len(train_ds), len(val_ds))

    collate = lambda b: collate_kinetics(b, cfg.pad_t_multiple)  # noqa: E731
    shard = None
    if jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    vbs = cfg.val_batch_size or cfg.batch_size
    train_loader = PrefetchLoader(train_ds, cfg.batch_size, collate,
                                  shuffle=True, num_workers=cfg.num_workers,
                                  prefetch=cfg.prefetch, drop_last=True,
                                  seed=cfg.seed, shard=shard)
    val_loader = PrefetchLoader(val_ds, vbs, collate, shuffle=False,
                                num_workers=cfg.num_workers, shard=shard)

    dtype = jnp.dtype(cfg.compute_dtype)
    model = FineNet(version=cfg.x3d_version, n_classes=cfg.num_classes,
                    task="class", dropout_rate=cfg.dropout,
                    bn_splits=cfg.base_bn_splits, compute_dtype=dtype,
                    remat=cfg.remat)
    sample = next(iter(val_loader) if len(val_ds) else iter(train_loader))
    init_clips = _class_batch(sample, dtype)["clips"][:1]
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(cfg.seed)},
                           init_clips, False))()
    state = TrainState.create(variables)
    sched = build_schedule(cfg, steps_per_epoch=max(
        len(train_ds) // max(cfg.batch_size, 1), 1))
    state_box["sched"] = sched
    state_box["loader"] = train_loader
    state = maybe_resume(cfg, PREFIX, state, sched, loader=train_loader)

    # Same data-parallel surface as the detection drivers: replicated state,
    # batch sharded over the mesh (gradient all-reduce + global BN via XLA
    # collectives).  Multi-process runs REQUIRE the mesh — each host loads
    # only its shard and the global batch is assembled with
    # make_array_from_process_local_data; training per-host numpy batches
    # would silently optimise independent diverging models.
    mesh = None
    if cfg.mesh_devices and cfg.mesh_devices > 1:
        mesh = make_mesh(cfg.mesh_devices)
    elif jax.process_count() > 1:
        mesh = make_mesh()
    if mesh is not None:
        state = replicate(state, mesh)
        log.info("kinetics data-parallel mesh over %d devices",
                 mesh.devices.size)

    def build_train_step(m):
        return make_class_train_step(m, momentum=cfg.momentum,
                                     weight_decay=cfg.weight_decay,
                                     label_smoothing=cfg.label_smoothing)

    train_step = build_train_step(model)
    eval_step = make_class_eval_step(model)
    key = jax.random.PRNGKey(cfg.seed)

    results: Dict[str, float] = {}
    # X3D long-cycle multigrid through pretraining: per phase the clip
    # window / crop / batch change and SubBN split stats rebuild — same
    # dormant reference hooks as the fine driver (x3d_fine.py:313-318).
    mg = None
    mg_state = (None, None)
    if cfg.multigrid:
        mg = LongCycleSchedule(cfg.frames, cfg.crop_size, cfg.batch_size,
                               epochs_per_phase=cfg.multigrid_epochs_per_phase)
        results_phases: list = []
        results["multigrid_phases"] = results_phases  # mutated in place

    def mg_apply(epoch_idx: int, state):
        nonlocal model, train_step, eval_step, mg_state
        shapes = mg.shapes(epoch_idx)
        splits = cfg.base_bn_splits * mg.phase(epoch_idx).bn_split_scale
        if (shapes, splits) == mg_state:
            return state, shapes[2]
        frames, crop, bsz = shapes
        train_loader.dataset.frames = frames  # KineticsDataset: true length
        train_loader.dataset.crop_size = crop
        train_loader.batch_size = bsz
        if splits != (mg_state[1] or cfg.base_bn_splits):
            new_stats, _ = mg.transition(epoch_idx, state.batch_stats,
                                         cfg.base_bn_splits)
            if mesh is not None:
                new_stats = replicate(new_stats, mesh)
            state = state.replace(batch_stats=new_stats)
            model = model.clone(bn_splits=splits)
            train_step = build_train_step(model)
            eval_step = make_class_eval_step(model)
        mg_state = (shapes, splits)
        log.info("kinetics multigrid phase @ epoch %d: frames %d crop %d "
                 "batch %d bn_splits %d", epoch_idx, frames, crop, bsz,
                 splits)
        results_phases.append((epoch_idx, frames, crop, bsz, splits))
        return state, bsz

    epochs = 0
    while epochs < cfg.max_epochs:
        epochs += 1
        cur_bs = cfg.batch_size
        if mg is not None:
            state, cur_bs = mg_apply(epochs - 1, state)
        tot = {"loss": 0.0, "acc": 0.0, "n": 0}
        for batch in train_loader:
            if batch["clips"].shape[0] != cur_bs // \
                    jax.process_count():
                continue
            mb = _class_batch(batch, dtype)
            if mesh is not None:
                mb = shard_batch(mb, mesh)
            lr = jnp.asarray(sched.lr(int(state.step)), jnp.float32)
            state, m = train_step(state, mb, lr, key)
            state_box["state"] = state
            tot["loss"] += float(m["loss"])
            tot["acc"] += float(m["acc"])
            tot["n"] += 1
            step_i = int(state.step)
            if step_i % cfg.ckpt_every == 0:
                save_train_state(cfg, PREFIX, state, sched,
                                 loader=train_loader)
            if cfg.max_steps and step_i >= cfg.max_steps:
                break
        log.info("kinetics epoch %d loss %.4f top1 %.4f", epochs,
                 tot["loss"] / max(tot["n"], 1),
                 tot["acc"] / max(tot["n"], 1))
        results["train_loss"] = tot["loss"] / max(tot["n"], 1)
        results["train_top1"] = tot["acc"] / max(tot["n"], 1)

        if len(val_ds):
            eval_state = bn_aggregated(state)
            vtot = {"loss": 0.0, "acc": 0.0, "n": 0}
            for batch in val_loader:
                if (jax.process_count() > 1 and batch["clips"].shape[0]
                        != vbs // jax.process_count()):
                    continue  # ragged tail can't assemble a global batch
                vmb = _class_batch(batch, dtype)
                if mesh is not None:
                    vmb = shard_batch(vmb, mesh)
                out = eval_step(eval_state, vmb)
                vtot["loss"] += float(out["loss"])
                vtot["acc"] += float(out["acc"])
                vtot["n"] += 1
                if cfg.max_val_batches and vtot["n"] >= cfg.max_val_batches:
                    break
            log.info("kinetics epoch %d VAL loss %.4f top1 %.4f (jit %s)",
                     epochs, vtot["loss"] / max(vtot["n"], 1),
                     vtot["acc"] / max(vtot["n"], 1),
                     jit_cache_size(eval_step))
            results["val_top1"] = vtot["acc"] / max(vtot["n"], 1)
        sched.epoch_step()
        if cfg.max_steps and int(state.step) >= cfg.max_steps:
            break

    save_train_state(cfg, PREFIX, state, sched, loader=train_loader)
    return results
