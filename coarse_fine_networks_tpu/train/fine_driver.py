"""Fine-stream training driver (re-design of ``train_fine.py``).

Same loop shape as the reference: each outer cycle runs
``train_phases_per_val`` training phases then one validation phase
(``train_fine.py:147``); SubBN stats aggregate before eval
(``train_fine.py:157``); a checkpoint lands every ``ckpt_every`` steps
(``train_fine.py:245-249``); APMeter tracks per-frame mAP over valid frames.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..data import (
    CharadesDataset,
    CenterCropScaled,
    Compose,
    MultiScaleRandomCropMultigrid,
    PrefetchLoader,
    RandomHorizontalFlip,
    collate_clips,
)
from ..metrics import APMeter
from ..models import FineNet
from ..parallel import make_mesh
from ..parallel.mesh import host_local_rows, replicate
from ..utils import get_logger
from .common import (
    iter_train_batches,
    load_pretrained,
    maybe_resume,
    model_batch,
    preemption_guard,
    save_train_state,
)
from .config import DriverConfig
from .multigrid import LongCycleSchedule
from .optim import build_schedule
from .state import TrainState
from .steps import (
    bn_aggregated,
    crop_reduced_loss as _crop_reduced_loss,
    jit_cache_size,
    make_eval_step,
    make_train_step,
    t_chunks as _t_chunks,
)

log = get_logger()


def build_transforms(cfg: DriverConfig):
    """Train: MultiScaleRandomCropMultigrid + deferred HFlip
    (train_fine.py:74-77); val: CenterCropScaled (train_fine.py:78-80).
    ToTensor/Normalize run on device."""
    train_t = Compose([
        MultiScaleRandomCropMultigrid(list(cfg.scales), cfg.crop_size),
        RandomHorizontalFlip(deferred=True),
    ])
    val_t = Compose([CenterCropScaled(cfg.crop_size)])
    return train_t, val_t


def build_fine_loaders(cfg: DriverConfig):
    train_t, val_t = build_transforms(cfg)
    common = dict(task="loc", frames=cfg.frames, gamma_tau=cfg.gamma_tau,
                  min_frames=cfg.min_frames, num_classes=cfg.num_classes,
                  crop_size=cfg.crop_size,
                  pack_dir=cfg.pack_dir)
    train_ds = CharadesDataset(cfg.anno, "training", cfg.root,
                               spatial_transform=train_t, crops=1, **common)
    val_ds = CharadesDataset(cfg.anno, "testing", cfg.root,
                             spatial_transform=val_t, crops=cfg.crops, **common)
    vbs = cfg.val_batch_size or max(cfg.batch_size // 2, 1)
    collate = lambda b: collate_clips(b, cfg.pad_t_multiple,  # noqa: E731
                                      cfg.pad_label_multiple)
    # Multi-process: each host loads only its slice of every global batch
    # (assembled on device by shard_batch / make_array_from_process_local_data).
    shard = None
    if jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    train_loader = PrefetchLoader(train_ds, cfg.batch_size, collate,
                                  shuffle=True, num_workers=cfg.num_workers,
                                  prefetch=cfg.prefetch, drop_last=True,
                                  seed=cfg.seed, shard=shard)
    val_collate = lambda b: collate_clips(  # noqa: E731
        b, cfg.pad_t_multiple, cfg.pad_label_multiple, bucket=cfg.val_bucket)
    val_loader = PrefetchLoader(
        val_ds, vbs, val_collate, shuffle=False,
        num_workers=cfg.num_workers, prefetch=cfg.prefetch,
        sort_key=val_ds.num_frames if cfg.val_length_sorted else None)
    return train_loader, val_loader


def _add_ap(apm: APMeter, probs: np.ndarray, labels: np.ndarray,
            masks: np.ndarray) -> None:
    """Accumulate AP over valid frames per sample (train_fine.py:215-222)."""
    valid = masks.sum(axis=1).astype(int)
    for b in range(labels.shape[0]):
        apm.add(probs[b, : valid[b]], labels[b, : valid[b]])


def _add_ap_batches(apm: APMeter, probs: np.ndarray, host_batches) -> None:
    """Accumulate AP for one train step; with gradient accumulation ``probs``
    carries a leading micro-step axis matching ``host_batches``."""
    if len(host_batches) > 1:
        for i, hb in enumerate(host_batches):
            _add_ap(apm, probs[i], hb["labels"], hb["masks"])
    else:
        _add_ap(apm, probs, host_batches[0]["labels"],
                host_batches[0]["masks"])


def run(cfg: DriverConfig) -> Dict[str, float]:
    """Preemption/crash-guarded driver entry: any interruption (SIGTERM
    from a preempted host, OOM, assertion) checkpoints the latest step
    before propagating, and ``maybe_resume`` continues from it on restart
    (aux failure-recovery subsystem; the reference loses everything since
    its last manual 1000-step save)."""
    from ..utils.hw import enable_compilation_cache

    enable_compilation_cache()
    state_box = {"state": None, "sched": None}
    with preemption_guard(cfg, "fine_charades", state_box):
        return _run_impl(cfg, state_box)


def _run_impl(cfg: DriverConfig, state_box) -> Dict[str, float]:
    # Deterministic-by-seed driver runs: the spatial transforms draw their
    # crop/flip parameters from the global `random` module (the reference's
    # own protocol, charades_fine.py:170-173) — seed it (and numpy) so two
    # runs with the same DriverConfig produce the same trajectory (with
    # num_workers=1; more workers interleave the draws).
    import random as _pyrandom

    _pyrandom.seed(cfg.seed)
    np.random.seed(cfg.seed)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    train_loader, val_loader = build_fine_loaders(cfg)
    log.info("train %d val %d videos", len(train_loader.dataset.data),
             len(val_loader.dataset.data))

    model = FineNet(
        version=cfg.x3d_version, n_classes=cfg.num_classes, task="loc",
        dropout_rate=cfg.dropout, bn_splits=cfg.base_bn_splits,
        compute_dtype=jnp.dtype(cfg.compute_dtype), remat=cfg.remat,
    )
    sample = next(iter(val_loader))
    init_clips = model_batch(sample, train=False)["clips"][:1]
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(cfg.seed)},
                           init_clips, False)
    )()
    if cfg.kinetics_ckpt:
        variables = load_pretrained(variables, cfg.kinetics_ckpt, "fine")
        log.info("loaded pretrained %s", cfg.kinetics_ckpt)
    state = TrainState.create(variables)
    sched = build_schedule(cfg, steps_per_epoch=len(train_loader))
    state_box["sched"] = sched
    state_box["loader"] = train_loader
    state = maybe_resume(cfg, "fine_charades", state, sched,
                         loader=train_loader)

    mesh = None
    if cfg.mesh_devices and cfg.mesh_devices > 1:
        mesh = make_mesh(cfg.mesh_devices)
        state = replicate(state, mesh)
        log.info("data-parallel mesh over %d devices", cfg.mesh_devices)

    def build_train_step(m):
        return make_train_step(m, align_corners=cfg.align_corners,
                               momentum=cfg.momentum,
                               weight_decay=cfg.weight_decay,
                               accum_steps=cfg.num_steps_per_update,
                               grad_clip=cfg.grad_clip)

    train_step = build_train_step(model)
    eval_step = make_eval_step(model, align_corners=cfg.align_corners)
    # hoisted out of the val phase so the chunked long-video programs stay
    # compiled across epochs; rebuilt only when the module itself changes
    # (a multigrid bn-split transition)
    chunk_apply = jax.jit(lambda v, c: model.apply(v, c, train=False))
    key = jax.random.PRNGKey(cfg.seed)

    # X3D long-cycle multigrid (activates the reference's dormant hooks:
    # x3d_fine.py:313-318, spatial_transforms.py:505-509): per phase the
    # dataset window/crop and loader batch change, and the module is rebuilt
    # with the phase's SubBN split count.
    tr_apm, val_apm = APMeter(), APMeter()
    results: Dict[str, float] = {}
    mg = None
    mg_state = (None, None)  # ((frames, crop, batch), bn_splits)
    if cfg.multigrid:
        mg = LongCycleSchedule(cfg.frames, cfg.crop_size, cfg.batch_size,
                               epochs_per_phase=cfg.multigrid_epochs_per_phase)
        results_phases: list = []
        results["multigrid_phases"] = results_phases  # mutated in place

    def mg_apply(epoch_idx: int, state):
        nonlocal model, train_step, eval_step, chunk_apply, mg_state
        shapes = mg.shapes(epoch_idx)
        splits = cfg.base_bn_splits * mg.phase(epoch_idx).bn_split_scale
        if (shapes, splits) == mg_state:
            return state, shapes[2]
        frames, crop, bsz = shapes
        train_loader.dataset.frames = frames * 2      # dataset convention
        train_loader.dataset.crop_size = crop
        train_loader.batch_size = bsz
        if splits != (mg_state[1] or cfg.base_bn_splits):
            new_stats, _ = mg.transition(epoch_idx, state.batch_stats,
                                         cfg.base_bn_splits)
            if mesh is not None:
                # transition builds host-side arrays; under the mesh they
                # must re-enter training replicated like the rest of state
                new_stats = replicate(new_stats, mesh)
            state = state.replace(batch_stats=new_stats)
            model = model.clone(bn_splits=splits)
            train_step = build_train_step(model)
            # the module (BN-split structure) changed: eval/chunk programs
            # must trace the new module too
            eval_step = make_eval_step(model, align_corners=cfg.align_corners)
            chunk_apply = jax.jit(
                lambda v, c: model.apply(v, c, train=False))
        mg_state = (shapes, splits)
        log.info("multigrid phase @ epoch %d: frames %d crop %d batch %d "
                 "bn_splits %d", epoch_idx, frames, crop, bsz, splits)
        results_phases.append((epoch_idx, frames, crop, bsz, splits))
        return state, bsz

    epochs = 0
    iterations_per_epoch = max(len(train_loader), 1)
    s_times = max(iterations_per_epoch // cfg.log_every_frac, 1)
    tot = {"loss": 0.0, "cls": 0.0, "loc": 0.0, "n": 0}

    while epochs < cfg.max_epochs:
        for phase in cfg.train_phases_per_val * ["train"] + ["val"]:
            if phase == "train":
                epochs += 1
                cur_bs = cfg.batch_size
                if mg is not None:
                    state, cur_bs = mg_apply(epochs - 1, state)
                for mb, host_batches in iter_train_batches(
                        train_loader, cfg, mesh, batch_size=cur_bs):
                    lr = jnp.asarray(sched.lr(int(state.step)), jnp.float32)
                    state, metrics = train_step(state, mb, lr, key)
                    state_box["state"] = state
                    tot["loss"] += float(metrics["loss"])
                    tot["cls"] += float(metrics["cls_loss"])
                    tot["loc"] += float(metrics["loc_loss"])
                    tot["n"] += 1
                    if cfg.record_trajectory:
                        results.setdefault("trajectory", []).append(
                            (int(state.step), float(lr),
                             float(metrics["loss"])))
                    _add_ap_batches(
                        tr_apm,
                        host_local_rows(
                            metrics["probs"],
                            axis=1 if len(host_batches) > 1 else 0),
                        host_batches)
                    step_i = int(state.step)
                    if step_i % s_times == 0:
                        log.info(
                            "epoch %d step %d lr %.5f loss %.4f cls %.4f "
                            "loc %.4f mAP %.4f", epochs, step_i, float(lr),
                            tot["loss"] / max(tot["n"], 1),
                            tot["cls"] / max(tot["n"], 1),
                            tot["loc"] / max(tot["n"], 1), tr_apm.mean())
                        results["train_map"] = tr_apm.mean()
                        if cfg.record_trajectory:
                            results.setdefault("train_map_log", []).append(
                                (step_i, results["train_map"]))
                        tr_apm.reset()
                        tot = {"loss": 0.0, "cls": 0.0, "loc": 0.0, "n": 0}
                    if step_i % cfg.ckpt_every == 0:
                        save_train_state(cfg, "fine_charades", state, sched,
                                         loader=train_loader)
                    if cfg.max_steps and step_i >= cfg.max_steps:
                        break
            else:
                eval_state = bn_aggregated(state)
                eval_vars = {"params": eval_state.params,
                             "batch_stats": eval_state.batch_stats}
                vloss = 0.0
                nval = 0
                for batch in val_loader:
                    mb = model_batch(batch, train=False)
                    t = mb["clips"].shape[1]
                    if t < cfg.t_lim_inference + 5:
                        out = eval_step(eval_state, mb, cfg.crops)
                    else:
                        # chunked long-video eval, mirroring the coarse
                        # stream's bounded windows
                        # (train_coarse_fineFEAT.py:215-224)
                        logits = jnp.concatenate([
                            chunk_apply(eval_vars, part) for part in
                            _t_chunks(mb["clips"], cfg.t_lim_inference)
                        ], axis=1)
                        out = _crop_reduced_loss(logits, mb, cfg.crops,
                                                 cfg.align_corners)
                    vloss += float(out["loss"])
                    nval += 1
                    _add_ap(val_apm, np.asarray(out["probs"]),
                            batch["labels"], batch["masks"])
                    if cfg.max_val_batches and nval >= cfg.max_val_batches:
                        break
                val_map = val_apm.mean()
                val_apm.reset()
                log.info("epoch %d VAL loss %.4f mAP %.4f (jit shapes: "
                         "eval %s chunk %s)", epochs,
                         vloss / max(nval, 1), val_map,
                         jit_cache_size(eval_step), jit_cache_size(chunk_apply))
                results.setdefault("val_jit_shapes", []).append(
                    (jit_cache_size(eval_step), jit_cache_size(chunk_apply)))
                results["val_map"] = val_map
                results["val_loss"] = vloss / max(nval, 1)
                sched.epoch_step()
            if cfg.max_steps and int(state.step) >= cfg.max_steps:
                return results
    return results
