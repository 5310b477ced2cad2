"""Coarse-stream training driver (re-design of ``train_coarse_fineFEAT.py``).

Differences from the fine loop: trains on clips **plus cached fine features**;
fusion params (``rw``/``mix``) at 10× LR (``train_coarse_fineFEAT.py:137-141``);
two train phases per val (``:162``); logit upsampling without align_corners
(``:226``); chunked inference for long validation videos with a per-chunk
``meta`` start-offset advance (``:215-224``); validation emits the
``Charades_v1_localize`` 25-frame CSV (``:249-263``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..data import CharadesDataset, PrefetchLoader, collate_coarse
from ..metrics import APMeter, LocalizeCSVWriter, subsample_25
from ..models import CoarseNet
from ..ops.resample import linear_resize
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
from .fine_driver import build_transforms, _add_ap_batches
from .optim import build_schedule
from .state import TrainState
from .steps import (
    bn_aggregated,
    jit_cache_size,
    make_eval_step,
    make_train_step,
)

log = get_logger()


def build_coarse_loaders(cfg: DriverConfig):
    train_t, val_t = build_transforms(cfg)
    common = dict(task="loc", frames=cfg.frames, gamma_tau=cfg.gamma_tau,
                  min_frames=cfg.min_frames, num_classes=cfg.num_classes,
                  crop_size=cfg.crop_size, fine_feat_dir=cfg.fine_feat_dir,
                  pack_dir=cfg.pack_dir)
    train_ds = CharadesDataset(cfg.anno, "training", cfg.root,
                               spatial_transform=train_t, crops=1, **common)
    val_ds = CharadesDataset(cfg.anno, "testing", cfg.root,
                             spatial_transform=val_t, crops=cfg.crops, **common)
    collate = lambda b: collate_coarse(b,  # noqa: E731
                                       pad_t_multiple=cfg.pad_t_multiple,
                                       pad_label_multiple=cfg.pad_label_multiple)
    shard = None
    if jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    train_loader = PrefetchLoader(train_ds, cfg.batch_size, collate,
                                  shuffle=True, num_workers=cfg.num_workers,
                                  prefetch=cfg.prefetch, drop_last=True,
                                  seed=cfg.seed, shard=shard)
    val_collate = lambda b: collate_coarse(  # noqa: E731
        b, pad_t_multiple=cfg.pad_t_multiple,
        pad_label_multiple=cfg.pad_label_multiple, bucket=cfg.val_bucket)
    val_loader = PrefetchLoader(
        val_ds, cfg.val_batch_size or 1, val_collate, shuffle=False,
        num_workers=cfg.num_workers, prefetch=cfg.prefetch,
        sort_key=val_ds.num_frames if cfg.val_length_sorted else None)
    return train_loader, val_loader


def _chunked_logits(apply_fn, variables, mb, t_lim: int):
    """Long-video eval in fixed windows, advancing ``meta[:, 0]`` per chunk
    (``train_coarse_fineFEAT.py:215-224``).  ``apply_fn`` is jitted — at most
    two shapes compile (full windows + the final remainder)."""
    clips = mb["clips"]
    t = clips.shape[1]
    outs = []
    meta = mb["meta"]
    for ti in range(0, t // t_lim + 1):
        part = clips[:, ti * t_lim : min(t, (ti + 1) * t_lim)]
        if part.shape[1] == 0:
            break
        logits = apply_fn(variables, part, mb["feats"], mb["feat_mask"], meta)
        outs.append(logits)
        meta = meta.at[:, 0].add(t_lim)
    return jnp.concatenate(outs, axis=1)


def run(cfg: DriverConfig) -> Dict[str, float]:
    """Preemption/crash-guarded driver entry: any interruption (SIGTERM
    from a preempted host, OOM, assertion) checkpoints the latest step
    before propagating, and ``maybe_resume`` continues from it on restart
    (aux failure-recovery subsystem; the reference loses everything since
    its last manual 1000-step save)."""
    from ..utils.hw import enable_compilation_cache

    enable_compilation_cache()
    state_box = {"state": None, "sched": None}
    with preemption_guard(cfg, "coarse_fineFEAT_charades", state_box):
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
    assert cfg.fine_feat_dir, "coarse training needs fine_feat_dir"
    train_loader, val_loader = build_coarse_loaders(cfg)
    log.info("train %d val %d videos", len(train_loader.dataset.data),
             len(val_loader.dataset.data))

    # stem_s2d_input: pre-s2d clips from device_normalize_s2d.  Composes
    # with a single-process data-parallel mesh (the producer emits the clips
    # batch-sharded, see iter_train_batches); multi-process hosts assemble
    # global arrays from local shards, which the producer doesn't cover.
    # TPU-backend-gated: forcing trunk_layout='fold4' on CPU would bypass
    # auto-resolution and fail on non-16-divisible crops (ADVICE r4).
    use_s2d = (cfg.stem_s2d_input
               and jax.process_count() == 1
               and jax.default_backend() == "tpu")
    model = CoarseNet(
        version=cfg.x3d_version, n_classes=cfg.num_classes, task="loc",
        dropout_rate=cfg.dropout, bn_splits=cfg.base_bn_splits,
        t_pool="grid", learned_mixing=True, is_mixing=True, crops=1,
        compute_dtype=jnp.dtype(cfg.compute_dtype), remat=cfg.remat,
        stem_s2d_input=use_s2d,
        **({"trunk_layout": "fold4"} if use_s2d else {}),
    )
    # multi-crop testing (x3d_coarse.py:209-211): a sibling module with the
    # crops attribute set — same parameters, different static config
    eval_model = (model if cfg.crops == 1 else
                  model.clone(crops=cfg.crops))
    sample = next(iter(val_loader))
    mb0 = model_batch(sample, train=False, s2d=use_s2d)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(cfg.seed)},
            mb0["clips"][:1, :16], mb0["feats"], mb0["feat_mask"], mb0["meta"],
            False,
        )
    )()
    if cfg.kinetics_ckpt:
        variables = load_pretrained(variables, cfg.kinetics_ckpt, "coarse")
        log.info("loaded pretrained %s", cfg.kinetics_ckpt)
    state = TrainState.create(variables)
    sched = build_schedule(cfg, steps_per_epoch=len(train_loader))
    state_box["sched"] = sched
    state_box["loader"] = train_loader
    state = maybe_resume(cfg, "coarse_fineFEAT_charades", state, sched,
                         loader=train_loader)

    mesh = None
    if cfg.mesh_devices and cfg.mesh_devices > 1:
        mesh = make_mesh(cfg.mesh_devices)
        state = replicate(state, mesh)

    fusion_mult = cfg.fusion_lr_mult or 10.0
    train_step = make_train_step(
        model, align_corners=cfg.align_corners, momentum=cfg.momentum,
        weight_decay=cfg.weight_decay, fusion_lr_mult=fusion_mult,
        accum_steps=cfg.num_steps_per_update, grad_clip=cfg.grad_clip,
    )
    eval_step = make_eval_step(eval_model, align_corners=cfg.align_corners)
    # hoisted out of the val phase: rebuilding this jit per validation would
    # discard its compile cache and recompile every chunked long-video shape
    # each epoch (the reference compiles nothing, but pays the same windows
    # every epoch too: train_coarse_fineFEAT.py:215-224)
    chunk_apply = jax.jit(
        lambda v, c, f, m, me: eval_model.apply(v, c, f, m, me, train=False))
    key = jax.random.PRNGKey(cfg.seed)

    tr_apm, val_apm = APMeter(), APMeter()
    results: Dict[str, float] = {}
    epochs = 0
    iterations_per_epoch = max(len(train_loader), 1)
    s_times = max(iterations_per_epoch // cfg.log_every_frac, 1)
    tot = {"loss": 0.0, "n": 0}

    while epochs < cfg.max_epochs:
        for phase in cfg.train_phases_per_val * ["train"] + ["val"]:
            if phase == "train":
                epochs += 1
                for mb, host_batches in iter_train_batches(train_loader, cfg,
                                                           mesh, s2d=use_s2d):
                    step_i = int(state.step)
                    lr_val = sched.lr(step_i)
                    # the reference's lr_warmup writes the same LR into every
                    # param group, flattening the 10x fusion group inside the
                    # warmup window (train_coarse_fineFEAT.py:137-141, 296-300)
                    lr_f = (lr_val if sched.in_warmup(step_i)
                            else lr_val * fusion_mult)
                    state, metrics = train_step(
                        state, mb, jnp.asarray(lr_val, jnp.float32), key,
                        jnp.asarray(lr_f, jnp.float32))
                    state_box["state"] = state
                    tot["loss"] += float(metrics["loss"])
                    tot["n"] += 1
                    _add_ap_batches(
                        tr_apm,
                        host_local_rows(
                            metrics["probs"],
                            axis=1 if len(host_batches) > 1 else 0),
                        host_batches)
                    step_i = int(state.step)
                    if cfg.record_trajectory:
                        results.setdefault("trajectory", []).append(
                            (step_i, float(lr_val), float(metrics["loss"])))
                    if step_i % s_times == 0:
                        log.info("epoch %d step %d lr %.5f (fusion %.5f) "
                                 "loss %.4f mAP %.4f",
                                 epochs, step_i, lr_val, lr_f,
                                 tot["loss"] / max(tot["n"], 1),
                                 tr_apm.mean())
                        results["train_map"] = tr_apm.mean()
                        if cfg.record_trajectory:
                            results.setdefault("train_map_log", []).append(
                                (step_i, results["train_map"]))
                        tr_apm.reset()
                        tot = {"loss": 0.0, "n": 0}
                    if step_i % cfg.ckpt_every == 0:
                        save_train_state(cfg, "coarse_fineFEAT_charades",
                                         state, sched, loader=train_loader)
                    if cfg.max_steps and step_i >= cfg.max_steps:
                        break
            else:
                eval_state = bn_aggregated(state)
                eval_vars = {"params": eval_state.params,
                             "batch_stats": eval_state.batch_stats}
                writer = (LocalizeCSVWriter(cfg.localize_csv)
                          if cfg.localize_csv else None)
                nval = 0
                for batch in val_loader:
                    mb = model_batch(batch, train=False,
                                     s2d=use_s2d)
                    t = mb["clips"].shape[1]
                    if t < cfg.t_lim_inference + 5:
                        out = eval_step(eval_state, mb, cfg.crops)
                        probs = np.asarray(out["probs"])
                    else:
                        logits = _chunked_logits(chunk_apply, eval_vars, mb,
                                                 cfg.t_lim_inference)
                        tl = mb["labels"].shape[1]
                        logits = linear_resize(logits, tl,
                                               cfg.align_corners)
                        if cfg.crops > 1:
                            # multi-crop max-reduce over sigmoid probs
                            # (train_coarse_fineFEAT.py:231-234)
                            bn = logits.shape[0]
                            logits = logits.reshape(bn // cfg.crops,
                                                    cfg.crops, tl, -1)
                            probs_c = jax.nn.sigmoid(logits)
                            probs = np.asarray(
                                jnp.max(probs_c, axis=1)
                                * mb["masks"][:, :, None]
                            )
                        else:
                            probs = np.asarray(
                                jax.nn.sigmoid(logits) * mb["masks"][:, :, None]
                            )
                    valid = batch["masks"].sum(axis=1).astype(int)
                    for b in range(probs.shape[0]):
                        p25, l25 = subsample_25(probs[b], valid[b],
                                                batch["labels"][b])
                        val_apm.add(p25, l25)
                        if writer is not None:
                            writer.add_video(batch["vids"][b], p25,
                                             float(batch["durs"][b]))
                    nval += 1
                    if cfg.max_val_batches and nval >= cfg.max_val_batches:
                        break
                if writer is not None:
                    writer.close()
                val_map = val_apm.mean()
                val_apm.reset()
                log.info("epoch %d VAL mAP(25fr) %.4f (jit shapes: eval %s "
                         "chunk %s)", epochs, val_map,
                         jit_cache_size(eval_step),
                         jit_cache_size(chunk_apply))
                results.setdefault("val_jit_shapes", []).append(
                    (jit_cache_size(eval_step), jit_cache_size(chunk_apply)))
                results["val_map"] = val_map
                sched.epoch_step()
            if cfg.max_steps and int(state.step) >= cfg.max_steps:
                return results
    return results
