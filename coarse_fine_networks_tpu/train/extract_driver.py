"""Fine-feature extraction driver (re-design of ``extract_fineFEAT.py``).

One inference sweep over whole videos (``testing`` split, batch 1) with the
``global_tower`` FineNet, writing the 5 per-level feature tensors per video to
``save_dir/<key>/<vid>.npy`` — the cached bank consumed by the coarse stage
(``extract_fineFEAT.py:168-173``).  Features are stored channels-last
``(T, 7, 7, C)``; the coarse dataset also reads the reference's torch ``.pt``
layout for drop-in compatibility.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..data import (
    CharadesDataset,
    CenterCropScaled,
    Compose,
    PrefetchLoader,
    collate_clips,
)
from ..models import FineNet
from ..models.fine import FEAT_KEYS
from ..train.common import load_pretrained, model_batch
from ..utils import get_logger
from .config import DriverConfig

log = get_logger()


def run(cfg: DriverConfig, save_dir: str, fine_ckpt: Optional[str] = None,
        splits=("training", "testing")) -> int:
    """Returns the number of videos extracted.

    The reference extracts one split at a time with the split name edited by
    hand ("SET 'TESTING' FOR BOTH, TO EXTRACT", ``extract_fineFEAT.py:80``);
    here both splits are swept (``extract_feat=True`` forces whole-video
    sampling either way)."""
    from ..utils.hw import enable_compilation_cache

    enable_compilation_cache()
    for k in FEAT_KEYS:
        os.makedirs(os.path.join(save_dir, k), exist_ok=True)

    val_t = Compose([CenterCropScaled(cfg.crop_size)])
    datasets = [
        CharadesDataset(
            cfg.anno, split, cfg.root, spatial_transform=val_t, task="loc",
            frames=cfg.frames, gamma_tau=cfg.gamma_tau, crops=1,
            extract_feat=True, min_frames=cfg.min_frames,
            num_classes=cfg.num_classes, crop_size=cfg.crop_size,
            pack_dir=cfg.pack_dir,
        )
        for split in splits
    ]

    def loaders():
        for ds in datasets:
            yield PrefetchLoader(
                ds, 1, lambda b: collate_clips(b, cfg.pad_t_multiple, None),
                num_workers=cfg.num_workers, prefetch=cfg.prefetch,
            )

    model = FineNet(
        version=cfg.x3d_version, n_classes=cfg.num_classes, task="loc",
        bn_splits=cfg.base_bn_splits, global_tower=True,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
    )
    sample = next(iter(next(iter(loaders()))))
    init_clips = model_batch(sample, train=False)["clips"]
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, init_clips,
                           False)
    )()
    if fine_ckpt:
        variables = load_pretrained(variables, fine_ckpt, "fine")
        log.info("loaded fine checkpoint %s", fine_ckpt)
    # SubBN eval stats must be refreshed from the training split stats
    # before any eval-mode forward (extract_fineFEAT.py:138) — checkpoints
    # store the split stats; without this the tower normalises with the
    # init-valued eval stats and the taps explode multiplicatively.
    from ..models.layers import aggregate_sub_bn_stats

    variables = dict(variables,
                     batch_stats=aggregate_sub_bn_stats(
                         variables["batch_stats"]))

    @jax.jit
    def tower(clips):
        return model.apply(variables, clips, False)

    count = 0
    nonfinite = 0
    for loader in loaders():
        for batch in loader:
            mb = model_batch(batch, train=False)
            feats = tower(mb["clips"])
            # valid temporal frames (padding produces garbage taps — slice off)
            t_valid = int(np.asarray(batch["clip_mask"]).sum())
            vid = batch["vids"][0]
            bad = False
            for k in FEAT_KEYS:
                arr = np.asarray(feats[k][0, :t_valid])  # (T, 7, 7, C)
                bad = bad or not np.isfinite(arr).all()
                np.save(os.path.join(save_dir, k, vid + ".npy"), arr)
            if bad:
                if nonfinite == 0:
                    log.warning(
                        "non-finite features for %s — the fine checkpoint's "
                        "BN running stats are unusable (a barely-trained "
                        "model's eval stats are still init-dominated); coarse "
                        "training on this bank will saturate", vid)
                nonfinite += 1
            count += 1
            if count % 20 == 0:
                log.info("extracted %d videos", count)
    if nonfinite:
        log.warning("extraction: %d/%d videos had non-finite features",
                    nonfinite, count)
    log.info("extraction done: %d videos → %s", count, save_dir)
    return count
