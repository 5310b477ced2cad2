"""Driver configuration — a single dataclass holding the knobs the reference
scatters as module-level constants (``train_fine.py:44-53``,
``train_coarse_fineFEAT.py:45-55``, ``extract_fineFEAT.py:40-53``)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

# Per-version tables (train_fine.py:59-61)
CROP_SIZE = {"S": 160, "M": 224, "XL": 312}
RESIZE_SIZE = {"S": (180.0, 225.0), "M": (256.0, 320.0), "XL": (360.0, 450.0)}
GAMMA_TAU = {"S": 6, "M": 5, "XL": 5}

CHARADES_MEAN = (0.413, 0.368, 0.338)
CHARADES_STD = (0.131, 0.125, 0.132)


@dataclasses.dataclass
class DriverConfig:
    anno: str                      # charades.json path
    root: str                      # per-frame JPEG root
    save_dir: str = "models"
    x3d_version: str = "M"
    num_classes: int = 157
    batch_size: int = 8            # train_fine.py:44 (coarse uses 6)
    val_batch_size: Optional[int] = None
    init_lr: float = 0.01
    lr_milestones: Sequence[int] = (15, 20, 25)
    warmup_steps: int = 0
    lr_schedule: str = "multistep"  # "multistep" | "cosine" (kinetics recipe)
    total_steps: Optional[int] = None   # cosine horizon (None: derived)
    cosine_final_lr: float = 0.0
    label_smoothing: float = 0.0   # kinetics softmax-CE smoothing
    max_epochs: int = 200
    frames: int = 80 * 4           # train_fine.py:57
    crops: int = 1
    dropout: float = 0.5
    base_bn_splits: int = 1
    weight_decay: float = 1e-5
    momentum: float = 0.9
    # optional global-L2 gradient clip (torch clip_grad_norm_ semantics);
    # None = reference parity (the reference never clips)
    grad_clip: Optional[float] = None
    train_phases_per_val: int = 4  # train_fine.py:147 (coarse: 2)
    num_steps_per_update: int = 1  # gradient accumulation (train_fine.py:65)
    ckpt_every: int = 1000
    log_every_frac: int = 2        # print stats every 1/2 epoch
    kinetics_ckpt: Optional[str] = None  # torch .pt or native .ckpt
    resume: bool = True
    num_workers: int = 4
    prefetch: int = 4
    device_prefetch: int = 2  # batches staged on-device ahead of the step
    # (H2D + normalize/s2d producer in a background thread — input/compute
    # overlap; 1 disables the lookahead but keeps the pipelined thread)
    pack_dir: "str | None" = None  # .cfnpack container dir (cli.pack_dataset);
    # per-video fallback to the JPEG frame layout when a pack is missing
    stem_s2d_input: bool = False   # coarse driver: feed the trunk pre-s2d
    # clips in the stem conv's preferred layout (device_normalize_s2d ->
    # CoarseNet(stem_s2d_input=True)); removes the in-step relayout-copy
    # chain (~3 ms/step at the bench shape).  TPU fold4, single-process only
    # (under a single-process mesh the producer emits the clips already
    # batch-sharded over `data`; multi-process falls back to the classic
    # path).
    record_trajectory: bool = False  # drivers append (step, lr, loss) per
    # step + the periodic train-mAP readings to results — the in-repo
    # analogue of the reference's captured training log
    # (log_coarse_fine_train.txt) for regression harnesses
    fine_feat_dir: Optional[str] = None
    fusion_lr_mult: Optional[float] = None
    align_corners: bool = True     # fine: True; coarse driver: False
    compute_dtype: str = "float32"
    remat: bool = False
    mesh_devices: Optional[int] = None  # data-parallel device count (None=all)
    min_frames: Optional[int] = None    # dataset filter (tests use small)
    crop_size_override: Optional[int] = None
    pad_t_multiple: Optional[int] = 16
    pad_label_multiple: Optional[int] = 64
    t_lim_inference: int = 1000    # chunked long-video eval (both streams)
    val_bucket: bool = True        # geometric (x2) val padding buckets:
    # O(log T) compiled shapes instead of one per 16-frame length
    val_length_sorted: bool = True  # order val videos by length so batches
    # pad tightly (enables val_batch_size > 1 without padding waste)
    seed: int = 0
    max_steps: Optional[int] = None      # early stop for tests
    max_val_batches: Optional[int] = None
    localize_csv: Optional[str] = None   # coarse val CSV output
    debug_nans: bool = False       # opt-in jit-level NaN checks
    multigrid: bool = False        # drive the X3D long-cycle schedule
    # (frames/crop/batch/bn_splits change per phase; fine driver only)
    multigrid_epochs_per_phase: int = 1

    @property
    def crop_size(self) -> int:
        return self.crop_size_override or CROP_SIZE[self.x3d_version]

    @property
    def gamma_tau(self) -> int:
        return GAMMA_TAU[self.x3d_version]

    @property
    def scales(self) -> Tuple[float, float]:
        """Random-crop scale range: the PUBLISHED crop/resize ratio of the
        version (M: 224/(256, 320) = (0.875, 0.7) — train_fine.py:59-61,74),
        independent of ``crop_size_override``.  Deriving it from the override
        (32/256 = 0.125 at test scale) makes the crop grab ~1/8th-side
        patches: near-constant clips zero the BN batch variance and saturate
        the net (found by tests/test_training_trajectory.py)."""
        r = RESIZE_SIZE[self.x3d_version]
        base = CROP_SIZE[self.x3d_version]
        return tuple(base / s for s in r)
