"""X3D-Multigrid long-cycle schedule (activates the reference's dormant
multigrid hooks, SURVEY.md §2 #27).

The reference ships the machinery — ``update_bn_splits_long_cycle``
(``x3d_fine.py:313-318``), ``MultiScaleRandomCropMultigrid``'s dynamic crop
size (``spatial_transforms.py:505-509``), the multigrid Kinetics checkpoint
name — but no schedule driving it.  This module provides the standard
long-cycle schedule from the multigrid training recipe: cycle through
(short+small, short+base, long+small, long+base) shapes with batch size scaled
to keep memory constant, rebuilding SubBN split stats at each transition.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

from ..models.surgery import set_bn_splits


@dataclasses.dataclass(frozen=True)
class LongCyclePhase:
    frames_scale: float   # temporal length multiplier
    crop_scale: float     # spatial side multiplier
    batch_scale: int      # batch multiplier (keeps tokens/step ~constant)
    bn_split_scale: int   # SubBN split multiplier (x3d_fine.py:313-318)


DEFAULT_LONG_CYCLE: List[LongCyclePhase] = [
    LongCyclePhase(0.25, 0.5, 8, 8),
    LongCyclePhase(0.5, 0.707, 4, 4),
    LongCyclePhase(0.5, 1.0, 2, 2),
    LongCyclePhase(1.0, 1.0, 1, 1),
]


class LongCycleSchedule:
    """Iterate long-cycle phases across training epochs."""

    def __init__(self, base_frames: int, base_crop: int, base_batch: int,
                 epochs_per_phase: int = 1,
                 phases: List[LongCyclePhase] = None):
        self.base = (base_frames, base_crop, base_batch)
        self.phases = phases or DEFAULT_LONG_CYCLE
        self.epochs_per_phase = epochs_per_phase

    def phase(self, epoch: int) -> LongCyclePhase:
        i = (epoch // self.epochs_per_phase) % len(self.phases)
        return self.phases[i]

    def shapes(self, epoch: int) -> Tuple[int, int, int]:
        """(frames, crop_size, batch_size) for this epoch — feed to the
        dataset/transform (the multigrid crop hook) and the loader."""
        p = self.phase(epoch)
        f, c, b = self.base
        frames = max(int(f * p.frames_scale), 1)
        crop = int(c * p.crop_scale) // 16 * 16 or 16
        return frames, crop, b * p.batch_scale

    def transition(self, epoch: int, batch_stats: dict,
                   base_splits: int = 1) -> Tuple[dict, int]:
        """At a phase boundary, rebuild SubBN split stats at the phase's
        *absolute* split count ``base_splits * bn_split_scale``; returns
        (new_batch_stats, num_splits)."""
        p = self.phase(epoch)
        splits = base_splits * p.bn_split_scale
        return set_bn_splits(batch_stats, splits), splits
