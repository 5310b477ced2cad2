"""TPU hardware peak specs + XLA cost-analysis helpers for utilization
reporting (MFU / HBM-bandwidth fraction) in the bench harness.

Peak numbers are the published per-chip specs (dense bf16 FLOP/s, HBM GB/s).
Unknown device kinds fall back to v5e so the bench still runs, flagged in the
returned name.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax


class ChipPeaks(NamedTuple):
    name: str
    flops_bf16: float      # dense bf16 FLOP/s per chip
    hbm_bw: float          # HBM bytes/s per chip
    known: bool


_PEAKS: Dict[str, ChipPeaks] = {
    # device_kind substring -> peaks
    "v5 lite": ChipPeaks("v5e", 197e12, 819e9, True),
    "v5e": ChipPeaks("v5e", 197e12, 819e9, True),
    "v5p": ChipPeaks("v5p", 459e12, 2765e9, True),
    "v5": ChipPeaks("v5p", 459e12, 2765e9, True),
    "v4": ChipPeaks("v4", 275e12, 1228e9, True),
    "v6": ChipPeaks("v6e", 918e12, 1640e9, True),
    "v3": ChipPeaks("v3", 123e12, 900e9, True),
}


def chip_peaks(device=None) -> ChipPeaks:
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for sub, peaks in _PEAKS.items():
        if sub in kind:
            return peaks
    return ChipPeaks(f"unknown({kind})->v5e-assumed", 197e12, 819e9, False)


def sync(x):
    """Synchronize on *completion* of ``x`` — transport-safe.

    ``jax.block_until_ready`` waits on the local buffer's ready event; on
    remote-attached device transports (e.g. a tunneled TPU backend) dispatch
    is fully asynchronous and the call can return immediately, silently
    turning a block_until_ready-based timing loop into a dispatch-rate
    measurement.  Fetching one scalar element round-trips through the device
    execution queue and is a correct barrier everywhere.  Cost: one
    host<->device RTT (well under 1 ms), so use it once per timed window,
    not once per step.
    """
    import numpy as np

    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    jax.block_until_ready(leaves)
    if leaves:
        l = leaves[0]
        np.asarray(l.ravel()[0] if getattr(l, "size", 0) else l)
    return x


def compiled_costs(compiled) -> Dict[str, float]:
    """Extract {flops, bytes} from a jax Compiled object's cost analysis.

    XLA's analysis counts the whole program (forward+backward+update for a
    train step).  Returns zeros when the backend exposes no analysis.
    """
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not isinstance(ca, dict):
        return {"flops": 0.0, "bytes": 0.0}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def utilization(flops: float, bytes_moved: float, step_seconds: float,
                device=None) -> Dict[str, float]:
    """MFU and HBM-BW fraction for one executed program."""
    peaks = chip_peaks(device)
    if step_seconds <= 0:
        return {"mfu": 0.0, "hbm_bw_util": 0.0, "chip": peaks.name}
    return {
        "mfu": flops / step_seconds / peaks.flops_bf16,
        "hbm_bw_util": bytes_moved / step_seconds / peaks.hbm_bw,
        "chip": peaks.name,
    }


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    The coarse train step is a ~1.3 TFLOP program whose cold XLA compile is
    minutes of host time; the cache brings every later driver/bench start to
    seconds.  Default location: ``.jax_cache`` at the repo root (override
    with ``JAX_COMPILATION_CACHE_DIR``).  Only programs that took >5 s to
    compile are cached, so the CPU test tier stays uncached.
    """
    import os

    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return cache_dir
