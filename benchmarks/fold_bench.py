"""Fold4 trunk segment benchmark: plain XLA vs fold4(+Pallas stencil) at the
real training shapes, fwd+bwd, on the real chip.

    python benchmarks/fold_bench.py [stem|block0|b12|trunk]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.utils.hw import sync

from coarse_fine_networks_tpu.models.x3d import X3DStage, X3DStem
from coarse_fine_networks_tpu.models.x3d_fold import (
    FoldedStage,
    FoldedStem,
)
from coarse_fine_networks_tpu.ops.fold import from_fold4, to_fold4

B = int(os.environ.get("BENCH_B", 8))
T = int(os.environ.get("BENCH_T", 64))
HW = int(os.environ.get("BENCH_HW", 224))
DTYPE = jnp.bfloat16
N = int(os.environ.get("BENCH_STEPS", 10))
DW = os.environ.get("BENCH_DW", "auto")  # fold dw impl


def measure(name, fn, *args):
    jitted = jax.jit(fn)
    out = jitted(*args)
    sync(out)
    t0 = time.time()
    for _ in range(N):
        out = jitted(*args)
    sync(out)
    dt = (time.time() - t0) / N
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def grad_of(module, extra=None):
    def loss(v, x):
        out, _ = module.apply(v, x, True, mutable=["batch_stats"])
        if extra is not None:
            out = extra(out)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    return jax.grad(loss)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    if which in ("all", "stem"):
        clips = jnp.asarray(rng.rand(B, T, HW, HW, 3), DTYPE)
        stem_p = X3DStem(planes=24, s2d=True)
        stem_f = FoldedStem(planes=24, dw_impl=DW)
        v = jax.jit(lambda: stem_p.init({"params": key}, clips, True))()
        measure("stem plain fwd+bwd", grad_of(stem_p), v, clips)
        measure("stem fold4 fwd+bwd (direct conv1_s)", grad_of(stem_f), v,
                clips)

    x1 = jnp.asarray(rng.rand(B, T, HW // 2, HW // 2, 24), DTYPE)
    x1f = to_fold4(x1)
    x2 = jnp.asarray(rng.rand(B, T, HW // 4, HW // 4, 24), DTYPE)
    x2f = to_fold4(x2)

    if which in ("all", "block0"):
        b0p = X3DStage(mid_planes=54, out_planes=24, num_blocks=1, stride=2)
        b0f = FoldedStage(in_planes=24, mid_planes=54, out_planes=24,
                          num_blocks=1, stride=2, dw_impl=DW)
        vp = jax.jit(lambda: b0p.init({"params": key}, x1, True))()
        measure("layer1.block0 plain fwd+bwd", grad_of(b0p), vp, x1)
        measure(f"layer1.block0 fold4 fwd+bwd (dw={DW})", grad_of(b0f), vp,
                x1f)

    if which in ("all", "b12"):
        b12p = X3DStage(mid_planes=54, out_planes=24, num_blocks=2, stride=1)
        b12f = FoldedStage(in_planes=24, mid_planes=54, out_planes=24,
                           num_blocks=2, stride=1, dw_impl=DW)
        vp = jax.jit(lambda: b12p.init({"params": key}, x2, True))()
        measure("layer1.block1-2 plain fwd+bwd", grad_of(b12p), vp, x2)
        measure(f"layer1.block1-2 fold4 fwd+bwd (dw={DW})", grad_of(b12f),
                vp, x2f)

    if which in ("all", "trunk"):
        # the full closed region: stem + layer1, fold entry at the clips,
        # fold exit at 56^2 (what CoarseNet/FineNet run with fold4)
        clips = jnp.asarray(rng.rand(B, T, HW, HW, 3), DTYPE)

        from flax import linen as nn

        class PlainTrunk(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                x = X3DStem(planes=24, s2d=True, name="stem")(x, train)
                return X3DStage(mid_planes=54, out_planes=24, num_blocks=3,
                                stride=2, name="layer1")(x, train)

        class FoldTrunk(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                x = FoldedStem(planes=24, dw_impl=DW, name="stem")(x, train)
                x = FoldedStage(in_planes=24, mid_planes=54, out_planes=24,
                                num_blocks=3, stride=2, dw_impl=DW,
                                name="layer1")(x, train)
                return from_fold4(x, 24)

        tp, tf = PlainTrunk(), FoldTrunk()
        v = jax.jit(lambda: tp.init({"params": key}, clips, True))()
        measure("stem+layer1 plain fwd+bwd", grad_of(tp), v, clips)
        measure(f"stem+layer1 fold4 fwd+bwd (dw={DW})", grad_of(tf), v, clips)


if __name__ == "__main__":
    main()
