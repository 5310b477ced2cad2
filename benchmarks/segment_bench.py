"""Per-segment timing/bytes for the coarse train step's hot path.

Times the stem and layer1 (the PERF.md frontier) in isolation at the real
training shapes — forward and forward+backward — with XLA cost-analysis byte
counts, to target the fused-kernel work precisely.

    python benchmarks/segment_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models.x3d import X3DStage, X3DStem
from coarse_fine_networks_tpu.utils.hw import (compiled_costs, sync,
                                               utilization)

B = int(os.environ.get("BENCH_B", 8))
T = int(os.environ.get("BENCH_T", 64))
HW = int(os.environ.get("BENCH_HW", 224))
DTYPE = jnp.bfloat16
N = int(os.environ.get("BENCH_STEPS", 10))


def measure(name, fn, *args):
    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    costs = compiled_costs(compiled)
    out = jitted(*args)
    sync(out)
    t0 = time.time()
    for _ in range(N):
        out = jitted(*args)
    sync(out)
    dt = (time.time() - t0) / N
    util = utilization(costs["flops"], costs["bytes"], dt)
    print(f"{name:34s} {dt * 1e3:7.2f} ms  {costs['bytes'] / 1e9:6.2f} GB  "
          f"BW {util['hbm_bw_util'] * 100:5.1f}%  "
          f"{costs['flops'] / 1e9:7.1f} GFLOP  MFU {util['mfu'] * 100:4.1f}%",
          flush=True)
    return dt, costs


def main():
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    stem = X3DStem(planes=24, s2d=True)
    clips = jnp.asarray(rng.rand(B, T, HW, HW, 3), DTYPE)
    vs = jax.jit(lambda: stem.init({"params": key}, clips, True))()

    def stem_fwd(v, x):
        out, _ = stem.apply(v, x, True, mutable=["batch_stats"])
        return out

    def stem_loss(v, x):
        out, _ = stem.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    measure("stem fwd (train)", stem_fwd, vs, clips)
    measure("stem fwd+bwd", jax.grad(stem_loss), vs, clips)

    layer1 = X3DStage(mid_planes=54, out_planes=24, num_blocks=3, stride=2)
    x1 = jnp.asarray(rng.rand(B, T, HW // 2, HW // 2, 24), DTYPE)
    v1 = jax.jit(lambda: layer1.init({"params": key}, x1, True))()

    def l1_fwd(v, x):
        out, _ = layer1.apply(v, x, True, mutable=["batch_stats"])
        return out

    def l1_loss(v, x):
        out, _ = layer1.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    measure("layer1 fwd (train)", l1_fwd, v1, x1)
    measure("layer1 fwd+bwd", jax.grad(l1_loss), v1, x1)

    # single block0 (the stride-2, SE, downsample block) for kernel targeting
    block0 = X3DStage(mid_planes=54, out_planes=24, num_blocks=1, stride=2)
    v0 = jax.jit(lambda: block0.init({"params": key}, x1, True))()

    def b0_fwd(v, x):
        out, _ = block0.apply(v, x, True, mutable=["batch_stats"])
        return out

    def b0_loss(v, x):
        out, _ = block0.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    measure("layer1.block0 fwd (train)", b0_fwd, v0, x1)
    measure("layer1.block0 fwd+bwd", jax.grad(b0_loss), v0, x1)

    # blocks 1-2 shape (56^2, stride 1)
    x2 = jnp.asarray(rng.rand(B, T, HW // 4, HW // 4, 24), DTYPE)
    b12 = X3DStage(mid_planes=54, out_planes=24, num_blocks=2, stride=1)
    v12 = jax.jit(lambda: b12.init({"params": key}, x2, True))()

    def b12_loss(v, x):
        out, _ = b12.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    measure("layer1.block1-2 fwd+bwd", jax.grad(b12_loss), v12, x2)


if __name__ == "__main__":
    main()
