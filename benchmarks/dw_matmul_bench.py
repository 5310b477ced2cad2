"""Micro-bench: the fold-matmul weight gradient at layer1/block0 shapes.

PERF.md round-2 flagged `layer1/block0/conv1` backward at ~18 ms — a
tall-skinny reduction matmul dW = xᵀ @ dout contracting ~1.6M positions into
a (128, 256) output, which XLA can lower far from the ~1.5 ms bandwidth
bound (read 0.41 + 0.82 GB).  This sweeps lowering strategies:

    python benchmarks/dw_matmul_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.utils.hw import sync

B, T, HB, W = 8, 64, 28, 112
I, O = 128, 256
N = int(os.environ.get("BENCH_STEPS", 10))


def measure(name, fn, *args):
    jitted = jax.jit(fn)
    out = jitted(*args)
    sync(out)
    t0 = time.time()
    for _ in range(N):
        out = jitted(*args)
    sync(out)
    dt = (time.time() - t0) / N
    print(f"{name:32s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, HB, W, I), jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, T, HB, W, O), jnp.bfloat16)

    measure("einsum bthwi,bthwo->io", lambda a, b: jnp.einsum(
        "bthwi,bthwo->io", a, b, preferred_element_type=jnp.float32), x, g)

    def flat(a, b):
        return jax.lax.dot_general(
            a.reshape(-1, I), b.reshape(-1, O), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    measure("flat dot_general (P,i)x(P,o)", flat, x, g)

    def ksplit(a, b, k):
        av = a.reshape(k, -1, I)
        bv = b.reshape(k, -1, O)
        p = jax.lax.dot_general(
            av, bv, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return p.sum(axis=0)
    for k in (8, 64, 512):
        measure(f"k-split x{k} batched dot+sum",
                lambda a, b, k=k: ksplit(a, b, k), x, g)

    # the fwd matmul for scale (should be ~bandwidth: read 0.41, write 0.82)
    wm = jnp.asarray(rng.randn(I, O), jnp.bfloat16)
    measure("fwd (P,i)@(i,o)", lambda a, w: (
        a.reshape(-1, I) @ w).reshape(a.shape[:-1] + (O,)), x, wm)
    # dx: (P,o)@(o,i)
    measure("dx (P,o)@(i,o)T", lambda b, w: jax.lax.dot_general(
        b.reshape(-1, O), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32), g, wm)


if __name__ == "__main__":
    main()
