"""Capture an xprof device trace of the coarse train step and bucket time.

Runs the same workload as ``bench.py`` (BASELINE config #3: coarse train
step, B8 T64 224^2 bf16), traces a few steps with ``jax.profiler``, then
parses the XSpace protobuf directly (no TensorBoard round trip) and prints
per-HLO-category and top-op time so kernel work can be targeted precisely.

    python benchmarks/profile_step.py            # full step
    PROFILE_STEPS=5 python benchmarks/profile_step.py
"""

import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.utils.hw import enable_compilation_cache, sync

enable_compilation_cache()

B = int(os.environ.get("BENCH_BATCH", 8))
T = int(os.environ.get("BENCH_T", 64))
HW = int(os.environ.get("BENCH_HW", 224))
TF = int(os.environ.get("BENCH_TF", 128))
TL = int(os.environ.get("BENCH_TL", 640))
N_CLASSES = 157
DTYPE = jnp.bfloat16
N_STEPS = int(os.environ.get("PROFILE_STEPS", 3))


def build_step():
    from coarse_fine_networks_tpu.models import CoarseNet
    from coarse_fine_networks_tpu.train import TrainState, make_train_step

    rng = np.random.RandomState(0)
    # PROFILE_S2D=1 profiles the exact program bench.py measures: pre-s2d
    # clips from the device_normalize_s2d producer (PERF.md round-4).
    s2d_input = (os.environ.get("PROFILE_S2D", "1") == "1"
                 and jax.default_backend() == "tpu")
    if s2d_input:
        from coarse_fine_networks_tpu.data.transforms import (
            device_normalize_s2d,
        )

        u8 = jnp.asarray(rng.randint(0, 256, (B, T, HW, HW, 3)), jnp.uint8)
        clips = device_normalize_s2d(u8, np.zeros(B, bool),
                                     np.ones((B, T), np.float32),
                                     out_dtype=DTYPE)
    else:
        clips = jnp.asarray(rng.rand(B, T, HW, HW, 3), DTYPE)
    batch = {
        "clips": clips,
        "feats": {
            k: jnp.asarray(rng.rand(B, TF, 7, 7, c), jnp.float32)
            for k, c in [("layer1", 24), ("layer2", 48), ("layer3", 96),
                         ("layer4", 192), ("conv5", 432)]
        },
        "feat_mask": jnp.ones((B, TF), jnp.float32),
        "meta": jnp.asarray([[0, T, 2 * T, 1]] * B, jnp.int32),
        "labels": jnp.asarray((rng.rand(B, TL, N_CLASSES) > 0.9), jnp.float32),
        "masks": jnp.ones((B, TL), jnp.float32),
    }
    model = CoarseNet(version="M", n_classes=N_CLASSES, task="loc",
                      t_pool="grid", learned_mixing=True, is_mixing=True,
                      compute_dtype=DTYPE,
                      stem_s2d=True,
                      stem_s2d_input=s2d_input,
                      trunk_layout=("fold4" if s2d_input else
                                    os.environ.get("BENCH_TRUNK", "auto")))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch["clips"],
                           batch["feats"], batch["feat_mask"], batch["meta"],
                           False))()
    state = TrainState.create(variables)
    step = make_train_step(model, align_corners=False, fusion_lr_mult=10.0)
    return step, state, batch


def parse_xspace(trace_dir):
    """Aggregate device-plane event durations by op name from the xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()          # name -> total ps
    op_meta = {}                            # name -> stats dict (last seen)
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        if "Host" in plane.name:
            continue
        emeta = plane.event_metadata
        smeta = plane.stat_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-HLO events; step/module lines would
            # double count
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                if name not in op_meta:
                    stats = {}
                    for st in ev.stats:
                        key = smeta[st.metadata_id].name
                        val = (st.str_value or st.int64_value or
                               st.uint64_value or st.double_value)
                        stats[key] = val
                    mstats = {}
                    md = emeta[ev.metadata_id]
                    for st in md.stats:
                        key = smeta[st.metadata_id].name
                        val = (st.str_value or st.int64_value or
                               st.uint64_value or st.double_value)
                        mstats[key] = val
                    op_meta[name] = {**mstats, **stats}
    return per_op, op_meta


CATEGORIES = (
    ("stencil custom-call", lambda n, c: "custom-call" in c or
     "custom call" in c or n.startswith("tpu_custom_call")),
    ("convolution fusion", lambda n, c: "conv" in c or "conv" in n),
    ("data formatting", lambda n, c: any(k in c for k in (
        "copy", "transpose", "reshape", "bitcast")) or any(
        n.startswith(k) for k in ("copy", "transpose", "bitcast"))),
    ("matmul fusion", lambda n, c: "dot" in c or n.startswith("dot")),
    ("loop/elementwise fusion", lambda n, c: "fusion" in c or
     n.startswith("fusion") or n.startswith("loop_")),
    ("reduce", lambda n, c: "reduce" in c or n.startswith("reduce")),
)


def classify(name, meta):
    cat = str(meta.get("hlo_category", "")).lower()
    for label, pred in CATEGORIES:
        if pred(name.lower(), cat):
            return label
    return f"other[{cat}]" if cat else "other"


def main():
    step, state, batch = build_step()
    lr = jnp.asarray(0.02)
    key = jax.random.PRNGKey(0)
    # AOT compile and run the executable directly — same path as bench.py
    # (the jit dispatch path re-traces/compiles a second program, and on the
    # tunneled backend has crashed at runtime for the s2d-input program when
    # the server-side executable cache returns a different-layout build).
    step = step.lower(state, batch, lr, key).compile()
    # warm
    for _ in range(2):
        state, metrics = step(state, batch, lr, key)
    sync(metrics["loss"])

    t0 = time.time()
    for _ in range(5):
        state, metrics = step(state, batch, lr, key)
    sync(metrics["loss"])
    step_ms = (time.time() - t0) / 5 * 1e3
    print(f"untraced step: {step_ms:.1f} ms", file=sys.stderr)

    trace_dir = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(
        prefix="cfn_profile_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(N_STEPS):
        state, metrics = step(state, batch, lr, key)
    sync(metrics["loss"])
    jax.profiler.stop_trace()

    per_op, op_meta = parse_xspace(trace_dir)

    # Async copy/collective *-start events span their whole in-flight window
    # (issue -> done), which overlaps compute — summing them double-counts
    # massively (a f32[54] param prefetch can "last" 9 ms).  Track them
    # separately and keep the device total to synchronous op time.
    def is_async(name, meta):
        cat = str(meta.get("hlo_category", "")).lower()
        return (name.lstrip("%").startswith(("copy-start", "copy-done"))
                or cat.startswith(("copy-start", "copy-done"))
                or "async" in cat)

    sync_ops = {n: ps for n, ps in per_op.items()
                if not is_async(n, op_meta.get(n, {}))}
    async_ms = (sum(per_op.values()) - sum(sync_ops.values())) / 1e9 / N_STEPS
    total_ms = sum(sync_ops.values()) / 1e9 / N_STEPS

    buckets = collections.Counter()
    for name, ps in sync_ops.items():
        buckets[classify(name, op_meta.get(name, {}))] += ps

    print(f"\ndevice total: {total_ms:.1f} ms/step "
          f"(untraced wall {step_ms:.1f} ms; async/overlapped windows "
          f"{async_ms:.1f} ms not counted)  trace: {trace_dir}")
    print("\n== buckets ==")
    for cat, ps in buckets.most_common():
        ms = ps / 1e9 / N_STEPS
        print(f"  {cat:28s} {ms:7.2f} ms  {ms / total_ms * 100:5.1f}%")

    print("\n== top 40 ops ==")
    top = collections.Counter(sync_ops)
    for name, ps in top.most_common(40):
        ms = ps / 1e9 / N_STEPS
        meta = op_meta.get(name, {})
        cat = str(meta.get("hlo_category", ""))
        print(f"  {ms:7.2f} ms  {cat:22.22s}  {name[:90]}")


if __name__ == "__main__":
    main()
