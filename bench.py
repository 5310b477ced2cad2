"""Benchmark: Coarse-stream training step throughput on one TPU chip.

Measures the BASELINE.json config #3 workload — Coarse stream + GridPool /
GridUnpool + multi-stage fusion, forward+backward+SGD update, batch 8 at the
published training shapes (clip T=64 @ 224², cached fine features T=128) — and
reports clips/sec/chip.

Baseline: the reference trains this stage at ~9.3 clips/s aggregate across
5 CUDA GPUs (`log_coarse_fine_train.txt:1,17-19`) ⇒ ~1.86 clips/s/GPU.
``vs_baseline`` is clips/sec/chip ÷ 1.86.

Prints ONE JSON line on stdout; progress goes to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

# Persistent XLA compilation cache: the coarse train step is a large program
# (~1.3 TFLOP) and a cold compile is minutes; cache hits bring every later
# bench/driver start to seconds.  BENCH_CACHE=0 disables (for A/B timing).
if os.environ.get("BENCH_CACHE", "1") == "1":
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from coarse_fine_networks_tpu.utils.hw import (compiled_costs, sync,
                                               utilization)

BASELINE_CLIPS_PER_CHIP = 9.3 / 5  # reference clips/s per GPU

B = int(os.environ.get("BENCH_BATCH", 8))
T = int(os.environ.get("BENCH_T", 64))        # frames 80*4 / gamma_tau 10
HW = int(os.environ.get("BENCH_HW", 224))
TF = int(os.environ.get("BENCH_TF", 128))     # fine-feature cap (collate)
TL = int(os.environ.get("BENCH_TL", 640))     # label length
N_CLASSES = 157
STEPS = int(os.environ.get("BENCH_STEPS", 30))
DTYPE = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _clips_layout_str(clips, s2d_input: bool) -> str:
    """Actual device layout of the s2d producer's output ('off' when the
    fast path is disabled).  The stem-layout pin is best-effort: executables
    restored from the compilation cache on the tunneled backend drop custom
    output layouts (PERF.md round-5), in which case the step absorbs a ~3 ms
    in-program relayout copy — this makes the regression visible in the
    parsed metrics."""
    if not s2d_input:
        return "off"
    try:
        return str(clips.format.layout.major_to_minor)
    except Exception:
        return "unknown"


def bench_fine_forward():
    """BASELINE config #1: fine-stream forward, one 80-frame clip @ 224²."""
    from coarse_fine_networks_tpu.models import FineNet

    rng = np.random.RandomState(0)
    t = 80 * 2 // 10  # frames=80 → clip T=16 (dataset doubles frames & tau)
    clips = jnp.asarray(rng.rand(1, t, 224, 224, 3), jnp.float32)
    model = FineNet(version="M", n_classes=N_CLASSES, task="loc",
                    compute_dtype=DTYPE)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, clips, False)
    )()
    fwd = jax.jit(lambda v, x: model.apply(v, x, False))
    out = fwd(variables, clips)
    sync(out)
    t0 = time.time()
    for _ in range(STEPS):
        out = fwd(variables, clips)
    sync(out)
    dt = (time.time() - t0) / STEPS
    print(json.dumps({
        "metric": "fine_forward_clips_per_sec_per_chip",
        "value": round(1.0 / dt, 2),
        "unit": "clips/s/chip (fwd only, 1x80fr @ 224^2)",
        "vs_baseline": round((1.0 / dt) / BASELINE_CLIPS_PER_CHIP, 2),
    }))


def bench_joint_inference():
    """BASELINE config #4: end-to-end Coarse-Fine joint inference (fine tower
    + fusion + coarse stream in one jitted program).  Reference whole-video
    val ran ~1.85 videos/s across 5 GPUs (log_coarse_fine_train.txt:28-29)
    ⇒ 0.37 videos/s/GPU."""
    from coarse_fine_networks_tpu.models import CoarseFinePipeline

    rng = np.random.RandomState(0)
    b, t, tf = 1, T, TF
    clips = jnp.asarray(rng.rand(b, t, HW, HW, 3), DTYPE)
    fine_clips = jnp.asarray(rng.rand(b, tf, HW, HW, 3), DTYPE)
    meta = jnp.asarray([[0, t, 2 * t, 1]] * b, jnp.int32)
    m = CoarseFinePipeline(n_classes=N_CLASSES, compute_dtype=DTYPE)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, clips,
                               fine_clips, meta))()
    fwd = jax.jit(lambda v: m.apply(v, clips, fine_clips, meta, label_len=TL))
    out = fwd(v)
    sync(out)
    t0 = time.time()
    for _ in range(STEPS):
        out = fwd(v)
    sync(out)
    dt = (time.time() - t0) / STEPS

    # fine-feature-cache serving split (serve/feature_cache.py): a repeat
    # video skips the extract program entirely — the warm-cache rate is the
    # fuse program alone
    ext = jax.jit(lambda v, fc: m.apply(v, fc,
                                        method=type(m).extract))
    feats = ext(v, fine_clips)
    sync(feats)
    fmask = jnp.ones((b, tf), jnp.float32)
    fuse = jax.jit(lambda v, f: m.apply(v, clips, f, fmask, meta, TL,
                                        method=type(m).fuse))
    outf = fuse(v, feats)
    sync(outf)
    t0 = time.time()
    for _ in range(STEPS):
        feats = ext(v, fine_clips)
    sync(feats)
    dt_ext = (time.time() - t0) / STEPS
    t0 = time.time()
    for _ in range(STEPS):
        outf = fuse(v, feats)
    sync(outf)
    dt_fuse = (time.time() - t0) / STEPS

    print(json.dumps({
        "metric": "joint_inference_videos_per_sec_per_chip",
        "value": round(1.0 / dt, 2),
        "unit": "videos/s/chip (fine tower T=128 + coarse T=64 @ 224^2)",
        "vs_baseline": round((1.0 / dt) / (1.85 / 5), 2),
        "extract_ms": round(dt_ext * 1e3, 1),
        "fuse_ms": round(dt_fuse * 1e3, 1),
        "cache_hit_videos_per_sec": round(1.0 / dt_fuse, 2),
    }))


def _train_input_corpus():
    """Synthetic 480p-class JPEG corpus at published train sampling shapes."""
    import tempfile

    from coarse_fine_networks_tpu.data.synthetic import generate_mini_charades

    hw = int(os.environ.get("BENCH_CORPUS_HW", 480))
    # drop_last=True needs >= B videos per epoch or the loader yields nothing
    n_videos = int(os.environ.get("BENCH_CORPUS_VIDEOS", max(2 * B, 12)))
    root = tempfile.mkdtemp(prefix="cfn_input_bench_")
    log(f"generating corpus: {n_videos} videos x 680 frames @ {hw}p ...")
    t0 = time.time()
    anno = generate_mini_charades(root, num_videos=n_videos, num_frames=680,
                                  hw=hw, train_fraction=1.0, num_classes=157)
    log(f"corpus done in {time.time() - t0:.1f}s")
    return root, anno, hw


def _train_input_loader(root, anno, hw, workers, pack_dir=None):
    """The REAL train loader (C++ random-crop decode when built, PIL
    otherwise): B clips of T frames @ 224² from per-frame JPEG dirs
    (window frames*2 at stride gamma_tau*2, the published coarse-train
    sampling — charades_fine.py:151-160).  ``pack_dir`` switches the frame
    source to `.cfnpack` containers (one open+seeks per clip)."""
    from coarse_fine_networks_tpu.data import (
        CharadesDataset,
        Compose,
        MultiScaleRandomCropMultigrid,
        PrefetchLoader,
        RandomHorizontalFlip,
        collate_clips,
    )

    tform = Compose([
        MultiScaleRandomCropMultigrid([1.0, 0.875, 0.75], HW),
        RandomHorizontalFlip(deferred=True),
    ])
    ds = CharadesDataset(anno, "training", os.path.join(root, "frames"),
                         task="loc", frames=T * 5, gamma_tau=5,
                         min_frames=10, crop_size=HW,
                         spatial_transform=tform,
                         decode_backend=os.environ.get("BENCH_DECODE", "auto"),
                         pack_dir=pack_dir)
    return PrefetchLoader(ds, B, lambda b: collate_clips(b, 16, 64),
                          shuffle=True, num_workers=workers, prefetch=4,
                          drop_last=True)


def _pack_corpus(root):
    """Pack the synthetic corpus into .cfnpack containers; returns the pack
    dir (or None if the native library is unavailable)."""
    from coarse_fine_networks_tpu.data import native as native_mod

    if not native_mod.available():
        return None
    pack_dir = os.path.join(root, "packs")
    t0 = time.time()
    n = native_mod.pack_directory(os.path.join(root, "frames"), pack_dir)
    log(f"packed {n} corpus videos in {time.time() - t0:.1f}s")
    return pack_dir


def _cycle_loader(loader):
    while True:
        n = 0
        for b in loader:
            n += 1
            yield b
        if n == 0:
            raise RuntimeError("loader yielded no batches (corpus smaller "
                               "than one drop_last batch?)")


def _measure_input_rate(loader, n_batches=6, warm_batches=12):
    it = _cycle_loader(loader)
    # warm past the buffer-pool ring fill (data/bufpool.py): the first
    # `slots` borrows per shape still allocate fresh pages, steady state
    # starts once every ring cycles
    first = next(it)
    for _ in range(warm_batches - 1):
        next(it)
    t0 = time.time()
    for _ in range(n_batches):
        next(it)
    dt = (time.time() - t0) / n_batches
    return B / dt, first


def bench_input_pipeline():
    """VERDICT #3: host data plane at training rates, reported as sustained
    input clips/s plus a measured per-worker-thread rate (the 'core budget'
    number).  ``vs_baseline`` is input rate ÷ the round-2 65.2 clips/s
    train-step consumption — ≥1 means input feeds the chip."""
    workers = int(os.environ.get("BENCH_WORKERS", max(os.cpu_count(), 1)))
    root, anno, hw = _train_input_corpus()
    from coarse_fine_networks_tpu.data import native as native_mod

    log(f"native decode available: {native_mod.available()}")
    rate1, _ = _measure_input_rate(
        _train_input_loader(root, anno, hw, workers=1))
    log(f"single-worker decode rate: {rate1:.2f} clips/s/core")
    rate, first = _measure_input_rate(
        _train_input_loader(root, anno, hw, workers=workers))
    print(json.dumps({
        "metric": "input_pipeline_clips_per_sec",
        "value": round(rate, 2),
        "unit": f"clips/s host input (B{B} T~{first['clips'].shape[2]} "
                f"{HW}^2 from {hw}p JPEGs, {workers} workers)",
        "vs_baseline": round(rate / 65.2, 3),
        "clips_per_sec_per_core": round(rate1, 2),
        "host_cores": os.cpu_count(),
    }))


def bench_coarse_val():
    """Batched whole-video validation throughput (VERDICT #4): B videos per
    eval step at one padded bucket shape (the reference and round-1 driver
    ran val at batch 1).  Reference whole-video val: ~1.85 videos/s across
    5 GPUs ⇒ 0.37 videos/s/GPU."""
    from coarse_fine_networks_tpu.models import CoarseNet
    from coarse_fine_networks_tpu.train import TrainState
    from coarse_fine_networks_tpu.train.steps import make_eval_step

    b = int(os.environ.get("BENCH_VAL_BATCH", 4))
    t = int(os.environ.get("BENCH_VAL_T", 256))  # padded bucket length
    rng = np.random.RandomState(0)
    batch = {
        "clips": jnp.asarray(rng.rand(b, t, HW, HW, 3), DTYPE),
        "feats": {
            k: jnp.asarray(rng.rand(b, TF, 7, 7, c), jnp.float32)
            for k, c in [("layer1", 24), ("layer2", 48), ("layer3", 96),
                         ("layer4", 192), ("conv5", 432)]
        },
        "feat_mask": jnp.ones((b, TF), jnp.float32),
        "meta": jnp.asarray([[0, t, 2 * t, 1]] * b, jnp.int32),
        "labels": jnp.asarray((rng.rand(b, 4 * t, N_CLASSES) > 0.9),
                              jnp.float32),
        "masks": jnp.ones((b, 4 * t), jnp.float32),
    }
    model = CoarseNet(version="M", n_classes=N_CLASSES, task="loc",
                      t_pool="grid", learned_mixing=True, is_mixing=True,
                      compute_dtype=DTYPE)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           batch["clips"][:1, :16], batch["feats"],
                           batch["feat_mask"], batch["meta"], False))()
    state = TrainState.create(variables)
    step = make_eval_step(model, align_corners=False)
    out = step(state, batch)
    sync(out["probs"])
    t0 = time.time()
    for _ in range(STEPS):
        out = step(state, batch)
    sync(out["probs"])
    dt = (time.time() - t0) / STEPS
    log(f"eval step {dt * 1e3:.1f} ms for {b} videos of T={t}")
    print(json.dumps({
        "metric": "coarse_val_videos_per_sec_per_chip",
        "value": round(b / dt, 2),
        "unit": f"videos/s/chip (batched whole-video eval, B{b} T{t} "
                f"@ {HW}^2)",
        "vs_baseline": round((b / dt) / (1.85 / 5), 2),
    }))


def main():
    mode = os.environ.get("BENCH_MODE")
    if mode == "fine_forward":
        bench_fine_forward()
        return
    if mode == "joint_inference":
        bench_joint_inference()
        return
    if mode == "input_pipeline":
        bench_input_pipeline()
        return
    if mode == "coarse_val":
        bench_coarse_val()
        return
    from coarse_fine_networks_tpu.models import CoarseNet
    from coarse_fine_networks_tpu.train import TrainState, make_train_step

    # pre-s2d clips in the stem conv's preferred layout, produced by the
    # REAL input-pipeline program (device_normalize_s2d) outside the step —
    # removes the in-step relayout-copy chain (PERF.md round-4; ~3 ms).
    s2d_input = (os.environ.get("BENCH_S2D_INPUT", "1") == "1"
                 and os.environ.get("BENCH_TRUNK", "auto") in ("auto",
                                                               "fold4")
                 and jax.default_backend() == "tpu")

    rng = np.random.RandomState(0)
    if s2d_input:
        from coarse_fine_networks_tpu.data.transforms import (
            device_normalize_s2d,
        )

        u8 = jnp.asarray(rng.randint(0, 256, (B, T, HW, HW, 3)), jnp.uint8)
        flip = np.zeros(B, bool)
        cm = np.ones((B, T), np.float32)
        t0 = time.time()
        clips = device_normalize_s2d(u8, flip, cm, out_dtype=DTYPE)
        clips.block_until_ready()
        t0 = time.time()
        clips = device_normalize_s2d(u8, flip, cm, out_dtype=DTYPE)
        clips.block_until_ready()
        log(f"device_normalize_s2d (producer, outside step): "
            f"{(time.time() - t0) * 1e3:.1f} ms/batch")
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
                      remat=os.environ.get("BENCH_REMAT", "0") == "1",
                      stem_s2d=os.environ.get("BENCH_S2D", "1") == "1",
                      stem_s2d_input=s2d_input,
                      fold_pw=os.environ.get("BENCH_FOLD_PW", "0") == "1",
                      trunk_layout=("fold4" if s2d_input else
                                    os.environ.get("BENCH_TRUNK", "auto")))
    log(f"init: B={B} T={T} HW={HW} TF={TF} dtype={DTYPE.__name__} "
        f"device={jax.devices()[0]}")
    t0 = time.time()
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch["clips"],
                           batch["feats"], batch["feat_mask"], batch["meta"],
                           False)
    )()
    state = TrainState.create(variables)
    init_s = time.time() - t0
    log(f"init done in {init_s:.1f}s")

    step = make_train_step(model, align_corners=False, fusion_lr_mult=10.0)
    key = jax.random.PRNGKey(0)
    lr = jnp.asarray(0.02)

    # AOT compile once and run the executable directly: calling the jitted
    # `step` after `.lower().compile()` would trace+compile the whole
    # program a SECOND time for jit's own dispatch cache (~2x startup).
    t0 = time.time()
    lowered = step.lower(state, batch, lr, key)
    lower_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    costs = compiled_costs(compiled)
    step = compiled
    t0 = time.time()
    state, metrics = step(state, batch, lr, key)
    sync(metrics["loss"])
    first_step_s = time.time() - t0
    log(f"lower {lower_s:.1f}s  compile {compile_s:.1f}s  "
        f"first step {first_step_s:.1f}s  "
        f"loss={float(metrics['loss']):.4f}  "
        f"program: {costs['flops'] / 1e12:.2f} TFLOP, "
        f"{costs['bytes'] / 1e9:.2f} GB accessed")

    # warmup
    for _ in range(2):
        state, metrics = step(state, batch, lr, key)
    sync(metrics["loss"])

    t0 = time.time()
    for _ in range(STEPS):
        state, metrics = step(state, batch, lr, key)
    sync(metrics["loss"])
    dt = (time.time() - t0) / STEPS
    clips_per_sec = B / dt
    util = utilization(costs["flops"], costs["bytes"], dt)
    log(f"step time {dt * 1e3:.1f} ms  loss={float(metrics['loss']):.4f}  "
        f"MFU {util['mfu'] * 100:.1f}%  HBM-BW {util['hbm_bw_util'] * 100:.1f}%"
        f"  ({util['chip']})")

    extra = {}
    if os.environ.get("BENCH_INPUT_ATTACHED", "1") == "1":
        try:
            extra = _bench_input_attached(step, state, batch, lr, key)
        except Exception as e:  # keep the headline number robust
            log(f"input-attached phase failed: {e!r}")

    print(json.dumps({
        "metric": "coarse_train_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip (fwd+bwd+update, B8 T64 224^2 bf16)",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_CHIP, 2),
        "step_ms": round(dt * 1e3, 1),
        "mfu": round(util["mfu"], 4),
        "hbm_bw_util": round(util["hbm_bw_util"], 4),
        "program_tflop": round(costs["flops"] / 1e12, 3),
        "program_gb": round(costs["bytes"] / 1e9, 2),
        "chip": util["chip"],
        "init_s": round(init_s, 1),
        "compile_s": round(lower_s + compile_s, 1),
        "first_step_s": round(first_step_s, 1),
        # the stem-layout pin on the s2d producer is best-effort: executables
        # restored from the compilation cache on the tunneled backend drop
        # custom output layouts (PERF.md round-5), in which case the step
        # absorbs a ~3 ms in-program relayout copy.  Report what actually
        # happened so a layout regression is visible in the parsed metrics.
        "s2d_clips_layout": _clips_layout_str(batch["clips"], s2d_input),
        **extra,
    }))


def _bench_input_attached(step, state, batch, lr, key):
    """Run the REAL train loader (C++ random-crop JPEG decode) concurrently
    with the compiled train step — the measurement VERDICT round-2 #3 asked
    for instead of the isolated-loader extrapolation: achieved step time with
    input attached (includes host decode stalls and H2D contention) plus the
    measured single-worker decode rate (the honest 'core budget' number)."""
    root, anno, hw = _train_input_corpus()
    rate1, _ = _measure_input_rate(
        _train_input_loader(root, anno, hw, workers=1), n_batches=3)
    log(f"single-worker decode rate: {rate1:.2f} clips/s/core (JPEG)")

    # packed-container path (.cfnpack): the rate the production loader
    # actually runs at (cli.pack_dataset + DriverConfig.pack_dir), plus a
    # worker-scaling curve so the core budget is a measurement, not an
    # assertion (VERDICT r03 #4)
    pack_dir = _pack_corpus(root)
    rate1_packed = None
    worker_curve = {}
    if pack_dir is not None:
        rate1_packed, _ = _measure_input_rate(
            _train_input_loader(root, anno, hw, workers=1,
                                pack_dir=pack_dir), n_batches=3)
        log(f"single-worker decode rate: {rate1_packed:.2f} clips/s/core "
            f"(packed; {rate1_packed / max(rate1, 1e-9):.2f}x JPEG)")
        max_w = int(os.environ.get("BENCH_WORKER_CURVE_MAX",
                                   min(os.cpu_count() or 2, 4)))
        for w in sorted({1, 2, max_w}):
            if w == 1:
                worker_curve[w] = round(rate1_packed, 2)
                continue
            if w > (os.cpu_count() or 1):
                continue
            r, _ = _measure_input_rate(
                _train_input_loader(root, anno, hw, workers=w,
                                    pack_dir=pack_dir), n_batches=3)
            worker_curve[w] = round(r, 2)
        log(f"packed worker curve (clips/s): {worker_curve}")

    workers = int(os.environ.get("BENCH_WORKERS",
                                 max((os.cpu_count() or 2) - 2, 1)))
    loader = _train_input_loader(root, anno, hw, workers=workers,
                                 pack_dir=pack_dir)
    it = _cycle_loader(loader)
    hb = next(it)  # warm the pool + fill prefetch

    def attach(hb):
        # clips at the compiled shape; labels/masks padded/trimmed to the
        # compiled TL so the step program is reused (we are measuring input
        # + H2D contention, not a new program)
        lb = np.zeros((B, TL, N_CLASSES), np.float32)
        mk = np.zeros((B, TL), np.float32)
        n = min(TL, hb["labels"].shape[1])
        lb[:, :n] = np.asarray(hb["labels"])[:, :n]
        mk[:, :n] = np.asarray(hb["masks"])[:, :n]
        ck = np.asarray(hb["clips"])[:, 0]       # (B, n_crops, T, H, W, 3)
        ck = ck[:, :T] if ck.shape[1] >= T else np.concatenate(
            [ck, np.zeros((B, T - ck.shape[1]) + ck.shape[2:], ck.dtype)], 1)
        if batch["clips"].ndim == 5 and batch["clips"].shape[-1] == 12:
            # stem_s2d_input path: run the real producer program (uint8 H2D
            # + normalize + s2d pack) — its cost lands in the attached time
            from coarse_fine_networks_tpu.data.transforms import (
                device_normalize_s2d,
            )

            clips = device_normalize_s2d(
                jnp.asarray(ck), np.zeros(B, bool),
                np.ones((B, T), np.float32), out_dtype=DTYPE)
        else:
            clips = jnp.asarray(ck, DTYPE)
        return {**batch, "clips": clips,
                "labels": jnp.asarray(lb), "masks": jnp.asarray(mk)}

    n_att = int(os.environ.get("BENCH_ATTACHED_STEPS", 8))
    state, metrics = step(state, attach(hb), lr, key)  # shape-warm the H2D
    sync(metrics["loss"])

    # --- decompose the attached-step gap (VERDICT r04 #4) ---------------
    # (a) H2D + producer alone, synchronised (no decode, no step):
    t0 = time.time()
    for _ in range(3):
        db = attach(hb)
        jax.block_until_ready(db["clips"])
    h2d_ms = (time.time() - t0) / 3 * 1e3
    # (b) decode alone: the measured loader rate above
    decode_ms = B / max(rate1_packed or rate1, 1e-9) * 1e3
    log(f"attached breakdown: decode {decode_ms:.0f} ms/batch, "
        f"h2d+producer {h2d_ms:.0f} ms/batch (sync)")

    # --- overlapped run: H2D + producer for batch N+1 staged in a -------
    # background thread while step N runs (data/device_prefetch.py)
    from coarse_fine_networks_tpu.data.device_prefetch import (
        DevicePrefetcher,
    )

    def bounded(iterator, n):
        for _ in range(n):
            yield next(iterator)

    pf = iter(DevicePrefetcher(bounded(it, n_att + 1), attach, depth=2))
    state, metrics = step(state, next(pf), lr, key)
    sync(metrics["loss"])
    t0 = time.time()
    for db in pf:
        state, metrics = step(state, db, lr, key)
    sync(metrics["loss"])
    att_dt = (time.time() - t0) / n_att
    log(f"input-attached step time {att_dt * 1e3:.1f} ms "
        f"({workers} decode workers, overlapped; "
        f"ideal max(decode, h2d, step) = "
        f"{max(decode_ms, h2d_ms):.0f} ms)")
    out = {
        "input_attached_step_ms": round(att_dt * 1e3, 1),
        "input_attached_clips_per_sec": round(B / att_dt, 2),
        "input_h2d_producer_ms": round(h2d_ms, 1),
        "input_decode_ms_per_batch": round(decode_ms, 1),
        "input_clips_per_sec_per_core": round(rate1, 2),
        "input_workers": workers,
        "input_attached_source": "packed" if pack_dir else "jpeg",
    }
    if rate1_packed is not None:
        out["input_packed_clips_per_sec_per_core"] = round(rate1_packed, 2)
        out["input_packed_vs_jpeg"] = round(
            rate1_packed / max(rate1, 1e-9), 2)
        out["input_packed_worker_curve"] = {
            str(k): v for k, v in worker_curve.items()}
    return out


if __name__ == "__main__":
    main()
