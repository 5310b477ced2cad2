"""Data-parallel serving: batches row-shard over a device mesh inside the
scheduler (pad to a device multiple, slice back), with outputs identical to
single-device serving — for both the plain VideoServer and the two-program
caching server."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.parallel import make_mesh
from coarse_fine_networks_tpu.serve import CachingVideoServer, VideoServer


def _stub_apply(clips, fine_clips, meta, label_len, fine_mask=None):
    per_clip = clips.mean(axis=(1, 2, 3)) + fine_clips.mean(axis=(1, 2, 3))
    return jnp.broadcast_to(per_clip[:, None, :],
                            (clips.shape[0], label_len, 3))


@pytest.fixture
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh()


def _videos(n, seed=0, h=8):
    rng = np.random.RandomState(seed)
    return [(rng.rand(6, h, h, 3).astype(np.float32),
             rng.rand(12, h, h, 3).astype(np.float32)) for _ in range(n)]


def test_video_server_mesh_matches_single(mesh):
    """3 requests on an 8-device mesh (pad 3→8, shard, slice back) ==
    unsharded serving bit-for-bit at f32."""
    vids = _videos(3)
    results = {}
    for name, m in (("mesh", mesh), ("single", None)):
        s = VideoServer(_stub_apply, max_batch=4, max_wait_ms=50,
                        bucket_multiple=8, mesh=m).start()
        try:
            futs = [s.submit(c, f) for c, f in vids]
            results[name] = [fu.result(timeout=120) for fu in futs]
        finally:
            s.stop()
    for a, b in zip(results["mesh"], results["single"]):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_caching_server_mesh_two_program(mesh):
    """The caching server's extract and fuse programs both shard; hits and
    misses agree with the unsharded server."""
    def extract(fine):
        return {"tap": fine.mean(axis=(2, 3))[..., None, None, :]
                * jnp.ones((1, 1, 7, 7, 1))}

    def fuse(clips, feats, feat_mask, meta, label_len):
        f = (feats["tap"].mean(axis=(2, 3))
             * feat_mask[..., None]).sum(axis=1)       # (B, 3)
        base = clips.mean(axis=(1, 2, 3)) + f
        return jnp.broadcast_to(base[:, None, :],
                                (clips.shape[0], label_len, 3))

    vids = _videos(3, seed=1)
    results = {}
    for name, m in (("mesh", mesh), ("single", None)):
        s = CachingVideoServer(extract_fn=extract, fuse_fn=fuse,
                               max_batch=4, max_wait_ms=50,
                               bucket_multiple=8, mesh=m).start()
        try:
            futs = [s.submit(c, f, video_id=f"v{i}")
                    for i, (c, f) in enumerate(vids)]
            out = [fu.result(timeout=120) for fu in futs]
            # repeat one as a cache hit (no fine pixels)
            out.append(s.submit(vids[0][0], video_id="v0").result(timeout=120))
            assert s.cache.hits == 1
            results[name] = out
        finally:
            s.stop()
    for a, b in zip(results["mesh"], results["single"]):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_caching_server_real_pipeline_dp(mesh):
    """The shipped serving path end-to-end: the REAL CoarseFinePipeline
    (fold4 trunk + interpret stencil kernels — the TPU default) served
    data-parallel over the mesh via CachingVideoServer, asserting cold AND
    warm (feature-cache-hit) parity with single-device serving.  Covers the
    whole-video val surface (train_coarse_fineFEAT.py:215-263) under the
    mesh with the production model, not a stub apply."""
    import functools

    from coarse_fine_networks_tpu.models import CoarseFinePipeline
    from coarse_fine_networks_tpu.serve import FeatureCache

    h, t, tf, n_classes = 32, 8, 8, 7
    m = CoarseFinePipeline(n_classes=n_classes, trunk_layout="fold4",
                           dw_impl="interpret")
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, t, h, h, 3)), jnp.zeros((1, tf, h, h, 3)),
        jnp.asarray([[0, t, tf, 1]], jnp.int32)))()

    rng = np.random.RandomState(5)
    vids = [(rng.rand(t - 2, h, h, 3).astype(np.float32),
             rng.rand(tf - 2, h, h, 3).astype(np.float32))
            for _ in range(2)]
    results = {}
    for name, msh in (("mesh", mesh), ("single", None)):
        s = CachingVideoServer(
            extract_fn=functools.partial(m.apply, v,
                                         method=CoarseFinePipeline.extract),
            fuse_fn=functools.partial(m.apply, v,
                                      method=CoarseFinePipeline.fuse),
            cache=FeatureCache(capacity_bytes=1 << 28),
            max_batch=4, max_wait_ms=50, bucket_multiple=8, mesh=msh,
        ).start()
        try:
            futs = [s.submit(c, f, video_id=f"rp{i}")
                    for i, (c, f) in enumerate(vids)]
            out = [fu.result(timeout=600) for fu in futs]
            # warm pass: cache hit, no fine pixels submitted
            out.append(s.submit(vids[0][0],
                                video_id="rp0").result(timeout=600))
            assert s.cache.hits == 1
            results[name] = out
        finally:
            s.stop()
    for a, b in zip(results["mesh"], results["single"]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # warm output == cold output for the same video (both serving modes)
    for name in ("mesh", "single"):
        np.testing.assert_allclose(results[name][2], results[name][0],
                                   rtol=1e-5, atol=1e-6)


def test_caching_server_tensor_parallel_extract(mesh):
    """XL-serving shape: the miss-path extract program is a REAL fine tower
    sharded Megatron-style over a (data=2, model=4) mesh
    (parallel/tensor.py); the fuse program row-shards over ``data``.
    Results match a fully unsharded server."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (2x4 TP mesh inside)")
    from coarse_fine_networks_tpu.models import FineNet
    from coarse_fine_networks_tpu.parallel.tensor import (
        make_mesh2d, make_tp_tower, tp_tower_apply)

    tower = FineNet(version="M", n_classes=3, task="loc",
                    global_tower=True, trunk_layout="plain")
    rng = np.random.RandomState(3)
    proto = jnp.asarray(rng.rand(1, 4, 32, 32, 3), jnp.float32)
    tvars = tower.init({"params": jax.random.PRNGKey(0)}, proto, False)

    def fuse(clips, feats, feat_mask, meta, label_len):
        f = sum((v.mean(axis=(2, 3, 4)) * feat_mask).sum(axis=1)
                for v in feats.values())                     # (B,)
        base = clips.mean(axis=(1, 2, 3)) + f[:, None]
        return jnp.broadcast_to(base[:, None, :],
                                (clips.shape[0], label_len, 3))

    vids = [(rng.rand(6, 32, 32, 3).astype(np.float32),
             rng.rand(8, 32, 32, 3).astype(np.float32)) for _ in range(3)]
    results = {}
    for name in ("tp", "single"):
        if name == "tp":
            mesh2 = make_mesh2d(2, 4)
            tp_model, tp_vars = make_tp_tower(tower, tvars, mesh2, proto)
            jit_apply, _ = tp_tower_apply(tp_model, mesh2)
            extract = lambda fine: jit_apply(tp_vars, fine)
            m = mesh2
        else:
            extract = jax.jit(lambda fine: tower.apply(tvars, fine, False))
            m = None
        s = CachingVideoServer(extract_fn=extract, fuse_fn=fuse,
                               max_batch=4, max_wait_ms=50,
                               bucket_multiple=8, mesh=m).start()
        try:
            futs = [s.submit(c, f, video_id=f"tp{i}")
                    for i, (c, f) in enumerate(vids)]
            results[name] = [fu.result(timeout=180) for fu in futs]
        finally:
            s.stop()
    for a, b in zip(results["tp"], results["single"]):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
