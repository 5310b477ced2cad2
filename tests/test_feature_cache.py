"""Serving fine-feature cache: LRU semantics, and the two-program
(extract -> cache -> fuse) path must match the one-program pipeline exactly
while skipping the fine tower on repeat videos."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models import CoarseFinePipeline
from coarse_fine_networks_tpu.serve import CachingVideoServer, FeatureCache


def test_feature_cache_lru_bytes():
    c = FeatureCache(capacity_bytes=3 * 400)  # 3 entries of 100 f32
    f = lambda: {"a": np.zeros(100, np.float32)}
    c.put("v1", f(), 5)
    c.put("v2", f(), 5)
    c.put("v3", f(), 5)
    assert len(c) == 3 and c.nbytes == 1200
    assert c.get("v1") is not None            # refresh v1
    c.put("v4", f(), 5)                       # evicts v2 (LRU)
    assert c.get("v2") is None
    assert c.get("v1") is not None and c.get("v4") is not None
    assert c.evictions == 1
    # re-put of an existing key must not double-count bytes
    c.put("v1", f(), 5)
    assert c.nbytes == 1200
    # an entry larger than the whole cache is never admitted
    c.put("huge", {"a": np.zeros(10_000, np.float32)}, 5)
    assert c.get("huge") is None


def test_preload_dir_from_extract_banks(tmp_path):
    """Serving starts warm from the extract driver's disk banks
    (``save_dir/<key>/<vid>.npy``) — a preloaded video needs no fine
    pixels at submit time."""
    from coarse_fine_networks_tpu.serve.feature_cache import FeatureCache

    keys = FeatureCache.FEATURE_KEYS
    rng = np.random.RandomState(0)
    chans = {"layer1": 24, "layer2": 48, "layer3": 96, "layer4": 192,
             "conv5": 432}
    import os

    for k in keys:
        os.makedirs(tmp_path / k)
    for vid, t in (("VA", 5), ("VB", 9)):
        for k in keys:
            np.save(str(tmp_path / k / f"{vid}.npy"),
                    rng.rand(t, 7, 7, chans[k]).astype(np.float32))
    c = FeatureCache(capacity_bytes=1 << 30)
    assert c.preload_dir(str(tmp_path)) == 2
    feats, t = c.get("VA")
    assert t == 5 and feats["conv5"].shape == (5, 7, 7, 432)
    assert c.get("VB")[1] == 9
    # max_videos bound
    c2 = FeatureCache(capacity_bytes=1 << 30)
    assert c2.preload_dir(str(tmp_path), max_videos=1) == 1
    assert c2.get("VA") is not None and c2.get("VB") is None


@pytest.fixture(scope="module")
def pipeline():
    m = CoarseFinePipeline(n_classes=7)
    h, t, tf = 32, 8, 8
    clips = jnp.zeros((1, t, h, h, 3), jnp.float32)
    fine = jnp.zeros((1, tf, h, h, 3), jnp.float32)
    meta = jnp.asarray([[0, t, tf, 1]], jnp.int32)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, clips,
                               fine, meta))()
    return m, v


@pytest.mark.slow
def test_caching_server_hit_matches_one_program(pipeline):
    m, v = pipeline
    h = 32
    rng = np.random.RandomState(0)
    server = CachingVideoServer(
        extract_fn=functools.partial(m.apply, v,
                                     method=CoarseFinePipeline.extract),
        fuse_fn=functools.partial(m.apply, v,
                                  method=CoarseFinePipeline.fuse),
        max_batch=4, max_wait_ms=50, bucket_multiple=8,
    ).start()
    try:
        t, tf = 6, 7
        clips = rng.rand(t, h, h, 3).astype(np.float32)
        fine = rng.rand(tf, h, h, 3).astype(np.float32)

        # one-program oracle at the same padded bucket (8, 8)
        cp = np.zeros((1, 8, h, h, 3), np.float32)
        fp = np.zeros((1, 8, h, h, 3), np.float32)
        fm = np.zeros((1, 8), np.float32)
        cp[0, :t], fp[0, :tf], fm[0, :tf] = clips, fine, 1.0
        meta = jnp.asarray([[0, t, tf, 1]], jnp.int32)
        ref = np.asarray(m.apply(v, jnp.asarray(cp), jnp.asarray(fp), meta,
                                 32, fine_mask=jnp.asarray(fm)))[0, : 4 * t]

        r1 = server.submit(clips, fine, video_id="vidA").result(timeout=600)
        np.testing.assert_allclose(r1, ref, rtol=2e-4, atol=2e-5)
        assert server.cache.hits == 0 and len(server.cache) == 1

        # repeat request: no fine pixels at all, must hit and match
        r2 = server.submit(clips, video_id="vidA").result(timeout=600)
        np.testing.assert_allclose(r2, r1, rtol=1e-6, atol=1e-7)
        assert server.cache.hits == 1

        # uncached video without fine frames is a hard error
        with pytest.raises(ValueError):
            server.submit(clips, video_id="nope")

        # anonymous requests run but are never stored
        server.submit(clips, fine).result(timeout=600)
        assert len(server.cache) == 1
    finally:
        server.stop()


@pytest.mark.slow
def test_caching_server_hit_survives_different_bucket(pipeline):
    """Cached features are sliced to the true length, so a later request in
    a *larger* coarse bucket still fuses correctly against the same video."""
    m, v = pipeline
    h = 32
    rng = np.random.RandomState(1)
    server = CachingVideoServer(
        extract_fn=functools.partial(m.apply, v,
                                     method=CoarseFinePipeline.extract),
        fuse_fn=functools.partial(m.apply, v,
                                  method=CoarseFinePipeline.fuse),
        max_batch=2, max_wait_ms=20, bucket_multiple=8,
    ).start()
    try:
        fine = rng.rand(7, h, h, 3).astype(np.float32)
        clips_small = rng.rand(6, h, h, 3).astype(np.float32)
        clips_long = rng.rand(12, h, h, 3).astype(np.float32)  # bucket 16

        server.submit(clips_small, fine, video_id="v").result(timeout=600)
        got = server.submit(clips_long, video_id="v").result(timeout=600)

        # oracle: one-program apply at the (16, 8) padded shapes
        cp = np.zeros((1, 16, h, h, 3), np.float32)
        fp = np.zeros((1, 8, h, h, 3), np.float32)
        fm = np.zeros((1, 8), np.float32)
        cp[0, :12], fp[0, :7], fm[0, :7] = clips_long, fine, 1.0
        meta = jnp.asarray([[0, 12, 7, 1]], jnp.int32)
        ref = np.asarray(m.apply(v, jnp.asarray(cp), jnp.asarray(fp), meta,
                                 64, fine_mask=jnp.asarray(fm)))[0, :48]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
        assert server.cache.hits == 1
    finally:
        server.stop()
