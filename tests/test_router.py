"""Multi-model serving router: registry/alias/canary resolution, routed
execution through real VideoServer schedulers (stub models so the tests are
fast), stats, and draining stop."""

import numpy as np
import pytest

import jax.numpy as jnp

from coarse_fine_networks_tpu.serve import (
    ModelRouter,
    UnknownModelError,
    VideoServer,
)


def _stub_apply(scale):
    """Shape-faithful whole-video apply: (B,T,H,W,3)->(B,label_len,3)."""
    def apply(clips, fine_clips, meta, label_len, fine_mask=None):
        per_clip = clips.mean(axis=(1, 2, 3)) * scale      # (B, 3)
        return jnp.broadcast_to(per_clip[:, None, :],
                                (clips.shape[0], label_len, 3))
    return apply


def _mk_server(scale, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("max_wait_ms", 5)
    kw.setdefault("bucket_multiple", 4)
    return VideoServer(_stub_apply(scale), **kw)


@pytest.fixture
def router():
    r = ModelRouter()
    r.register("m-v1", _mk_server(1.0), default=True)
    r.register("m-v2", _mk_server(2.0))
    r.start()
    yield r
    r.stop()


def _video(seed=0, t=6, h=8):
    rng = np.random.RandomState(seed)
    return (rng.rand(t, h, h, 3).astype(np.float32),
            rng.rand(t * 2, h, h, 3).astype(np.float32))


def test_routing_and_default(router):
    clips, fine = _video()
    r_default = router.submit(clips, fine).result(timeout=60)
    r_v1 = router.submit(clips, fine, model="m-v1").result(timeout=60)
    r_v2 = router.submit(clips, fine, model="m-v2").result(timeout=60)
    np.testing.assert_allclose(r_default, r_v1)
    np.testing.assert_allclose(r_v2, 2.0 * r_v1, rtol=1e-6)
    assert r_v1.shape == (4 * clips.shape[0], 3)
    with pytest.raises(UnknownModelError):
        router.submit(clips, fine, model="nope")


def test_alias_is_atomic_rollout(router):
    clips, fine = _video(1)
    router.alias("prod", "m-v1")
    r1 = router.submit(clips, fine, model="prod").result(timeout=60)
    router.alias("prod", "m-v2")  # rollout: re-point, no server restart
    r2 = router.submit(clips, fine, model="prod").result(timeout=60)
    np.testing.assert_allclose(r2, 2.0 * r1, rtol=1e-6)
    with pytest.raises(UnknownModelError):
        router.alias("prod", "ghost")


def test_canary_split_deterministic(router):
    router.canary("m-v1", "m-v2", 0.5)
    # same video id always resolves to the same variant
    picks = {router.resolve("m-v1", video_id="vidX") for _ in range(10)}
    assert len(picks) == 1
    # across many ids, both variants receive traffic at roughly the split
    names = [router.resolve("m-v1", video_id=f"v{i}") for i in range(200)]
    frac = names.count("m-v2") / len(names)
    assert 0.3 < frac < 0.7
    router.canary("m-v1", "m-v2", 0.0)  # clear
    assert all(router.resolve("m-v1", video_id=f"v{i}") == "m-v1"
               for i in range(20))
    with pytest.raises(UnknownModelError):
        router.canary("ghost", "m-v1", 0.5)


def test_stats_and_draining_stop(router):
    clips, fine = _video(2)
    router.submit(clips, fine, model="m-v2").result(timeout=60)
    stats = router.stats()
    assert set(stats) == {"m-v1", "m-v2"}
    assert stats["m-v2"]["batches_run"] >= 1
    router.stop()
    with pytest.raises(RuntimeError):
        router.submit(clips, fine)


def test_register_after_start_and_duplicates(router):
    clips, fine = _video(3)
    router.register("m-v3", _mk_server(3.0))  # started lazily by register
    r3 = router.submit(clips, fine, model="m-v3").result(timeout=60)
    r1 = router.submit(clips, fine, model="m-v1").result(timeout=60)
    np.testing.assert_allclose(r3, 3.0 * r1, rtol=1e-6)
    with pytest.raises(ValueError):
        router.register("m-v1", _mk_server(9.0))
