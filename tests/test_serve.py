"""Continuous-batching inference server: batched results must match direct
single-request inference, mixed lengths must bucket into bounded shapes."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models import CoarseFinePipeline
from coarse_fine_networks_tpu.serve import VideoServer

pytestmark = pytest.mark.slow  # pipeline compiles dominate


@pytest.fixture(scope="module")
def pipeline():
    m = CoarseFinePipeline(n_classes=7)
    h, t, tf = 32, 8, 8
    clips = jnp.zeros((1, t, h, h, 3), jnp.float32)
    fine = jnp.zeros((1, tf, h, h, 3), jnp.float32)
    meta = jnp.asarray([[0, t, 2 * t, 1]], jnp.int32)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, clips,
                               fine, meta))()
    return m, v


def test_server_batches_and_matches_direct(pipeline):
    m, v = pipeline
    h = 32
    rng = np.random.RandomState(0)
    apply_fn = functools.partial(m.apply, v)
    server = VideoServer(apply_fn, max_batch=4, max_wait_ms=200,
                         bucket_multiple=8).start()
    try:
        reqs = []
        for t, tf in [(5, 6), (7, 8), (8, 7), (6, 5)]:
            clips = rng.rand(t, h, h, 3).astype(np.float32)
            fine = rng.rand(tf, h, h, 3).astype(np.float32)
            reqs.append((clips, fine, server.submit(clips, fine)))
        results = [f.result(timeout=600) for _, _, f in reqs]

        # all four share the (8, 8) bucket → one fused batch
        assert server.batches_run == 1
        assert server.batch_sizes == [4]

        for (clips, fine, _), probs in zip(reqs, results):
            t = clips.shape[0]
            assert probs.shape == (4 * t, 7)
            assert np.isfinite(probs).all()
            assert (probs >= 0).all() and (probs <= 1).all()
            # direct single-request inference through the same padded shape
            cp = np.zeros((1, 8, h, h, 3), np.float32)
            fp = np.zeros((1, 8, h, h, 3), np.float32)
            cp[0, :t] = clips
            fp[0, : fine.shape[0]] = fine
            meta = jnp.asarray([[0, t, 2 * t, 1]], jnp.int32)
            ref = np.asarray(
                jax.jit(lambda c, f, me: m.apply(v, c, f, me, 32))(
                    jnp.asarray(cp), jnp.asarray(fp), meta))[0, : 4 * t]
            np.testing.assert_allclose(probs, ref, rtol=2e-4, atol=2e-5)
    finally:
        server.stop()


def test_server_mixed_buckets(pipeline):
    m, v = pipeline
    h = 32
    rng = np.random.RandomState(1)
    apply_fn = functools.partial(m.apply, v)
    server = VideoServer(apply_fn, max_batch=8, max_wait_ms=50,
                         bucket_multiple=8).start()
    try:
        futs = []
        for t in (5, 8, 12, 16, 6, 13):   # buckets: 8, 8, 16, 16, 8, 16
            clips = rng.rand(t, h, h, 3).astype(np.float32)
            fine = rng.rand(8, h, h, 3).astype(np.float32)
            futs.append((t, server.submit(clips, fine)))
        for t, f in futs:
            probs = f.result(timeout=600)
            assert probs.shape == (4 * t, 7)
        assert server.batches_run <= 3   # bounded by bucket count
    finally:
        server.stop()
