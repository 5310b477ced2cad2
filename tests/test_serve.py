"""Continuous-batching inference server: batched results must match direct
single-request inference, mixed lengths must bucket into bounded shapes, and
the hardening semantics (backpressure, timeout, cancellation, error
isolation, spatial-shape bucketing) must hold."""

import functools
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models import CoarseFinePipeline
from coarse_fine_networks_tpu.serve import ServerOverloadedError, VideoServer


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
            t, tf = clips.shape[0], fine.shape[0]
            assert probs.shape == (4 * t, 7)
            assert np.isfinite(probs).all()
            assert (probs >= 0).all() and (probs <= 1).all()
            # direct single-request inference through the same padded shape,
            # with the same fine-frame validity mask the server derives
            cp = np.zeros((1, 8, h, h, 3), np.float32)
            fp = np.zeros((1, 8, h, h, 3), np.float32)
            fm = np.zeros((1, 8), np.float32)
            cp[0, :t] = clips
            fp[0, :tf] = fine
            fm[0, :tf] = 1.0
            meta = jnp.asarray([[0, t, tf, 1]], jnp.int32)
            ref = np.asarray(
                jax.jit(lambda c, f, me, k: m.apply(v, c, f, me, 32,
                                                    fine_mask=k))(
                    jnp.asarray(cp), jnp.asarray(fp), meta,
                    jnp.asarray(fm)))[0, : 4 * t]
            np.testing.assert_allclose(probs, ref, rtol=2e-4, atol=2e-5)
    finally:
        server.stop()


@pytest.mark.slow
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


# ---- hardening (cheap stub apply — no model compile) ------------------------


def _stub_apply(c, f, m, label_len, fine_mask=None):
    """Echo meta into the result so tests can observe what the server built:
    out[..., :4] = meta, out[..., 4] = sum(fine_mask) per sample."""
    b = c.shape[0]
    out = jnp.zeros((b, label_len, 7), jnp.float32)
    out = out.at[:, :, :4].set(m[:, None, :].astype(jnp.float32))
    if fine_mask is not None:
        out = out.at[:, :, 4].set(jnp.sum(fine_mask, axis=1)[:, None])
    return out


def _req(rng, t=5, tf=6, h=16, w=16):
    return (rng.rand(t, h, w, 3).astype(np.float32),
            rng.rand(tf, h, w, 3).astype(np.float32))


def test_backpressure_bounded_queue():
    rng = np.random.RandomState(0)
    server = VideoServer(_stub_apply, max_queue=2)  # not started: no drain
    server.submit(*_req(rng))
    server.submit(*_req(rng))
    with pytest.raises(ServerOverloadedError):
        server.submit(*_req(rng))


def test_priority_classes_and_aging():
    """Higher-priority buckets schedule first; a long-waiting low-priority
    request ages upward and eventually outranks fresh urgent traffic."""
    rng = np.random.RandomState(1)
    s = VideoServer(_stub_apply, max_batch=1, max_wait_ms=0,
                    bucket_multiple=4, priority_aging_s=1000.0)
    # two distinct buckets (different T); do not start — drive _take_batch
    s.submit(*_req(rng, t=3))                       # bucket A, priority 0
    s.submit(*_req(rng, t=20), priority=2)          # bucket B, priority 2
    key, reqs = s._take_batch()
    assert reqs and reqs[0].priority == 2           # urgent first
    key, reqs = s._take_batch()
    assert reqs and reqs[0].priority == 0

    # aging: the low-priority head waited long enough to outrank priority 2
    s2 = VideoServer(_stub_apply, max_batch=1, max_wait_ms=0,
                     bucket_multiple=4, priority_aging_s=1.0)
    lowf = s2.submit(*_req(rng, t=3))
    s2.submit(*_req(rng, t=20), priority=2)
    with s2._lock:
        for dq in s2._buckets.values():
            if dq and dq[0].priority == 0:
                dq[0].enqueued_at -= 10.0           # waited "10 s"
    key, reqs = s2._take_batch()
    assert reqs and reqs[0].priority == 0, "aged request must win"
    assert not lowf.done()


def test_submit_validates_shapes():
    server = VideoServer(_stub_apply)
    with pytest.raises(ValueError):
        server.submit(np.zeros((5, 16, 16)), np.zeros((5, 16, 16, 3)))
    with pytest.raises(ValueError):
        server.submit(np.zeros((5, 16, 16, 3)), np.zeros((5, 16, 16, 4)))


def test_request_timeout():
    rng = np.random.RandomState(0)
    # max_batch never fills and the deadline is far: the lone request would
    # wait forever without the per-request timeout
    server = VideoServer(_stub_apply, max_batch=64, max_wait_ms=60_000,
                         request_timeout_s=0.05).start()
    try:
        f = server.submit(*_req(rng))
        with pytest.raises(TimeoutError):
            f.result(timeout=30)
        assert server.timeouts == 1
    finally:
        server.stop()


def test_cancellation_before_launch():
    rng = np.random.RandomState(0)
    server = VideoServer(_stub_apply, max_batch=2, max_wait_ms=500).start()
    try:
        f1 = server.submit(*_req(rng))
        f2 = server.submit(*_req(rng, t=6))  # same bucket; batch of 2 forms
        assert f2.cancel()                   # ...unless cancelled in time
        r1 = f1.result(timeout=60)
        assert r1.shape == (4 * 5, 7)
        deadline = time.monotonic() + 10
        while server.cancelled == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert server.cancelled == 1
        assert server.batch_sizes == [1]
    finally:
        server.stop()


def test_error_isolation_keeps_serving():
    rng = np.random.RandomState(0)
    box = {"fail": True}

    def flaky(c, f, m, label_len, fine_mask=None):
        if box["fail"]:
            raise ValueError("injected")
        return _stub_apply(c, f, m, label_len, fine_mask)

    server = VideoServer(flaky, max_batch=1, max_wait_ms=1).start()
    try:
        f1 = server.submit(*_req(rng))
        with pytest.raises(ValueError, match="injected"):
            f1.result(timeout=60)
        box["fail"] = False
        f2 = server.submit(*_req(rng))
        assert f2.result(timeout=60).shape == (4 * 5, 7)
    finally:
        server.stop()


def test_spatial_sizes_bucket_separately():
    """Different H/W (or fine-stream H/W) must never fuse into one batch —
    they are different program shapes (the batch assembly would raise)."""
    rng = np.random.RandomState(0)
    server = VideoServer(_stub_apply, max_batch=8, max_wait_ms=30).start()
    try:
        f1 = server.submit(*_req(rng, h=16, w=16))
        f2 = server.submit(*_req(rng, h=32, w=16))
        f3 = server.submit(*_req(rng, h=16, w=16))  # only f1's bucket-mate
        for f in (f1, f2, f3):
            assert f.result(timeout=60).shape == (4 * 5, 7)
        assert server.batches_run == 2
        assert sorted(server.batch_sizes) == [1, 2]
    finally:
        server.stop()


def test_default_meta_and_fine_mask():
    """Default meta carries the TRUE fine frame count (nf) and the server
    passes a validity mask covering exactly the unpadded fine frames."""
    rng = np.random.RandomState(0)
    server = VideoServer(_stub_apply, max_batch=1, max_wait_ms=1,
                         bucket_multiple=16).start()
    try:
        t, tf = 5, 9  # tf pads to 16; mask must still sum to 9
        f = server.submit(*_req(rng, t=t, tf=tf))
        out = f.result(timeout=60)
        np.testing.assert_array_equal(out[0, :4], [0, t, tf, 1])
        assert out[0, 4] == tf
    finally:
        server.stop()


def test_serve_cli_aggregates_subbn_stats(tmp_path):
    """Serving checkpoint assembly refreshes SubBN eval stats from the
    stored split stats (the reference aggregates before any eval-mode use,
    extract_fineFEAT.py:138).  Training checkpoints only maintain split
    stats; without aggregation serving would normalise with init-valued
    eval stats and the tower activations explode multiplicatively
    (regression caught by tests/test_training_trajectory.py)."""
    from coarse_fine_networks_tpu.ckpt import save_checkpoint
    from coarse_fine_networks_tpu.cli.serve import (
        assemble_pipeline_variables,
    )

    split_mean = np.asarray([[1.0, 3.0], [3.0, 5.0]], np.float32)
    split_var = np.asarray([[4.0, 2.0], [8.0, 2.0]], np.float32)
    stats = {"trunk": {"bn1": {
        "mean": np.zeros(2, np.float32),
        "var": np.ones(2, np.float32),
        "split_mean": split_mean,
        "split_var": split_var,
    }}}
    v = {"params": {"fine": {"w": np.ones(1, np.float32)},
                    "coarse": {"w": np.ones(1, np.float32)}},
         "batch_stats": {"fine": stats, "coarse": stats}}
    path = str(tmp_path / "joint.ckpt")
    save_checkpoint(path, v)

    out = assemble_pipeline_variables(path, None, None)
    got = out["batch_stats"]["fine"]["trunk"]["bn1"]
    exp_mean = split_mean.mean(axis=0)
    exp_var = (split_var.mean(axis=0)
               + ((split_mean - exp_mean) ** 2).mean(axis=0))
    np.testing.assert_allclose(np.asarray(got["mean"]), exp_mean, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["var"]), exp_var, rtol=1e-6)
    # split stats pass through untouched (training can resume from them)
    np.testing.assert_array_equal(np.asarray(got["split_mean"]), split_mean)
