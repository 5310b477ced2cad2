"""HTTP serving front end: score round-trip through a real socket, model
routing, error mapping (404/400/429/depth), stats and health endpoints.
Stub models keep it fast — the TPU path is covered by tests/test_serve.py."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from coarse_fine_networks_tpu.serve import (
    InferenceHTTPServer,
    ModelRouter,
    VideoServer,
)


def _stub_apply(scale):
    def apply(clips, fine_clips, meta, label_len, fine_mask=None):
        per_clip = clips.mean(axis=(1, 2, 3)) * scale
        return jnp.broadcast_to(per_clip[:, None, :],
                                (clips.shape[0], label_len, 3))
    return apply


@pytest.fixture
def http_server():
    r = ModelRouter()
    r.register("m-v1", VideoServer(_stub_apply(1.0), max_batch=2,
                                   max_wait_ms=5, bucket_multiple=4),
               default=True)
    r.register("m-v2", VideoServer(_stub_apply(2.0), max_batch=2,
                                   max_wait_ms=5, bucket_multiple=4))
    s = InferenceHTTPServer(r, port=0).start()
    yield s
    s.stop()


def _post(port, path, arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, resp.read()


def _get_json(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_score_roundtrip_and_routing(http_server):
    port = http_server.port
    rng = np.random.RandomState(0)
    clips = rng.rand(6, 8, 8, 3).astype(np.float32)
    fine = rng.rand(12, 8, 8, 3).astype(np.float32)

    st, body = _post(port, "/v1/score", {"clips": clips, "fine_clips": fine})
    assert st == 200
    with np.load(io.BytesIO(body)) as z:
        p1 = z["probs"]
    assert p1.shape == (24, 3)

    st, body = _post(port, "/v1/score?model=m-v2",
                     {"clips": clips, "fine_clips": fine})
    assert st == 200
    with np.load(io.BytesIO(body)) as z:
        p2 = z["probs"]
    np.testing.assert_allclose(p2, 2.0 * p1, rtol=1e-6)


def test_endpoints_and_errors(http_server):
    port = http_server.port
    st, models = _get_json(port, "/v1/models")
    assert st == 200 and models["models"] == ["m-v1", "m-v2"]
    st, health = _get_json(port, "/healthz")
    assert st == 200 and health["status"] == "ok"

    clips = np.zeros((4, 8, 8, 3), np.float32)
    fine = np.zeros((8, 8, 8, 3), np.float32)
    # unknown model -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/score?model=ghost",
              {"clips": clips, "fine_clips": fine})
    assert e.value.code == 404
    # malformed payload -> 400
    req = urllib.request.Request(f"http://127.0.0.1:{port}/v1/score",
                                 data=b"not-an-npz")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # bad shape -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/score", {"clips": np.zeros((3, 3), np.float32),
                                  "fine_clips": fine})
    assert e.value.code == 400
    # unknown route -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get_json(port, "/v1/nope")
    assert e.value.code == 404

    _post(port, "/v1/score", {"clips": clips, "fine_clips": fine})
    st, stats = _get_json(port, "/v1/stats")
    assert st == 200 and stats["m-v1"]["batches_run"] >= 1


@pytest.mark.slow
def test_serve_cli_end_to_end(tmp_path):
    """The deployable service path exactly as the CLI wires it: per-stream
    driver-style checkpoints → assemble_pipeline_variables → real
    CoarseFinePipeline behind scheduler+cache+router+HTTP; a repeat request
    with a video_id must hit the feature cache."""
    import jax
    import jax.numpy as jnp2

    from coarse_fine_networks_tpu.ckpt import save_checkpoint
    from coarse_fine_networks_tpu.cli.serve import (
        assemble_pipeline_variables,
        build_server,
    )
    from coarse_fine_networks_tpu.models import CoarseFinePipeline

    m = CoarseFinePipeline(n_classes=7)
    h, t, tf = 32, 8, 8
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0)},
        jnp2.zeros((1, t, h, h, 3)), jnp2.zeros((1, tf, h, h, 3)),
        jnp2.asarray([[0, t, tf, 1]], jnp2.int32)))()
    # split into the two driver-style checkpoint payloads
    save_checkpoint(str(tmp_path / "fine.ckpt"), {
        "variables": {"params": v["params"]["fine"],
                      "batch_stats": v["batch_stats"]["fine"]}})
    save_checkpoint(str(tmp_path / "coarse.ckpt"), {
        "variables": {"params": v["params"]["coarse"],
                      "batch_stats": v["batch_stats"]["coarse"]}})

    variables = assemble_pipeline_variables(
        None, str(tmp_path / "fine.ckpt"), str(tmp_path / "coarse.ckpt"))
    srv = build_server(variables, "M", 7, port=0, cache_bytes=1 << 28,
                       max_batch=2, max_wait_ms=20, max_queue=16,
                       request_timeout_s=600).start()
    try:
        port = srv.port
        rng = np.random.RandomState(3)
        clips = rng.rand(6, h, h, 3).astype(np.float32)
        fine = rng.rand(7, h, h, 3).astype(np.float32)
        st, body = _post(port, "/v1/score?video_id=vid1",
                         {"clips": clips, "fine_clips": fine})
        assert st == 200
        with np.load(io.BytesIO(body)) as z:
            p1 = z["probs"]
        assert p1.shape == (24, 7) and np.isfinite(p1).all()
        # repeat: no fine pixels, must hit the cache and agree
        st, body = _post(port, "/v1/score?video_id=vid1", {"clips": clips})
        assert st == 200
        with np.load(io.BytesIO(body)) as z:
            p2 = z["probs"]
        np.testing.assert_allclose(p2, p1, rtol=1e-6, atol=1e-7)
        _, stats = _get_json(port, "/v1/stats")
        assert stats["coarse_fine"]["cache_hits"] == 1
    finally:
        srv.stop()
