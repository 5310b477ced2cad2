"""End-to-end serving demo on synthetic weights: build the joint pipeline,
stand up the full serving stack (scheduler → fine-feature cache → router →
HTTP), score a video over a real socket, then score it again as a cache hit.

    python examples/demo_serving.py

Runs on CPU or TPU; tiny shapes so it finishes in ~a minute on CPU.
"""

import io
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models import CoarseFinePipeline
from coarse_fine_networks_tpu.serve import (
    CachingVideoServer,
    FeatureCache,
    InferenceHTTPServer,
    ModelRouter,
)


def main():
    h, t, tf, n_classes = 32, 8, 16, 17
    m = CoarseFinePipeline(n_classes=n_classes)
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, t, h, h, 3)), jnp.zeros((1, tf, h, h, 3)),
        jnp.asarray([[0, t, tf, 1]], jnp.int32)))()

    import functools
    server = CachingVideoServer(
        extract_fn=functools.partial(m.apply, v,
                                     method=CoarseFinePipeline.extract),
        fuse_fn=functools.partial(m.apply, v,
                                  method=CoarseFinePipeline.fuse),
        cache=FeatureCache(capacity_bytes=1 << 28),
        max_batch=4, max_wait_ms=10,
    )
    router = ModelRouter().register("coarse_fine", server, default=True)
    srv = InferenceHTTPServer(router, port=0).start()
    print(f"serving on 127.0.0.1:{srv.port}")

    rng = np.random.RandomState(0)
    clips = rng.rand(6, h, h, 3).astype(np.float32)
    fine = rng.rand(12, h, h, 3).astype(np.float32)

    def score(arrays, qs=""):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/score{qs}", data=buf.getvalue())
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=600) as r:
            probs = np.load(io.BytesIO(r.read()))["probs"]
        return probs, time.time() - t0

    p1, dt1 = score({"clips": clips, "fine_clips": fine},
                    "?video_id=demo-vid")
    print(f"cold score: probs {p1.shape} in {dt1:.2f}s (extract + fuse)")
    p2, dt2 = score({"clips": clips}, "?video_id=demo-vid")
    print(f"warm score: probs {p2.shape} in {dt2:.2f}s (cache hit, no fine "
          f"pixels sent)")
    assert np.allclose(p1, p2, rtol=1e-5, atol=1e-6)

    import json
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/v1/stats", timeout=30) as r:
        print("stats:", json.dumps(json.loads(r.read())["coarse_fine"]))
    srv.stop()
    print("done")


if __name__ == "__main__":
    main()
