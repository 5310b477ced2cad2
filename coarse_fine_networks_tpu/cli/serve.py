"""``python -m coarse_fine_networks_tpu.cli.serve --fine-ckpt <fine.ckpt>
--coarse-ckpt <coarse.ckpt> [--port 8000]`` (or ``--ckpt <joint.ckpt>``)

Production inference service: loads the joint Coarse-Fine pipeline from
native checkpoints, wires it through the continuous-batching scheduler +
fine-feature cache + model router, and serves HTTP (`serve/http.py`):

    POST /v1/score?video_id=<id>   raw .npz {clips[, fine_clips]} -> probs
    GET  /v1/models  /v1/stats  /healthz

The reference has no inference service — its only scoring surface is the
batch-1 val loop inside ``train_coarse_fineFEAT.py:215-263``.
"""

from __future__ import annotations

import argparse
import functools
import signal
import threading


def _load_variables(path: str):
    """Driver checkpoints wrap model variables (train/common.py payload);
    raw variable dicts load as-is."""
    from ..ckpt import load_checkpoint

    payload = load_checkpoint(path)
    return payload.get("variables", payload)


def assemble_pipeline_variables(ckpt: str | None, fine_ckpt: str | None,
                                coarse_ckpt: str | None):
    """Joint pipeline variables from either one joint checkpoint (params
    already nested under ``fine``/``coarse``) or the two per-stream driver
    checkpoints (``train_fine`` + ``train_coarse_fineFEAT`` outputs — the
    reference's deployment artifacts).

    SubBN eval stats are refreshed from the stored split stats here
    (``aggregate_sub_bn_stats`` — the reference does the same before any
    eval-mode use, ``extract_fineFEAT.py:138``); training checkpoints only
    maintain the split stats, so serving without aggregation would
    normalise with init-valued eval stats."""
    from ..models.layers import aggregate_sub_bn_stats

    if ckpt:
        v = _load_variables(ckpt)
        if "fine" not in v["params"] or "coarse" not in v["params"]:
            raise ValueError(
                f"{ckpt} is not a joint pipeline checkpoint; pass "
                "--fine-ckpt/--coarse-ckpt for per-stream artifacts")
        return dict(v, batch_stats=aggregate_sub_bn_stats(v["batch_stats"]))
    if not (fine_ckpt and coarse_ckpt):
        raise ValueError("need --ckpt or both --fine-ckpt/--coarse-ckpt")
    fv = _load_variables(fine_ckpt)
    cv = _load_variables(coarse_ckpt)
    return {
        "params": {"fine": fv["params"], "coarse": cv["params"]},
        "batch_stats": aggregate_sub_bn_stats(
            {"fine": fv["batch_stats"], "coarse": cv["batch_stats"]}),
    }


def build_server(variables, version: str, num_classes: int, port: int,
                 cache_bytes: int, max_batch: int, max_wait_ms: float,
                 max_queue: int, request_timeout_s: float | None,
                 prewarm_dir: str | None = None,
                 mesh_devices: int | None = None):
    from ..models import CoarseFinePipeline
    from ..serve import (CachingVideoServer, FeatureCache,
                         InferenceHTTPServer, ModelRouter)

    mesh = None
    if mesh_devices and mesh_devices > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(mesh_devices)
    m = CoarseFinePipeline(version=version, n_classes=num_classes)
    cache = FeatureCache(capacity_bytes=cache_bytes)
    if prewarm_dir:
        n = cache.preload_dir(prewarm_dir)
        print(f"prewarmed {n} videos ({cache.nbytes / 1e9:.2f} GB) from "
              f"{prewarm_dir}", flush=True)

    server = CachingVideoServer(
        extract_fn=functools.partial(m.apply, variables,
                                     method=CoarseFinePipeline.extract),
        fuse_fn=functools.partial(m.apply, variables,
                                  method=CoarseFinePipeline.fuse),
        cache=cache,
        max_batch=max_batch, max_wait_ms=max_wait_ms, max_queue=max_queue,
        request_timeout_s=request_timeout_s, mesh=mesh,
    )
    router = ModelRouter().register("coarse_fine", server, default=True)
    return InferenceHTTPServer(router, port=port)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Serve Coarse-Fine joint inference over HTTP")
    p.add_argument("--ckpt", default=None,
                   help="joint pipeline checkpoint (.ckpt)")
    p.add_argument("--fine-ckpt", default=None,
                   help="fine-stream driver checkpoint (with --coarse-ckpt)")
    p.add_argument("--coarse-ckpt", default=None,
                   help="coarse-stream driver checkpoint (with --fine-ckpt)")
    p.add_argument("--version", default="M", choices=("S", "M", "XL"))
    p.add_argument("--num-classes", type=int, default=157)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--cache-gb", type=float, default=1.0,
                   help="fine-feature cache capacity")
    p.add_argument("--prewarm-dir", default=None,
                   help="extract_fineFEAT bank dir to preload the cache")
    p.add_argument("--mesh-devices", type=int, default=None,
                   help="data-parallel serving over N chips (batches "
                        "row-shard over the mesh)")
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--max-queue", type=int, default=256)
    p.add_argument("--request-timeout-s", type=float, default=120.0)
    args = p.parse_args(argv)

    variables = assemble_pipeline_variables(args.ckpt, args.fine_ckpt,
                                            args.coarse_ckpt)
    srv = build_server(variables, args.version, args.num_classes, args.port,
                       int(args.cache_gb * (1 << 30)), args.max_batch,
                       args.max_wait_ms, args.max_queue,
                       args.request_timeout_s,
                       prewarm_dir=args.prewarm_dir,
                       mesh_devices=args.mesh_devices).start()
    print(f"serving on :{srv.port} (POST /v1/score)", flush=True)
    done = threading.Event()
    signal.signal(signal.SIGTERM, lambda *a: done.set())
    signal.signal(signal.SIGINT, lambda *a: done.set())
    done.wait()
    srv.stop()


if __name__ == "__main__":
    main()
