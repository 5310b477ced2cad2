"""HTTP front end for the video inference tier.

A thin, dependency-free network surface over :class:`.router.ModelRouter`
(stdlib ``http.server`` with a thread pool — the actual batching, caching
and routing all live in the router/scheduler layer, which is where the TPU
work is; the HTTP layer only decodes requests and streams results).

Protocol (binary-safe, no JSON round-trip for pixel payloads):

* ``POST /v1/score`` — body is a raw ``.npz`` archive with arrays
  ``clips (T, H, W, 3) float32`` and optionally ``fine_clips``; query
  params ``model=<name>`` and ``video_id=<id>`` select the variant and
  enable the fine-feature cache; ``priority=<int>`` raises scheduling
  precedence (aged, so background traffic is never starved).  Response:
  an ``.npz`` with ``probs (4*T, n_classes) float32``.
* ``GET /v1/models`` — JSON list of registered variants.
* ``GET /v1/stats`` — JSON per-model queue/batch/cache health.
* ``GET /healthz`` — 200 when serving, 503 once draining.

Overload maps to HTTP 429, unknown model to 404, malformed input to 400,
per-request timeout to 504 — so standard load balancers and clients can
react without custom code.  The reference has no serving tier at all; this
closes the "deployable service" gap end-to-end (scheduler → cache →
router → network).
"""

from __future__ import annotations

import io
import json
import threading
from concurrent.futures import CancelledError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from .router import ModelRouter, UnknownModelError
from .scheduler import ServerOverloadedError


class InferenceHTTPServer:
    """Serve a :class:`ModelRouter` over HTTP.

    Args:
      router: a started (or startable) router.
      host/port: bind address; ``port=0`` picks a free port (tests).
      result_timeout_s: cap on waiting for a batched result.
    """

    def __init__(self, router: ModelRouter, host: str = "127.0.0.1",
                 port: int = 8000, result_timeout_s: float = 120.0):
        self.router = router
        self.result_timeout = result_timeout_s
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet; stats live in /v1/stats
                pass

            def _reply(self, code: int, body: bytes,
                       ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, code: int, obj):
                self._reply(code, json.dumps(obj).encode())

            def do_GET(self):
                path = urlparse(self.path).path
                if path == "/healthz":
                    if outer.router._stopped:
                        self._json(503, {"status": "draining"})
                    else:
                        self._json(200, {"status": "ok"})
                elif path == "/v1/models":
                    self._json(200, {"models": outer.router.models})
                elif path == "/v1/stats":
                    self._json(200, outer.router.stats())
                else:
                    self._json(404, {"error": f"no route {path}"})

            def do_POST(self):
                url = urlparse(self.path)
                if url.path != "/v1/score":
                    self._json(404, {"error": f"no route {url.path}"})
                    return
                q = parse_qs(url.query)
                model = q.get("model", [None])[0]
                video_id = q.get("video_id", [None])[0]
                priority = int(q.get("priority", ["0"])[0])
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    with np.load(io.BytesIO(self.rfile.read(n))) as z:
                        clips = z["clips"]
                        fine = (z["fine_clips"] if "fine_clips" in z.files
                                else None)
                except Exception as e:
                    self._json(400, {"error": f"bad npz body: {e}"})
                    return
                try:
                    kw = {}
                    if video_id is not None:
                        kw["video_id"] = video_id
                    if priority:
                        kw["priority"] = priority
                    fut = outer.router.submit(clips, fine, model=model, **kw)
                    probs = fut.result(timeout=outer.result_timeout)
                except UnknownModelError as e:
                    self._json(404, {"error": f"unknown model {e}"})
                    return
                except ServerOverloadedError as e:
                    self._json(429, {"error": str(e)})
                    return
                except (TimeoutError, CancelledError) as e:
                    self._json(504, {"error": f"timed out: {e}"})
                    return
                except (ValueError, RuntimeError) as e:
                    self._json(400, {"error": str(e)})
                    return
                buf = io.BytesIO()
                np.savez(buf, probs=np.asarray(probs, np.float32))
                self._reply(200, buf.getvalue(),
                            ctype="application/octet-stream")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "InferenceHTTPServer":
        self.router.start()
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        """Drain: stop accepting connections, then stop the router."""
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=30)
        self.router.stop()
