"""Minimal stdlib HTTP front-end for :class:`flyp_tpu.serving.ClipServer`.

The reference has no serving story at all (deployment means a hand-rolled
torch loop, `/root/reference/src/models/modeling.py:78-104`); this module
makes the rebuild's "deployment front-end" literally true: POST images,
get predictions — no client library, no framework dependency.

Transport choices, deliberately boring:

* ``http.server.ThreadingHTTPServer`` — one thread per request.  That is
  safe because ``ClipServer``'s request methods are reentrant (engine.py
  "Concurrency"); concurrent requests simply share device throughput.
* Image payloads are ``.npy`` bodies (``Content-Type:
  application/x-npy``) — the zero-dependency wire format every numpy
  client already has (``np.save(buf, images)``) — or JSON nested lists
  for tiny/manual requests.  Responses are JSON.

Endpoints::

    GET  /healthz            -> {"ok": true, "model": ..., "buckets": [...],
                                 "num_classes": N | null}
    POST /features           -> {"features": [[...], ...]}      (images)
    POST /text_features      -> {"features": [[...], ...]}      (json {"texts": [...]})
    POST /classify?k=5       -> {"probs": [[...]], "indices": [[...]],
                                 "classes": [[name, ...], ...]}  (images; needs a head)

Run via ``python -m flyp_tpu.cli.serve --http PORT ...``.
"""

from __future__ import annotations

import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence
from urllib.parse import parse_qs, urlparse

import numpy as np


def _decode_images(body: bytes, content_type: str) -> np.ndarray:
    if "json" in (content_type or ""):
        payload = json.loads(body.decode("utf-8"))
        return np.asarray(payload["images"], np.float32)
    return np.load(io.BytesIO(body), allow_pickle=False)


def make_handler(server, classnames: Optional[Sequence[str]] = None):
    """Request handler class bound to one ClipServer instance."""

    class ClipHandler(BaseHTTPRequestHandler):
        # Quiet by default: per-request stderr lines would swamp a
        # throughput deployment; flip for debugging.
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if urlparse(self.path).path != "/healthz":
                return self._reply(404, {"error": f"unknown path {self.path!r}"})
            self._reply(
                200,
                {
                    "ok": True,
                    "model": type(server.model).__name__,
                    "buckets": list(server.image_buckets),
                    "num_classes": None if server.head is None else int(server.head.weight.shape[0]),
                },
            )

        def do_POST(self):  # noqa: N802
            parsed = urlparse(self.path)
            try:
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                ctype = self.headers.get("Content-Type", "")
                if parsed.path == "/features":
                    feats = server.encode_images(_decode_images(body, ctype))
                    return self._reply(200, {"features": np.asarray(feats, np.float32).tolist()})
                if parsed.path == "/text_features":
                    texts = json.loads(body.decode("utf-8"))["texts"]
                    feats = server.encode_texts(texts)
                    return self._reply(200, {"features": np.asarray(feats, np.float32).tolist()})
                if parsed.path == "/classify":
                    if server.head is None:
                        return self._reply(400, {"error": "server has no classification head"})
                    k = int(parse_qs(parsed.query).get("k", ["5"])[0])
                    probs, idx = server.top_k(_decode_images(body, ctype), k=k)
                    out = {"probs": probs.tolist(), "indices": idx.tolist()}
                    if classnames is not None:
                        out["classes"] = [[classnames[j] for j in row] for row in idx]
                    return self._reply(200, out)
                return self._reply(404, {"error": f"unknown path {parsed.path!r}"})
            except Exception as e:  # surface the failure to the CLIENT
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return ClipHandler


def serve_http(
    server, port: int, classnames: Optional[Sequence[str]] = None, host: str = "127.0.0.1"
) -> ThreadingHTTPServer:
    """Bind a :class:`ThreadingHTTPServer` for ``server``; the caller owns
    the loop (``serve_forever()``) and shutdown.  ``port=0`` binds an
    ephemeral port (tests); the bound port is ``.server_address[1]``."""
    return ThreadingHTTPServer((host, port), make_handler(server, classnames))
