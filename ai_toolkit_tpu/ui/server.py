"""Minimal REST monitor server for the web UI.

Parity target: the reference UI's REST routes the trainer side can serve —
device monitor (``ui/src/app/api/gpu/route.ts:1-30`` shells out to
nvidia-smi; here we report TPU/accelerator stats from the JAX runtime) and
job listing/stop on the shared SQLite DB (``ui/prisma/schema.prisma``). The
reference's Next.js app owns the full API; this stdlib server covers the
endpoints a headless deployment needs:

    GET  /api/gpu                accelerator device list + memory stats
    GET  /api/jobs               Job table rows (id, status, step, info)
    GET  /api/jobs/<id>          one row
    POST /api/jobs/<id>/stop     set stop flag (trainer polls it)
    POST /api/jobs/<id>/save     set save_now flag
    GET  /api/health             liveness

Auth: optional AI_TOOLKIT_AUTH bearer token (reference README.md:180-196).
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def accelerator_stats() -> dict:
    """Device inventory + per-device memory, TPU equivalent of nvidia-smi."""
    import jax

    devices = []
    for d in jax.local_devices():
        info = {"id": d.id, "kind": d.device_kind, "platform": d.platform}
        try:
            ms = d.memory_stats()
            if ms:
                info["bytes_in_use"] = int(ms.get("bytes_in_use", 0))
                info["bytes_limit"] = int(ms.get("bytes_limit", 0))
        except Exception:
            pass
        devices.append(info)
    return {"devices": devices, "backend": devices[0]["platform"] if devices else "none"}


class _Handler(BaseHTTPRequestHandler):
    server_version = "ai-toolkit-tpu"

    def log_message(self, *a):  # quiet
        pass

    def _auth_ok(self) -> bool:
        token = os.environ.get("AI_TOOLKIT_AUTH")
        if not token:
            return True
        return self.headers.get("Authorization", "") == f"Bearer {token}"

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _db(self):
        return sqlite3.connect(self.server.db_path, timeout=5.0)

    def _jobs(self, job_id=None):
        try:
            with self._db() as conn:
                conn.row_factory = sqlite3.Row
                if job_id:
                    rows = conn.execute("SELECT * FROM Job WHERE id = ?", (job_id,)).fetchall()
                else:
                    rows = conn.execute("SELECT * FROM Job").fetchall()
            return [dict(r) for r in rows]
        except sqlite3.Error as e:
            return {"error": str(e)}

    def do_GET(self):
        if not self._auth_ok():
            return self._json({"error": "unauthorized"}, 401)
        if self.path == "/api/health":
            return self._json({"ok": True})
        if self.path == "/api/gpu":
            return self._json(accelerator_stats())
        if self.path == "/api/jobs":
            return self._json(self._jobs())
        if self.path.startswith("/api/jobs/"):
            job_id = self.path.split("/")[3]
            rows = self._jobs(job_id)
            if isinstance(rows, list) and rows:
                return self._json(rows[0])
            return self._json({"error": "not found"}, 404)
        return self._json({"error": "unknown route"}, 404)

    def do_POST(self):
        if not self._auth_ok():
            return self._json({"error": "unauthorized"}, 401)
        parts = self.path.strip("/").split("/")
        if len(parts) == 4 and parts[:2] == ["api", "jobs"] and parts[3] in ("stop", "save", "sample"):
            field = {"stop": "stop", "save": "save_now", "sample": "sample_now"}[parts[3]]
            try:
                with self._db() as conn:
                    n = conn.execute(
                        f"UPDATE Job SET {field} = 1 WHERE id = ?", (parts[2],)
                    ).rowcount
                return self._json({"updated": n})
            except sqlite3.Error as e:
                return self._json({"error": str(e)}, 500)
        return self._json({"error": "unknown route"}, 404)


class UIServer:
    """Threaded REST server; start()/stop() for embedding in run.py or tests."""

    def __init__(self, db_path: str = "aitk_db.db", host: str = "127.0.0.1", port: int = 8676):
        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.httpd.db_path = db_path
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
