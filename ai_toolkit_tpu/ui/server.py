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
    GET  /api/runs               training-folder runs (dirs w/ metrics.jsonl)
    GET  /api/runs/<name>/loss   loss/lr/speed series from metrics.jsonl
    GET  /api/runs/<name>/samples          sample file listing
    GET  /api/runs/<name>/samples/<file>   serve one sample (png/webp/wav)
    GET  /                       single-page dashboard (job table + loss chart)
    GET  /new                    quick-launch form (gradio flux_train_ui analog)
    POST /api/launch             write a LoRA config + spawn `run.py` detached
                                 (reference ui/cron startJob contract)

Auth: optional AI_TOOLKIT_AUTH bearer token (reference README.md:180-196).
"""

from __future__ import annotations

import json
import os
import re
import sqlite3
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# flat script names only — no separators, no traversal (reference
# ui/src/app/api/scripts/route.ts SCRIPT_NAME_RE)
_SCRIPT_NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.-]*\.py$")
_SCRIPT_ARG_KEY_RE = re.compile(r"^[A-Za-z0-9_-]+$")

_JOB_SCHEMA = """CREATE TABLE IF NOT EXISTS Job (
    id TEXT PRIMARY KEY,
    name TEXT,
    status TEXT DEFAULT 'queued',
    stop INTEGER DEFAULT 0,
    step INTEGER DEFAULT 0,
    total_steps INTEGER DEFAULT 0,
    info TEXT DEFAULT '',
    speed_string TEXT DEFAULT '',
    pid INTEGER,
    save_now INTEGER DEFAULT 0,
    sample_now INTEGER DEFAULT 0,
    config_path TEXT DEFAULT '',
    device TEXT DEFAULT 'all',
    queued_at REAL DEFAULT 0
)"""


def ensure_schema(db_path: str) -> None:
    """Create the Job table the reference UI/trainer contract uses
    (ui/prisma/schema.prisma:24-50) plus queue columns, and the Settings
    key/value table (reference prisma Settings model + api/settings)."""
    with sqlite3.connect(db_path, timeout=5.0) as conn:
        conn.execute("PRAGMA journal_mode=WAL")
        conn.execute(_JOB_SCHEMA)
        conn.execute("CREATE TABLE IF NOT EXISTS Settings "
                     "(key TEXT PRIMARY KEY, value TEXT NOT NULL DEFAULT '')")
        cols = {r[1] for r in conn.execute("PRAGMA table_info(Job)")}
        for col, decl in (("config_path", "TEXT DEFAULT ''"),
                          ("device", "TEXT DEFAULT 'all'"),
                          ("queued_at", "REAL DEFAULT 0"),
                          ("pid", "INTEGER")):
            if col not in cols:
                conn.execute(f"ALTER TABLE Job ADD COLUMN {col} {decl}")


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

    def _settings(self) -> dict:
        try:
            ensure_schema(self.server.db_path)
            with self._db() as conn:
                return dict(conn.execute("SELECT key, value FROM Settings"))
        except sqlite3.Error:
            return {}

    def _runs_root(self) -> str:
        # the Settings table overrides the construction-time default
        # (reference ui api/settings TRAINING_FOLDER semantics)
        return self._settings().get("TRAINING_FOLDER") or getattr(
            self.server, "runs_root", "output")

    def _run_dir(self, name: str) -> str | None:
        # reject traversal; a run is a directory under runs_root
        if not name or "/" in name or ".." in name:
            return None
        d = os.path.join(self._runs_root(), name)
        return d if os.path.isdir(d) else None

    def _serve_file(self, path: str):
        ctypes_map = {".png": "image/png", ".webp": "image/webp", ".jpg": "image/jpeg",
                      ".wav": "audio/wav", ".gif": "image/gif"}
        ext = os.path.splitext(path)[1].lower()
        try:
            with open(path, "rb") as f:
                body = f.read()
        except OSError:
            return self._json({"error": "not found"}, 404)
        self.send_response(200)
        self.send_header("Content-Type", ctypes_map.get(ext, "application/octet-stream"))
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if not self._auth_ok():
            return self._json({"error": "unauthorized"}, 401)
        if self.path in ("/", "/index.html"):
            body = _DASHBOARD_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            return self.wfile.write(body)
        if self.path == "/jobs":
            body = _JOBS_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            return self.wfile.write(body)
        if self.path == "/new":
            body = _LAUNCH_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            return self.wfile.write(body)
        if self.path == "/api/health":
            return self._json({"ok": True})
        if self.path == "/api/archs":
            # per-arch options for the config builder (reference
            # ui/src/app/jobs/new/options.tsx model list)
            from ai_toolkit_tpu.models.registry import (
                MODEL_REGISTRY,
                _ensure_builtin_models,
            )

            _ensure_builtin_models()
            out = []
            for arch in sorted(MODEL_REGISTRY):
                cls = MODEL_REGISTRY[arch]
                out.append({
                    "arch": arch,
                    "is_flow_matching": bool(getattr(cls, "is_flow_matching", True)),
                    "bucket_divisibility": int(getattr(cls, "bucket_divisibility", 16)),
                    "is_video": hasattr(cls, "frame_count_snapper"),
                    "is_audio": hasattr(cls, "latent_shape_audio"),
                    # structural-only archs train from random init and refuse
                    # checkpoint paths (docs/PARITY.md per-arch table)
                    "checkpoint_importable": bool(
                        getattr(cls, "checkpoint_importable", True)),
                    "noise_scheduler": "flowmatch"
                    if getattr(cls, "is_flow_matching", True) else "ddpm",
                })
            return self._json(out)
        if self.path == "/api/gpu":
            return self._json(accelerator_stats())
        if self.path == "/api/cpu":
            # host stats (reference ui/src/app/api/cpu)
            try:
                load1, load5, load15 = os.getloadavg()
            except OSError:
                load1 = load5 = load15 = 0.0
            mem = {}
            try:
                for line in open("/proc/meminfo"):
                    k, _, v = line.partition(":")
                    if k in ("MemTotal", "MemAvailable"):
                        mem[k] = int(v.strip().split()[0]) * 1024
            except OSError:
                pass
            return self._json({
                "cores": os.cpu_count(), "load1": load1, "load5": load5,
                "load15": load15, "mem_total": mem.get("MemTotal", 0),
                "mem_available": mem.get("MemAvailable", 0),
            })
        if self.path == "/api/scripts":
            # list runnable ui_scripts/*.py (reference api/scripts GET)
            root = self._scripts_root()
            names = []
            if os.path.isdir(root):
                names = sorted(
                    f for f in os.listdir(root)
                    if _SCRIPT_NAME_RE.match(f)
                    and os.path.isfile(os.path.join(root, f))
                )
            return self._json({"scripts": names})
        if self.path == "/api/settings":
            # reference ui/src/app/api/settings: key/value store with
            # TRAINING_FOLDER / DATASETS_FOLDER / HF_TOKEN semantics
            s = self._settings()
            s.setdefault("TRAINING_FOLDER", getattr(self.server, "runs_root", "output"))
            s.setdefault("DATASETS_FOLDER", getattr(self.server, "datasets_root", "datasets"))
            if s.get("HF_TOKEN"):
                s["HF_TOKEN"] = "***"  # never echo secrets back
            return self._json(s)
        if self.path == "/grid" or self.path.startswith("/grid?"):
            body = _GRID_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            return self.wfile.write(body)
        if self.path == "/api/jobs":
            return self._json(self._jobs())
        if self.path == "/api/runs":
            root = self._runs_root()
            runs = []
            if os.path.isdir(root):
                for name in sorted(os.listdir(root)):
                    m = os.path.join(root, name, "metrics.jsonl")
                    if os.path.isfile(m):
                        runs.append({"name": name, "mtime": os.path.getmtime(m)})
            return self._json(runs)
        if self.path.startswith("/api/runs/"):
            parts = self.path.strip("/").split("/")
            d = self._run_dir(parts[2]) if len(parts) >= 3 else None
            if d is None:
                return self._json({"error": "not found"}, 404)
            if len(parts) == 4 and parts[3] == "loss":
                series = []
                try:
                    with open(os.path.join(d, "metrics.jsonl")) as f:
                        for line in f:
                            try:
                                rec = json.loads(line)
                            except ValueError:
                                continue
                            if "loss" in rec:
                                series.append({"step": rec.get("step"),
                                               "loss": rec["loss"],
                                               "sec_per_step": rec.get("sec_per_step")})
                except OSError:
                    pass
                return self._json(series)
            if len(parts) == 4 and parts[3] == "samples":
                sd = os.path.join(d, "samples")
                files = sorted(os.listdir(sd)) if os.path.isdir(sd) else []
                return self._json(files)
            if len(parts) == 5 and parts[3] == "samples" and "/" not in parts[4] and ".." not in parts[4]:
                return self._serve_file(os.path.join(d, "samples", parts[4]))
            if len(parts) == 4 and parts[3] == "files":
                # recursive artifact listing (reference ui api/files)
                out = []
                for base, _dirs, files in os.walk(d):
                    for fn in files:
                        p = os.path.join(base, fn)
                        out.append({"path": os.path.relpath(p, d),
                                    "size": os.path.getsize(p)})
                return self._json(sorted(out, key=lambda r: r["path"]))
            if len(parts) >= 5 and parts[3] == "files":
                from urllib.parse import unquote

                rel = unquote("/".join(parts[4:]))
                full = os.path.realpath(os.path.join(d, rel))
                if not full.startswith(os.path.realpath(d) + os.sep) or not os.path.isfile(full):
                    return self._json({"error": "not found"}, 404)
                return self._serve_file(full)
            if len(parts) == 4 and parts[3] == "zip":
                # reference ui api/zip: download the whole run directory
                import tempfile
                import zipfile

                with tempfile.TemporaryFile() as tmp:
                    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
                        for base, _dirs, files in os.walk(d):
                            for fn in files:
                                p = os.path.join(base, fn)
                                zf.write(p, os.path.relpath(p, d))
                    size = tmp.tell()
                    tmp.seek(0)
                    self.send_response(200)
                    self.send_header("Content-Type", "application/zip")
                    self.send_header("Content-Disposition",
                                     f'attachment; filename="{parts[2]}.zip"')
                    self.send_header("Content-Length", str(size))
                    self.end_headers()
                    while True:
                        chunk = tmp.read(1 << 20)
                        if not chunk:
                            break
                        self.wfile.write(chunk)
                    return None
            return self._json({"error": "not found"}, 404)
        if self.path.startswith("/api/datasets"):
            parts = [p for p in self.path.strip("/").split("/")[2:] if p]
            return self._datasets_get(parts)
        if self.path.startswith("/api/jobs/"):
            segs = self.path.split("?")[0].strip("/").split("/")
            job_id = segs[2] if len(segs) > 2 else ""
            if len(segs) == 4 and segs[3] == "log":
                # tail of the spawned run.py log (reference jobs/[jobId] page
                # streams the job console)
                rows = self._jobs(job_id)
                if not (isinstance(rows, list) and rows):
                    return self._json({"error": "not found"}, 404)
                from urllib.parse import parse_qs, urlparse

                q = parse_qs(urlparse(self.path).query)
                try:
                    n = max(1, min(int(q.get("n", ["200"])[0] or 200), 5000))
                except ValueError:
                    return self._json({"error": "bad n"}, 400)
                name = rows[0].get("name") or job_id
                # job names come from arbitrary config files via the AITK
                # contract, not only the sanitized /api/launch — apply the
                # same traversal guard as _run_dir
                if "/" in name or "\\" in name or ".." in name:
                    return self._json({"error": "bad job name"}, 400)
                # the worker writes under its constructor runs_root; the
                # Settings TRAINING_FOLDER may differ — check both
                roots = {self._runs_root(), self.server.runs_root}
                lines: list[str] = []
                for root in roots:
                    log_path = os.path.join(root, "_quick_ui", f"{name}.log")
                    if os.path.isfile(log_path):
                        with open(log_path, "rb") as f:
                            f.seek(0, os.SEEK_END)
                            f.seek(max(0, f.tell() - 256 * 1024))
                            lines = f.read().decode("utf-8", "replace").splitlines()[-n:]
                        break
                return self._json({"name": name, "lines": lines})
            rows = self._jobs(job_id)
            if isinstance(rows, list) and rows:
                return self._json(rows[0])
            return self._json({"error": "not found"}, 404)
        return self._json({"error": "unknown route"}, 404)

    def _csrf_ok(self) -> bool:
        """Reject cross-site POSTs even when no auth token is configured.

        A hostile webpage can fire a "simple" cross-origin POST at
        127.0.0.1 without a preflight; requiring ``application/json`` (which
        forces a CORS preflight we never approve) plus a local Origin, when
        the browser sends one, blocks that.
        """
        origin = self.headers.get("Origin")
        if origin:
            host = self.headers.get("Host", "")
            if origin not in (f"http://{host}", f"https://{host}"):
                return False
        # the three content types a cross-site "simple" POST can carry; any
        # other type forces a CORS preflight this server never approves
        ctype = self.headers.get("Content-Type", "").split(";")[0].strip()
        return ctype not in (
            "application/x-www-form-urlencoded", "multipart/form-data", "text/plain"
        )

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def _json_body(self):
        try:
            return json.loads(self._read_body() or b"{}")
        except ValueError:
            return None

    def do_POST(self):
        if not self._auth_ok():
            return self._json({"error": "unauthorized"}, 401)
        if not self._csrf_ok():
            return self._json({"error": "cross-origin request rejected"}, 403)
        ctype = self.headers.get("Content-Type", "").split(";")[0].strip()
        parts = self.path.strip("/").split("/")
        if self.path in ("/api/launch", "/api/jobs/queue"):
            if ctype != "application/json":
                return self._json({"error": "Content-Type must be application/json"}, 415)
            body_queue = False
            if self.path == "/api/launch":
                # the /new form can also enqueue via the body flag
                peek = self._json_body()
                if peek is not None:
                    self._peeked_body = peek
                    body_queue = bool(peek.get("queue"))
            return self._launch(queue=self.path.endswith("queue") or body_queue)
        if self.path == "/api/settings":
            if ctype != "application/json":
                return self._json({"error": "Content-Type must be application/json"}, 415)
            body = self._json_body()
            if not isinstance(body, dict):
                return self._json({"error": "bad json"}, 400)
            try:
                ensure_schema(self.server.db_path)
                with self._db() as conn:
                    for k, v in body.items():
                        conn.execute(
                            "INSERT INTO Settings (key, value) VALUES (?, ?) "
                            "ON CONFLICT(key) DO UPDATE SET value = excluded.value",
                            (str(k), str(v)))
                return self._json({"updated": len(body)})
            except sqlite3.Error as e:
                return self._json({"error": str(e)}, 500)
        if self.path == "/api/scripts":
            if ctype != "application/json":
                return self._json({"error": "Content-Type must be application/json"}, 415)
            return self._run_script(self._json_body())
        if len(parts) >= 3 and parts[:2] == ["api", "datasets"]:
            return self._datasets_post(parts[2:], ctype)
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
        if len(parts) == 4 and parts[:2] == ["api", "jobs"] and parts[3] == "requeue":
            # reference jobs page "restart": back to the queue; refused while
            # running (stop first — the worker owns running processes)
            try:
                with self._db() as conn:
                    n = conn.execute(
                        "UPDATE Job SET status = 'queued', stop = 0, step = 0, "
                        "save_now = 0, sample_now = 0, "
                        "queued_at = ?, pid = NULL WHERE id = ? AND status != 'running'",
                        (time.time(), parts[2]),
                    ).rowcount
                if not n:
                    return self._json(
                        {"error": "not found or still running (stop it first)"}, 409)
                return self._json({"requeued": n})
            except sqlite3.Error as e:
                return self._json({"error": str(e)}, 500)
        if len(parts) == 4 and parts[:2] == ["api", "jobs"] and parts[3] == "delete":
            try:
                with self._db() as conn:
                    n = conn.execute(
                        "DELETE FROM Job WHERE id = ? AND status != 'running'",
                        (parts[2],),
                    ).rowcount
                if not n:
                    return self._json(
                        {"error": "not found or still running (stop it first)"}, 409)
                return self._json({"deleted": n})
            except sqlite3.Error as e:
                return self._json({"error": str(e)}, 500)
        return self._json({"error": "unknown route"}, 404)

    # ---- ui_scripts runner (reference ui/src/app/api/scripts/route.ts) ----

    def _scripts_root(self) -> str:
        return getattr(self.server, "scripts_root", None) or os.path.join(
            os.getcwd(), "ui_scripts")

    def _run_script(self, body):
        """POST {name, args}: run ui_scripts/<name> buffered, no shell.

        Mirrors the reference route: flat-name allowlist regex, resolved path
        must stay under ui_scripts/, args as a positional list or an object
        that becomes --key value flags, last JSON stdout line parsed as the
        structured result, hard timeout."""
        import subprocess
        import sys

        if not isinstance(body, dict):
            return self._json({"error": "bad json"}, 400)
        name = str(body.get("name", "")).strip()
        if not _SCRIPT_NAME_RE.match(name):
            return self._json({"error": "invalid script name"}, 400)
        root = os.path.realpath(self._scripts_root())
        target = os.path.realpath(os.path.join(root, name))
        if not target.startswith(root + os.sep) or not os.path.isfile(target):
            return self._json({"error": "script not found"}, 404)
        raw = body.get("args")
        args: list[str] = []
        if isinstance(raw, list):
            for v in raw:
                if v is None:
                    continue
                if not isinstance(v, (str, int, float, bool)):
                    return self._json(
                        {"error": "args entries must be string|number|boolean"}, 400)
                args.append(str(v))
        elif isinstance(raw, dict):
            for k, v in raw.items():
                if not _SCRIPT_ARG_KEY_RE.match(str(k)):
                    return self._json({"error": f"invalid arg key: {k}"}, 400)
                if v is True:
                    args.append(f"--{k}")
                elif v is False or v is None:
                    continue
                elif isinstance(v, (str, int, float)):
                    args += [f"--{k}", str(v)]
                else:
                    return self._json(
                        {"error": f"args.{k} must be string|number|boolean"}, 400)
        elif raw is not None:
            return self._json({"error": "args must be an array or object"}, 400)
        timeout = float(os.environ.get("AIT_UI_SCRIPT_TIMEOUT", 1200))
        try:
            proc = subprocess.run(
                [sys.executable, "-u", target, *args],
                capture_output=True, text=True, timeout=timeout,
                cwd=os.getcwd(),
                env={**os.environ, "PYTHONUNBUFFERED": "1"},
            )
            timed_out = False
            code, out_s, err_s = proc.returncode, proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            timed_out = True
            code = None
            out_s = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err_s = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        result = None
        for line in reversed(out_s.strip().splitlines()):
            line = line.strip()
            if not line:
                continue
            if line.startswith(("{", "[")):
                try:
                    result = json.loads(line)
                except ValueError:
                    result = None
            break
        return self._json({
            "ok": code == 0, "exitCode": code, "stdout": out_s[-65536:],
            "stderr": err_s[-65536:], "result": result, "timedOut": timed_out,
        })

    # ---- datasets (reference ui/src/app/api/datasets + api/img routes) ----

    def _datasets_root(self) -> str:
        return self._settings().get("DATASETS_FOLDER") or getattr(
            self.server, "datasets_root", "datasets")

    def _dataset_dir(self, name: str, create: bool = False) -> str | None:
        if not name or "/" in name or ".." in name or name.startswith("."):
            return None
        d = os.path.join(self._datasets_root(), name)
        if create:
            os.makedirs(d, exist_ok=True)
        return d if os.path.isdir(d) else None

    @staticmethod
    def _safe_file(fn: str) -> bool:
        return bool(fn) and "/" not in fn and ".." not in fn and not fn.startswith(".")

    def _datasets_get(self, parts: list[str]):
        img_exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp", ".mp4", ".webm", ".mov")
        if not parts:
            root = self._datasets_root()
            out = []
            if os.path.isdir(root):
                for name in sorted(os.listdir(root)):
                    d = os.path.join(root, name)
                    if os.path.isdir(d):
                        n = sum(1 for f in os.listdir(d) if f.lower().endswith(img_exts))
                        out.append({"name": name, "num_images": n})
            return self._json(out)
        d = self._dataset_dir(parts[0])
        if d is None:
            return self._json({"error": "not found"}, 404)
        if len(parts) == 1:
            items = []
            for f in sorted(os.listdir(d)):
                if not f.lower().endswith(img_exts):
                    continue
                stem = os.path.splitext(f)[0]
                cap_path = os.path.join(d, stem + ".txt")
                cap = ""
                if os.path.isfile(cap_path):
                    with open(cap_path, encoding="utf-8", errors="replace") as fh:
                        cap = fh.read()
                items.append({"file": f, "caption": cap})
            return self._json(items)
        if len(parts) == 3 and parts[1] == "img" and self._safe_file(parts[2]):
            return self._serve_file(os.path.join(d, parts[2]))
        return self._json({"error": "not found"}, 404)

    def _datasets_post(self, parts: list[str], ctype: str):
        if len(parts) == 1:  # create dataset dir
            d = self._dataset_dir(parts[0], create=True)
            if d is None:
                return self._json({"error": "bad name"}, 400)
            return self._json({"created": parts[0]})
        d = self._dataset_dir(parts[0])
        if d is None:
            return self._json({"error": "not found"}, 404)
        if len(parts) == 3 and parts[1] == "img" and self._safe_file(parts[2]):
            # raw-body upload; form content types are rejected (CSRF: they're
            # the only types a cross-site page can send without a preflight)
            if ctype in ("application/x-www-form-urlencoded", "multipart/form-data",
                         "text/plain", ""):
                return self._json({"error": "raw image/video body required"}, 415)
            body = self._read_body()
            if not body:
                return self._json({"error": "empty body"}, 400)
            tmp = os.path.join(d, "." + parts[2] + ".tmp")
            with open(tmp, "wb") as f:
                f.write(body)
            os.replace(tmp, os.path.join(d, parts[2]))
            return self._json({"uploaded": parts[2], "bytes": len(body)})
        if len(parts) == 3 and parts[1] == "caption" and self._safe_file(parts[2]):
            body = self._json_body()
            if body is None or "caption" not in body:
                return self._json({"error": "json {caption} required"}, 400)
            stem = os.path.splitext(parts[2])[0]
            with open(os.path.join(d, stem + ".txt"), "w", encoding="utf-8") as f:
                f.write(str(body["caption"]))
            return self._json({"saved": stem + ".txt"})
        if len(parts) == 3 and parts[1] == "delete" and self._safe_file(parts[2]):
            removed = []
            stem = os.path.splitext(parts[2])[0]
            for f in (parts[2], stem + ".txt"):
                p = os.path.join(d, f)
                if os.path.isfile(p):
                    os.remove(p)
                    removed.append(f)
            return self._json({"deleted": removed})
        return self._json({"error": "unknown route"}, 404)


    def _launch(self, queue: bool = False):
        """Quick-launch: JSON body -> LoRA train config -> detached run.py,
        or (``queue=True``) a 'queued' Job row the worker starts when its
        device set frees up (reference ui/cron/actions/processQueue.ts).
        """
        req = getattr(self, "_peeked_body", None)
        self._peeked_body = None
        if req is None:
            req = self._json_body()
        if req is None:
            return self._json({"error": "bad json"}, 400)
        name = str(req.get("name", "quick_lora"))
        if not name.replace("-", "").replace("_", "").isalnum():
            return self._json({"error": "bad name"}, 400)
        folder = req.get("dataset_folder")
        if not folder and req.get("dataset"):
            # dataset by NAME from the managed datasets root (/api/datasets)
            folder = self._dataset_dir(str(req["dataset"]))
        if not folder or not os.path.isdir(folder):
            return self._json({"error": "dataset_folder missing"}, 400)
        root = self._runs_root()
        dataset = {"folder_path": folder, "caption_ext": "txt",
                   "resolution": req.get("resolution", [512, 768, 1024])}
        if req.get("num_frames"):
            dataset["num_frames"] = int(req["num_frames"])
            dataset["shrink_video_to_frames"] = True
        if req.get("do_audio"):
            dataset["do_audio"] = True
        net_type = str(req.get("network_type", "lora"))
        if net_type not in ("lora", "lokr", "loha", "dora", "full", "embedding"):
            return self._json({"error": f"unknown network type {net_type}"}, 400)
        embedding = None
        if net_type == "full":
            network: dict | None = {"type": "full"}
        elif net_type == "embedding":
            # textual inversion rides the top-level `embedding` section, not
            # `network` — a network {type: embedding} would silently fall
            # through to a plain LoRA build
            network = None
            embedding = {"trigger": req.get("trigger_word") or "sks_concept",
                         "vectors": int(req.get("rank", 4))}
        else:
            network = {"type": net_type, "linear": int(req.get("rank", 16)),
                       "linear_alpha": int(req.get("rank", 16))}
            if req.get("conv_rank"):
                network["conv"] = int(req["conv_rank"])
                network["conv_alpha"] = int(req["conv_rank"])
        cfg = {
            "job": "extension",
            "config": {"name": name, "process": [{
                "type": "sd_trainer",
                "training_folder": root,
                "trigger_word": req.get("trigger_word") or None,
                **({"network": network} if network is not None else {}),
                **({"embedding": embedding} if embedding is not None else {}),
                "save": {"save_every": int(req.get("save_every", 250))},
                "datasets": [dataset],
                "train": {"batch_size": int(req.get("batch_size", 1)),
                          "steps": int(req.get("steps", 2000)),
                          "noise_scheduler": req.get("noise_scheduler", "flowmatch"),
                          "timestep_type": req.get("timestep_type", "flux_shift"),
                          "optimizer": req.get("optimizer", "adamw8bit"),
                          "lr": float(req.get("lr", 1e-4)),
                          "dtype": req.get("dtype", "bf16"),
                          "ema_config": {"use_ema": True, "ema_decay": 0.99}},
                "model": {"name_or_path": req.get("name_or_path", ""),
                          "arch": req.get("arch", "flux"),
                          "quantize": bool(req.get("quantize", True)),
                          "qtype": req.get("qtype", "qfloat8"),
                          "model_kwargs": req.get("model_kwargs", {})},
                "sample": {"sample_every": int(req.get("sample_every", 0)),
                           "prompts": req.get("prompts", [])},
                "mesh": {"axes": req.get("mesh", {"dp": 1, "fsdp": -1, "tp": 1})},
            }]},
        }
        overrides = req.get("overrides")
        if not overrides and req.get("overrides_yaml"):
            import yaml as _yaml

            try:
                overrides = _yaml.safe_load(str(req["overrides_yaml"])) or {}
            except Exception as e:  # noqa: BLE001
                return self._json({"error": f"bad overrides yaml: {e}"}, 400)
        if overrides:
            # free-form deep-merge: the builder's Advanced panel covers every
            # config knob without a bespoke form field per knob (reference
            # options.tsx exposes the whole surface)
            if not isinstance(overrides, dict):
                return self._json({"error": "overrides must be an object"}, 400)
            _deep_merge(cfg["config"]["process"][0], overrides)
        import yaml

        cfg_dir = os.path.join(root, "_quick_ui")
        os.makedirs(cfg_dir, exist_ok=True)
        cfg_path = os.path.join(cfg_dir, f"{name}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        if queue:
            job_id = str(uuid.uuid4())
            import time as _time

            try:
                ensure_schema(self.server.db_path)
                with self._db() as conn:
                    conn.execute(
                        "INSERT INTO Job (id, name, status, config_path, device, "
                        "queued_at, total_steps) VALUES (?, ?, 'queued', ?, ?, ?, ?)",
                        (job_id, name, cfg_path, str(req.get("device", "all")),
                         _time.time(), int(req.get("steps", 2000))),
                    )
            except sqlite3.Error as e:
                return self._json({"error": str(e)}, 500)
            return self._json({"queued": name, "id": job_id, "config": cfg_path})
        proc, log_path = _spawn_job(cfg_path, cfg_dir, name)
        return self._json({"launched": name, "pid": proc.pid,
                           "config": cfg_path, "log": log_path})


def _deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def _spawn_job(cfg_path: str, log_dir: str, name: str,
               job_id: str | None = None, db_path: str | None = None):
    """Detached run.py subprocess; AITK_JOB_ID/AITK_DB_PATH wire the spawned
    trainer to its Job row (the reference startJob.ts contract)."""
    import subprocess
    import sys

    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(log_dir, f"{name}.log")
    run_py = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "run.py",
    )
    env = dict(os.environ)
    if job_id:
        env["AITK_JOB_ID"] = job_id
        env["AITK_DB_PATH"] = os.path.abspath(db_path or "aitk_db.db")
    with open(log_path, "ab") as logf:
        proc = subprocess.Popen(
            [sys.executable, run_py, cfg_path],
            stdout=logf, stderr=subprocess.STDOUT, env=env,
            start_new_session=True,  # detached: survives the server
        )
    return proc, log_path


class QueueWorker:
    """queued -> running scheduler: one job per device set at a time
    (reference ui/cron/actions/processQueue.ts:6-60 + worker.ts:41-80)."""

    def __init__(self, db_path: str, runs_root: str, poll_s: float = 1.0):
        self.db_path = db_path
        self.runs_root = runs_root
        self.poll_s = poll_s
        self._procs: dict[str, object] = {}  # job_id -> Popen
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self):
        ensure_schema(self.db_path)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def _conn(self):
        conn = sqlite3.connect(self.db_path, timeout=5.0)
        conn.row_factory = sqlite3.Row
        return conn

    def _loop(self):
        while not self._stop.wait(self.poll_s):
            try:
                self.tick()
            except sqlite3.Error:
                pass

    def tick(self):
        # 1) reap finished processes we spawned
        for job_id, proc in list(self._procs.items()):
            rc = proc.poll()
            if rc is None:
                continue
            del self._procs[job_id]
            with self._conn() as conn:
                row = conn.execute(
                    "SELECT status FROM Job WHERE id = ?", (job_id,)
                ).fetchone()
                if row and row["status"] in ("running", "queued"):
                    conn.execute(
                        "UPDATE Job SET status = ? WHERE id = ?",
                        ("completed" if rc == 0 else "failed", job_id),
                    )
        # 2) per device set: start the oldest queued job if nothing runs there
        with self._conn() as conn:
            running = {
                r["device"]
                for r in conn.execute("SELECT device FROM Job WHERE status = 'running'")
            }
            queued = conn.execute(
                "SELECT id, name, config_path, device FROM Job "
                "WHERE status = 'queued' ORDER BY queued_at"
            ).fetchall()
        started_devices = set()
        for row in queued:
            dev = row["device"] or "all"
            if dev in running or dev in started_devices:
                continue
            proc, _ = _spawn_job(
                row["config_path"], os.path.join(self.runs_root, "_quick_ui"),
                row["name"], job_id=row["id"], db_path=self.db_path,
            )
            self._procs[row["id"]] = proc
            with self._conn() as conn:
                conn.execute(
                    "UPDATE Job SET status = 'running', pid = ? WHERE id = ?",
                    (proc.pid, row["id"]),
                )
            started_devices.add(dev)


class UIServer:
    """Threaded REST server; start()/stop() for embedding in run.py or tests."""

    def __init__(self, db_path: str = "aitk_db.db", host: str = "127.0.0.1", port: int = 8676,
                 runs_root: str = "output", datasets_root: str = "datasets",
                 queue_worker: bool = False, poll_s: float = 1.0,
                 scripts_root: str | None = None):
        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.httpd.db_path = db_path
        self.httpd.runs_root = runs_root
        self.httpd.datasets_root = datasets_root
        self.httpd.scripts_root = scripts_root
        self._thread: threading.Thread | None = None
        self.worker = (
            QueueWorker(db_path, runs_root, poll_s=poll_s) if queue_worker else None
        )

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        if self.worker is not None:
            self.worker.start()
        return self

    def stop(self):
        if self.worker is not None:
            self.worker.stop()
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)


_DASHBOARD_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>ai_toolkit_tpu</title>
<style>
body{font:14px system-ui;margin:24px;background:#0f1115;color:#d7dae0}
h1{font-size:18px} table{border-collapse:collapse;margin:12px 0}
td,th{padding:4px 12px;border-bottom:1px solid #2a2e38;text-align:left}
canvas{background:#161a22;border:1px solid #2a2e38;border-radius:6px}
select{background:#161a22;color:#d7dae0;border:1px solid #2a2e38;padding:4px}
.small{color:#8a90a0;font-size:12px}
</style></head><body>
<h1>ai_toolkit_tpu monitor</h1>
<div id="gpu" class="small"></div>
<table id="runs"><tr><th>run</th><th>last loss</th><th>steps</th><th>s/step</th></tr></table>
<select id="pick"></select>
<canvas id="chart" width="860" height="280"></canvas>
<script>
async function j(u){const r=await fetch(u);return r.json()}
function draw(series){
 const c=document.getElementById('chart'),x=c.getContext('2d');
 x.clearRect(0,0,c.width,c.height);
 if(!series.length)return;
 const xs=series.map(p=>p.step),ys=series.map(p=>p.loss);
 const x0=Math.min(...xs),x1=Math.max(...xs),y0=Math.min(...ys),y1=Math.max(...ys);
 const px=s=>30+(c.width-40)*(s-x0)/Math.max(1,x1-x0);
 const py=v=>c.height-20-(c.height-40)*(v-y0)/Math.max(1e-9,y1-y0);
 x.strokeStyle='#5b8cff';x.lineWidth=1.5;x.beginPath();
 series.forEach((p,i)=>{i?x.lineTo(px(p.step),py(p.loss)):x.moveTo(px(p.step),py(p.loss))});
 x.stroke();
 x.fillStyle='#8a90a0';x.font='11px system-ui';
 x.fillText(y1.toFixed(3),4,14);x.fillText(y0.toFixed(3),4,c.height-8);
 x.fillText(String(x1),c.width-40,c.height-6);
}
async function refresh(){
 try{const g=await j('/api/gpu');
  document.getElementById('gpu').textContent='backend: '+g.backend+' — '+
   g.devices.map(d=>d.kind+(d.bytes_limit?' '+(d.bytes_in_use/1e9).toFixed(1)+'/'+(d.bytes_limit/1e9).toFixed(0)+'GB':'' )).join(', ');
 }catch(e){}
 const runs=await j('/api/runs');
 const pick=document.getElementById('pick');
 const cur=pick.value;
 pick.innerHTML='';
 for(const r of runs){const o=document.createElement('option');
  o.textContent=r.name;pick.appendChild(o)}
 if(cur&&runs.some(r=>r.name===cur))pick.value=cur;
 const tbl=document.getElementById('runs');
 tbl.innerHTML='<tr><th>run</th><th>last loss</th><th>steps</th><th>s/step</th></tr>';
 for(const r of runs){
  const s=await j('/api/runs/'+encodeURIComponent(r.name)+'/loss');
  const last=s[s.length-1]||{};
  const tr=document.createElement('tr');
  for(const v of [r.name,last.loss!==undefined?last.loss.toFixed(4):'—',
                  last.step??'—',last.sec_per_step?last.sec_per_step.toFixed(2):'—']){
   const td=document.createElement('td');td.textContent=String(v);tr.appendChild(td)}
  tbl.appendChild(tr);
  if(r.name===pick.value)draw(s);
 }
}
document.getElementById('pick').onchange=refresh;
refresh();setInterval(refresh,5000);
</script></body></html>"""


_JOBS_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>jobs</title>
<style>
body{font:14px system-ui;margin:24px;background:#0f1115;color:#d7dae0}
h1{font-size:18px} table{border-collapse:collapse;margin:12px 0;width:100%}
td,th{padding:4px 10px;border-bottom:1px solid #2a2e38;text-align:left}
button{background:#161a22;color:#d7dae0;border:1px solid #2a2e38;border-radius:4px;
padding:2px 8px;margin-right:4px;cursor:pointer}
button:hover{border-color:#5b8cff}
pre{background:#161a22;border:1px solid #2a2e38;border-radius:6px;padding:10px;
max-height:420px;overflow:auto;font:12px ui-monospace,monospace;white-space:pre-wrap}
.small{color:#8a90a0;font-size:12px} a{color:#5b8cff}
</style></head><body>
<h1>jobs <span class="small"><a href="/">monitor</a> · <a href="/new">new</a></span></h1>
<table id="tbl"><tr><th>name</th><th>status</th><th>step</th><th>speed</th><th>actions</th></tr></table>
<h1 id="logname" class="small"></h1>
<pre id="log"></pre>
<script>
async function j(u,opt){const r=await fetch(u,opt);return r.json()}
async function act(id,a){
 const r=await j('/api/jobs/'+id+'/'+a,{method:'POST',
  headers:{'Content-Type':'application/json'},body:'{}'});
 if(r.error)alert(r.error);refresh();
}
let logId=null;
async function showLog(id){logId=id;pollLog()}
async function pollLog(){
 if(!logId)return;
 const r=await j('/api/jobs/'+logId+'/log?n=300');
 if(!r.error){document.getElementById('logname').textContent='log: '+r.name;
  const p=document.getElementById('log');p.textContent=r.lines.join('\\n');
  p.scrollTop=p.scrollHeight}
}
function btn(label,fn){const b=document.createElement('button');
 b.textContent=label;b.onclick=fn;return b}
async function refresh(){
 // rows built via textContent/closures: job names and ids come from
 // arbitrary config files, never trust them as HTML or inline JS
 const jobs=await j('/api/jobs');
 const tbl=document.getElementById('tbl');
 tbl.innerHTML='<tr><th>name</th><th>status</th><th>step</th><th>speed</th><th>actions</th></tr>';
 for(const r of jobs){
  const tr=document.createElement('tr');
  for(const v of [r.name,r.status,r.step+'/'+r.total_steps,r.speed_string||'']){
   const td=document.createElement('td');td.textContent=String(v);tr.appendChild(td)}
  const td=document.createElement('td');
  td.appendChild(btn('log',()=>showLog(r.id)));
  if(r.status==='running'){
   td.appendChild(btn('stop',()=>act(r.id,'stop')));
   td.appendChild(btn('save',()=>act(r.id,'save')));
   td.appendChild(btn('sample',()=>act(r.id,'sample')));
  }else{
   td.appendChild(btn('requeue',()=>act(r.id,'requeue')));
   td.appendChild(btn('delete',()=>act(r.id,'delete')));
  }
  tr.appendChild(td);tbl.appendChild(tr);
 }
}
refresh();setInterval(refresh,4000);setInterval(pollLog,4000);
</script></body></html>"""


_LAUNCH_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>quick launch</title>
<style>body{font:14px system-ui;margin:24px;background:#0f1115;color:#d7dae0}
label{display:block;margin:8px 0 2px}input,select{width:320px;padding:4px;
background:#161a22;color:#d7dae0;border:1px solid #2a2e38}
button{margin-top:12px;padding:6px 18px;background:#5b8cff;border:0;color:#fff;
border-radius:4px}</style></head><body>
<h1>New training job</h1>
<label>name</label><input id="name" value="my_lora">
<label>arch</label><select id="arch"></select>
<div id="archnote" style="color:#c99;font-size:12px"></div>
<label>checkpoint path</label><input id="ckpt" value="">
<label>dataset (managed)</label><select id="dssel"><option value=""></option></select>
<label>…or dataset folder path</label><input id="ds" value="">
<label>steps</label><input id="steps" value="2000">
<label>batch size</label><input id="bs" value="1">
<label>learning rate</label><input id="lr" value="1e-4">
<label>resolution</label><input id="res" value="1024">
<label>trigger word</label><input id="trig" value="">
<label>network type</label><select id="nettype">
<option>lora</option><option>lokr</option><option>loha</option>
<option>dora</option><option value="full">full fine-tune</option>
<option value="embedding">textual inversion</option></select>
<label id="rankrow">rank</label><input id="rank" value="16">
<label id="convrow">conv rank (0 = linear only)</label><input id="convrank" value="0">
<label>optimizer</label><select id="opt">
<option>adamw8bit</option><option>adamw</option><option>adafactor</option>
<option>prodigy</option><option>automagic</option></select>
<label>noise scheduler</label><select id="sched">
<option>flowmatch</option><option>ddpm</option></select>
<label>timestep type</label><select id="tstype">
<option>flux_shift</option><option>sigmoid</option><option>linear</option>
<option>shift</option><option>lognorm_blend</option><option>weighted</option></select>
<label>quantize base</label><select id="quant">
<option value="">off</option><option value="qfloat8">qfloat8</option>
<option value="qint8">qint8</option><option value="uint4">uint4</option></select>
<label>save every N steps</label><input id="saveevery" value="250">
<label id="framesrow" style="display:none">video frames</label>
<input id="frames" value="33" style="display:none">
<label id="audiorow" style="display:none"><input type="checkbox" id="audio"
 style="width:auto"> train joint audio (AV sidecar wavs)</label>
<label>sample prompts (one per line)</label>
<textarea id="prompts" rows="3" style="width:320px;background:#161a22;
color:#d7dae0;border:1px solid #2a2e38"></textarea>
<label>sample every N steps (0 = off)</label><input id="sampleevery" value="0">
<label>advanced overrides (YAML, deep-merged onto the process config)</label>
<textarea id="adv" rows="5" style="width:320px;background:#161a22;
color:#d7dae0;border:1px solid #2a2e38"
placeholder="train:\n  gradient_accumulation_steps: 2\nmodel:\n  low_vram: true"></textarea>
<label><input type="checkbox" id="queue" style="width:auto"> queue (run when a slot frees)</label>
<button onclick="go()">Launch</button><pre id="out"></pre>
<script>
let archinfo={};
fetch('/api/archs').then(r=>r.json()).then(list=>{
 const sel=document.getElementById('arch');
 for(const a of list){archinfo[a.arch]=a;const o=document.createElement('option');
  o.value=a.arch;o.textContent=a.arch+(a.is_video?' (video)':a.is_audio?' (audio)':'');
  if(a.arch==='flux')o.selected=true;sel.appendChild(o);}
 sel.onchange=()=>{const a=archinfo[sel.value]||{};
  for(const id of ['framesrow','frames'])
   document.getElementById(id).style.display=a.is_video?'':'none';
  document.getElementById('audiorow').style.display=
   (a.is_video||a.is_audio)?'':'none';
  document.getElementById('sched').value=
   a.noise_scheduler||(a.is_flow_matching===false?'ddpm':'flowmatch');
  document.getElementById('tstype').value=
   a.is_flow_matching===false?'sigmoid':'flux_shift';
  document.getElementById('archnote').textContent=
   a.checkpoint_importable===false?
   'structural-only arch: real checkpoint paths are refused':'';};
 sel.onchange();
});
fetch('/api/datasets').then(r=>r.json()).then(list=>{
 const sel=document.getElementById('dssel');
 for(const d of (list.datasets||list||[])){const o=document.createElement('option');
  const n=d.name||d;o.value=n;o.textContent=n;sel.appendChild(o);}
});
document.getElementById('nettype').onchange=()=>{
 const t=document.getElementById('nettype').value;
 const show=!(t==='full'||t==='embedding');
 for(const id of ['rankrow','rank','convrow','convrank'])
  document.getElementById(id).style.display=show?'':'none';};
async function go(){
 const body={name:name.value,arch:arch.value,name_or_path:ckpt.value,
  dataset_folder:ds.value,dataset:document.getElementById('dssel').value,
  steps:+steps.value,rank:+rank.value,batch_size:+document.getElementById('bs').value,
  lr:lr.value,resolution:+res.value,trigger_word:trig.value,
  network_type:document.getElementById('nettype').value,
  conv_rank:+document.getElementById('convrank').value||0,
  optimizer:document.getElementById('opt').value,
  noise_scheduler:document.getElementById('sched').value,
  timestep_type:document.getElementById('tstype').value,
  save_every:+document.getElementById('saveevery').value,
  sample_every:+document.getElementById('sampleevery').value,
  prompts:document.getElementById('prompts').value.split('\\n').filter(x=>x),
  queue:document.getElementById('queue').checked};
 const adv=document.getElementById('adv').value.trim();
 if(adv){body.overrides_yaml=adv;}
 const a=archinfo[arch.value]||{};
 if(a.is_video){body.num_frames=+document.getElementById('frames').value;}
 if(document.getElementById('audio').checked){body.do_audio=true;}
 const q=document.getElementById('quant').value;
 if(q){body.quantize=true;body.qtype=q;}else{body.quantize=false;}
 const r=await fetch('/api/launch',{method:'POST',
  headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
 document.getElementById('out').textContent=JSON.stringify(await r.json(),null,2);
}
</script></body></html>"""


_GRID_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>sample grid</title>
<style>body{font:14px system-ui;margin:24px;background:#0f1115;color:#d7dae0}
select{padding:4px;background:#161a22;color:#d7dae0;border:1px solid #2a2e38}
#grid{display:grid;grid-template-columns:repeat(auto-fill,minmax(180px,1fr));
gap:8px;margin-top:16px}#grid figure{margin:0}#grid img,#grid video{width:100%;
border:1px solid #2a2e38;border-radius:4px}
figcaption{font-size:11px;color:#8a8f9c;overflow:hidden;white-space:nowrap}
</style></head><body>
<h1>Sample grid</h1>
<select id="run"></select>
<div id="grid"></div>
<script>
const sel=document.getElementById('run');
const want=new URLSearchParams(location.search).get('run');
fetch('/api/runs').then(r=>r.json()).then(runs=>{
 for(const r of runs){const o=document.createElement('option');
  o.value=r.name;o.textContent=r.name;if(r.name===want)o.selected=true;
  sel.appendChild(o);}
 if(runs.length)load();
});
sel.onchange=load;
async function load(){
 const run=sel.value;
 const files=await (await fetch('/api/runs/'+run+'/samples')).json();
 const g=document.getElementById('grid');g.innerHTML='';
 for(const f of files){
  const fig=document.createElement('figure');
  const url='/api/runs/'+run+'/samples/'+encodeURIComponent(f);
  if(f.endsWith('.webp')&&false){}
  const el=f.endsWith('.wav')?document.createElement('audio')
          :document.createElement('img');
  el.src=url;if(f.endsWith('.wav'))el.controls=true;
  const cap=document.createElement('figcaption');cap.textContent=f;
  fig.appendChild(el);fig.appendChild(cap);g.appendChild(fig);}
}
</script></body></html>"""
