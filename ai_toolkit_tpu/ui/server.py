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

    def _runs_root(self) -> str:
        return getattr(self.server, "runs_root", "output")

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
        if self.path == "/new":
            body = _LAUNCH_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            return self.wfile.write(body)
        if self.path == "/api/health":
            return self._json({"ok": True})
        if self.path == "/api/gpu":
            return self._json(accelerator_stats())
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
            return self._json({"error": "not found"}, 404)
        if self.path.startswith("/api/jobs/"):
            job_id = self.path.split("/")[3]
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
        ctype = self.headers.get("Content-Type", "").split(";")[0].strip()
        return ctype in ("application/json", "")

    def do_POST(self):
        if not self._auth_ok():
            return self._json({"error": "unauthorized"}, 401)
        if not self._csrf_ok():
            return self._json({"error": "cross-origin request rejected"}, 403)
        if self.path == "/api/launch":
            if self.headers.get("Content-Type", "").split(";")[0].strip() != "application/json":
                return self._json({"error": "Content-Type must be application/json"}, 415)
            return self._launch()
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


    def _launch(self):
        """Quick-launch: JSON body -> LoRA train config -> detached run.py.

        The TPU analog of the reference gradio quick-UI (flux_train_ui.py)
        and the cron worker's startJob spawn (ui/cron/actions/startJob.ts):
        one POST composes a standard sd_trainer config and runs it.
        """
        import subprocess
        import sys

        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
        except ValueError:
            return self._json({"error": "bad json"}, 400)
        name = str(req.get("name", "quick_lora"))
        if not name.replace("-", "").replace("_", "").isalnum():
            return self._json({"error": "bad name"}, 400)
        folder = req.get("dataset_folder")
        if not folder or not os.path.isdir(folder):
            return self._json({"error": "dataset_folder missing"}, 400)
        root = self._runs_root()
        cfg = {
            "job": "extension",
            "config": {"name": name, "process": [{
                "type": "sd_trainer",
                "training_folder": root,
                "trigger_word": req.get("trigger_word") or None,
                "network": {"type": "lora", "linear": int(req.get("rank", 16)),
                            "linear_alpha": int(req.get("rank", 16))},
                "save": {"save_every": int(req.get("save_every", 250))},
                "datasets": [{"folder_path": folder, "caption_ext": "txt",
                              "resolution": req.get("resolution", [512, 768, 1024])}],
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
                          "model_kwargs": req.get("model_kwargs", {})},
                "sample": {"sample_every": int(req.get("sample_every", 0)),
                           "prompts": req.get("prompts", [])},
                "mesh": {"axes": req.get("mesh", {"dp": 1, "fsdp": -1, "tp": 1})},
            }]},
        }
        import yaml

        cfg_dir = os.path.join(root, "_quick_ui")
        os.makedirs(cfg_dir, exist_ok=True)
        cfg_path = os.path.join(cfg_dir, f"{name}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        log_path = os.path.join(cfg_dir, f"{name}.log")
        run_py = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "run.py",
        )
        with open(log_path, "ab") as logf:
            proc = subprocess.Popen(
                [sys.executable, run_py, cfg_path],
                stdout=logf, stderr=subprocess.STDOUT,
                start_new_session=True,  # detached: survives the server
            )
        return self._json({"launched": name, "pid": proc.pid,
                           "config": cfg_path, "log": log_path})


class UIServer:
    """Threaded REST server; start()/stop() for embedding in run.py or tests."""

    def __init__(self, db_path: str = "aitk_db.db", host: str = "127.0.0.1", port: int = 8676,
                 runs_root: str = "output"):
        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.httpd.db_path = db_path
        self.httpd.runs_root = runs_root
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
 pick.innerHTML=runs.map(r=>'<option>'+r.name+'</option>').join('');
 if(cur&&runs.some(r=>r.name===cur))pick.value=cur;
 const tbl=document.getElementById('runs');
 tbl.innerHTML='<tr><th>run</th><th>last loss</th><th>steps</th><th>s/step</th></tr>';
 for(const r of runs){
  const s=await j('/api/runs/'+r.name+'/loss');
  const last=s[s.length-1]||{};
  tbl.innerHTML+='<tr><td>'+r.name+'</td><td>'+(last.loss!==undefined?last.loss.toFixed(4):'—')+
   '</td><td>'+(last.step??'—')+'</td><td>'+(last.sec_per_step?last.sec_per_step.toFixed(2):'—')+'</td></tr>';
  if(r.name===pick.value)draw(s);
 }
}
document.getElementById('pick').onchange=refresh;
refresh();setInterval(refresh,5000);
</script></body></html>"""


_LAUNCH_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>quick launch</title>
<style>body{font:14px system-ui;margin:24px;background:#0f1115;color:#d7dae0}
label{display:block;margin:8px 0 2px}input,select{width:320px;padding:4px;
background:#161a22;color:#d7dae0;border:1px solid #2a2e38}
button{margin-top:12px;padding:6px 18px;background:#5b8cff;border:0;color:#fff;
border-radius:4px}</style></head><body>
<h1>Quick LoRA launch</h1>
<label>name</label><input id="name" value="my_lora">
<label>arch</label><input id="arch" value="flux">
<label>checkpoint path</label><input id="ckpt" value="">
<label>dataset folder</label><input id="ds" value="">
<label>steps</label><input id="steps" value="2000">
<label>rank</label><input id="rank" value="16">
<label>trigger word</label><input id="trig" value="">
<button onclick="go()">Launch</button><pre id="out"></pre>
<script>
async function go(){
 const body={name:name.value,arch:arch.value,name_or_path:ckpt.value,
  dataset_folder:ds.value,steps:+steps.value,rank:+rank.value,
  trigger_word:trig.value};
 const r=await fetch('/api/launch',{method:'POST',
  headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
 document.getElementById('out').textContent=JSON.stringify(await r.json(),null,2);
}
</script></body></html>"""
