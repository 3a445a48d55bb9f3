"""UI bridge: honor the reference web UI's SQLite job contract.

The reference Next.js UI (``/root/reference/ui/``) spawns the trainer with
``AITK_JOB_ID`` set and communicates through the ``Job`` table of
``aitk_db.db`` (schema ``ui/prisma/schema.prisma:24-50``): the trainer writes
status/step/total_steps/speed_string/info and polls stop/save_now/sample_now.
Implementing this contract means the reference UI works against this trainer
unchanged (SURVEY §7.1).
"""

from __future__ import annotations

import os
import sqlite3
import time


class UIJobBridge:
    def __init__(self, job_id: str | None = None, db_path: str | None = None):
        self.job_id = job_id or os.environ.get("AITK_JOB_ID")
        self.db_path = db_path or os.environ.get("AITK_DB_PATH", "aitk_db.db")
        self.enabled = bool(self.job_id) and os.path.isfile(self.db_path)
        self._last_write = 0.0

    def _conn(self):
        conn = sqlite3.connect(self.db_path, timeout=5.0)
        conn.execute("PRAGMA journal_mode=WAL")
        return conn

    def _update(self, **fields):
        if not self.enabled:
            return
        try:
            with self._conn() as conn:
                sets = ", ".join(f"{k} = ?" for k in fields)
                conn.execute(
                    f"UPDATE Job SET {sets} WHERE id = ?",
                    (*fields.values(), self.job_id),
                )
        except sqlite3.Error:
            pass  # UI availability must never kill training

    def _read(self, key: str):
        if not self.enabled:
            return None
        try:
            with self._conn() as conn:
                row = conn.execute(
                    f"SELECT {key} FROM Job WHERE id = ?", (self.job_id,)
                ).fetchone()
            return None if row is None else row[0]
        except sqlite3.Error:
            return None

    # ---- trainer-side API ----

    def start(self, total_steps: int):
        self._update(status="running", total_steps=total_steps, info="", pid=os.getpid())

    def on_step(self, step: int, loss: float, sec_per_step: float | None = None):
        now = time.time()
        if now - self._last_write < 1.0:  # throttle DB writes to 1 Hz
            return
        self._last_write = now
        speed = f"{sec_per_step:.2f} s/step" if sec_per_step else ""
        self._update(step=step, speed_string=speed, info=f"loss: {loss:.4f}")

    def should_stop(self) -> bool:
        return self._read("stop") == 1

    def should_save_now(self) -> bool:
        if self._read("save_now") == 1:
            self._update(save_now=0)
            return True
        return False

    def should_sample_now(self) -> bool:
        if self._read("sample_now") == 1:
            self._update(sample_now=0)
            return True
        return False

    def finish(self, status: str = "completed", info: str = ""):
        self._update(status=status, info=info)

    def on_error(self, message: str):
        self._update(status="error", info=message[:500])
