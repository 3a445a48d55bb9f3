import sqlite3

from ai_toolkit_tpu.jobs.ui_bridge import UIJobBridge


def make_db(path):
    conn = sqlite3.connect(path)
    conn.execute(
        """CREATE TABLE Job (id TEXT PRIMARY KEY, name TEXT, status TEXT DEFAULT 'stopped',
        stop INTEGER DEFAULT 0, step INTEGER DEFAULT 0, total_steps INTEGER,
        info TEXT DEFAULT '', speed_string TEXT DEFAULT '', pid INTEGER,
        save_now INTEGER DEFAULT 0, sample_now INTEGER DEFAULT 0)"""
    )
    conn.execute("INSERT INTO Job (id, name) VALUES ('j1', 'test')")
    conn.commit()
    conn.close()


def test_ui_bridge_contract(tmp_path):
    db = str(tmp_path / "aitk_db.db")
    make_db(db)
    bridge = UIJobBridge(job_id="j1", db_path=db)
    assert bridge.enabled
    bridge.start(100)
    bridge.on_step(5, 0.1234, 1.5)
    conn = sqlite3.connect(db)
    row = conn.execute("SELECT status, step, total_steps, speed_string FROM Job").fetchone()
    assert row[0] == "running" and row[1] == 5 and row[2] == 100
    assert "s/step" in row[3]

    # UI sets flags; trainer consumes and clears them
    conn.execute("UPDATE Job SET save_now = 1, sample_now = 1, stop = 1")
    conn.commit()
    assert bridge.should_save_now()
    assert not bridge.should_save_now()  # cleared
    assert bridge.should_sample_now()
    assert bridge.should_stop()
    bridge.finish("stopped")
    assert conn.execute("SELECT status FROM Job").fetchone()[0] == "stopped"


def test_ui_bridge_disabled_without_db(tmp_path):
    bridge = UIJobBridge(job_id="j1", db_path=str(tmp_path / "missing.db"))
    assert not bridge.enabled
    bridge.start(10)  # all no-ops
    assert bridge.should_stop() is False
