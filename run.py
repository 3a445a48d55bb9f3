#!/usr/bin/env python
"""CLI entry: ``python run.py config/my_job.yaml [more_configs...]``.

Mirrors the reference CLI surface (``/root/reference/run.py:70-147``):
multiple configs run sequentially, ``-r/--recover`` continues past failures,
``-n/--name`` overrides the job name, ``-l/--log`` tees output to a file,
``SEED`` env seeds RNG.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Platform override for CI / virtual-mesh runs. Plain env vars are too late on
# images whose sitecustomize pre-registers an accelerator backend, so run.py
# applies them in-process before the first backend touch:
#   AIT_PLATFORM=cpu AIT_HOST_DEVICES=8 python run.py job.yaml
# gives an 8-virtual-device CPU mesh (sharding validation without chips).
if os.environ.get("AIT_PLATFORM"):
    if os.environ.get("AIT_HOST_DEVICES"):
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={os.environ['AIT_HOST_DEVICES']}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", os.environ["AIT_PLATFORM"])

# Persistent XLA compile cache: conv-heavy backwards (SDXL UNet) can take
# >10 min to compile on a shared remote-compile queue; pay that once per
# machine. Opt out with AIT_NO_COMPILE_CACHE=1.
from ai_toolkit_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main() -> int:
    parser = argparse.ArgumentParser(description="ai_toolkit_tpu job runner")
    parser.add_argument("config_files", nargs="+", help="config name(s) or path(s)")
    parser.add_argument("-r", "--recover", action="store_true",
                        help="continue running remaining jobs on failure")
    parser.add_argument("-n", "--name", type=str, default=None, help="job name override")
    parser.add_argument("-l", "--log", type=str, default=None, help="tee output to log file")
    parser.add_argument("--ui_port", type=int, default=0,
                        help="serve the REST monitor + dashboard on this port")
    parser.add_argument("--runs_root", type=str, default="output",
                        help="training_folder root the dashboard lists runs from")
    args = parser.parse_args()

    if args.log:
        class _Tee:
            def __init__(self, stream, path):
                self.stream = stream
                self.f = open(path, "a")

            def write(self, s):
                self.stream.write(s)
                self.f.write(s)
                self.f.flush()

            def flush(self):
                self.stream.flush()
                self.f.flush()

        sys.stdout = _Tee(sys.stdout, args.log)
        sys.stderr = _Tee(sys.stderr, args.log)

    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import run_job
    from ai_toolkit_tpu.parallel.mesh import init_distributed

    init_distributed()

    ui_server = None
    if args.ui_port:
        from ai_toolkit_tpu.ui import UIServer

        ui_server = UIServer(
            db_path=os.environ.get("AITK_DB_PATH", "aitk_db.db"), port=args.ui_port,
            runs_root=args.runs_root,
        ).start()
        print(f"UI monitor on :{ui_server.port}")

    failures = 0
    for config_file in args.config_files:
        try:
            raw = get_config(config_file, name_override=args.name)
            print(f"Running job: {raw['config']['name']}")
            run_job(raw)
        except KeyboardInterrupt:
            print("interrupted")
            return 130
        except Exception:
            traceback.print_exc()
            failures += 1
            if not args.recover:
                return 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
