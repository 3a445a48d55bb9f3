"""TPU-toolkit manager CLI (reference parity: ``manager/__main__.py``).

The reference ships an installer/launcher ("manager") that detects hardware,
builds the environment, and runs diagnostics. The TPU analog targets
TPU-VM images where the JAX stack is preinstalled, so install/sync verify
dependencies rather than pip-install them (no-network images are common).

    python -m ai_toolkit_tpu.manager detect [--json]   TPU / host detection
    python -m ai_toolkit_tpu.manager doctor            full diagnostics
    python -m ai_toolkit_tpu.manager check [--json]    dependency / repo status
    python -m ai_toolkit_tpu.manager sync              verify dependencies
    python -m ai_toolkit_tpu.manager install           verify + create dirs
    python -m ai_toolkit_tpu.manager launch [--port N] start the REST monitor
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import platform
import subprocess
import sys

REQUIRED = ("jax", "flax", "optax", "numpy", "safetensors", "PIL", "yaml")
OPTIONAL = ("cv2", "scipy", "einops", "torch", "transformers", "orbax.checkpoint")


def _ok(msg):
    print(f"[ ok ] {msg}")


def _warn(msg):
    print(f"[warn] {msg}")


def _fail(msg):
    print(f"[FAIL] {msg}")


def detect(as_json: bool = False) -> dict:
    out: dict = {
        "os": platform.system().lower(),
        "arch": platform.machine(),
        "python": platform.python_version(),
        "cpus": os.cpu_count(),
    }
    try:
        import jax

        out["jax"] = jax.__version__
        devs = jax.devices()
        out["backend"] = devs[0].platform if devs else "none"
        out["devices"] = [
            {"id": d.id, "kind": getattr(d, "device_kind", "?"), "platform": d.platform}
            for d in devs
        ]
        try:
            stats = devs[0].memory_stats() or {}
            if "bytes_limit" in stats:
                out["hbm_bytes"] = int(stats["bytes_limit"])
        except Exception:
            pass
    except Exception as e:  # pragma: no cover
        out["jax_error"] = str(e)
    if as_json:
        print(json.dumps(out, indent=2))
    else:
        devs = out.get("devices", [])
        kind = devs[0]["kind"] if devs else "none"
        print(f"os={out['os']} arch={out['arch']} python={out['python']} "
              f"backend={out.get('backend', '?')} devices={len(devs)}x{kind}")
    return out


def check_deps(verbose: bool = True) -> bool:
    good = True
    for mod in REQUIRED:
        try:
            importlib.import_module(mod)
            if verbose:
                _ok(f"required: {mod}")
        except Exception as e:
            good = False
            _fail(f"required module '{mod}' missing: {e}")
    for mod in OPTIONAL:
        try:
            importlib.import_module(mod)
            if verbose:
                _ok(f"optional: {mod}")
        except Exception:
            if verbose:
                _warn(f"optional module '{mod}' unavailable (features gated)")
    return good


def doctor() -> int:
    print("== ai_toolkit_tpu doctor ==")
    info = detect()
    good = check_deps()

    # device smoke test: tiny matmul must run on the default backend
    try:
        import jax
        import jax.numpy as jnp

        x = jnp.ones((128, 128), jnp.bfloat16)
        y = float(jnp.sum(x @ x))
        _ok(f"device matmul ({info.get('backend', '?')}): sum={y:.0f}")
    except Exception as e:
        good = False
        _fail(f"device matmul failed: {e}")

    # virtual multi-device mesh (sharding machinery) in a subprocess so the
    # flag applies before jax initializes there
    code = (
        # in-process platform override: images that pre-register an
        # accelerator backend in sitecustomize ignore plain env vars
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import numpy as np;"
        "from jax.sharding import Mesh, PartitionSpec as P, NamedSharding;"
        "devs = np.array(jax.devices()).reshape(2, 4);"
        "m = Mesh(devs, ('dp', 'fsdp'));"
        "x = jax.device_put(np.ones((8, 8)), NamedSharding(m, P('dp', 'fsdp')));"
        "print(float(x.sum()))"
    )
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True,
                           text=True, timeout=240)
        if r.returncode == 0:
            _ok("8-device virtual mesh shards arrays")
        else:
            good = False
            _fail(f"virtual mesh failed: {r.stderr.strip()[-200:]}")
    except Exception as e:
        good = False
        _fail(f"virtual mesh subprocess failed: {e}")

    # native data loader
    try:
        from ai_toolkit_tpu.data.native import get_lib

        if get_lib() is not None:
            _ok("native C++ data loader built")
        else:
            _warn("native data loader not built (PIL fallback active)")
    except Exception:
        _warn("native data loader module unavailable (PIL fallback active)")

    # config round trip
    try:
        from ai_toolkit_tpu.config.modules import TrainConfig

        TrainConfig.from_dict({"lr": 1e-4})
        _ok("config system loads")
    except Exception as e:
        good = False
        _fail(f"config system broken: {e}")

    print("== doctor:", "PASS" if good else "FAIL", "==")
    return 0 if good else 1


def check(as_json: bool = False) -> int:
    out = {"deps_ok": check_deps(verbose=not as_json)}
    try:
        r = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        out["commit"] = r.stdout.strip()[:12]
    except Exception:
        out["commit"] = None
    if as_json:
        print(json.dumps(out))
    return 0 if out["deps_ok"] else 1


# ---- migrations: one-shot upgrade steps keyed by id, recorded in
# .ait_migrations so `update` runs each exactly once (reference
# manager/migrations.py contract) ----

MIGRATIONS: list[tuple[str, "callable"]] = [
    # ("0001-example", lambda root: ...),
]


def run_migrations(root: str | None = None) -> int:
    root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    state_path = os.path.join(root, ".ait_migrations")
    done = set()
    if os.path.exists(state_path):
        done = set(open(state_path).read().split())
    ran = 0
    for mid, fn in MIGRATIONS:
        if mid in done:
            continue
        fn(root)
        done.add(mid)
        ran += 1
        _ok(f"migration applied: {mid}")
    with open(state_path, "w") as f:
        f.write("\n".join(sorted(done)))
    if not ran:
        _ok("no pending migrations")
    return 0


def update() -> int:
    """git pull --ff-only, then re-sync deps + run migrations (reference
    `python -m manager update`)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(["git", "pull", "--ff-only"], cwd=root)
    if r.returncode != 0:
        _fail("git pull failed (diverged checkout?) — resolve manually")
        return 1
    ok_ = check_deps()
    run_migrations(root)
    return 0 if ok_ else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ai_toolkit_tpu.manager")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("detect", "check"):
        p = sub.add_parser(name)
        p.add_argument("--json", action="store_true")
    sub.add_parser("doctor")
    sub.add_parser("sync")
    sub.add_parser("install")
    sub.add_parser("update")
    sub.add_parser("migrate")
    lp = sub.add_parser("launch")
    lp.add_argument("--port", type=int, default=8675)
    pc = sub.add_parser("precompile")  # prewarm the persistent XLA cache
    pc.add_argument("targets", nargs="*", default=None)
    args = ap.parse_args(argv)

    if args.cmd == "precompile":
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ait_precompile",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "scripts", "precompile.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.main(args.targets or None)

    if args.cmd == "detect":
        detect(as_json=args.json)
        return 0
    if args.cmd == "check":
        return check(as_json=args.json)
    if args.cmd == "doctor":
        return doctor()
    if args.cmd == "sync":
        return 0 if check_deps() else 1
    if args.cmd == "update":
        return update()
    if args.cmd == "migrate":
        return run_migrations()
    if args.cmd == "install":
        ok_ = check_deps()
        for d in ("output", "datasets", "config"):
            os.makedirs(d, exist_ok=True)
            _ok(f"dir ready: {d}/")
        return 0 if ok_ else 1
    if args.cmd == "launch":
        import time

        from ai_toolkit_tpu.ui.server import UIServer

        srv = UIServer(port=args.port, queue_worker=True).start()
        print(f"monitor UI + queue worker on :{srv.port} (ctrl-c to stop)")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
