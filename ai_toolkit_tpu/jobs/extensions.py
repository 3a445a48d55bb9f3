"""User-plugin discovery.

The reference scans ``extensions/`` + ``extensions_built_in/`` packages for an
``AI_TOOLKIT_EXTENSIONS`` list of Extension classes and dispatches job types
by their uid (``/root/reference/toolkit/extension.py:28-57``). Our built-ins
live in ``jobs/dispatch.py``; this module adds the user-plugin half: drop a
python module (or package) into ``<repo>/extensions/`` — or any directory
named by ``AIT_EXTENSIONS_DIR`` (path-separated list) — exposing

    AI_TOOLKIT_EXTENSIONS = [MyExtension]

where ``MyExtension.uid`` is the config ``type:`` string and
``MyExtension.get_process()`` returns a process class accepting
``(job_name, process_config)`` with a ``run()`` method, like the built-in
processes. A plugin module may also call ``models.registry.register_model``
at import time to add architectures.
"""

from __future__ import annotations

import importlib.util
import os
import pkgutil
import sys


class Extension:
    """Base class for extensions (mirrors the reference contract)."""

    name: str | None = None
    uid: str | None = None

    @classmethod
    def get_process(cls):  # pragma: no cover - abstract
        raise NotImplementedError


def _extension_dirs() -> list[str]:
    dirs = []
    env = os.environ.get("AIT_EXTENSIONS_DIR")
    if env:
        dirs.extend(p for p in env.split(os.pathsep) if p)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    dirs.append(os.path.join(repo_root, "extensions"))
    return [d for d in dirs if os.path.isdir(d)]


_cache: dict[str, type] | None = None


def discover_extension_processes(refresh: bool = False) -> dict[str, type]:
    """uid -> process class for every discovered extension."""
    global _cache
    if _cache is not None and not refresh:
        return _cache
    found: dict[str, type] = {}
    for d in _extension_dirs():
        for _, name, _ in pkgutil.iter_modules([d]):
            mod_name = f"ait_ext_{os.path.basename(d)}_{name}"
            try:
                spec = importlib.util.spec_from_file_location(
                    mod_name,
                    os.path.join(d, name, "__init__.py")
                    if os.path.isdir(os.path.join(d, name))
                    else os.path.join(d, name + ".py"),
                )
                module = importlib.util.module_from_spec(spec)
                sys.modules[mod_name] = module
                spec.loader.exec_module(module)
            except Exception as e:  # a broken plugin must not kill the CLI
                print(f"extension {name!r} in {d} failed to import: {e}")
                continue
            exts = getattr(module, "AI_TOOLKIT_EXTENSIONS", None)
            if not isinstance(exts, list):
                continue
            for ext in exts:
                uid = getattr(ext, "uid", None)
                if uid:
                    found[uid] = ext.get_process()
    _cache = found
    return found
