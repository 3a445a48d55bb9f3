"""CivitAI model resolution.

Behavior parity with ``/root/reference/toolkit/civitai.py``: a config
``name_or_path`` pointing at ``civitai.com/models/<id>[?modelVersionId=..]``
resolves to a locally cached safetensors file, downloading (fp16-SafeTensor
preferred) on miss. Redesigned pieces:

- cache file is ``<models_dir>/.ai_toolkit_cache.json`` (same contract so a
  models dir shared with the reference keeps working);
- download uses stdlib urllib (no requests dependency) with atomic
  tmp-file rename;
- in an offline environment the download path raises a clear error instead
  of hanging — the cache-hit path still works.

``AIT_MODELS_DIR`` overrides the models directory (default ``~/.cache/
ai_toolkit_tpu/models``). ``CIVITAI_API_KEY`` is attached as a bearer token
when present (civitai requires it for some downloads).
"""

from __future__ import annotations

import json
import os
from urllib.parse import parse_qsl, urlparse


def models_dir() -> str:
    d = os.environ.get("AIT_MODELS_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "ai_toolkit_tpu", "models"
    )
    return d


class ModelCache:
    """model_id -> version_id -> {model_path}; stale paths self-evict."""

    def __init__(self, root: str | None = None):
        self.root = root or models_dir()
        self.cache_path = os.path.join(self.root, ".ai_toolkit_cache.json")
        self.models: dict = {}
        if os.path.exists(self.cache_path):
            with open(self.cache_path) as f:
                raw = json.load(f)
            self.models = raw.get("models", raw)

    def get(self, model_id: int, version_id: int | str | None = None) -> str | None:
        versions = self.models.get(str(model_id))
        if not versions:
            return None
        if version_id is None:
            version_id = max(int(v) for v in versions)
        entry = versions.get(str(version_id))
        path = entry and entry.get("model_path")
        if path and os.path.exists(path):
            return path
        if entry:
            del versions[str(version_id)]
            self.save()
        return None

    def put(self, model_id: int, version_id: int, path: str) -> None:
        self.models.setdefault(str(model_id), {})[str(version_id)] = {"model_path": path}
        self.save()

    def save(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        existing = {}
        if os.path.exists(self.cache_path):
            with open(self.cache_path) as f:
                existing = json.load(f)
        existing["models"] = self.models
        with open(self.cache_path, "w") as f:
            json.dump(existing, f, indent=2)


def parse_civitai_url(url: str) -> tuple[int, int | None]:
    """-> (model_id, version_id|None). Accepts
    https://civitai.com/models/25694?modelVersionId=127742 style urls."""
    parsed = urlparse(url)
    seg = [s for s in parsed.path.split("/") if s]
    model_id = seg[-1] if seg else ""
    if not model_id.isdigit():
        raise ValueError(f"invalid civitai model id in url: {url!r}")
    q = dict(parse_qsl(parsed.query))
    ver = q.get("modelVersionId")
    return int(model_id), (int(ver) if ver and ver.isdigit() else None)


def pick_model_file(files: list[dict]) -> dict | None:
    """The reference's download preference cascade (civitai.py:105-143):
    fp16 SafeTensor > primary > any SafeTensor > any fp16 > first."""

    def meta(f, key):
        return (f.get("metadata") or {}).get(key)

    for f in files:
        if meta(f, "fp") == "fp16" and meta(f, "format") == "SafeTensor":
            return f
    for f in files:
        if f.get("primary"):
            return f
    for f in files:
        if meta(f, "format") == "SafeTensor":
            return f
    for f in files:
        if meta(f, "fp") == "fp16":
            return f
    return files[0] if files else None


def _api_get(url: str) -> dict:
    import urllib.request

    req = urllib.request.Request(url, headers=_auth_headers())
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read().decode())
    except OSError as e:
        raise RuntimeError(
            f"civitai API unreachable ({e}); this environment has no network "
            "egress — place the checkpoint locally and point name_or_path at it"
        ) from e


def _auth_headers() -> dict:
    key = os.environ.get("CIVITAI_API_KEY")
    return {"Authorization": f"Bearer {key}"} if key else {}


def get_model_download_info(model_id: int, version_id: int | None = None) -> tuple[dict, int]:
    data = _api_get(f"https://civitai.com/api/v1/models/{model_id}")
    version = None
    for v in data.get("modelVersions", []):
        if version_id is None or str(v.get("id")) == str(version_id):
            version = v
            break
    if version is None:
        raise ValueError(f"no model version for model {model_id} (version {version_id})")
    f = pick_model_file(version.get("files", []))
    if f is None:
        raise ValueError(f"no downloadable file for civitai model {model_id}")
    return f, int(version["id"])


def _download(url: str, dest: str) -> None:
    import urllib.request

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = os.path.join(os.path.dirname(dest), ".download_tmp_" + os.path.basename(dest))
    req = urllib.request.Request(url, headers=_auth_headers())
    try:
        with urllib.request.urlopen(req, timeout=60) as r, open(tmp, "wb") as f:
            total = int(r.headers.get("content-length", 0) or 0)
            done = 0
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
                done += len(chunk)
                if total:
                    print(f"\rdownloading {os.path.basename(dest)}: "
                          f"{done / 1e6:.0f}/{total / 1e6:.0f} MB", end="", flush=True)
        print()
        os.replace(tmp, dest)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def get_model_path_from_url(url: str) -> str:
    """Resolve a civitai url to a local file path, downloading on cache miss
    (reference civitai.get_model_path_from_url)."""
    model_id, version_id = parse_civitai_url(url)
    cache = ModelCache()
    hit = cache.get(model_id, version_id)
    if hit is not None:
        return hit
    info, resolved_version = get_model_download_info(model_id, version_id)
    dest = os.path.join(models_dir(), info["name"])
    print(f"downloading civitai model {model_id} v{resolved_version} -> {dest}")
    _download(info["downloadUrl"], dest)
    cache.put(model_id, resolved_version, dest)
    return dest


def maybe_resolve_civitai(name_or_path: str) -> str:
    """Hook for model loading: pass non-civitai paths through untouched."""
    if isinstance(name_or_path, str) and "civitai.com" in name_or_path:
        return get_model_path_from_url(name_or_path)
    return name_or_path
