"""CivitAI helper (reference toolkit/civitai.py): url parsing, the file
preference cascade, the json model cache with stale-path eviction, and the
offline error path. No network involved."""

import json

import pytest

from ai_toolkit_tpu.io.civitai import (
    ModelCache,
    maybe_resolve_civitai,
    parse_civitai_url,
    pick_model_file,
)


def test_parse_civitai_url():
    assert parse_civitai_url("https://civitai.com/models/25694?modelVersionId=127742") == (25694, 127742)
    assert parse_civitai_url("https://civitai.com/models/25694") == (25694, None)
    with pytest.raises(ValueError, match="invalid"):
        parse_civitai_url("https://civitai.com/models/not-a-number")


def test_pick_model_file_cascade():
    fp16_st = {"name": "a", "metadata": {"fp": "fp16", "format": "SafeTensor"}}
    primary = {"name": "b", "primary": True, "metadata": {"fp": "fp32", "format": "PickleTensor"}}
    any_st = {"name": "c", "metadata": {"fp": "fp32", "format": "SafeTensor"}}
    any_fp16 = {"name": "d", "metadata": {"fp": "fp16", "format": "PickleTensor"}}
    other = {"name": "e", "metadata": {}}
    # fp16 safetensor wins over everything
    assert pick_model_file([other, primary, any_st, fp16_st])["name"] == "a"
    assert pick_model_file([other, any_st, primary])["name"] == "b"
    assert pick_model_file([other, any_fp16, any_st])["name"] == "c"
    assert pick_model_file([other, any_fp16])["name"] == "d"
    assert pick_model_file([other])["name"] == "e"
    assert pick_model_file([]) is None


def test_model_cache_roundtrip_and_eviction(tmp_path):
    f = tmp_path / "model.safetensors"
    f.write_bytes(b"x")
    c = ModelCache(root=str(tmp_path))
    c.put(123, 7, str(f))
    # re-open from disk; latest version wins when unspecified
    c2 = ModelCache(root=str(tmp_path))
    assert c2.get(123) == str(f)
    assert c2.get(123, 7) == str(f)
    assert c2.get(999) is None
    # reference cache file layout: {"models": {id: {ver: {model_path}}}}
    raw = json.loads((tmp_path / ".ai_toolkit_cache.json").read_text())
    assert raw["models"]["123"]["7"]["model_path"] == str(f)
    # stale path evicts itself
    f.unlink()
    assert ModelCache(root=str(tmp_path)).get(123, 7) is None


def test_cache_hit_resolves_without_network(tmp_path, monkeypatch):
    monkeypatch.setenv("AIT_MODELS_DIR", str(tmp_path))
    f = tmp_path / "cached.safetensors"
    f.write_bytes(b"x")
    ModelCache(root=str(tmp_path)).put(25694, 127742, str(f))
    out = maybe_resolve_civitai("https://civitai.com/models/25694?modelVersionId=127742")
    assert out == str(f)
    # non-civitai paths pass through untouched
    assert maybe_resolve_civitai("/some/local.safetensors") == "/some/local.safetensors"


def test_offline_miss_raises_clearly(tmp_path, monkeypatch):
    monkeypatch.setenv("AIT_MODELS_DIR", str(tmp_path))

    import ai_toolkit_tpu.io.civitai as cv

    def boom(url):
        raise RuntimeError("civitai API unreachable (no egress)")

    monkeypatch.setattr(cv, "_api_get", boom)
    with pytest.raises(RuntimeError, match="unreachable"):
        cv.get_model_path_from_url("https://civitai.com/models/1")
