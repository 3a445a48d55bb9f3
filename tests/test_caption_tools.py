"""Captioner + dataset_tools jobs (reference extensions_built_in/captioner,
dataset_tools)."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image


def _mk_imgs(folder, n=3, size=64, dup=False):
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png"
        )
    if dup:
        data = (folder / "im_0.png").read_bytes()
        (folder / "im_dup.png").write_bytes(data)


def test_caption_job_heuristic(tmp_path):
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    folder = tmp_path / "imgs"
    _mk_imgs(folder)
    (folder / "im_0.txt").write_text("existing caption")
    cfg = {
        "job": "extension",
        "config": {"name": "cap", "process": [{
            "type": "captioner",
            "caption": {"path_to_caption": str(folder), "backend": "heuristic"},
        }]},
    }
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    results = get_job(get_config(p)).run()
    assert results[0]["written"] == 2 and results[0]["skipped"] == 1
    cap = (folder / "im_1.txt").read_text()
    assert "image" in cap and len(cap) > 10
    # existing caption untouched without recaption
    assert (folder / "im_0.txt").read_text() == "existing caption"
    # recaption overwrites
    cfg["config"]["process"][0]["caption"]["recaption"] = True
    p.write_text(yaml.safe_dump(cfg))
    results = get_job(get_config(p)).run()
    assert results[0]["written"] == 3


def test_caption_vlm_backend_rejects_missing_weights_dir(tmp_path):
    """A *named* weights path that doesn't exist fails loudly; omitting it
    runs the deterministic tiny VLM (covered by
    test_caption_job_vlm_tiny_deterministic)."""
    from ai_toolkit_tpu.jobs.caption_process import CaptionProcess

    folder = tmp_path / "imgs"
    _mk_imgs(folder, n=1)

    class _C:
        extras = {"caption": {"path_to_caption": str(folder), "backend": "vlm",
                              "model_name_or_path": str(tmp_path / "missing")}}

    with pytest.raises(RuntimeError, match="not a local directory"):
        CaptionProcess("j", _C()).run()


def test_dataset_tools_pipeline(tmp_path):
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    folder = tmp_path / "ds"
    _mk_imgs(folder, n=3, dup=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(folder / "small.png")
    cfg = {
        "job": "extension",
        "config": {"name": "dt", "process": [{
            "type": "dataset_tools",
            "dataset_path": str(folder),
            "steps": ["dedupe", "prune_small", "caption", "trigger"],
            "prune_small": {"min_size": 48},
            "caption": {"backend": "heuristic"},
            "trigger": {"word": "zxc"},
        }]},
    }
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    results = get_job(get_config(p)).run()
    stats = results[0]
    assert stats["dedupe_removed"] == 1
    assert stats["pruned"] == 1
    files = sorted(os.listdir(folder))
    assert "small.png" not in files and "im_dup.png" not in files
    # every surviving image captioned and trigger-prefixed
    for f in files:
        if f.endswith(".png"):
            cap = (folder / f.replace(".png", ".txt")).read_text()
            assert cap.startswith("zxc, ")


def test_caption_job_vlm_tiny_deterministic(tmp_path):
    """'vlm' backend (round-3): random-init tiny VLM (CLIP-vision patches ->
    projector -> greedy LLM decode through the real code paths) produces
    deterministic, image-dependent captions. Real weights load via
    vision_tower/ + language_model/ through the goldened import rules."""
    import numpy as np
    from PIL import Image

    from ai_toolkit_tpu.jobs.caption_process import CaptionProcess

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)).save(
        folder / "a.png")
    Image.fromarray(np.full((48, 48, 3), 250, np.uint8)).save(folder / "b.png")

    cfg = {"path_to_caption": str(folder), "backend": "vlm",
           "max_new_tokens": 6, "seed": 0}
    out = CaptionProcess("vlmcap", cfg).run()
    assert out["written"] == 2
    cap_a = (folder / "a.txt").read_text()
    cap_b = (folder / "b.txt").read_text()
    assert cap_a and cap_b

    # deterministic under re-run
    cfg2 = dict(cfg, recaption=True)
    CaptionProcess("vlmcap2", cfg2).run()
    assert (folder / "a.txt").read_text() == cap_a

    # a missing weights path errors loudly instead of silently random-initing
    import pytest as _pt
    bad = dict(cfg, model_name_or_path=str(tmp_path / "nope"))
    with _pt.raises(RuntimeError, match="not a local directory"):
        CaptionProcess("vlmbad", bad).run()
