"""Concept-replacer training process.

Parity target: ``extensions_built_in/concept_replacer/ConceptReplacer.py``:
per-batch, each caption is wrapped as ``"{concept}, {caption}, {concept}"``
(comma-shuffled concept) for the adapter-on forward and
``"{replacement}, {caption}, {replacement}"`` for the adapter-off target
(``ConceptReplacer.py:63-130``). Config::

    process:
      - type: concept_replacer
        replacements:
          - {concept: "a dog", replacement: "a cat"}
        ... (standard sd_trainer keys)
"""

from __future__ import annotations

import random

from ai_toolkit_tpu.jobs.train_process import SDTrainProcess


class ConceptReplacerProcess(SDTrainProcess):
    def __init__(self, job_name: str, cfg):
        super().__init__(job_name, cfg)
        reps = cfg.extras.get("replacements", [])
        if not reps:
            raise ValueError("concept_replacer needs replacements: [{concept, replacement}]")
        self.replacements = [(r["concept"], r.get("replacement", "")) for r in reps]
        self._rng = random.Random(cfg.train.seed or 42)
        # route the step factory to the replacement objective
        cfg.train.extras["guidance_loss"] = "concept_replacer"

    @staticmethod
    def _shuffle_wrap(tag: str, prompt: str, rng: random.Random) -> str:
        parts = [x.strip() for x in tag.split(",")]
        rng.shuffle(parts)
        tag = ", ".join(parts)
        return f"{tag}, {prompt}, {tag}"

    def _prepare_batch(self, model, raw, text_cache, step_cfg):
        concept_caps, replacement_caps = [], []
        for cap in raw["captions"]:
            concept, replacement = self._rng.choice(self.replacements)
            concept_caps.append(self._shuffle_wrap(concept, cap, self._rng))
            replacement_caps.append(self._shuffle_wrap(replacement, cap, self._rng))
        batch = super()._prepare_batch(
            model, {**raw, "captions": concept_caps}, text_cache, step_cfg
        )
        import jax.numpy as jnp

        rep = {k: jnp.asarray(v) for k, v in text_cache.get(replacement_caps).items()}
        cond = batch["cond"]
        for aux in ("pe", "guidance", "added_cond"):
            if aux in cond and aux not in rep:
                rep[aux] = cond[aux]
        batch["replacement_cond"] = rep
        return batch
