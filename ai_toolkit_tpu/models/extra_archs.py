"""Long-tail arch registrations (table-driven DiT variants).

Parity target: the remaining reference plugin archs in
``extensions_built_in/diffusion_models/*`` that are structural variants of
the families already implemented here — an LLM-conditioned rectified-flow
DiT over VAE latents. Each entry cites its plugin and carries the dims that
are visible in the vendored sources; anything uncertain defaults sensibly
and every field is overridable through ``model.model_kwargs`` so a user with
the real checkpoint config can set exact dims without code changes.

| arch          | plugin dir        | known dims (src)                          |
|---------------|-------------------|-------------------------------------------|
| f-lite        | f_light           | cross/joint 1152 x 28, 16 heads, 4ch VAE, T5 TE (src/model.py:311-315) |
| mageflow(+edit) | mageflow        | flux-style double+single, Qwen3-VL TE, 128ch/16x MageVAE (mageflow.py:11-14) |
| anima         | anima             | Qwen3-VL-conditioned DiT (anima.py:220)   |
| nucleus_image | nucleus_image     | Qwen3-VL TE (nucleus_image_model.py:132)  |
| flex2         | flex2             | flux control family (inpaint/control inputs) |
| hidream_o1    | hidream           | hidream family                            |
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.base import BaseTpuModel
from ai_toolkit_tpu.models.flux_dit import (
    FluxConfig,
    FluxDiT,
    flux_lora_targets,
    flux_partition_rules,
    pack_latents,
    unpack_latents,
)
from ai_toolkit_tpu.models.registry import register_model
from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder, T5Config, T5Encoder
from ai_toolkit_tpu.models.vae import AutoencoderKL, VAEConfig
from ai_toolkit_tpu.ops.rope import image_position_ids, multi_axis_rope
from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

# hidden, heads, head_dim, depth_double, depth_single, ctx_dim, vae, te, llm_d
#
# Derivation status (r5 audit): NEITHER plugin vendors transformer dims — both
# load them from checkpoint config.json through external model classes, so
# only the surrounding contracts are pinned by in-reference source:
# - anima: diffusers ``CosmosTransformer3DModel`` target (anima.py:235),
#   Qwen3 text conditioner + T5 ids (anima.py:137-177), bucket divisibility
#   32 (anima.py:248: 16*2), max_sequence_length 512 (anima.py:241). The
#   hidden/depth numbers below are the Cosmos-Predict2-2B convention, NOT
#   verified — which is why checkpoint paths stay REFUSED.
# - nucleus_image: scheduler_config (nucleus_image_model.py:31-43) and the
#   load flow only; dims below are conventions, checkpoints REFUSED.
_SPECS: dict[str, dict] = {
    "anima": dict(hidden=2048, heads=16, head_dim=128, dd=0, ds=24, ctx=2048,
                  vae="flux", te="llm", llm_d=2048),
    "nucleus_image": dict(hidden=2560, heads=20, head_dim=128, dd=0, ds=28, ctx=2048,
                          vae="flux", te="llm", llm_d=2048),
}

_VAES = {
    "sd": VAEConfig.sd,
    "flux": VAEConfig.flux,
    "flux2": lambda: VAEConfig(latent_channels=32, scaling_factor=1.0, use_quant_conv=False),
}


@register_model
class GenericDiTModel(BaseTpuModel):
    """Config-table DiT wrapper for the long-tail archs above."""

    arch = "generic_dit"
    checkpoint_importable = False  # table-driven stand-ins refuse checkpoints
    archs = list(_SPECS.keys())
    is_flow_matching = True
    bucket_divisibility = 16
    max_txt_len = 256

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        spec = dict(_SPECS[config.arch])
        spec.update({k: v for k, v in config.model_kwargs.items() if k in (
            "hidden", "heads", "head_dim", "dd", "ds", "ctx", "vae", "te", "llm_d", "edit",
            "chroma",
        )})
        self.is_edit = bool(spec.get("edit"))
        size = config.model_kwargs.get("size", "full")
        if size == "tiny":
            base = FluxConfig.tiny()
            self.dit_config = FluxConfig(**{
                **base.__dict__,
                "depth_double": min(spec["dd"], 1), "depth_single": min(spec["ds"], 2),
                "guidance_embed": False,
                "chroma_mod": bool(spec.get("chroma")),
                "approximator_hidden": 64, "approximator_depth": 2,
            })
            self.vae_config = VAEConfig.tiny()
            self.te_kind = spec["te"]
            self.t5_config = T5Config.tiny()
            self.llm_config = LLMConfig.tiny()
            self.max_txt_len = 16
        else:
            hd = spec["head_dim"]
            ax = (hd - 2 * (hd // 4), hd // 4, hd // 4)
            self.dit_config = FluxConfig(
                in_channels=4 * _VAES[spec["vae"]]().latent_channels,
                hidden_size=spec["hidden"], num_heads=spec["heads"], head_dim=hd,
                depth_double=spec["dd"], depth_single=spec["ds"],
                context_dim=spec["ctx"], vec_dim=256, guidance_embed=False,
                axes_dim=ax,
                # chroma-family: Approximator modulation (see flux_dit)
                chroma_mod=bool(spec.get("chroma")),
            )
            self.vae_config = _VAES[spec["vae"]]()
            self.te_kind = spec["te"]
            self.t5_config = T5Config.xxl()
            self.llm_config = LLMConfig(
                vocab_size=151_936, d_model=spec.get("llm_d", 2048),
                n_layers=28, n_heads=16, n_kv_heads=4,
                head_dim=max(64, spec.get("llm_d", 2048) // 16),
                d_ff=4 * spec.get("llm_d", 2048), rope_theta=1_000_000.0,
            )
        self.dit = FluxDiT(self.dit_config)
        self.vae = AutoencoderKL(self.vae_config)
        if self.te_kind == "t5":
            self.te = T5Encoder(self.t5_config)
            vocab, eos = self.t5_config.vocab_size, 1
        else:
            self.te = LLMEncoder(self.llm_config)
            vocab, eos = self.llm_config.vocab_size, 2
        self.tokenizer = load_tokenizer(
            config.name_or_path, "tokenizer", vocab_size=vocab, eos_id=eos,
            max_len=self.max_txt_len,
        )

    def init_variables(self, rng: jax.Array) -> dict:
        r_dit, r_vae, r_te = jax.random.split(rng, 3)
        cfg = self.dit_config
        n_img, n_txt = 16, 8
        pe = jnp.zeros((1, n_txt + n_img, cfg.head_dim // 2, 2, 2))
        pe = pe.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
        dit_vars = self.dit.init(
            r_dit, jnp.zeros((1, n_img, cfg.in_channels)), jnp.zeros((1, n_txt, cfg.context_dim)),
            jnp.zeros((1,)), jnp.zeros((1, cfg.vec_dim)), pe, None,
        )
        vae_vars = self.vae.init(
            r_vae, jnp.zeros((1, 2 * self.vae_config.downscale, 2 * self.vae_config.downscale, 3))
        )
        return {
            "dit": dit_vars["params"],
            "vae": vae_vars["params"],
            "te": self.te.init(r_te, jnp.zeros((1, self.max_txt_len), jnp.int32))["params"],
        }

    def load_variables(self, rng: jax.Array) -> dict:
        if self.config.name_or_path:
            # Honesty over silence (round-2 review): these table-driven archs
            # have no checkpoint importer yet — training would run against
            # RANDOM weights, which is almost never what the user wants.
            raise NotImplementedError(
                f"arch '{self.config.arch}' has no checkpoint importer yet — "
                f"it can train from random init (name_or_path: \"\") for "
                f"architecture experiments, but cannot load "
                f"'{self.config.name_or_path}'. Fully-supported archs with "
                f"importers: see docs/PARITY.md."
            )
        return self.init_variables(rng)

    def encode_prompt(self, variables: dict, prompts: list[str]) -> dict:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        txt = jax.jit(self.te.apply)({"params": variables["te"]}, jnp.asarray(ids))
        if isinstance(txt, dict):
            txt = txt["last_hidden_state"]
        return {"txt": txt, "y": jnp.zeros((len(prompts), self.dit_config.vec_dim))}

    def rope_table(self, latent_h: int, latent_w: int, txt_len: int) -> jnp.ndarray:
        ids = image_position_ids(latent_h // 2, latent_w // 2, text_len=txt_len)
        table = multi_axis_rope(
            jnp.asarray(ids)[None], list(self.dit_config.axes_dim), self.dit_config.theta
        )
        if self.is_edit:
            cids = np.asarray(image_position_ids(latent_h // 2, latent_w // 2, text_len=0)).copy()
            cids[:, 0] = 1
            table = jnp.concatenate([
                table,
                multi_axis_rope(jnp.asarray(cids)[None], list(self.dit_config.axes_dim),
                                self.dit_config.theta),
            ], axis=1)
        return table

    def predict(self, variables, noisy_latents, t, cond):
        b, h, w, c = noisy_latents.shape
        img = pack_latents(noisy_latents)
        n_img = img.shape[1]
        if self.is_edit and cond.get("control_latents") is not None:
            img = jnp.concatenate([img, pack_latents(cond["control_latents"])], axis=1)
        colls = {"params": variables["dit"]}
        for k in ("lora", "loha", "lokr", "dora", "lorm", "quant", "ctrl"):
            if k in variables:
                colls[k] = variables[k]
        out = self.dit.apply(colls, img, cond["txt"], t, cond["y"], cond["pe"], None)
        return unpack_latents(out[:, :n_img], h, w)

    def encode_images(self, variables, images, rng=None):
        return self.vae.apply({"params": variables["vae"]}, images, rng, method=AutoencoderKL.encode)

    def decode_latents(self, variables, latents):
        return self.vae.apply({"params": variables["vae"]}, latents, method=AutoencoderKL.decode)

    def latent_shape(self, height: int, width: int):
        d = self.vae_config.downscale
        return height // d, width // d, self.vae_config.latent_channels

    def image_seq_len(self, height: int, width: int) -> int:
        h, w, _ = self.latent_shape(height, width)
        return (h // 2) * (w // 2)

    def lora_targets(self):
        return flux_lora_targets()

    def partition_rules(self):
        return flux_partition_rules(self.dit_config.scan_blocks)
