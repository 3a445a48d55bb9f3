"""The training process: model load -> adapter -> data -> jitted loop -> save.

This is the TPU-native equivalent of ``BaseSDTrainProcess.run()`` +
``SDTrainer`` (``/root/reference/jobs/process/BaseSDTrainProcess.py:1738-2857``,
``extensions_built_in/sd_trainer/SDTrainer.py``): the whole lifecycle, with
the per-step work compiled into one pjit'd function instead of an eager hook
chain. Covers: LoRA + full fine-tune, latent & text-embed caching, resume
(weights + optimizer + step), EMA, save/sample cadence, checkpoint rotation,
sample-grid generation, metrics logging, and mesh sharding (DP/FSDP/TP).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora, count_lora_params
from ai_toolkit_tpu.config.modules import JobConfig, ProcessConfig
from ai_toolkit_tpu.data.caching import TextEmbedCache, cache_latents
from ai_toolkit_tpu.data.loader import build_dataloader
from ai_toolkit_tpu.generation import generate, save_image_atomic
from ai_toolkit_tpu.io.checkpoint import CheckpointManager
from ai_toolkit_tpu.models.registry import get_model_class
from ai_toolkit_tpu.parallel.mesh import make_mesh
from ai_toolkit_tpu.parallel.sharding import apply_rules, named_sharding_tree, shard_batch_spec
from ai_toolkit_tpu.samplers import get_schedule
from ai_toolkit_tpu.train.optimizers import get_optimizer
from ai_toolkit_tpu.train.state import TrainState
from ai_toolkit_tpu.train.step import TrainStepConfig, make_jitted_train_step
from ai_toolkit_tpu.utils.logging import RunLogger
from ai_toolkit_tpu.utils.timer import Timer


class SDTrainProcess:
    """uid 'sd_trainer' / 'diffusion_trainer' / 'ui_trainer'."""

    def __init__(self, job_name: str, cfg: ProcessConfig):
        self.job_name = job_name
        self.cfg = cfg
        self.save_root = os.path.join(cfg.training_folder, job_name)
        os.makedirs(self.save_root, exist_ok=True)
        self.timer = Timer("train")
        self.logger: RunLogger | None = None
        self.progress_hook = None  # UI integration point (step, loss, status)
        self.ti_trigger = None
        self.ip_mode = False
        self.custom_adapter = None  # CustomAdapterRuntime when adapter configured
        self.train_te = False  # text-encoder LoRA training (in-graph TE)

    # ---- lifecycle ----

    def run(self) -> dict:
        cfg = self.cfg
        tc = cfg.train
        seed = tc.seed if tc.seed is not None else int(os.environ.get("SEED", 42))
        rng = jax.random.key(seed)

        self.logger = RunLogger(cfg.logging, self.save_root, self.job_name)
        from ai_toolkit_tpu.jobs.ui_bridge import UIJobBridge

        self.ui = UIJobBridge()
        self.ui.start(tc.steps)

        # 1. model
        model_cls = get_model_class(cfg.model.arch)
        model = model_cls(cfg.model)
        self.model = model
        if getattr(cfg.train, "free_u", False):
            if hasattr(model, "enable_free_u"):
                # FreeU on the train forward (BaseSDTrainProcess.py:2539)
                model.enable_free_u()
            else:
                raise ValueError(f"free_u is a UNet-family knob; {cfg.model.arch} has no skips")
        variables = model.load_variables(rng)
        # assistant/inference LoRA (reference assistant_lora.py; fuse/unfuse
        # flow base_model.py:396-411): assistant is FUSED for training and
        # unfused for sampling; an inference lora is the opposite.
        self._assistant_lora = None
        self._inference_lora = None
        self._uncond_lora = None
        mpath = getattr(cfg.model, "lora_path", None)
        apath = cfg.model.assistant_lora_path or cfg.model.model_kwargs.get(
            "assistant_lora_path"
        )
        ipath = cfg.model.inference_lora_path or cfg.model.model_kwargs.get(
            "inference_lora_path"
        )
        upath = cfg.model.unconditional_lora_path or cfg.model.model_kwargs.get(
            "unconditional_lora_path"
        )
        arapath = cfg.model.accuracy_recovery_adapter
        if apath or ipath or mpath or upath or arapath:
            from ai_toolkit_tpu.adapters.lora import merge_lora
            from ai_toolkit_tpu.io.lora_file import load_lora_file

            main0 = self._main_component(variables)
            km = self._key_map(model, variables[main0])
            inv0 = self._inverse_key_map(model, km)
            if mpath:
                # permanent merge into the base (reference ModelConfig
                # lora_path) — never unfused, unlike the assistant lora
                tree, _ = load_lora_file(mpath, inv0)
                variables[main0] = merge_lora(variables[main0], tree)
                print(f"base lora merged at load: {mpath}")
            if apath:
                tree, _ = load_lora_file(apath, inv0)
                variables[main0] = merge_lora(variables[main0], tree)
                self._assistant_lora = (main0, tree)
                print(f"assistant lora fused for training: {apath}")
            if ipath:
                tree, _ = load_lora_file(ipath, inv0)
                self._inference_lora = (main0, tree)
                print(f"inference lora loaded (fused only for sampling): {ipath}")
            if upath:
                # active ONLY on the unconditional CFG pass at sampling time,
                # never trained (reference ideogram4.py:276-355, pipeline:381)
                tree, _ = load_lora_file(upath, inv0)
                self._uncond_lora = tree
                print(f"unconditional lora loaded (uncond CFG pass only): {upath}")
            if arapath:
                # accuracy recovery adapter (reference util/quantize.py:281-400):
                # a frozen always-active LoRA/LoKr that compensates the
                # quantization error of the base. It lives in the FROZEN
                # variable tree — never merged (merging through int8 would
                # re-lose the accuracy it recovers), never trained; a trainable
                # lora stacks with it via rank-concat (train/state.py).
                from safetensors import safe_open

                with safe_open(arapath, framework="numpy") as f:
                    first = next(iter(f.keys()), "")
                    is_lokr = first.startswith("lycoris") and any(
                        "lokr" in k for k in f.keys()
                    )
                if is_lokr:
                    from ai_toolkit_tpu.io.lora_file import load_lokr_file

                    if (self.cfg.network and self.cfg.network.type == "lokr"):
                        raise ValueError(
                            "lokr-format ARA cannot be combined with a "
                            "trainable lokr network (one lokr collection)."
                        )
                    tree, _ = load_lokr_file(arapath, inv0)
                    variables = {**variables, "lokr": tree}
                else:
                    tree, _ = load_lora_file(arapath, inv0)
                    variables = {**variables, "lora": tree}
                print(f"accuracy recovery adapter active: {arapath}")

        # 1b. optional weight-only quantization of the frozen diffusion core
        # (backend by model.qtype: qfloat8 / qint8 / uint4 / ...)
        if cfg.model.quantize:
            from ai_toolkit_tpu.adapters.quantize import quantize_params, quantized_bytes

            main = self._main_component(variables)
            rest, quant = quantize_params(variables[main], qtype=cfg.model.qtype)
            variables = {**variables, main: rest, "quant": quant}
            print(f"quantized base: {quantized_bytes(quant)/1e9:.2f} GB ({cfg.model.qtype})")
        if cfg.model.quantize_te and not (
            getattr(self, "ti_trigger", None) or getattr(self, "train_te", False)
        ):
            # frozen text encoders store quantized under qtype_te and are
            # dequantized transiently inside encode_prompt (reference
            # quantize_te); skipped when the TE trains
            from ai_toolkit_tpu.adapters.quantize import (
                dequantize_tree,
                quantize_params as _qp,
            )

            main = self._main_component(variables)
            te_quant = {}
            for comp in list(variables):
                if comp in (main, "vae", "quant") or not isinstance(variables[comp], dict):
                    continue
                rest, q = _qp(variables[comp], qtype=cfg.model.qtype_te)
                if q:
                    variables = {**variables, comp: rest}
                    te_quant[comp] = q
            if te_quant:
                orig_encode = model.encode_prompt

                def encode_with_dequant(vs, prompts, _orig=orig_encode, _tq=te_quant):
                    vs = {
                        **vs,
                        **{c: dequantize_tree(vs[c], q) for c, q in _tq.items()},
                    }
                    return _orig(vs, prompts)

                model.encode_prompt = encode_with_dequant
                print(f"quantized TEs: {sorted(te_quant)} ({cfg.model.qtype_te})")

        # 2. mesh + sharding of frozen base
        mesh = make_mesh(cfg.mesh)
        self.mesh = mesh
        if (
            "sp" in mesh.axis_names
            and mesh.shape["sp"] > 1
            and hasattr(model, "enable_sequence_parallel")
        ):
            # context parallelism for video models: tokens shard over 'sp',
            # block self-attention becomes ring attention
            model.enable_sequence_parallel(mesh)
        rules = model.partition_rules()
        var_specs = apply_rules(variables, mesh, rules)
        variables = jax.device_put(variables, named_sharding_tree(var_specs, mesh))
        # optional host-offload of frozen weights (reference layer_offloading /
        # MemoryManager path; here XLA streams pinned_host inputs per step)
        from ai_toolkit_tpu.parallel.offload import offload_model_variables

        variables = offload_model_variables(variables, cfg.model, mesh=mesh)

        # 2b. frozen ControlNet/T2I assistant (reference
        # adapter_assist_name_or_path, SDTrainer.py:1403-1498): control-image
        # residuals guide training; the assistant itself is never trained
        self._assist_net = None
        assist = tc.adapter_assist_name_or_path or cfg.extras.get(
            "adapter_assist_name_or_path"
        )
        if assist and hasattr(model, "unet_config"):
            from ai_toolkit_tpu.adapters.t2i_adapter import init_t2i_adapter

            net, params = init_t2i_adapter(
                model.unet_config, jax.random.fold_in(rng, 77),
                image_size=8 * model.vae_config.downscale,
                downscale=model.vae_config.downscale,
            )
            if os.path.isfile(str(assist)):
                from ai_toolkit_tpu.adapters.custom_adapter import load_custom_adapter

                loaded, _ = load_custom_adapter(str(assist))
                if loaded:
                    params = loaded
            self._assist_net = (net, params)
            print(f"assistant adapter active: {assist}")

        # 3. schedule (+ user overrides, e.g. weighting_table / shift)
        sched_overrides = dict(tc.extras.get("scheduler_params") or {})
        if tc.num_train_timesteps != 1000:
            sched_overrides.setdefault("num_train_timesteps", tc.num_train_timesteps)
        if cfg.model.is_v_pred:
            sched_overrides.setdefault("prediction_type", "v_prediction")
        schedule = get_schedule(tc.noise_scheduler, cfg.model.arch, **sched_overrides)

        # 4. trainable (LoRA / full fine-tune)
        trainable, key_map, fmt, prefix = self._build_trainable(model, variables, rng)
        if tc.learnable_snr_gos and not model.is_flow_matching:
            from ai_toolkit_tpu.train.step import init_lsnr_state

            trainable["lsnr"] = init_lsnr_state()

        # 5. optimizer + lr schedule
        lr = self._lr_schedule(tc)
        if tc.do_paramiter_swapping and tc.optimizer.startswith("automagic"):
            tc.optimizer_params.setdefault(
                "paramiter_swapping", tc.paramiter_swapping_factor
            )
        # per-group learning rates (reference unet_lr / text_encoder_lr /
        # adapter_lr / embedding_lr, config_modules.py:381-386): one
        # multi_transform over top-level trainable collections
        group_lr = {
            "te": getattr(tc, "text_encoder_lr", None),
            "emb": getattr(tc, "embedding_lr", None),
            "adapter": getattr(tc, "adapter_lr", None),
            "unet": getattr(tc, "unet_lr", None),
            "refiner": getattr(tc, "refiner_lr", None),
        }
        group_lr = {k: v for k, v in group_lr.items() if v}
        if group_lr:
            import optax

            def _label(key: str) -> str:
                if key == "lora_refiner":
                    return "refiner" if "refiner" in group_lr else "default"
                if key.startswith("lora_te") or key == "te_full":
                    return "te" if "te" in group_lr else "default"
                if key == "emb":
                    return "emb" if "emb" in group_lr else "default"
                if key in ("ip", "ip_proj", "adapter", "t2i"):
                    return "adapter" if "adapter" in group_lr else "default"
                if key in ("lora", "loha", "lokr", "dora") or key == self._main_component(variables):
                    return "unet" if "unet" in group_lr else "default"
                return "default"

            labels = {k: _label(k) for k in trainable}
            txs = {"default": get_optimizer(tc.optimizer, lr, tc.optimizer_params, tc.max_grad_norm)}
            for g, glr in group_lr.items():
                if g in labels.values():
                    txs[g] = get_optimizer(
                        tc.optimizer, self._lr_schedule(tc, base_lr=glr),
                        tc.optimizer_params, tc.max_grad_norm,
                    )
            used = {v for v in labels.values()}
            tx = optax.multi_transform({k: v for k, v in txs.items() if k in used or k == "default"}, labels)
        else:
            tx = get_optimizer(tc.optimizer, lr, tc.optimizer_params, tc.max_grad_norm)
        state = TrainState.create(variables, trainable, tx, use_ema=tc.ema_config.use_ema)

        # 6. checkpoints + resume
        ckpt = CheckpointManager(
            self.save_root, self.job_name,
            max_step_saves_to_keep=cfg.save.max_step_saves_to_keep,
            fmt=fmt, prefix=prefix, key_map=key_map,
            dtype=np.float16 if cfg.save.dtype in ("float16", "fp16") else np.float32,
        )
        self.ckpt = ckpt
        inverse = self._inverse_key_map(model, key_map) if key_map else None
        start_step = 0
        te_inverse: dict[str, dict] = {}
        for k in trainable:
            if k.startswith("lora_te"):
                from ai_toolkit_tpu.io.sd_import import clip_lora_key_map

                fwd = clip_lora_key_map(trainable[k])
                inv = {v: p for p, v in fwd.items()}
                inv.update({v.replace(".", "_"): p for p, v in fwd.items()})
                te_inverse[k] = inv
        if "lorm" in trainable:
            # lorm resume needs its own inverse map: scanned stacks were
            # written per-layer as '<dotted>.<l>' and must restack via the
            # '#' convention; 2D factors map 1:1
            inv_lorm: dict[str, str] = {}

            def _walk_lorm(node, pre):
                for k, v in node.items():
                    if isinstance(v, dict) and "a" in v:
                        p = pre + [k]
                        sp, dp = "/".join(p), ".".join(p)
                        a = v["a"]
                        if getattr(a, "ndim", 2) == 3:
                            for l in range(a.shape[0]):
                                inv_lorm[f"{dp}.{l}"] = f"{sp}#{l}"
                        else:
                            inv_lorm[dp] = sp
                    elif isinstance(v, dict):
                        _walk_lorm(v, pre + [k])

            _walk_lorm(trainable["lorm"], [])
            inverse = inv_lorm
        resumed_lora, resumed_te, resume_step = ckpt.load_latest_split(inverse, te_inverse)
        if resumed_lora is not None and "lorm" in trainable:
            # shapes must match the freshly-factored tree (same base + same
            # extract knobs — SVD is deterministic)
            cur = jax.tree.map(lambda x: x.shape, trainable["lorm"])
            new = jax.tree.map(lambda x: x.shape, resumed_lora)
            if cur == new:
                state = state.replace(trainable={
                    **trainable, "lorm": jax.tree.map(jnp.asarray, resumed_lora)})
                start_step = resume_step
                print(f"resumed LoRM factors at step {resume_step}")
            else:
                print("lorm resume shape mismatch — starting fresh")
        elif resumed_lora is not None and "lora" in trainable:
            cur = jax.tree.map(lambda x: x.shape, trainable["lora"])
            new = jax.tree.map(lambda x: x.shape, resumed_lora)
            shape_ok = cur == new
            if not shape_ok:
                print("resume checkpoint has different network shape — starting fresh "
                      "(reference skips the optimizer in this case too)")
            if shape_ok:
                new_trainable = {"lora": jax.tree.map(jnp.asarray, resumed_lora)}
                if "lsnr" in trainable:
                    # keep the learnable-SNR cell (its optimizer is in-graph);
                    # reference reloads learnable_snr.json on resume (:1898)
                    new_trainable["lsnr"] = trainable["lsnr"]
                    snr_json = os.path.join(self.save_root, "learnable_snr.json")
                    if os.path.isfile(snr_json):
                        import json as _json

                        with open(snr_json) as f:
                            saved = _json.load(f)
                        new_trainable["lsnr"] = {
                            **trainable["lsnr"],
                            "params": {k: jnp.asarray(float(v))
                                       for k, v in saved.items()},
                        }
                        print("resumed learnable_snr.json")
                for k in trainable:
                    if not k.startswith("lora_te"):
                        continue
                    got = resumed_te.get(k)
                    if got is not None and (
                        jax.tree.map(lambda x: x.shape, trainable[k])
                        == jax.tree.map(lambda x: x.shape, got)
                    ):
                        new_trainable[k] = jax.tree.map(jnp.asarray, got)
                        print(f"resumed {k} (TE LoRA)")
                    else:
                        new_trainable[k] = trainable[k]  # shape drift: fresh TE lora
                if "ctrl" in trainable:
                    # control_lora: restore the x_embedder expansion from the
                    # same file (saved as transformer.x_embedder.weight)
                    from ai_toolkit_tpu.adapters.control_lora import (
                        load_control_lora_expansion,
                        upgrade_expansion,
                    )

                    img_in_key = next(iter(trainable["ctrl"]))
                    got = load_control_lora_expansion(
                        ckpt.latest_save_path(), img_in_key
                    )
                    if got is not None:
                        want = trainable["ctrl"][img_in_key]["w"].shape[0]
                        got[img_in_key]["w"] = jnp.asarray(
                            upgrade_expansion(got[img_in_key]["w"], want)
                        )
                        new_trainable["ctrl"] = got
                        print("resumed control_lora x_embedder expansion")
                for k in trainable:
                    # carry any remaining trainable collections (fresh values
                    # when the save file has no entry for them)
                    new_trainable.setdefault(k, trainable[k])
                state = state.replace(trainable=new_trainable)
                start_step = resume_step
                opt_state, ema, _ = ckpt.load_opt_state(
                    {"opt_state": state.opt_state, "ema": state.ema, "step": np.int64(0)}
                )
                if opt_state is not None:
                    state = state.replace(opt_state=opt_state, ema=ema)
                state = state.replace(step=jnp.asarray(start_step, jnp.int32))
                print(f"resumed from step {start_step}")

        self._ctrl_variables = variables

        # 7. data
        loader, text_cache = self._build_data(model, variables)

        # 8. train step (jitted with shardings)
        step_cfg = TrainStepConfig.from_train_config(tc)
        if getattr(model, "x0_prediction", False) or getattr(model, "noise_scale", 1.0) != 1.0:
            from dataclasses import replace as _dc_replace

            step_cfg = _dc_replace(
                step_cfg,
                x0_target=bool(getattr(model, "x0_prediction", False)),
                model_noise_scale=float(getattr(model, "noise_scale", 1.0)),
            )
        if getattr(model, "multistage", False) and tc.switch_boundary_every > 1:
            from dataclasses import replace as _dc_replace

            step_cfg = _dc_replace(
                step_cfg,
                stage_boundary=float(getattr(model, "stage_boundary", 0.875)),
                switch_every=int(tc.switch_boundary_every),
            )
        if getattr(model, "refiner", None) is not None:
            # reference refiner routing (BaseSDTrainProcess.py:1168-1175 +
            # 1428-1459): with train_unet the prepared batch DOUBLES so every
            # sample trains through both ranges (base half below the split,
            # refiner half above — double_refiner_batch); without, all
            # timesteps land in the refiner range and only it runs
            from dataclasses import replace as _dc_replace

            start_at = float(getattr(cfg.model, "refiner_start_at", 0.5))
            if tc.train_unet:
                model.refiner_mode = "split"
                step_cfg = _dc_replace(step_cfg, refiner_double=True,
                                       refiner_start_at=start_at)
            else:
                model.refiner_mode = "all"
                n_train = int(getattr(schedule, "num_train_timesteps", 1000))
                step_cfg = _dc_replace(
                    step_cfg,
                    min_denoising_steps=max(step_cfg.min_denoising_steps,
                                            round(n_train * start_at)))
            print(f"refiner active (mode={model.refiner_mode}, start_at={start_at})")
        predict_fn = getattr(model, "predict_train", model.predict)
        if getattr(self, "custom_adapter", None) is not None:
            _base_predict, _runtime = predict_fn, self.custom_adapter

            def predict_fn(vars_, noisy, t, cond):  # noqa: F811
                v2, c2 = _runtime.apply(vars_, cond)
                return _base_predict(v2, noisy, t, c2)
        # split-jit: frozen params are input-only (no output copy), small state
        # donated; model_variables buffers stay valid for encode/sample closures.
        guidance_kind = tc.extras.get("guidance_loss") or cfg.extras.get("guidance_loss")
        _GUIDED = ("targeted", "targeted_polarity", "direct", "tnt", "targeted_flow")
        base = None  # custom train-step factory (guidance / mean-flow paths)
        if guidance_kind == "polarity" or guidance_kind in _GUIDED:
            # paired-image guidance: batches must carry unconditional_latents
            from ai_toolkit_tpu.train.slider import (
                make_guided_train_step,
                make_polarity_train_step,
            )

            nw = float(tc.extras.get("network_weight", 1.0))
            if guidance_kind == "polarity":
                base = make_polarity_train_step(predict_fn, schedule, step_cfg, network_weight=nw)
            else:
                base = make_guided_train_step(
                    guidance_kind, predict_fn, schedule, step_cfg, network_weight=nw
                )
        elif guidance_kind == "concept_replacer":
            from ai_toolkit_tpu.train.slider import make_concept_replacer_train_step

            base = make_concept_replacer_train_step(
                predict_fn, schedule, step_cfg,
                network_weight=float(tc.extras.get("network_weight", 1.0)),
            )
        elif self.custom_adapter is not None and self.custom_adapter.adapter_type == "mean_flow":
            from ai_toolkit_tpu.train.mean_flow import make_mean_flow_train_step

            base = make_mean_flow_train_step(
                predict_fn, schedule, step_cfg,
                flow_ratio=float((cfg.adapter or {}).get("flow_ratio", 0.25)),
            )
        # DFE perceptual latent loss (reference SDTrainer.py:623-683;
        # train.diffusion_feature_extractor_path/_weight). Missing weight file
        # -> random-init feature net (offline), still a fixed projection loss.
        aux_loss_fn = None
        dfe_path = tc.diffusion_feature_extractor_path or tc.latent_feature_extractor_path
        if dfe_path is not None:
            dfe_w = float(
                tc.diffusion_feature_extractor_weight
                if tc.diffusion_feature_extractor_path
                else tc.latent_feature_loss_weight
            )
            if isinstance(dfe_path, str) and dfe_path.split(":")[0] in (
                    "v7", "v8", "v7-tiny", "v8-tiny"):
                # pixel-space TIPSv2 DPT perceptual loss (reference DFE 7/8)
                from ai_toolkit_tpu.models.dfe import load_dfe7, make_dfe7_loss

                module, dfe_params, partial = load_dfe7(dfe_path)
                _vfrozen = {k: v for k, v in variables.items()
                            if k in ("vae", "params")}

                def _decode(lat, _m=model, _v=_vfrozen):
                    return _m.decode_latents(_v, lat)

                aux_loss_fn = make_dfe7_loss(module, dfe_params, schedule,
                                             dfe_w, _decode,
                                             partial_step=partial)
                print(f"DFE perceptual loss active (tipsv2 "
                      f"{'v8 partial-step' if partial else 'v7'}, weight {dfe_w})")
            else:
                from ai_toolkit_tpu.models.dfe import load_dfe, make_dfe_loss

                in_ch = getattr(model, "vae_config", None)
                in_ch = getattr(in_ch, "latent_channels", 4)
                real = dfe_path if isinstance(dfe_path, str) and os.path.isfile(dfe_path) else None
                if real is None:
                    print(f"DFE: no weight file at {dfe_path!r} — random-init feature net")
                module, dfe_params, dfe_ver = load_dfe(real, in_ch)
                aux_loss_fn = make_dfe_loss(module, dfe_params, dfe_ver, schedule, dfe_w)
                print(f"DFE perceptual loss active (v{dfe_ver}, weight {dfe_w})")
        if base is not None:
            _inner = jax.jit(
                lambda mv, tr, os_, ema, st, batch, rng, image_seq_len=None: (
                    lambda s2: ((s2[0].trainable, s2[0].opt_state, s2[0].ema, s2[0].step), s2[1])
                )(base(TrainState(step=st, model_variables=mv, trainable=tr, opt_state=os_,
                                  ema=ema, tx=tx), batch, rng, image_seq_len)),
                static_argnames=("image_seq_len",),
            )

            def train_step(state, batch, rng, image_seq_len=None):
                (tr, os_, ema, st), metrics = _inner(
                    state.model_variables, state.trainable, state.opt_state, state.ema,
                    state.step, batch, rng, image_seq_len=image_seq_len,
                )
                return state.replace(trainable=tr, opt_state=os_, ema=ema, step=st), metrics
        else:
            decode_fn = None
            if step_cfg.train_turbo:
                if any(d.cache_latents or d.cache_latents_to_disk
                       for d in cfg.datasets):
                    raise ValueError(
                        "train_turbo decodes to pixels in-graph — set "
                        "cache_latents: false on every dataset so batches "
                        "carry raw images")

                def decode_fn(vars_, lats):
                    return model.decode_latents(vars_, lats)
            train_step = make_jitted_train_step(
                predict_fn, schedule, step_cfg, tx, aux_loss_fn=aux_loss_fn,
                decode_fn=decode_fn,
            )

        # 9. validation setup (fixed batch + fixed rng -> comparable loss curve)
        val_batch, val_seq_len, eval_step = None, None, None
        if cfg.validation.validate_every > 0:
            from ai_toolkit_tpu.train.step import make_eval_step

            ds0 = loader.datasets[0]
            vb = ds0.build_batches(cfg.train.batch_size, shuffle=False)[0]
            raw_val = loader._load_batch(ds0, vb)
            val_batch = self._prepare_batch(model, raw_val, text_cache, step_cfg)
            val_seq_len = val_batch.pop("image_seq_len", None)
            eval_step = make_eval_step(predict_fn, schedule, step_cfg)

        # 10. first sample
        if not tc.disable_sampling and not tc.skip_first_sample and cfg.sample.prompts:
            self._sample(state, start_step)

        # profiling (reference torch_profiler / Timer): jax trace when requested
        profile_dir = os.environ.get("AIT_PROFILE_DIR")
        if profile_dir:
            from jax import profiler as _profiler

            _profiler.start_trace(profile_dir)
            print(f"jax profiler tracing to {profile_dir}")

        # 10. the loop
        data_iter = iter(loader)
        rng_train = jax.random.key(seed + 1)
        t_last = time.time()
        losses: list[float] = []
        final_metrics: dict = {}
        # input-pipeline overlap: batch N+1 is prepared while the device runs
        # step N (JAX async dispatch); the per-step loss stays a device scalar
        # and is only fetched at log/UI points, so the host never blocks on
        # the step unless it needs the number (reference Timer shows the same
        # data/step split; this is the TPU-idiomatic overlap).
        with self.timer("data"):
            raw = next(data_iter)
            next_batch = self._prepare_batch(model, raw, text_cache, step_cfg)
        consecutive_oom = 0
        for step in range(start_step, tc.steps):
            batch = next_batch
            seq_len = batch.pop("image_seq_len", None)
            try:
                with self.timer("step"):
                    state, metrics = train_step(state, batch, rng_train, image_seq_len=seq_len)
                consecutive_oom = 0
            except Exception as e:  # OOM resilience (reference :2627-2648):
                # skip the batch, keep state, abort after 3 consecutive
                msg = str(e)
                if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                    consecutive_oom += 1
                    print(f"step {step + 1}: device OOM — skipping batch "
                          f"({consecutive_oom}/3)")
                    if consecutive_oom >= 3:
                        raise RuntimeError(
                            "aborting after 3 consecutive OOM steps"
                        ) from e
                    if step + 1 < tc.steps:
                        raw = next(data_iter)
                        next_batch = self._prepare_batch(model, raw, text_cache, step_cfg)
                    continue
                raise
            if step + 1 < tc.steps:
                with self.timer("data"):
                    raw = next(data_iter)
                    next_batch = self._prepare_batch(model, raw, text_cache, step_cfg)
            loss_dev = metrics["loss"]
            losses.append(loss_dev)
            if tc.show_turbo_outputs and "turbo_pixels" in metrics:
                # debug view of the one-step turbo reconstruction
                # (reference SDTrainer.py:478: shows it every step)
                px = np.asarray(metrics["turbo_pixels"][0])
                px = np.clip((px + 1.0) * 127.5, 0, 255).astype(np.uint8)
                tdir = os.path.join(self.save_root, "turbo_outputs")
                os.makedirs(tdir, exist_ok=True)
                save_image_atomic(px, os.path.join(tdir, f"step_{step + 1}.webp"))
            if tc.max_loss_debug and "max_loss_skipped" in metrics:
                if float(metrics["max_loss_skipped"]) > 0:
                    print(f"max_loss: step {step + 1} batch exceeded "
                          f"{tc.max_loss} — update zeroed")
            want_loss_now = (
                self.progress_hook is not None
                or self.ui.enabled
                or (step + 1) % cfg.logging.log_every == 0
                or step == start_step
            )
            loss = float(loss_dev) if want_loss_now else None
            final_metrics = {"loss": loss_dev}

            if self.progress_hook:
                self.progress_hook(step + 1, loss)
            if self.ui.enabled:
                self.ui.on_step(step + 1, loss)
            if self.ui.enabled:
                if self.ui.should_stop():
                    print("stop requested by UI")
                    self._save(state, step + 1)
                    self.ui.finish(status="stopped")
                    return {"final_loss": loss, "steps": step + 1, "stopped": True}
                if self.ui.should_save_now():
                    self._save(state, step + 1)
                if self.ui.should_sample_now():
                    self._sample(state, step + 1)
            if (step + 1) % cfg.logging.log_every == 0 or step == start_step:
                dt = (time.time() - t_last) / max(1, min(cfg.logging.log_every, step + 1 - start_step))
                t_last = time.time()
                lr_now = tc.lr
                self.logger.log(
                    {"loss": np.mean(losses[-cfg.logging.log_every :]), "lr": lr_now,
                     "sec_per_step": dt}, step + 1,
                )
                print(f"step {step + 1}/{tc.steps} loss={loss:.4f} ({dt:.2f}s/step)")
            if cfg.performance_log_every and (step + 1) % cfg.performance_log_every == 0:
                print(self.timer.summary())
            if eval_step is not None and (step + 1) % cfg.validation.validate_every == 0:
                with self.timer("validate"):
                    val_loss = float(
                        eval_step(
                            state.model_variables, state.trainable, val_batch,
                            jax.random.key(cfg.validation.seed), image_seq_len=val_seq_len,
                        )
                    )
                self.logger.log({"val_loss": val_loss}, step + 1)
                print(f"  val_loss={val_loss:.4f}")
            if cfg.save.save_every and (step + 1) % cfg.save.save_every == 0 and step + 1 < tc.steps:
                self._save(state, step + 1)
            if (
                not tc.disable_sampling
                and cfg.sample.sample_every
                and (step + 1) % cfg.sample.sample_every == 0
                and step + 1 < tc.steps
            ):
                self._sample(state, step + 1)

        if profile_dir:
            from jax import profiler as _profiler

            _profiler.stop_trace()

        # 11. final save + sample
        self._final_state = state  # introspection/tests
        self._save(state, tc.steps, final=True)
        if not tc.disable_sampling and cfg.sample.prompts:
            self._sample(state, tc.steps)
        self.logger.finish()
        self.ui.finish()
        if cfg.save.push_to_hub and cfg.save.hf_repo_id:
            self._push_to_hub()
        final_loss = final_metrics.get("loss")
        return {
            "final_loss": float(final_loss) if final_loss is not None else None,
            "steps": tc.steps,
        }

    # ---- helpers ----

    def _build_trainable(self, model, variables, rng):
        cfg = self.cfg
        net = cfg.network
        if (net is None and cfg.adapter
                and cfg.adapter.get("type") in ("control_lora", "i2v")
                and cfg.adapter.get("lora_config")):
            # reference control_lora/i2v configs nest the network under
            # adapter.lora_config (config_modules.py:321-325)
            from ai_toolkit_tpu.config.modules import NetworkConfig

            net = NetworkConfig.from_dict(dict(cfg.adapter["lora_config"]))
        main_key = self._main_component(variables)
        if cfg.adapter and cfg.adapter.get("type") in ("ip_adapter", "ip_adapter_plus"):
            from ai_toolkit_tpu.adapters.ip_adapter import init_ip_adapter
            from ai_toolkit_tpu.models.text_encoders.clip_vision import (
                CLIPVisionConfig,
                CLIPVisionModel,
            )

            vis_cfg = (
                CLIPVisionConfig.tiny()
                if cfg.model.model_kwargs.get("size") == "tiny"
                else CLIPVisionConfig.vit_h()
            )
            self.vision_tower = CLIPVisionModel(vis_cfg)
            vkey = jax.random.fold_in(rng, 99)
            sz = vis_cfg.image_size
            variables["clip_vision"] = self.vision_tower.init(
                vkey, jnp.zeros((1, sz, sz, 3))
            )["params"]
            self.vision_size = sz
            # plus variant: patch tokens through a perceiver resampler
            # (reference ip-adapter-plus, toolkit/ip_adapter.py Resampler)
            self.ip_plus = cfg.adapter.get("type") == "ip_adapter_plus" or bool(
                cfg.adapter.get("is_plus")
            )
            n_tokens = int(cfg.adapter.get("num_tokens", 16 if self.ip_plus else 4))
            rdim = int(cfg.adapter.get("resampler_dim", min(768, vis_cfg.hidden_size)))
            if model.is_flow_matching and hasattr(model, "dit_config"):
                # IP-Adapter on the flux family (reference ip_adapter.py:
                # 508-556 is_flux: Resampler output_dim = DiT hidden; per-
                # block decoupled KV via CustomIPFluxAttnProcessor2_0)
                from ai_toolkit_tpu.adapters.ip_adapter import (
                    Resampler,
                    build_flux_ip_collection,
                )

                hid = int(model.dit_config.hidden_size)
                proj = Resampler(
                    cross_dim=hid, n_tokens=n_tokens, dim=rdim,
                    depth=int(cfg.adapter.get("resampler_depth", 4)),
                    heads=int(cfg.adapter.get("resampler_heads", max(1, rdim // 64))),
                )
                proj_params = proj.init(
                    jax.random.fold_in(rng, 98),
                    jnp.zeros((1, 5, vis_cfg.hidden_size)))["params"]
                self.ip_plus = True  # flux ip always feeds patch tokens
                ip = build_flux_ip_collection(
                    variables[main_key], hid, jax.random.fold_in(rng, 98),
                    init="random",
                    scale=float(cfg.adapter.get("scale", 1.0)),
                )
            else:
                ip, proj_params, proj = init_ip_adapter(
                    variables[self._main_component(variables)],
                    model.unet_config.cross_attention_dim,
                    vis_cfg.hidden_size if self.ip_plus else vis_cfg.projection_dim,
                    n_tokens,
                    jax.random.fold_in(rng, 98),
                    plus=self.ip_plus,
                    resampler_dim=rdim,
                    resampler_depth=int(cfg.adapter.get("resampler_depth", 4)),
                    resampler_heads=int(cfg.adapter.get("resampler_heads", max(1, rdim // 64))),
                )
            model.ip_proj = proj
            self.ip_mode = True
            print(f"IP-Adapter: {sum(1 for _ in jax.tree.leaves(ip)) // 3} cross-attn sites, "
                  f"{n_tokens} tokens")
            return {"ip": ip, "ip_proj": proj_params}, None, "ip_adapter", ""
        if cfg.adapter and cfg.adapter.get("type") == "text_encoder":
            # full text-encoder swap training (reference custom_adapter type
            # 'text_encoder'): a trainable TE copy runs in-graph while the
            # diffusion core stays frozen
            te_key = next(k for k in ("clip", "t5", "te") if k in variables)
            self.train_te = True
            print(f"text_encoder swap: training a full copy of '{te_key}'")
            return ({"te_full": jax.tree.map(jnp.asarray, variables[te_key])},
                    None, "kohya", "")
        if cfg.adapter and cfg.adapter.get("type") == "ilora":
            # InstantLoRA (reference toolkit/models/ilora.py): per-sample LoRA
            # weights generated from vision embeds; only the generator trains
            from ai_toolkit_tpu.adapters.custom_adapter import CustomAdapterRuntime
            from ai_toolkit_tpu.adapters.ilora import (
                ILoRAGenerator,
                build_ilora_spec,
                make_ilora_apply,
            )
            from ai_toolkit_tpu.models.text_encoders.clip_vision import (
                CLIPVisionConfig,
                CLIPVisionModel,
            )

            vis_cfg = (
                CLIPVisionConfig.tiny()
                if cfg.model.model_kwargs.get("size") == "tiny"
                else CLIPVisionConfig.vit_h()
            )
            self.vision_tower = CLIPVisionModel(vis_cfg)
            sz = vis_cfg.image_size
            variables["clip_vision"] = self.vision_tower.init(
                jax.random.fold_in(rng, 99), jnp.zeros((1, sz, sz, 3))
            )["params"]
            self.vision_size = sz
            spec = LoRASpec.from_network_config(net, target_patterns=model.lora_targets())
            base_lora = build_lora(variables[main_key], spec, rng)
            ispec = build_ilora_spec(base_lora)
            gen = ILoRAGenerator(
                total=ispec.total,
                head_dim=int(cfg.adapter.get("head_dim", 512)),
                num_heads=int(cfg.adapter.get("num_heads", 1)),
            )
            params = gen.init(
                jax.random.fold_in(rng, 98), jnp.zeros((1, 4, vis_cfg.hidden_size))
            )["params"]
            ctx_key = "txt" if hasattr(model, "dit_config") else "context"
            self.custom_adapter = CustomAdapterRuntime(
                "ilora", gen, ctx_key,
                vars_apply=make_ilora_apply(ispec, base_lora, gen),
            )
            n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
            print(f"InstantLoRA: generating {ispec.total:,} lora weights/sample "
                  f"from {len(ispec.entries)} modules; {n:,} generator params")
            return {"adapter": params}, None, "custom_adapter", ""
        if cfg.adapter and cfg.adapter.get("type") == "subpixel":
            # subpixel adapter (reference toolkit/models/subpixel_adapter.py):
            # the model trains directly in pixel-shuffle space — the VAE swaps
            # for a parameterless pixel unshuffle, fresh in/out projections
            # train (x_embedder/proj_out hijack, :18-125), and a control lora
            # covers the rest of the DiT (img_in/proj excluded, :268-272)
            from ai_toolkit_tpu.adapters.custom_adapter import CustomAdapterRuntime

            if not hasattr(model, "enable_subpixel"):
                raise ValueError(
                    f"subpixel adapter needs a flux-family model, not {cfg.model.arch}"
                )
            if cfg.model.quantize:
                raise ValueError("subpixel adapter is incompatible with a "
                                 "quantized base (swaps img_in/final_proj)")
            f = int(cfg.adapter.get("subpixel_downscale_factor",
                                    cfg.adapter.get("downscale_factor", 8)))
            io = model.enable_subpixel(jax.random.fold_in(rng, 31), f)

            def subpixel_vars_apply(params, variables_, cond):
                # shadow the frozen projections with the trainable ones
                return (
                    {**variables_, main_key: {**variables_[main_key], **params}},
                    cond,
                )

            self.custom_adapter = CustomAdapterRuntime(
                "subpixel", None, "txt", vars_apply=subpixel_vars_apply
            )
            trainable = {"adapter": io}
            if net:
                spec = LoRASpec.from_network_config(net, target_patterns=model.lora_targets())
                spec.ignore_if_contains = list(spec.ignore_if_contains or []) + [
                    "img_in", "final_proj",
                ]
                trainable["lora"] = build_lora(variables[main_key], spec, rng)
            n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(trainable))
            print(f"CustomAdapter[subpixel]: factor {f}, {n:,} trainable params")
            return trainable, None, "custom_adapter", ""
        if cfg.adapter and cfg.adapter.get("type") in (
            "decorator",
            "redux", "te_augmenter", "vision_direct", "clip_fusion", "single_value",
            "photo_maker", "photo_maker_full", "mean_flow", "t2i", "llm_adapter",
        ):
            # CustomAdapter umbrella (reference toolkit/custom_adapter.py:104-286)
            from ai_toolkit_tpu.adapters.custom_adapter import init_custom_adapter

            atype = cfg.adapter["type"]
            ctx_key = "txt" if hasattr(model, "dit_config") else "context"
            if ctx_key == "txt":
                ctx_dim = model.dit_config.context_dim
            else:
                ctx_dim = model.unet_config.cross_attention_dim
            if atype == "t2i":
                cfg.adapter["_unet_channels"] = list(model.unet_config.block_out_channels)
                cfg.adapter.setdefault("downscale", model.vae_config.downscale)
            if atype == "llm_adapter":
                # reference toolkit/models/llm_adapter.py: an LLM replaces the
                # text path through a trainable context_embedder projection;
                # num_cloned_blocks > 0 (trainable cloned DiT blocks) is not
                # implemented — refuse loudly rather than silently ignore.
                if int(cfg.adapter.get("num_cloned_blocks", 0)):
                    raise NotImplementedError(
                        "llm_adapter num_cloned_blocks > 0 is not supported"
                    )
                from ai_toolkit_tpu.models.text_encoders import LLMConfig, LLMEncoder
                from ai_toolkit_tpu.utils.tokenizer import load_tokenizer

                kind = cfg.adapter.get("llm", "qwen2")
                if cfg.model.model_kwargs.get("size") == "tiny":
                    lcfg = LLMConfig.tiny()
                else:
                    lcfg = {
                        "llama": LLMConfig.llama31_8b,
                        "gemma2": LLMConfig.gemma2_2b,
                    }.get(kind, LLMConfig.qwen25_7b)()
                self.llm_encoder = LLMEncoder(lcfg)
                lp = cfg.adapter.get("name_or_path") or ""
                self.llm_seq_len = int(
                    cfg.adapter.get("num_tokens")
                    or (512 if hasattr(model, "dit_config") else 256)
                )
                self.llm_tokenizer = load_tokenizer(
                    lp, "tokenizer", vocab_size=lcfg.vocab_size, eos_id=1,
                    max_len=self.llm_seq_len,
                )
                llm_params = self.llm_encoder.init(
                    jax.random.fold_in(rng, 97), jnp.zeros((1, 8), jnp.int32)
                )["params"]
                if lp and os.path.isdir(lp):
                    from ai_toolkit_tpu.io.dit_importers import (
                        _merge_imported,
                        load_safetensors_dir,
                    )
                    from ai_toolkit_tpu.io.sd_import import llm_rules
                    from ai_toolkit_tpu.io.torch_import import torch_to_tree

                    flat = load_safetensors_dir(lp)
                    tree, unmatched = torch_to_tree(flat, llm_rules(gemma=kind == "gemma2"))
                    if unmatched:
                        print(f"llm_adapter import: {len(unmatched)} unmatched")
                    llm_params = _merge_imported(llm_params, tree, "llm_adapter te")
                variables["llm_te"] = llm_params
                cfg.adapter["_llm_hidden"] = lcfg.d_model
            vision_dim = 0
            if (atype not in ("single_value", "mean_flow", "t2i", "decorator", "llm_adapter")
                    and cfg.adapter.get("image_encoder_arch") == "pixtral"):
                # exact pixtral tower (reference pixtral_vision.py; vd_adapter
                # image_encoder_arch == 'pixtral')
                from ai_toolkit_tpu.models.text_encoders.pixtral_vision import (
                    PixtralVisionConfig,
                    PixtralVisionEncoder,
                    load_pixtral_encoder,
                )

                ppath = cfg.adapter.get("image_encoder_path") or ""
                if ppath and os.path.isdir(ppath):
                    self.vision_tower, ptree = load_pixtral_encoder(ppath)
                    variables["clip_vision"] = ptree
                    pix_cfg = self.vision_tower.cfg
                else:
                    pix_cfg = (PixtralVisionConfig.tiny()
                               if cfg.model.model_kwargs.get("size") == "tiny"
                               else PixtralVisionConfig())
                    self.vision_tower = PixtralVisionEncoder(pix_cfg)
                    sz0 = min(pix_cfg.image_size, 256)
                    variables["clip_vision"] = self.vision_tower.init(
                        jax.random.fold_in(rng, 99), jnp.zeros((1, sz0, sz0, 3))
                    )["params"]
                self.vision_size = min(pix_cfg.image_size, 512)
                self.vision_is_pixtral = True
                vision_dim = pix_cfg.hidden_size
            elif atype not in ("single_value", "mean_flow", "t2i", "decorator", "llm_adapter"):
                from ai_toolkit_tpu.models.text_encoders.clip_vision import (
                    CLIPVisionConfig,
                    CLIPVisionModel,
                )

                vis_cfg = (
                    CLIPVisionConfig.tiny()
                    if cfg.model.model_kwargs.get("size") == "tiny"
                    else CLIPVisionConfig.vit_h()
                )
                self.vision_tower = CLIPVisionModel(vis_cfg)
                sz = vis_cfg.image_size
                variables["clip_vision"] = self.vision_tower.init(
                    jax.random.fold_in(rng, 99), jnp.zeros((1, sz, sz, 3))
                )["params"]
                self.vision_size = sz
                vision_dim = (
                    vis_cfg.projection_dim
                    if atype in ("photo_maker", "photo_maker_full")
                    else vis_cfg.hidden_size
                )
            is_flux_family = model.is_flow_matching and hasattr(model, "dit_config")
            if atype == "vision_direct" and is_flux_family:
                cfg.adapter["_flux_family"] = True
                cfg.adapter["_dit_hidden"] = int(model.dit_config.hidden_size)
            params, runtime = init_custom_adapter(
                cfg.adapter, ctx_dim, ctx_key, vision_dim, jax.random.fold_in(rng, 98)
            )
            self.custom_adapter = runtime
            trainable = {"adapter": params}
            if atype == "vision_direct" and is_flux_family:
                # flux path (vd_adapter.py:568-578 + CustomFluxVDAttnProcessor):
                # per-block decoupled KV over the joint query, init from the
                # frozen block K weights
                from ai_toolkit_tpu.adapters.ip_adapter import build_flux_ip_collection

                only_double = bool(cfg.adapter.get("flux_only_double", False))
                pixtral = cfg.adapter.get("image_encoder_arch") == "pixtral"
                mid = (int(model.dit_config.hidden_size)
                       if (pixtral and only_double) else vision_dim)
                trainable["ip"] = build_flux_ip_collection(
                    variables[main_key], mid, jax.random.fold_in(rng, 101),
                    init="from_qkv", only_double=only_double,
                    scale=float(cfg.adapter.get("scale", 1.0)),
                )
            elif atype == "vision_direct":
                from ai_toolkit_tpu.adapters.ip_adapter import build_ip_collection

                trainable["ip"] = build_ip_collection(
                    variables[main_key], ctx_dim,
                    scale=float(cfg.adapter.get("scale", 1.0)),
                )
            if atype == "mean_flow" and net:
                # reference MeanFlowAdapter bundles a LoRA with the time embed
                # (toolkit/models/mean_flow_adapter.py:160-185)
                spec = LoRASpec.from_network_config(net, target_patterns=model.lora_targets())
                trainable["lora"] = build_lora(variables[main_key], spec, rng)
            n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(trainable))
            print(f"CustomAdapter[{atype}]: {n:,} trainable params")
            return trainable, None, "custom_adapter", ""
        if cfg.embedding:
            # textual inversion: trainable token bank, trigger -> virtual ids
            from ai_toolkit_tpu.adapters.embedding import TriggerTokenizer, init_embedding_bank

            emb_cfg = cfg.embedding
            trigger = emb_cfg.get("trigger", cfg.trigger_word or "sks")
            n_vec = int(emb_cfg.get("vectors", 4))
            hidden = model.clip_config.hidden_size
            init_from = None
            if emb_cfg.get("init_words"):
                ids = model.tokenizer.encode(emb_cfg["init_words"])
                tok_table = np.asarray(variables["clip"]["token_embedding"])
                valid = [i for i in ids if i != model.tokenizer.eos_id]
                if valid:
                    init_from = tok_table[valid]
            bank = init_embedding_bank(n_vec, hidden, init_from=init_from)
            model.tokenizer = TriggerTokenizer(
                model.tokenizer, trigger, model.clip_config.vocab_size, n_vec
            )
            self.ti_trigger = trigger
            print(f"textual inversion: trigger '{trigger}' -> {n_vec} vectors")
            return {"emb": {"bank": jnp.asarray(bank)}}, None, "embedding", ""
        if net is None and cfg.adapter and cfg.adapter.get("type") in (
            "control_lora", "i2v",
        ):
            raise ValueError(
                f"{cfg.adapter['type']} requires network: {{type: lora, ...}} "
                "(or adapter.lora_config, the reference's layout)"
            )
        if net is None or net.type in ("full", "fine_tune"):
            # full fine-tune: train the diffusion component itself; optional
            # module filters (reference model.only_if_contains)
            tree = variables[main_key]
            inc = cfg.model.only_if_contains or (net.only_if_contains if net else None)
            exc = cfg.model.ignore_if_contains or (net.ignore_if_contains if net else None)
            if inc or exc:
                tree = _filter_param_tree(tree, inc, exc)
                n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
                print(f"full fine-tune (filtered to {n:,} params)")
            return {main_key: tree}, None, "kohya", "lora_transformer"
        ctrl_extra: dict = {}
        if cfg.adapter and cfg.adapter.get("type") == "control_lora":
            # control-lora (reference toolkit/models/control_lora_adapter.py +
            # custom_adapter.py:258,624-700): full-rank img_in input expansion
            # over packed control channels ('ctrl' collection, ops/layers.py)
            # + a LoRA over the rest of the DiT (img_in excluded)
            from dataclasses import replace as _dc_replace

            from ai_toolkit_tpu.adapters.control_lora import (
                init_control_lora,
                load_control_lora_expansion,
                upgrade_expansion,
            )

            dc = getattr(model, "dit_config", None)
            if dc is None or not hasattr(dc, "control_channels"):
                raise ValueError(
                    f"control_lora needs a flux-family DiT arch, not {cfg.model.arch}"
                )
            if dc.control_channels:
                raise ValueError(
                    f"control_lora needs a base arch; {cfg.model.arch} already "
                    "consumes control channels (kontext/flex2-style)"
                )
            nc = int(cfg.adapter.get("num_control_images", 1))
            inpaint = bool(cfg.adapter.get("has_inpainting_input", False))
            ctrl = init_control_lora(
                dc.hidden_size, dc.in_channels, jax.random.fold_in(rng, 41),
                num_control_images=nc, has_inpainting_input=inpaint,
            )
            img_in_key = next(iter(ctrl))
            lp = cfg.adapter.get("name_or_path")
            if lp and os.path.isfile(str(lp)):
                got = load_control_lora_expansion(str(lp), img_in_key)
                if got is not None:
                    ctrl[img_in_key]["w"] = jnp.asarray(upgrade_expansion(
                        got[img_in_key]["w"], ctrl[img_in_key]["w"].shape[0]
                    ))
                    print(f"control_lora: restored x_embedder expansion from {lp}")
            extra_packed = int(ctrl[img_in_key]["w"].shape[0])
            model.dit_config = _dc_replace(dc, control_channels=extra_packed)
            model.control_lora_inpaint = inpaint
            self.control_lora_mode = {
                "inpaint": inpaint,
                "num_control": nc,
                "control_image_dropout": float(
                    cfg.adapter.get("control_image_dropout", 0.0)
                ),
                "invert_inpaint_mask_chance": float(
                    cfg.adapter.get("invert_inpaint_mask_chance", 0.0)
                ),
            }
            ctrl_extra["ctrl"] = ctrl
            print(
                f"CustomAdapter[control_lora]: +{extra_packed} packed input ch "
                f"on {img_in_key}" + (" (inpainting)" if inpaint else "")
            )
        if cfg.adapter and cfg.adapter.get("type") == "i2v":
            # i2v adapter (reference toolkit/models/i2v_adapter.py +
            # custom_adapter.py:265): graft image cross-attn KV + the vision
            # MLPProj (and optionally the first-frame FrameEmbedder) onto a
            # frozen t2v wan base. The wan DiT already defines the i2v leaves
            # (WanConfig.i2v) — flip the config, train only the new leaves as
            # a {'dit': overlay} collection + a LoRA over the rest.
            from dataclasses import replace as _dc_replace

            from ai_toolkit_tpu.adapters.i2v import (
                init_frame_embedder_ctrl,
                new_leaves,
                scale_added_kv,
            )
            from ai_toolkit_tpu.models.text_encoders.clip_vision import (
                CLIPVisionConfig,
                CLIPVisionModel,
            )

            dc = getattr(model, "dit_config", None)
            if dc is None or not hasattr(dc, "i2v"):
                raise ValueError(
                    f"i2v adapter needs a wan-family arch, not {cfg.model.arch}"
                )
            if dc.i2v:
                raise ValueError(
                    "i2v adapter needs a t2v base; "
                    f"{cfg.model.arch} is already an i2v arch"
                )
            model.dit_config = _dc_replace(dc, i2v=True)
            model.dit = type(model.dit)(model.dit_config)
            # frozen vision tower feeding the new image-KV path
            if model.clip_vision is None:
                model.vision_config = (
                    CLIPVisionConfig.tiny()
                    if cfg.model.model_kwargs.get("size") == "tiny"
                    else CLIPVisionConfig.vit_h()
                )
                model.clip_vision = CLIPVisionModel(model.vision_config)
                sz = model.vision_config.image_size
                variables["clip_vision"] = model.clip_vision.init(
                    jax.random.fold_in(rng, 99), jnp.zeros((1, sz, sz, 3))
                )["params"]
            # diff a fresh i2v init against the t2v params -> only-new leaves
            cfg_i2v = model.dit_config
            pt_, ph_, pw_ = cfg_i2v.patch_size
            n_tok = pt_ * ph_ * pw_ * 2
            full = model.dit.init(
                jax.random.fold_in(rng, 42),
                jnp.zeros((1, n_tok, cfg_i2v.in_channels * pt_ * ph_ * pw_)),
                jnp.zeros((1, 8, cfg_i2v.text_dim)),
                jnp.zeros((1,)),
                jnp.zeros((1, n_tok, cfg_i2v.head_dim // 2, 2, 2)),
                jnp.zeros((1, 4, cfg_i2v.img_cond_dim)),
            )["params"]
            overlay = scale_added_kv(new_leaves(full, variables[main_key]))
            if not overlay:
                raise ValueError("i2v adapter found no new leaves to train "
                                 "(base already carries the i2v params?)")
            ctrl_extra[main_key] = jax.tree.map(
                lambda x: x.astype(jnp.float32), overlay
            )
            start_frame = bool(cfg.adapter.get("i2v_do_start_frame", False))
            if start_frame:
                ctrl_extra["ctrl"] = init_frame_embedder_ctrl(
                    cfg_i2v.dim, model.vae_config.latent_channels,
                    cfg_i2v.patch_size, jax.random.fold_in(rng, 43),
                    mask_channels=model.vae_config.temporal_downscale,
                )
            self.i2v_mode = {"start_frame": start_frame}
            n = sum(int(np.prod(np.shape(x)))
                    for x in jax.tree.leaves(overlay))
            print(f"CustomAdapter[i2v]: {n:,} grafted i2v params"
                  + (" + first-frame embedder" if start_frame else ""))
        spec = LoRASpec.from_network_config(net, target_patterns=model.lora_targets())
        if getattr(self, "control_lora_mode", None) is not None:
            # the expansion replaces any lora on img_in (reference always
            # appends 'x_embedder' to ignore_if_contains, :140-144)
            spec.ignore_if_contains = list(spec.ignore_if_contains or []) + ["img_in"]
        if getattr(self, "i2v_mode", None) is not None:
            # reference ignores patch_embedding + the grafted add-kv modules
            # (i2v_adapter.py:346-354)
            spec.ignore_if_contains = list(spec.ignore_if_contains or []) + [
                "patch_embedding", "cross_k_img", "cross_v_img", "img_emb",
            ]
        if net.type == "lorm":
            # low-rank module REPLACEMENT (reference toolkit/lorm.py via
            # do_lorm, BaseSDTrainProcess.py:209-211, 1930-1933): SVD-factor
            # the targeted kernels into a trainable 'lorm' collection and
            # DELETE the base kernels — the compressed model itself trains
            from ai_toolkit_tpu.adapters.lorm import (
                LoRMSpec,
                build_lorm,
                count_lorm_params,
                lorm_stats_str,
            )

            kw = net.network_kwargs or {}
            lspec = LoRMSpec(
                extract_mode=str(kw.get("lorm_extract_mode",
                                        kw.get("extract_mode", "ratio"))),
                extract_mode_param=float(kw.get("lorm_extract_mode_param",
                                                kw.get("extract_mode_param", 0.25))),
                parameter_threshold=int(kw.get("parameter_threshold", 0)),
                target_patterns=spec.target_patterns,
                ignore_if_contains=tuple(
                    list(spec.ignore_if_contains or []) + ["proj_in", "proj_out"]),
            )
            lorm, slim, stats = build_lorm(variables[main_key], lspec)
            if not stats["modules"]:
                raise ValueError("lorm: no kernels matched the target patterns")
            variables[main_key] = jax.tree.map(jnp.asarray, slim)
            print(lorm_stats_str(stats))
            print(f"LoRM trainable: {count_lorm_params(lorm):,} params")
            return {"lorm": jax.tree.map(jnp.asarray, lorm)}, None, "peft", "transformer"
        if net.type in ("lokr", "lycoris_lokr"):
            from ai_toolkit_tpu.adapters.lycoris import build_lokr

            lokr = build_lokr(variables[main_key], spec, rng, factor=net.lokr_factor)
            print(f"LoKr: {sum(1 for _ in jax.tree.leaves(lokr)) // 3} modules")
            return {"lokr": lokr}, None, "kohya", "lora_transformer"
        if net.type in ("loha", "lycoris_loha"):
            from ai_toolkit_tpu.adapters.lycoris import build_loha

            loha = build_loha(variables[main_key], spec, rng)
            print(f"LoHa: {sum(1 for _ in jax.tree.leaves(loha)) // 5} modules (rank {spec.rank})")
            return {"loha": loha}, None, "kohya", "lora_transformer"
        if net.type == "dora":
            from ai_toolkit_tpu.adapters.lycoris import build_dora

            dora = build_dora(variables[main_key], spec, rng)
            key_map = self._key_map(model, dora)
            return {"dora": dora}, key_map, "kohya", (
                "lora_transformer" if model.is_flow_matching else "lora_unet"
            )
        lora = build_lora(variables[main_key], spec, rng)
        n = count_lora_params(lora)
        print(f"LoRA: {len(lora)} top-level modules, {n:,} trainable params (rank {spec.rank})")
        trainable_extra: dict = {}
        if cfg.train.train_text_encoder:
            # TE LoRA (reference per-TE param groups, lora_special.py:762):
            # trains the text encoder(s) in-graph alongside the unet lora
            te_spec = LoRASpec(
                rank=spec.rank, alpha=spec.alpha,
                target_patterns=[r"layer_\d+/(q|k|v|out|fc1|fc2)$"],
            )
            for i, te_key in enumerate(k for k in ("clip", "clip2") if k in variables):
                # SDXL: use_text_encoder_1/2 gate which TE trains (reference
                # stable_diffusion_model.py:2668-2674 param filtering)
                if i == 0 and not getattr(cfg.model, "use_text_encoder_1", True):
                    continue
                if i == 1 and not getattr(cfg.model, "use_text_encoder_2", True):
                    continue
                te_lora = build_lora(variables[te_key], te_spec, jax.random.fold_in(rng, 50 + i))
                if te_lora:
                    trainable_extra[f"lora_te{i + 1}" if "clip2" in variables else "lora_te"] = (
                        te_lora
                    )
                    print(f"TE LoRA on {te_key}: {count_lora_params(te_lora):,} params")
            self.train_te = True
        if "refiner" in variables and getattr(cfg.train, "train_refiner", True):
            # reference trains the refiner alongside (BaseSDTrainProcess.py:
            # 754-756); LoRA attaches with the same spec, own lr group
            ref_lora = build_lora(variables["refiner"], spec, jax.random.fold_in(rng, 77))
            if ref_lora:
                trainable_extra["lora_refiner"] = ref_lora
                print(f"refiner LoRA: {count_lora_params(ref_lora):,} params")
        key_map = self._key_map(model, lora)
        # per-arch export layout override (e.g. qwen_image -> ComfyUI
        # 'diffusion_model.' keys, reference qwen_image.py:420-433)
        layout = model.lora_key_layout()
        if layout != "kohya":
            fmt = layout
        else:
            fmt = "peft" if model.is_flow_matching else "kohya"
        prefix = "lora_transformer" if model.is_flow_matching else "lora_unet"
        return {"lora": lora, **trainable_extra, **ctrl_extra}, key_map, fmt, prefix

    @staticmethod
    def _main_component(variables: dict) -> str:
        for k in ("dit", "unet", "transformer"):
            if k in variables:
                return k
        return next(iter(variables))

    @staticmethod
    def _key_map(model, lora):
        from ai_toolkit_tpu.models.flux_dit import flux_lora_key_map
        from ai_toolkit_tpu.models.unet import unet_lora_key_map

        if hasattr(model, "lora_key_map"):
            return model.lora_key_map(lora)
        if model.is_flow_matching:
            return flux_lora_key_map(lora)
        if hasattr(model, "unet_config"):
            return unet_lora_key_map(lora, num_levels=len(model.unet_config.block_out_channels))
        return {}  # non-unet eps models: internal dotted paths

    @staticmethod
    def _inverse_key_map(model, key_map):
        """external key -> internal path, expanding '{L}' stack placeholders.

        Models may provide ``lora_inverse_key_map``; the flux-family fallback
        only applies when the config actually has double/single depths (a
        blind call used to crash lumina2-style configs without them)."""
        if hasattr(model, "lora_inverse_key_map"):
            return model.lora_inverse_key_map(key_map)
        if (model.is_flow_matching and hasattr(model, "dit_config")
                and hasattr(model.dit_config, "depth_double")):
            from ai_toolkit_tpu.models.flux_dit import flux_inverse_key_map

            return flux_inverse_key_map(
                key_map, model.dit_config.depth_double, model.dit_config.depth_single
            )
        inverse = {v: k for k, v in key_map.items()}
        inverse.update({v.replace(".", "_"): k for k, v in key_map.items()})
        return inverse

    def _lr_schedule(self, tc, base_lr=None):
        import optax

        base = tc.lr if base_lr is None else base_lr
        total = tc.steps
        params = dict(tc.lr_scheduler_params or {})
        name = (tc.lr_scheduler or "constant").lower()
        if name == "constant":
            return base
        if name == "linear":
            return optax.linear_schedule(base, params.get("end_lr", 0.0), total)
        if name == "cosine":
            return optax.cosine_decay_schedule(base, total, alpha=params.get("alpha", 0.0))
        if name == "cosine_with_restarts":
            n = params.get("num_cycles", 3)
            per = max(1, total // n)
            return optax.join_schedules(
                [optax.cosine_decay_schedule(base, per) for _ in range(n)],
                [per * (i + 1) for i in range(n - 1)],
            )
        if name == "constant_with_warmup":
            warm = params.get("num_warmup_steps", 100)
            return optax.join_schedules(
                [optax.linear_schedule(0.0, base, warm), optax.constant_schedule(base)], [warm]
            )
        if name == "step":
            every = params.get("step_size", max(1, total // 3))
            gamma = params.get("gamma", 0.1)
            return lambda step: base * gamma ** (step // every)
        return base

    def _build_data(self, model, variables):
        cfg = self.cfg
        if not cfg.datasets:
            raise ValueError("no datasets configured")

        # snap requested frame counts onto the model's temporal grid (causal
        # video VAEs want td*k+1; reference get_frame_count_snapper)
        if hasattr(model, "frame_count_snapper"):
            for d in cfg.datasets:
                if getattr(d, "num_frames", 1) > 1:
                    snapped = model.frame_count_snapper(d.num_frames)
                    if snapped != d.num_frames:
                        print(f"dataset {d.folder_path}: num_frames "
                              f"{d.num_frames} -> {snapped} (VAE temporal grid)")
                        d.num_frames = snapped

        # loss scale for regularization datasets (reference reg_weight)
        if cfg.train.reg_weight != 1.0:
            for d in cfg.datasets:
                if d.is_reg:
                    d.loss_multiplier = d.loss_multiplier * cfg.train.reg_weight

        img_mult = cfg.train.img_multiplier
        standardize = cfg.train.standardize_images
        encode_jit = jax.jit(lambda imgs: model.encode_images(variables, imgs))

        def encode_fn(imgs: np.ndarray) -> np.ndarray:
            if standardize:
                ax = tuple(range(1, imgs.ndim))
                mu = imgs.mean(axis=ax, keepdims=True)
                sd = np.maximum(imgs.std(axis=ax, keepdims=True), 1e-6)
                imgs = (imgs - mu) / sd
            if img_mult != 1.0:
                imgs = imgs * img_mult
            return np.asarray(encode_jit(jnp.asarray(imgs)))

        self._encode_pixels = encode_fn

        cache_dir = None
        if all(d.cache_latents or d.cache_latents_to_disk for d in cfg.datasets):
            cache_dir = os.path.join(self.save_root, "latent_cache")
            from ai_toolkit_tpu.data.dataset import FolderDataset

            for i, dcfg in enumerate(cfg.datasets):
                ds = FolderDataset(dcfg, model.bucket_divisibility, cfg.trigger_word, seed=42 + i)
                with self.timer("latent_cache"):
                    cache_latents(ds.items, encode_fn, cache_dir, batch_size=cfg.train.batch_size)

        loader = build_dataloader(
            cfg.datasets, cfg.train.batch_size, model.bucket_divisibility,
            trigger_word=cfg.trigger_word,
            latent_cache_dir=cache_dir,
            encode_fn=None if cache_dir else encode_fn,
            want_pixels=self.ip_mode or self.cfg.train.train_turbo or (
                self.custom_adapter is not None
                and self.custom_adapter.adapter_type
                not in ("single_value", "mean_flow", "t2i", "decorator",
                        "llm_adapter", "subpixel")
            ),
        )
        text_cache = TextEmbedCache(lambda prompts: model.encode_prompt(variables, prompts))
        self._split_text_cache = None
        if self.cfg.train.short_and_long_captions_encoder_split:
            # SDXL dual-encoder split (SDTrainer.py:1528-1532): cache keyed by
            # the (short, long) pair; short -> TE1, long -> TE2
            if self.cfg.model.arch not in ("sdxl", "ssd", "vega"):
                print("config warning: short_and_long_captions_encoder_split "
                      "is SDXL-only (reference gates on sd.is_xl); ignored for "
                      f"arch {self.cfg.model.arch}")
            else:
                def encode_split(keys: list[str]) -> dict:
                    pairs = [k.split("\x1f", 1) for k in keys]
                    return model.encode_prompt(
                        variables, [p[1] for p in pairs],
                        prompts_te1=[p[0] for p in pairs],
                    )

                self._split_text_cache = TextEmbedCache(encode_split)
        return loader, text_cache

    def _prepare_batch(self, model, raw: dict, text_cache: TextEmbedCache, step_cfg) -> dict:
        if self.cfg.train.short_and_long_captions and not raw.get("is_reg"):
            raw = double_short_long_batch(raw)
        if getattr(model, "refiner_mode", None) == "split":
            raw = double_refiner_batch(raw)
        if getattr(model, "multi_control", False):
            # multi-reference edit (qwen_image_edit_plus): the rope table needs
            # the per-batch reference count before it is built below
            model._n_ctrl = int(raw["control_pixels_multi"].shape[1]) if (
                "control_pixels_multi" in raw) else 1
        captions = raw["captions"]
        p_drop = self.cfg.train.prompt_dropout_prob
        if p_drop > 0:
            # unconditional-training dropout (reference prompt_dropout_prob);
            # the short-caption half of a doubled batch is exempt
            n_droppable = raw.get("_n_long", len(captions))
            r = np.random.default_rng(None)
            captions = [
                "" if (i < n_droppable and r.random() < p_drop) else c
                for i, c in enumerate(captions)
            ]
        p_sat = self.cfg.train.prompt_saturation_chance
        if p_sat > 0 and not raw.get("is_reg"):
            # repeat short captions to ~77 tokens (BaseSDTrainProcess.py:1076)
            r = np.random.default_rng(None)
            captions = [
                ", ".join([c] * (77 // max(len(c.split()), 1) + 1))
                if c and len(c.split()) < 77 and r.random() < p_sat
                else c
                for c in captions
            ]
        if getattr(self, "ti_trigger", None) or getattr(self, "train_te", False):
            # textual inversion / TE training: raw token ids into the step
            # (the text encoder runs in-graph so grads reach emb/lora_te)
            ids = np.stack([model.tokenizer.encode(c) for c in captions])
            cond = {"input_ids": jnp.asarray(ids)}
        elif getattr(self, "_split_text_cache", None) is not None and not (
            self.cfg.train.short_and_long_captions and not raw.get("is_reg")
        ):
            # encoder split: TE1 reads the short caption, TE2 the long one.
            # Mutually exclusive with the doubling knob by the reference's own
            # config comment (config_modules.py:470: "if above is NOT true").
            shorts = raw.get("captions_short") or captions
            cond = self._split_text_cache.get(
                [f"{s}\x1f{l}" for s, l in zip(shorts, captions)]
            )
            cond = {k: jnp.asarray(v) for k, v in cond.items()}
        else:
            cond = text_cache.get(captions)
            cond = {k: jnp.asarray(v) for k, v in cond.items()}
        latents_np = raw["latents"]
        if self.cfg.train.latent_multiplier != 1.0:
            latents_np = latents_np * self.cfg.train.latent_multiplier
        if getattr(self.cfg.train, "do_blank_stabilization", False):
            # blank-prompt samples train against zeroed latents
            # (BaseSDTrainProcess.py:1397-1402)
            blank = np.asarray([1.0 if c.strip() else 0.0 for c in captions],
                               latents_np.dtype if hasattr(latents_np, "dtype") else np.float32)
            latents_np = latents_np * blank.reshape((-1,) + (1,) * (np.ndim(latents_np) - 1))
        batch: dict = {
            "latents": jnp.asarray(latents_np),
            "loss_multiplier": jnp.asarray(raw["loss_multiplier"]),
        }
        if self.cfg.train.train_turbo:
            if "pixels" not in raw:
                raise ValueError("train_turbo needs raw image batches "
                                 "(cache_latents: false)")
            batch["pixel_values"] = jnp.asarray(raw["pixels"])
        cos_reg = self.cfg.train.content_or_style_reg
        if cos_reg and cos_reg != self.cfg.train.content_or_style:
            # reg batches sample from their own timestep skew
            batch["is_reg_flag"] = jnp.asarray(1.0 if raw.get("is_reg") else 0.0)
        if self.cfg.train.force_consistent_noise and "noise_seed" in raw:
            batch["noise_seed"] = jnp.asarray(raw["noise_seed"])
        if self.cfg.train.loss_target == "unaugmented" and "unaugmented_pixels" in raw:
            # encode the pre-augmentation images as the regression target
            # (reference SDTrainer.py:815-821)
            ul = self._encode_pixels(raw["unaugmented_pixels"])
            if self.cfg.train.latent_multiplier != 1.0:
                ul = ul * self.cfg.train.latent_multiplier
            batch["unaugmented_latents"] = jnp.asarray(ul)
        lat = raw["latents"]
        extra_ctx_tokens = 0
        if self.custom_adapter is not None:
            atype = self.custom_adapter.adapter_type
            if atype == "single_value":
                vals = raw.get("extra_values") or self.cfg.adapter.get("extra_values", [1.0])
                nv = int(self.cfg.adapter.get("num_tokens", 1))
                arr = np.asarray(vals, np.float32).reshape(-1)[:nv]
                cond["extra_values"] = jnp.tile(jnp.asarray(arr)[None], (lat.shape[0], 1))
                extra_ctx_tokens = nv
            elif atype == "mean_flow":
                # r is sampled inside the train step; reserve rope slots for
                # the appended r tokens
                extra_ctx_tokens = int(self.cfg.adapter.get("num_tokens", 1))
            elif atype == "decorator":
                extra_ctx_tokens = int(self.cfg.adapter.get("num_tokens", 4))
            elif atype == "llm_adapter":
                # LLM replaces the text path: encode captions with the LLM and
                # hand its states to the context_embedder inside the step
                if not hasattr(self, "_llm_encode"):
                    enc, lv = self.llm_encoder, self._ctrl_variables["llm_te"]
                    self._llm_encode = jax.jit(
                        lambda ids, m: enc.apply({"params": lv}, ids, m)
                    )
                ids = np.stack([self.llm_tokenizer.encode(c) for c in captions])
                mask = (ids != self.llm_tokenizer.eos_id).astype(np.int32)
                mask[:, 0] = 1  # keep at least one visible token
                states = self._llm_encode(jnp.asarray(ids), jnp.asarray(mask))
                if isinstance(states, dict):
                    states = states["last_hidden_state"]
                cond["llm_states"] = states
                cond["llm_mask"] = jnp.asarray(mask)
                # pe must cover the REPLACED text length, not the original
                if cond.get("txt") is not None:
                    extra_ctx_tokens = int(ids.shape[1]) - int(cond["txt"].shape[1])
            elif "pixels" in raw:
                if not hasattr(self, "_vision_tokens_encode"):
                    vt, vv = self.vision_tower, self._ctrl_variables["clip_vision"]
                    sz = self.vision_size

                    if getattr(self, "vision_is_pixtral", False):
                        from ai_toolkit_tpu.models.text_encoders.pixtral_vision import (
                            PIXTRAL_MEAN,
                            PIXTRAL_STD,
                        )

                        mean = jnp.asarray(PIXTRAL_MEAN)
                        std = jnp.asarray(PIXTRAL_STD)

                        def _enc_tokens(px):
                            px = jax.image.resize(px, (px.shape[0], sz, sz, 3), "bilinear")
                            # batch pixels are [-1, 1]; reference normalize
                            # (:405) is over [0, 1] images
                            px01 = (px + 1.0) / 2.0
                            px = (px01 - mean) / std
                            tokens = vt.apply({"params": vv}, px)
                            return tokens, tokens.mean(axis=1)
                    else:
                        def _enc_tokens(px):
                            px = jax.image.resize(px, (px.shape[0], sz, sz, 3), "bilinear")
                            out = vt.apply({"params": vv}, px)
                            return out["penultimate_hidden_state"], out["pooled_output"]

                    self._vision_tokens_encode = jax.jit(_enc_tokens)
                tokens, pooled = self._encode_vision_cached(raw.get("clip_pixels", raw["pixels"]))
                cond["vision_tokens"] = tokens
                cond["vision_pooled"] = pooled
                if atype == "redux":
                    extra_ctx_tokens = int(tokens.shape[1])
                elif atype in ("clip_fusion",):
                    extra_ctx_tokens = int(self.cfg.adapter.get("num_tokens", 8))
                elif atype == "photo_maker":
                    extra_ctx_tokens = int(self.cfg.adapter.get("num_tokens", 2))
                elif atype == "photo_maker_full":
                    # trigger ("class") token positions in each caption —
                    # the FuseModule replaces these embeds in place (no
                    # appended tokens, reference photomaker.py:55-87)
                    cond["class_tokens_mask"] = jnp.asarray(
                        self._class_token_mask(model, raw["captions"])
                    )
        if model.is_flow_matching and hasattr(model, "rope_table"):
            if lat.ndim == 5:
                # video latents [B,T,h,w,C]: wan/ltx rope over (t, y, x)
                tt, h, w = lat.shape[1], lat.shape[2], lat.shape[3]
                cond["pe"] = model.rope_table(tt, h, w)
                pt, ph, pw = model.dit_config.patch_size
                batch["image_seq_len"] = (tt // pt) * (h // ph) * (w // pw)
            elif lat.ndim == 3:
                # audio latents [B, T_lat, C] (ace_step): 1D rope over time;
                # the exact AIO arch builds its own rotary tables (returns None)
                pe = model.rope_table(int(lat.shape[1]))
                if pe is not None:
                    cond["pe"] = pe
                batch["image_seq_len"] = int(lat.shape[1])
            else:
                h, w = lat.shape[1], lat.shape[2]
                cond["pe"] = model.rope_table(h, w, int(cond["txt"].shape[1]) + extra_ctx_tokens)
                cond["guidance"] = jnp.full((lat.shape[0],), 1.0)
                batch["image_seq_len"] = (h // 2) * (w // 2)
        if "audio_waveform" in raw and getattr(model, "joint_audio", False):
            # joint AV stream: encode sidecar audio to latents; its noise is
            # drawn inside the train step at the shared sigma
            if not hasattr(self, "_audio_encode"):
                variables = self._ctrl_variables
                self._audio_encode = jax.jit(
                    lambda w: model.encode_audio(variables, w)
                )
            a_lat = self._audio_encode(jnp.asarray(raw["audio_waveform"]))
            batch["audio_latents"] = a_lat
            cond["pe_audio"] = model.audio_rope_table(int(a_lat.shape[1]))
        if "pooled" in cond and hasattr(model, "added_cond"):
            d = model.vae_config.downscale
            cond["added_cond"] = model.added_cond(cond.pop("pooled"), lat.shape[1] * d, lat.shape[2] * d)
        if self.cfg.train.blank_prompt_preservation and not getattr(self, "ti_trigger", None):
            bk = [""] * len(raw["captions"])
            bcond = {k: jnp.asarray(v) for k, v in text_cache.get(bk).items()}
            if model.is_flow_matching and "pe" in cond:
                bcond["pe"] = cond["pe"]
                bcond["guidance"] = cond.get("guidance")
            batch["blank_cond"] = bcond
        if self.cfg.train.guidance_loss_target != 1.0 and not getattr(self, "ti_trigger", None):
            # anchor embeds for the target-side CFG extrapolation
            utext = [self.cfg.train.unconditional_prompt or ""] * len(raw["captions"])
            ucond = {k: jnp.asarray(v) for k, v in text_cache.get(utext).items()}
            if model.is_flow_matching and "pe" in cond:
                ucond["pe"] = cond["pe"]
                ucond["guidance"] = cond.get("guidance")
            batch["uncond_cond"] = ucond
        if self.cfg.train.do_cfg and not getattr(self, "ti_trigger", None):
            neg_text = (self.cfg.train.negative_prompt
                        or self.cfg.train.unconditional_prompt
                        or self.cfg.sample.neg or "")
            negs = [neg_text] * len(raw["captions"])
            neg_cond = {k: jnp.asarray(v) for k, v in text_cache.get(negs).items()}
            if model.is_flow_matching and "pe" in cond:
                neg_cond["pe"] = cond["pe"]
                neg_cond["guidance"] = cond.get("guidance")
            batch["neg_cond"] = neg_cond
        if self.ip_mode and "pixels" in raw:
            if not hasattr(self, "_vision_encode"):
                vt, vv = self.vision_tower, self._ctrl_variables["clip_vision"]
                sz = self.vision_size

                key = ("penultimate_hidden_state"
                       if getattr(self, "ip_plus", False) else "pooled_output")

                def _enc(px):
                    px = jax.image.resize(px, (px.shape[0], sz, sz, 3), "bilinear")
                    return vt.apply({"params": vv}, px)[key]

                self._vision_encode = jax.jit(_enc)
            cond["ip_embeds"] = self._vision_encode(jnp.asarray(raw.get("clip_pixels", raw["pixels"])))
        if "unconditional_pixels" in raw:
            batch["unconditional_latents"] = jnp.asarray(
                self._encode_control(raw["unconditional_pixels"])
            )
        ff = raw.get("first_frame")
        if ff is None and getattr(self, "i2v_mode", None) is not None:
            # i2v adapter on image batches: the image IS the first frame
            # (reference edit_batch_processed, i2v_adapter.py:554-582)
            px = raw.get("pixels")
            if px is not None:
                ff = px[:, 0] if np.ndim(px) == 5 else px
            else:
                raise ValueError(
                    "i2v adapter needs first-frame pixels: set datasets[]."
                    "do_i2v for video data or disable latent-only caching"
                )
        if ff is not None and hasattr(model, "encode_image_cond"):
            cond["img_cond"] = jnp.asarray(
                model.encode_image_cond(self._ctrl_variables, jnp.asarray(ff))
            )
        if (getattr(self, "i2v_mode", None) is not None
                and self.i2v_mode["start_frame"]):
            # first-frame latent-concat conditioning for the FrameEmbedder
            # (reference wan_utils.add_first_frame_conditioning)
            from ai_toolkit_tpu.adapters.i2v import assemble_first_frame_control

            cond["control_latents"] = jnp.asarray(assemble_first_frame_control(
                np.asarray(ff), int(lat.shape[1]), self._encode_control,
                temporal_downscale=model.vae_config.temporal_downscale,
            ))
        if self.cfg.model.arch == "flex2":
            # flex2 33-channel conditioning: [masked latents, inpaint mask,
            # control latents] with per-batch dropouts (reference
            # flex2.condition_noisy_latents); host-side assembly
            if not hasattr(self, "_flex2_rng"):
                self._flex2_rng = np.random.default_rng(1234)
            ctrl_lat = None
            if "control_pixels" in raw:
                ctrl_lat = np.asarray(self._encode_control(raw["control_pixels"]))
            keep = raw.get("inpaint_keep")
            if keep is None and "pixel_mask" in raw:
                keep = raw["pixel_mask"]  # reference falls back to the mask
            cond["control_latents"] = jnp.asarray(
                model.assemble_flex2_control(
                    np.asarray(raw["latents"]), keep, ctrl_lat, self._flex2_rng
                )
            )
        elif getattr(self, "control_lora_mode", None) is not None:
            # control_lora conditioning (reference custom_adapter.py:624-700):
            # the expanded img_in ALWAYS sees the extra channels — zeros when
            # the control is absent or dropped out
            clm = self.control_lora_mode
            if not hasattr(self, "_cl_rng"):
                self._cl_rng = np.random.default_rng(4321)
            if clm["inpaint"]:
                from ai_toolkit_tpu.adapters.control_lora import assemble_inpaint_control

                keep = raw.get("inpaint_keep")
                if keep is None and "pixel_mask" in raw:
                    keep = raw["pixel_mask"]
                cond["control_latents"] = jnp.asarray(assemble_inpaint_control(
                    np.asarray(raw["latents"]), keep, self._cl_rng,
                    clm["control_image_dropout"],
                    clm["invert_inpaint_mask_chance"],
                ))
            else:
                nc = clm["num_control"]
                lat_np = np.asarray(raw["latents"])
                b, h2, w2, c = lat_np.shape
                drop = self._cl_rng.random() < clm["control_image_dropout"]
                if drop or ("control_pixels" not in raw
                            and "control_pixels_multi" not in raw):
                    ctrl_np = np.zeros((b, h2, w2, c * nc), np.float32)
                elif nc > 1 and "control_pixels_multi" in raw:
                    cm = raw["control_pixels_multi"]  # [B, N, H, W, 3]
                    n_have = min(nc, cm.shape[1])
                    flat = np.asarray(self._encode_control(
                        cm[:, :n_have].reshape((-1,) + cm.shape[2:])
                    ))
                    per = flat.reshape((b, n_have) + flat.shape[1:])
                    # channel-concat each control (torch cat dim=1 equivalent)
                    ctrl_np = np.moveaxis(per, 1, 3).reshape(b, h2, w2, n_have * c)
                    if n_have < nc:
                        pad = np.zeros((b, h2, w2, (nc - n_have) * c), np.float32)
                        ctrl_np = np.concatenate([ctrl_np, pad], axis=-1)
                else:
                    one = np.asarray(self._encode_control(raw["control_pixels"]))
                    ctrl_np = (one if nc == 1 else np.concatenate(
                        [one] + [np.zeros_like(one)] * (nc - 1), axis=-1
                    ))
                cond["control_latents"] = jnp.asarray(ctrl_np)
        elif "control_pixels" in raw:
            if self.custom_adapter is not None and self.custom_adapter.adapter_type == "t2i":
                # trainable t2i adapter consumes raw control pixels in-graph
                cond["control_pixels"] = jnp.asarray(raw["control_pixels"])
            elif getattr(model, "multi_control", False) and "control_pixels_multi" in raw:
                # [B, N, H, W, 3] -> encode flat -> [B, N, h, w, C]
                cm = raw["control_pixels_multi"]
                bsz, n = cm.shape[:2]
                flat = np.asarray(self._encode_control(cm.reshape((-1,) + cm.shape[2:])))
                cond["control_latents"] = jnp.asarray(
                    flat.reshape((bsz, n) + flat.shape[1:])
                )
                counts = raw.get("control_counts")
                if counts is not None and int(np.min(counts)) < n:
                    # mixed reference counts: mask padded slots out of
                    # attention instead of conditioning on blank frames
                    cond["ctrl_counts"] = jnp.asarray(counts)
            else:
                cond["control_latents"] = jnp.asarray(self._encode_control(raw["control_pixels"]))
        if getattr(self, "_assist_net", None) is not None and "control_pixels" in raw:
            # frozen ControlNet/T2I assistant (reference adapter_assist_name_or_path)
            if not hasattr(self, "_assist_apply"):
                net, params = self._assist_net
                self._assist_apply = jax.jit(lambda px: net.apply({"params": params}, px))
            cond["adapter_residuals"] = self._assist_apply(jnp.asarray(raw["control_pixels"]))
        if "pixel_mask" in raw:
            # downscale pixel mask to latent resolution (area mean)
            m = raw["pixel_mask"]
            d = m.shape[1] // lat.shape[1]
            m = m.reshape(m.shape[0], lat.shape[1], d, lat.shape[2], d, 1).mean(axis=(2, 4))
            batch["mask"] = jnp.asarray(m)
        batch["cond"] = cond
        return batch

    def _encode_vision_cached(self, pixels: np.ndarray):
        """CLIP-vision encode with memory + optional disk cache.

        Reference parity: clip-image caching mixins
        (``dataloader_mixins.py`` is_caching_clip_vision_to_disk). Keys are
        content hashes of the pixel array (the loader doesn't surface file
        paths), so flips/crops cache independently — same as the reference's
        per-transform cache keys. Enable disk persistence with
        ``adapter: {cache_clip_vision_to_disk: true}``.
        """
        import hashlib

        if not hasattr(self, "_vision_cache_mem"):
            self._vision_cache_mem = {}
            self._vision_cache_dir = None
            if self.cfg.adapter and self.cfg.adapter.get("cache_clip_vision_to_disk"):
                self._vision_cache_dir = os.path.join(self.save_root, "clip_vision_cache")
                os.makedirs(self._vision_cache_dir, exist_ok=True)
        toks, pools, missing = [None] * len(pixels), [None] * len(pixels), []
        for i in range(len(pixels)):
            key = f"{hashlib.md5(np.ascontiguousarray(pixels[i]).tobytes()).hexdigest()}_{self.vision_size}"
            hit = self._vision_cache_mem.get(key)
            if hit is None and self._vision_cache_dir:
                p = os.path.join(self._vision_cache_dir, key + ".safetensors")
                if os.path.isfile(p):
                    from safetensors.numpy import load_file

                    d = load_file(p)
                    hit = (d["tokens"], d["pooled"])
                    self._vision_cache_mem[key] = hit
            if hit is None:
                missing.append((i, key))
            else:
                toks[i], pools[i] = hit
        if missing:
            t_new, p_new = self._vision_tokens_encode(
                jnp.asarray(np.stack([pixels[i] for i, _ in missing]))
            )
            t_new, p_new = np.asarray(t_new), np.asarray(p_new)
            for j, (i, key) in enumerate(missing):
                toks[i], pools[i] = t_new[j], p_new[j]
                self._vision_cache_mem[key] = (t_new[j], p_new[j])
                if self._vision_cache_dir:
                    from safetensors.numpy import save_file

                    save_file(
                        {"tokens": np.ascontiguousarray(t_new[j]),
                         "pooled": np.ascontiguousarray(p_new[j])},
                        os.path.join(self._vision_cache_dir, key + ".safetensors"),
                    )
        return jnp.asarray(np.stack(toks)), jnp.asarray(np.stack(pools))

    def _class_token_mask(self, model, captions: list[str]) -> np.ndarray:
        """[B, S] 1 where a trigger-word token sits (photo_maker_full).
        Items without the trigger mark the first content token instead."""
        trig = self.cfg.trigger_word or ""
        ids = np.stack([model.tokenizer.encode(c) for c in captions])
        core: list[int] = []
        if trig:
            empty = set(model.tokenizer.encode(""))
            core = [t for t in model.tokenizer.encode(trig) if t not in empty]
        mask = np.isin(ids, core) if core else np.zeros_like(ids, bool)
        for b in range(mask.shape[0]):
            if not mask[b].any():
                mask[b, min(1, mask.shape[1] - 1)] = True
        return mask.astype(np.int32)

    def _encode_control(self, pixels):
        if not hasattr(self, "_ctrl_encode"):
            variables = self._ctrl_variables
            self._ctrl_encode = jax.jit(lambda imgs: self.model.encode_images(variables, imgs))
        return np.asarray(self._ctrl_encode(jnp.asarray(pixels)))

    def _save(self, state: TrainState, step: int, final: bool = False):
        with self.timer("save"):
            if "emb" in state.trainable:
                from ai_toolkit_tpu.adapters.embedding import save_embedding

                bank = state.trainable["emb"]["bank"]
                if state.ema is not None and "emb" in state.ema:
                    bank = state.ema["emb"]["bank"]
                path = os.path.join(
                    self.save_root,
                    f"{self.job_name}.safetensors" if final else f"{self.job_name}_{step:09d}.safetensors",
                )
                save_embedding(np.asarray(bank), path, name=self.ti_trigger, step=step)
                print(f"saved: {path}")
                return
            if "adapter" in state.trainable:
                from ai_toolkit_tpu.adapters.custom_adapter import save_custom_adapter

                path = self.ckpt.final_path() if final else self.ckpt.path_for_step(step)
                tree = state.trainable["adapter"]
                if state.ema is not None and "adapter" in state.ema:
                    tree = state.ema["adapter"]
                meta = {"step": step}
                # bundle sibling collections (vision_direct kv, mean_flow lora)
                for sib, pre in (("ip", "vd"), ("lora", "lora")):
                    if sib not in state.trainable:
                        continue
                    flat_sib = {}
                    sib_tree = jax.tree.map(np.asarray, state.trainable[sib])
                    if sib == "ip" and any(
                        k.startswith(("double", "single")) for k in sib_tree
                    ):
                        # flux decoupled-KV: reference key layout
                        # adapter_modules.{i}.to_k_adapter.weight
                        # (vd_adapter.py state_dict via the ModuleList)
                        from ai_toolkit_tpu.adapters.ip_adapter import flux_ip_flat

                        flat_sib = flux_ip_flat(sib_tree, fmt="vd")
                    else:
                        def _w(node, prefix):
                            for k in sorted(node.keys()):
                                v = node[k]
                                if isinstance(v, dict):
                                    _w(v, f"{prefix}{k}.")
                                else:
                                    flat_sib[f"{pre}.{prefix}{k}"] = v

                        _w(sib_tree, "")
                    tree = {**jax.tree.map(np.asarray, tree), **flat_sib}
                save_custom_adapter(
                    jax.tree.map(np.asarray, tree), self.custom_adapter.adapter_type, path,
                    metadata=meta,
                )
                print(f"saved: {path}")
                return
            if "ip" in state.trainable:
                from ai_toolkit_tpu.adapters.ip_adapter import save_ip_adapter

                path = (
                    self.ckpt.final_path() if final else self.ckpt.path_for_step(step)
                )
                save_ip_adapter(
                    jax.tree.map(np.asarray, state.trainable["ip"]),
                    jax.tree.map(np.asarray, state.trainable["ip_proj"]),
                    path, metadata={"step": step},
                )
                print(f"saved: {path}")
                return
            if "lorm" in state.trainable:
                # LoRM factors in PEFT layout with internal module paths +
                # a network_type marker (the reference saves the whole
                # converted unet; our compact factor file + merge_lorm
                # reconstructs full kernels for export)
                from ai_toolkit_tpu.io.lora_file import save_lora_file

                tree = state.trainable["lorm"]
                if state.ema is not None and "lorm" in state.ema:
                    tree = state.ema["lorm"]
                if final and self.cfg.train.merge_network_on_save:
                    # reconstruct full kernels (a @ b) and export the merged
                    # model in interop layout — without this the compressed
                    # model is unusable outside this framework
                    from ai_toolkit_tpu.adapters.lorm import merge_lorm

                    main_key = self._main_component(state.model_variables)
                    merged = merge_lorm(
                        jax.tree.map(np.asarray, state.model_variables[main_key]),
                        jax.tree.map(np.asarray, tree),
                    )
                    self._export_interop(state, {main_key: merged})
                path = (
                    self.ckpt.final_path() if final else self.ckpt.path_for_step(step)
                )
                save_lora_file(
                    jax.tree.map(np.asarray, tree), path, key_map=None,
                    fmt="peft", prefix="transformer",
                    metadata={"step": step, "network_type": "lorm",
                              "software": "ai_toolkit_tpu"},
                )
                self.ckpt._save_opt_state(
                    jax.tree.map(np.asarray, state.opt_state),
                    jax.tree.map(np.asarray, state.ema) if state.ema is not None else None,
                    step,
                )
                if not final:
                    self.ckpt.clean_up_saves()
                print(f"saved: {path}")
                return
            if any(k in state.trainable for k in ("lokr", "dora", "loha")):
                key = next(k for k in ("lokr", "dora", "loha") if k in state.trainable)
                tree = state.trainable[key]
                if state.ema is not None and key in state.ema:
                    tree = state.ema[key]
                from ai_toolkit_tpu.io.lora_file import save_adapter_file

                path = (
                    self.ckpt.final_path() if final else self.ckpt.path_for_step(step)
                )
                save_adapter_file(
                    tree, key, path, key_map=self.ckpt.key_map, prefix=self.ckpt.prefix,
                    metadata={"step": step, "software": "ai_toolkit_tpu"},
                )
                print(f"saved: {path}")
                return
            if "lora" in state.trainable:
                save_tree = state.trainable["lora"]
                if state.ema is not None and "lora" in state.ema:
                    save_tree = state.ema["lora"]
                if final and self.cfg.train.merge_network_on_save:
                    # merged full model in interop layout (reference
                    # merge_network_on_save + saving.py keymap path)
                    from ai_toolkit_tpu.adapters.lora import merge_lora

                    main_key = self._main_component(state.model_variables)
                    strength = self.cfg.train.merge_network_on_save_strength
                    merged = merge_lora(
                        state.model_variables[main_key],
                        jax.tree.map(np.asarray, save_tree), multiplier=strength,
                    )
                    self._export_interop(state, {main_key: merged})
                extra_flat = None
                if ("ctrl" in state.trainable
                        and getattr(self, "control_lora_mode", None) is not None):
                    # control_lora: x_embedder expansion rides in the same
                    # file under the reference key (control_lora_adapter.py:
                    # get_state_dict 'transformer.x_embedder.weight')
                    from ai_toolkit_tpu.adapters.control_lora import (
                        control_lora_extra_flat,
                    )

                    ctree = state.trainable["ctrl"]
                    if state.ema is not None and "ctrl" in state.ema:
                        ctree = state.ema["ctrl"]
                    extra_flat = control_lora_extra_flat(
                        jax.tree.map(np.asarray, ctree)
                    )
                if getattr(self, "i2v_mode", None) is not None:
                    # i2v: grafted attn_hog/image_embedder/frame_embedder
                    # pieces in the reference layout (i2v_adapter.py:527-548)
                    from ai_toolkit_tpu.adapters.i2v import i2v_extra_flat

                    main_key = self._main_component(state.model_variables)
                    overlay = state.trainable[main_key]
                    if state.ema is not None and main_key in state.ema:
                        overlay = state.ema[main_key]
                    extra_flat = i2v_extra_flat(
                        jax.tree.map(np.asarray, overlay),
                        jax.tree.map(np.asarray, state.trainable["ctrl"])
                        if "ctrl" in state.trainable else None,
                        patch_size=self.model.dit_config.patch_size,
                    )
                te_keys = [k for k in state.trainable if k.startswith("lora_te")]
                if te_keys:
                    # kohya lora_te* entries beside the unet/transformer lora
                    from ai_toolkit_tpu.io.lora_file import flatten_lora
                    from ai_toolkit_tpu.io.sd_import import clip_lora_key_map

                    extra_flat = extra_flat or {}
                    for k in te_keys:
                        pre = {"lora_te": "lora_te", "lora_te1": "lora_te1",
                               "lora_te2": "lora_te2"}[k]
                        tree_k = jax.tree.map(np.asarray, state.trainable[k])
                        extra_flat.update(flatten_lora(
                            tree_k, key_map=clip_lora_key_map(tree_k), fmt="kohya",
                            prefix=pre,
                        ))
                path = self.ckpt.save(
                    jax.tree.map(np.asarray, save_tree), step,
                    opt_state=jax.tree.map(np.asarray, state.opt_state),
                    ema=jax.tree.map(np.asarray, state.ema) if state.ema is not None else None,
                    final=final,
                    extra_flat=extra_flat,
                )
            else:
                # full fine-tune: save component weights as flat safetensors
                # (fast step saves / resume)...
                from safetensors.numpy import save_file

                main_key = next(iter(state.trainable))
                flat = _flatten_params(jax.tree.map(np.asarray, state.trainable[main_key]))
                path = os.path.join(
                    self.save_root,
                    f"{self.job_name}.safetensors" if final else f"{self.job_name}_{step:09d}.safetensors",
                )
                save_file(flat, path, metadata={"step": str(step), "software": "ai_toolkit_tpu"})
                if final:
                    # ...and an interop HF-layout export on the final save
                    # (reference saves full models in loadable layouts,
                    # toolkit/saving.py:22-139)
                    self._export_interop(state, {main_key: state.trainable[main_key]})
            if isinstance(state.trainable, dict) and "lsnr" in state.trainable:
                # reference writes learnable_snr.json next to the checkpoint
                import json as _json

                lp = {k: float(v) for k, v in state.trainable["lsnr"]["params"].items()}
                with open(os.path.join(self.save_root, "learnable_snr.json"), "w") as f:
                    _json.dump(lp, f)
            print(f"saved: {path}")

    def _export_interop(self, state: TrainState, overrides: dict) -> None:
        """HF-layout full-model export of frozen base + trained overrides."""
        from ai_toolkit_tpu.io.full_export import export_full_model

        if "quant" in state.model_variables:
            print("interop export skipped: base model is int8-quantized "
                  "(train with quantize: false to export full weights)")
            return
        variables = {**state.model_variables, **overrides}
        out_dir = os.path.join(self.save_root, f"{self.job_name}_diffusers")
        try:
            written = export_full_model(self.model, variables, out_dir)
        except NotImplementedError as e:
            print(f"interop export skipped: {e}")
            return
        for p in written:
            print(f"exported: {p}")
        if hasattr(self.model, "unet_config"):
            # sd family: also write the A1111/Comfy-loadable LDM single file
            # (the reference's primary sd-family save format, saving.py:22-139)
            from ai_toolkit_tpu.io.ldm_single_file import export_ldm_checkpoint

            p = export_ldm_checkpoint(
                self.model, variables,
                os.path.join(self.save_root, f"{self.job_name}_ldm.safetensors"))
            print(f"exported: {p}")

    def _sample(self, state: TrainState, step: int):
        cfg = self.cfg
        from ai_toolkit_tpu.config.modules import GenerateImageConfig

        sample_dir = os.path.join(self.save_root, "samples")
        lora = state.trainable.get("lora")
        if lora is not None and state.ema is not None and "lora" in state.ema:
            lora = state.ema["lora"]
        variables = state.model_variables
        if (getattr(self, "custom_adapter", None) is not None
                and self.custom_adapter.adapter_type == "subpixel"
                and "adapter" in state.trainable):
            # subpixel: the trained projections MUST shadow the frozen ones at
            # sample time too (the base img_in no longer matches the latent
            # channel count)
            main = self._main_component(variables)
            variables = {
                **variables,
                main: {**variables[main], **state.trainable["adapter"]},
            }
        if "ctrl" in state.trainable:
            # control_lora / i2v: the input-expansion collection must be live
            # at sample time (the DiT now expects the extra channels)
            variables = {**variables, "ctrl": state.trainable["ctrl"]}
        if "lora" not in state.trainable:
            variables = {**variables, **state.trainable}
        else:
            # TE loras ride along so encode_prompt samples with the trained TEs
            te_extra = {k: v for k, v in state.trainable.items() if k.startswith("lora_te")}
            if te_extra:
                variables = {**variables, **te_extra}
        if getattr(self, "_assistant_lora", None):
            # reference base_model.py:396-411: assistant unfused for sampling
            from ai_toolkit_tpu.adapters.lora import unmerge_lora

            main, tree = self._assistant_lora
            variables = {**variables, main: unmerge_lora(variables[main], tree)}
        if getattr(self, "_inference_lora", None):
            from ai_toolkit_tpu.adapters.lora import merge_lora

            main, tree = self._inference_lora
            variables = {**variables, main: merge_lora(variables[main], tree)}
        with self.timer("sample"):
            for i, item in enumerate(cfg.sample.prompts):
                seed = cfg.sample.seed + (i if cfg.sample.walk_seed else 0)
                gen = GenerateImageConfig.from_sample(cfg.sample, item, seed)
                if getattr(gen, "ctrl_img", None) and (
                    (self.ip_mode and hasattr(self, "_vision_encode"))
                    or (self.custom_adapter is not None
                        and self.custom_adapter.adapter_type == "vision_direct"
                        and hasattr(self, "_vision_tokens_encode"))
                ):
                    # adapter-image conditioning at sample time: encode the
                    # --ctrl_img through the vision tower (reference samples
                    # with the adapter image active). [-1, 1] pixels, same
                    # convention as the training batches (data/dataset.py)
                    from PIL import Image as _Image

                    _im = _Image.open(gen.ctrl_img).convert("RGB")
                    _px = np.asarray(_im, np.float32)[None] / 127.5 - 1.0
                    if self.ip_mode:
                        gen.ip_embeds = np.asarray(
                            self._vision_encode(jnp.asarray(_px)))
                    else:
                        tok, _pool = self._vision_tokens_encode(jnp.asarray(_px))
                        ad = variables.get("adapter", {})
                        gen.ip_tokens = np.asarray(
                            self.custom_adapter.module.apply({"params": ad}, tok)
                            if self.custom_adapter.module is not None else tok)
                    gen.ctrl_img = None  # consumed as the adapter image
                try:
                    out = generate(self.model, variables, gen, lora=lora,
                                   uncond_lora=getattr(self, "_uncond_lora", None))
                except Exception as e:
                    print(f"sampling failed: {e}")
                    return
                if hasattr(self.model, "frame_count_snapper"):
                    from ai_toolkit_tpu.generation import save_video_atomic, save_wav_atomic

                    frames, wav = out
                    ext = "webp" if frames.shape[0] > 1 else gen.output_ext
                    path = os.path.join(sample_dir, f"{self.job_name}_{step:09d}_{i}.{ext}")
                    save_video_atomic(frames, path, fps=gen.fps)
                    if wav is not None:
                        save_wav_atomic(wav, os.path.splitext(path)[0] + ".wav")
                    img = frames[len(frames) // 2]
                elif hasattr(self.model, "latent_shape_audio"):
                    from ai_toolkit_tpu.generation import save_wav_atomic

                    path = os.path.join(sample_dir, f"{self.job_name}_{step:09d}_{i}.wav")
                    save_wav_atomic(
                        out, path, sample_rate=int(gen.extras.get("sample_rate", 44_100))
                    )
                    if self.logger:
                        self.logger.log({f"sample_{i}_rms": float(np.sqrt((out ** 2).mean()))},
                                        step)
                    continue
                else:
                    img = out
                    path = os.path.join(
                        sample_dir, f"{self.job_name}_{step:09d}_{i}.{gen.output_ext}"
                    )
                    save_image_atomic(img, path)
                if self.logger:
                    self.logger.log_image(img, f"sample_{i}", step)


def _double_batch_arrays(raw: dict, bs0: int) -> dict:
    """Repeat every per-sample ndarray (latents, noise seeds, masks, pixels,
    ...) along the batch axis so both halves see the same image."""
    out = dict(raw)
    for k, v in raw.items():
        if k not in ("captions", "captions_short") and isinstance(v, np.ndarray) \
                and v.ndim >= 1 and v.shape[0] == bs0:
            out[k] = np.concatenate([v, v], axis=0)
    return out


def double_short_long_batch(raw: dict) -> dict:
    """Dual-caption doubling (reference BaseSDTrainProcess.py:1037-1044 +
    1433-1451): the caption list becomes long + short, and every per-sample
    array repeats so both halves see the same image. Reg batches never reach
    here ("dont do this with regs"), so the jitted step sees at most two
    static batch shapes. ``_n_long`` marks how many leading captions are the
    long half — the short half is exempt from prompt dropout (reference
    get_caption(short_caption=True) never passes through the dropout path)."""
    bs0 = len(raw["captions"])
    out = _double_batch_arrays(raw, bs0)
    shorts = list(raw.get("captions_short") or raw["captions"])
    out["captions"] = list(raw["captions"]) + shorts
    out["captions_short"] = shorts + shorts
    out["_n_long"] = bs0
    return out


def double_refiner_batch(raw: dict) -> dict:
    """Refiner double-up (reference BaseSDTrainProcess.py:1428-1459): every
    sample trains through BOTH timestep ranges — the batch duplicates, the
    jitted step gives the first half base-range timesteps and the second half
    refiner-range (train/step.py refiner_double branch)."""
    bs0 = len(raw["captions"])
    out = _double_batch_arrays(raw, bs0)
    out["captions"] = list(raw["captions"]) * 2
    if raw.get("captions_short"):
        out["captions_short"] = list(raw["captions_short"]) * 2
    return out


def _filter_param_tree(tree, include, exclude):
    """Keep subtrees whose '/'-joined path matches an include substring (if
    given) and no exclude substring. Reference-style torch patterns like
    'transformer.transformer_blocks.' are normalized ('.'->'/', the
    'transformer.' prefix dropped, diffusers block-list names mapped onto our
    module names) so reference full-FT configs work as-is."""

    def norm(p):
        p = p.strip().strip(".")
        if p.startswith("transformer."):
            p = p[len("transformer."):]
        return p.replace(".", "/")

    def variants(p):
        out = {p}
        out.add(p.replace("single_transformer_blocks", "single_blocks"))
        out.add(p.replace("transformer_blocks", "double_blocks"))
        out.add(p.replace("transformer_blocks", "blocks"))
        return out

    inc = [v for p in (include or []) for v in variants(norm(p))]
    exc = [v for p in (exclude or []) for v in variants(norm(p))]

    def walk(node, path):
        if not isinstance(node, dict):
            keep = (not inc or any(p in path for p in inc)) and not any(
                p in path for p in exc
            )
            return node if keep else None
        out = {}
        for k, v in node.items():
            sub = walk(v, f"{path}/{k}" if path else k)
            if sub is not None and (not isinstance(sub, dict) or sub):
                out[k] = sub
        return out

    return walk(tree, "")


def _flatten_params(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_params(v, key))
        else:
            out[key] = np.ascontiguousarray(v)
    return out

    def _push_to_hub(self):
        """Upload final artifacts to HF hub (reference push_to_hub:2859)."""
        try:
            from huggingface_hub import HfApi

            api = HfApi()
            repo = self.cfg.save.hf_repo_id
            api.create_repo(repo, private=self.cfg.save.hf_private, exist_ok=True)
            final = self.ckpt.final_path()
            if os.path.isfile(final):
                api.upload_file(path_or_fileobj=final, path_in_repo=os.path.basename(final),
                                repo_id=repo)
            card = os.path.join(self.save_root, "README.md")
            with open(card, "w") as f:
                f.write(f"# {self.job_name}\n\nTrained with ai_toolkit_tpu.\n")
            api.upload_file(path_or_fileobj=card, path_in_repo="README.md", repo_id=repo)
            print(f"pushed to hub: {repo}")
        except Exception as e:
            print(f"hub push failed (offline?): {e}")
