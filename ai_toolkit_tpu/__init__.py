"""ai_toolkit_tpu — a TPU-native diffusion fine-tuning suite in JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of ostris/ai-toolkit (config-driven
LoRA / full fine-tune / textual-inversion training for image, edit, video and
audio diffusion models), designed TPU-first:

- one jit/pjit-compiled train step over a named ``jax.sharding.Mesh``
  (replaces the reference's eager hook loop,
  ``/root/reference/jobs/process/BaseSDTrainProcess.py:2526``),
- LoRA as a functional parameter overlay applied inside the forward pass
  (replaces the monkey-patched module forwards of
  ``/root/reference/toolkit/network_mixins.py:274``),
- FSDP/TP sharding in place of the reference's quantize/offload VRAM
  machinery (``/root/reference/toolkit/memory_management/``),
- a host-side bucketed data pipeline with latent/text-embed caching.

Public API mirrors the reference's YAML job-config schema (see
``/root/reference/config/examples/``).
"""

__version__ = "0.1.0"
