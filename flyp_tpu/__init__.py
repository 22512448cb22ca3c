"""flyp_tpu — a TPU-native JAX framework for contrastive fine-tuning of CLIP.

Re-implements the capabilities of the FLYP reference codebase ("Finetune Like
You Pretrain", Goyal et al., CVPR 2023) as an idiomatic JAX/XLA/Pallas stack:

* ``flyp_tpu.models``     — Flax CLIP towers (ViT, ModifiedResNet, text
  transformer) with fp32 LayerNorm islands and bf16 MXU compute.
* ``flyp_tpu.ops``        — Pallas TPU kernels (flash attention, fused
  LayerNorm/QuickGELU) and the global-batch contrastive loss built on
  ``jax.lax.all_gather`` over the ICI mesh.
* ``flyp_tpu.parallel``   — device-mesh construction and sharding rules.
* ``flyp_tpu.data``       — host-side input pipeline (CSV/webdataset-style),
  PIL transforms matching CLIP preprocessing, dataset registry for the
  ID/OOD evaluation suites.
* ``flyp_tpu.templates``  — prompt-template registry.
* ``flyp_tpu.training``   — FLYP trainer, curriculum/progress/few-shot/CE
  ablation/fisher/linear-probe procedures.
* ``flyp_tpu.evaluation`` — zero-shot-head evaluation harness and metrics.
"""

__version__ = "0.1.0"
