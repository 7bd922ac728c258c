"""Prismatic VLM pretraining CLI (align → finetune stages).

Counterpart of ``/root/reference/scripts/pretrain.py:48-238``: stage
hyperparameters come from the ModelConfig registry; ``align`` trains the
projector only, ``finetune`` trains projector + LLM
(``prismatic.py:133-245`` stage semantics via the trainable-mask optimizer).

Usage:
  python scripts/pretrain.py --model.type prism-dinosiglip-224px+7b \
      --stage align --dataset_root data/llava [--smoke_test true]
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from emmax_tpu.conf import (DatasetConfig, ModelConfig, config_to_dict,
                            parse_config)
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch("pretrain")


@dataclass
class PretrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    stage: str = "finetune"                 # align | finetune
    run_root_dir: Path = Path("runs")
    run_id: Optional[str] = None
    pretrained_checkpoint: Optional[Path] = None  # e.g. the align stage dir
    seed: int = 7
    tokenizer_path: Optional[str] = None
    attn_impl: str = "auto"
    max_steps: Optional[int] = None
    smoke_test: bool = False
    trackers: str = "jsonl"
    # align-stage only: cache pre-projector tower features across epochs
    # (frozen towers -> constant outputs; training/vision_cache.py)
    cache_vision: bool = False


def main(cfg: PretrainConfig) -> None:
    import jax
    import jax.numpy as jnp

    from emmax_tpu.data.collators import SplitModalityLoader, collate_lm
    from emmax_tpu.data.pretrain import AlignDataset, FinetuneDataset
    from emmax_tpu.models.load import build_vlm
    from emmax_tpu.models.materialize import get_image_transforms
    from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
    from emmax_tpu.ops.image import ImageTransformConfig
    from emmax_tpu.parallel import make_mesh, shard_params
    from emmax_tpu.parallel.mesh import strategy_to_mesh_shape
    from emmax_tpu.training.checkpointing import (CheckpointManager,
                                                  write_sidecars)
    from emmax_tpu.training.loop import LoopConfig, run_training
    from emmax_tpu.training.metrics import Metrics, build_trackers
    from emmax_tpu.training.train_state import (create_train_state,
                                                make_optimizer,
                                                trainable_mask)
    from emmax_tpu.training.train_step import jit_train_step, make_train_step
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer, load_tokenizer

    m = cfg.model
    assert cfg.stage in ("align", "finetune"), cfg.stage
    # stage hyperparameters (scripts/pretrain.py:70-114)
    lr = getattr(m, f"{cfg.stage}_learning_rate")
    wd = getattr(m, f"{cfg.stage}_weight_decay")
    mgn = getattr(m, f"{cfg.stage}_max_grad_norm")
    sched = getattr(m, f"{cfg.stage}_lr_scheduler_type")
    warmup = getattr(m, f"{cfg.stage}_warmup_ratio")
    epochs = getattr(m, f"{cfg.stage}_epochs")
    gbs = getattr(m, f"{cfg.stage}_global_batch_size")
    strategy = getattr(m, f"{cfg.stage}_train_strategy")

    run_id = cfg.run_id or f"{m.model_id}+stage-{cfg.stage}+x{cfg.seed}"
    run_dir = Path(cfg.run_root_dir) / run_id

    if cfg.smoke_test:
        vlm_cfg = tiny_vlm_config(vocab_size=512)
        tokenizer = ByteLevelTokenizer(vocab_size=512)
        transforms = {name: ImageTransformConfig(size=v.img_size)
                      for name, v in vlm_cfg.vision}
        import tempfile

        from emmax_tpu.data.pretrain import make_synthetic_chat_json

        tmp = Path(tempfile.mkdtemp())
        make_synthetic_chat_json(tmp / "chat.json", 16, image_dir=tmp / "img")
        ann, imgs = tmp / "chat.json", tmp / "img"
        gbs = 8
        epochs = 1
    else:
        vlm_cfg, _family = build_vlm(m.vision_backbone_id, m.llm_backbone_id,
                                     m.arch_specifier)
        transforms = get_image_transforms(m.vision_backbone_id,
                                          m.image_resize_strategy)
        tokenizer = load_tokenizer(cfg.tokenizer_path)
        components = (cfg.dataset.align_stage_components if cfg.stage == "align"
                      else cfg.dataset.finetune_stage_components)
        ann = Path(cfg.dataset.dataset_root_dir) / components[0]
        imgs = Path(cfg.dataset.dataset_root_dir) / components[1]

    dataset = (AlignDataset(ann, imgs, tokenizer) if cfg.stage == "align"
               else FinetuneDataset(ann, imgs, tokenizer))
    per_host = max(gbs // jax.process_count(), 1)
    # split-modality batching + mixed text-only/multimodal collation
    # (reference run_training path: SplitModalitySampler + collate with
    # multimodal_indices, base_strategy.py:157-292)
    loader = SplitModalityLoader(
        dataset, per_host,
        lambda s: collate_lm(s, tokenizer.pad_id),
        seed=cfg.seed, num_shards=jax.process_count(),
        shard_index=jax.process_index())

    mesh = make_mesh(strategy_to_mesh_shape(strategy, jax.device_count(),
                                            jax.process_count()))
    params = init_vlm_params(jax.random.PRNGKey(cfg.seed), vlm_cfg)
    if cfg.pretrained_checkpoint is not None:
        from emmax_tpu.models.load import _latest_checkpoint, _load_orbax

        ckpt_path = _latest_checkpoint(Path(cfg.pretrained_checkpoint))
        if ckpt_path is not None:
            template = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
            params = _load_orbax(ckpt_path, template)

    if cfg.cache_vision and cfg.stage == "align":
        # frozen towers -> constant per-sample outputs: encode once per
        # unique image, serve cached tower features every later epoch
        # (the loader holds private tower copies; donation-safe)
        from emmax_tpu.training.vision_cache import CachedVisionLoader

        loader = CachedVisionLoader(
            loader, params, vlm_cfg, transforms,
            compute_dtype=jnp.float32 if cfg.smoke_test else jnp.bfloat16)

    total_steps = cfg.max_steps or epochs * max(len(loader), 1)
    stage_name = "align" if cfg.stage == "align" else "finetune"
    tx, schedule = make_optimizer(params, learning_rate=lr, weight_decay=wd,
                                  max_grad_norm=mgn, lr_scheduler_type=sched,
                                  warmup_ratio=warmup,
                                  total_steps=total_steps, stage=stage_name)
    params = shard_params(params, mesh)
    state = create_train_state(params, tx)
    ckpt = CheckpointManager(run_dir)
    write_sidecars(run_dir, {"model": config_to_dict(m), "stage": cfg.stage,
                             "run_id": run_id})

    compute_dtype = jnp.float32 if cfg.smoke_test else (
        jnp.bfloat16 if m.enable_mixed_precision_training else jnp.float32)
    step_fn = jit_train_step(make_train_step(
        vlm_cfg, tx, attn_impl=cfg.attn_impl,
        remat=m.enable_gradient_checkpointing, compute_dtype=compute_dtype,
        transforms=transforms,
        stop_vision_gradient=(cfg.stage == "align"),
        # fully-frozen leaves are excluded from differentiation (no
        # frozen-params-sized gradient tree; see make_train_step)
        freeze_mask=trainable_mask(state.params, cfg.stage)), mesh=mesh)
    metrics = Metrics(build_trackers(cfg.trackers.split(","), run_id, run_dir))
    state = run_training(
        vlm_cfg=vlm_cfg, state=state, train_step=step_fn, loader=loader,
        metrics=metrics,
        loop_cfg=LoopConfig(epochs=epochs, max_steps=cfg.max_steps,
                            save_every=2500),
        mesh=mesh, ckpt_manager=ckpt, lr_fn=schedule)
    metrics.finalize()
    overwatch.info(f"{cfg.stage} stage done at step {int(state.step)}")


if __name__ == "__main__":
    cfg = parse_config(PretrainConfig, sys.argv[1:],
                       choice_fields={"model": ModelConfig,
                                      "dataset": DatasetConfig})
    main(cfg)
