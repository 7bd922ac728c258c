"""Emma-X VLA fine-tuning CLI.

TPU-native counterpart of ``/root/reference/vla-scripts/train.py:50-280``:
same config surface (``--vla.type <id>`` + dotted overrides), same run-dir
layout (``config.json`` + ``dataset_statistics.json`` sidecars, checkpoints
named ``step-XXXXXX-epoch-XX-loss=X.XXXX``), same training semantics
(GCOT dataset w/ data-mix, instruction masking, solver eval every 200 steps,
checkpoint every 1000) — on a jax mesh instead of torchrun+FSDP.

Usage:
  python vla-scripts/train.py \
      --vla.type prism-dinosiglip-224px+mx-moveonly-moveguided-single-policy \
      --data_root_dir data/gcot --run_root_dir runs [--smoke_test true]
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from emmax_tpu.conf import VLAConfig, config_to_dict, parse_config
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch("train")


@dataclass
class TrainConfig:
    # fmt: off
    vla: VLAConfig = field(default_factory=VLAConfig)

    data_root_dir: Path = Path("data/gcot")            # GCOT JSON dir
    file_name: str = "second_version.json"             # train.py:58
    run_root_dir: Path = Path("runs")
    rlds_data_dir: Optional[Path] = None               # bridge tfrecords (frames)
    frames_dir: Optional[Path] = None                  # pre-extracted frames

    pretrained_checkpoint: Optional[Path] = None       # resume / base VLA
    is_resume: bool = False
    auto_resume: bool = True                           # pick up run-dir ckpts
    resume_step: Optional[int] = None
    resume_epoch: Optional[int] = None

    run_id_note: Optional[str] = None
    save_interval: int = 1000
    eval_interval: int = 200
    seed: int = 7

    tokenizer_path: Optional[str] = None               # real Llama-2 tokenizer
    attn_impl: str = "auto"
    mask_inst: bool = True
    smoke_test: bool = False                           # tiny model + synthetic data
    trackers: str = "jsonl"                            # comma-separated
    # fmt: on


def main(cfg: TrainConfig) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emmax_tpu.data.collators import BatchLoader, collate_train
    from emmax_tpu.data.gcot import (DirectoryFrameSource, GCOTDataset,
                                     SyntheticFrameSource,
                                     make_dummy_gcot_items)
    from emmax_tpu.models.load import build_vlm
    from emmax_tpu.models.materialize import get_image_transforms
    from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
    from emmax_tpu.ops.image import ImageTransformConfig
    from emmax_tpu.parallel import make_mesh, shard_params
    from emmax_tpu.parallel.mesh import strategy_to_mesh_shape
    from emmax_tpu.training.checkpointing import (CheckpointManager,
                                                  write_sidecars)
    from emmax_tpu.training.loop import (LoopConfig, make_eval_fn,
                                         run_discrete_vla_training)
    from emmax_tpu.training.metrics import VLADiscreteMetrics, build_trackers
    from emmax_tpu.training.train_state import (create_train_state,
                                                make_optimizer,
                                                stage_from_flags,
                                                trainable_mask)
    from emmax_tpu.training.train_step import jit_train_step, make_train_step
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.solver import Solver
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer, load_tokenizer

    vla = cfg.vla
    n_devices = jax.device_count()
    if vla.expected_world_size not in (-1, n_devices):
        overwatch.warning(
            f"expected_world_size={vla.expected_world_size} but "
            f"{n_devices} devices visible; proceeding with {n_devices}")

    # run id mirrors the reference convention (train.py:120-127)
    run_id = f"{vla.vla_id}+n{max(n_devices // 8, 1)}+b{vla.global_batch_size}+x{cfg.seed}"
    if cfg.run_id_note:
        run_id += f"--{cfg.run_id_note}"
    run_dir = Path(cfg.run_root_dir) / run_id
    run_dir.mkdir(parents=True, exist_ok=True)

    # --- model + tokenizer ---
    if cfg.smoke_test:
        # >= 516 so the 256 action bins fit above the byte region
        # (ActionTokenizer validates this since the round-3 boundary fix)
        tokenizer = ByteLevelTokenizer(vocab_size=1024)
        # model vocab covers the tokenizer's padded vocab (incl. <PAD>)
        vlm_cfg = tiny_vlm_config(vocab_size=tokenizer.padded_vocab_size)
        transforms = {name: ImageTransformConfig(size=v.img_size)
                      for name, v in vlm_cfg.vision}
        family = "llama2-pure"
    else:
        from emmax_tpu.conf import ModelConfig

        mc = ModelConfig.get_choice_class(str(vla.base_vlm))()
        vlm_cfg, family = build_vlm(mc.vision_backbone_id, mc.llm_backbone_id,
                                    mc.arch_specifier)
        transforms = get_image_transforms(mc.vision_backbone_id,
                                          mc.image_resize_strategy)
        tokenizer = load_tokenizer(cfg.tokenizer_path)

    action_tokenizer = ActionTokenizer(tokenizer)

    # --- proprio statistics sidecar (train.py:148-149,214-216) ---
    stats_path = Path(cfg.data_root_dir) / "dataset_statistics.json"
    dataset_statistics = (json.loads(stats_path.read_text())
                          if stats_path.exists() else None)

    # --- data ---
    if cfg.smoke_test:
        items = make_dummy_gcot_items(64)
        frame_source = SyntheticFrameSource(64)
    else:
        with open(Path(cfg.data_root_dir) / cfg.file_name) as f:
            items = json.load(f)
        if cfg.frames_dir is not None:
            frame_source = DirectoryFrameSource(cfg.frames_dir)
        elif cfg.rlds_data_dir is not None:
            from emmax_tpu.data.rlds import RLDSFrameSource

            frame_source = RLDSFrameSource(cfg.rlds_data_dir)
        else:
            raise ValueError("need --frames_dir or --rlds_data_dir")

    dataset = GCOTDataset(items, action_tokenizer, tokenizer, frame_source,
                          data_mix=vla.data_mix, mask_inst=cfg.mask_inst)
    per_host_bs = max(vla.global_batch_size // jax.process_count(), 1)
    loader = BatchLoader(
        dataset, per_host_bs,
        lambda s: collate_train(s, tokenizer.pad_id,
                                max_length=vlm_cfg.llm.max_seq_len),
        seed=cfg.seed, num_shards=jax.process_count(),
        shard_index=jax.process_index())
    from emmax_tpu.data.prefetch import PrefetchingLoader

    # --- mesh + params + optimizer ---
    mesh_shape = strategy_to_mesh_shape(vla.train_strategy, n_devices,
                                        jax.process_count())
    mesh = make_mesh(mesh_shape)
    overwatch.info(f"mesh {dict(zip(('replica', 'fsdp', 'tensor'), mesh_shape))}")
    loader = PrefetchingLoader(loader, mesh)  # overlap host pipeline w/ step

    if cfg.pretrained_checkpoint is not None and not cfg.is_resume:
        from emmax_tpu.models.load import convert_prismatic_pt, _cast_tree

        params = _cast_tree(
            convert_prismatic_pt(cfg.pretrained_checkpoint, vlm_cfg),
            jnp.float32)
    else:
        params = init_vlm_params(jax.random.PRNGKey(cfg.seed), vlm_cfg)

    stage = stage_from_flags(vla.freeze_vision_backbone,
                             vla.freeze_llm_backbone,
                             vla.unfreeze_last_llm_layer)
    steps_per_epoch = max(len(loader), 1)
    total_steps = vla.max_steps or vla.epochs * steps_per_epoch
    tx, schedule = make_optimizer(
        params, learning_rate=vla.learning_rate,
        weight_decay=vla.weight_decay, max_grad_norm=vla.max_grad_norm,
        lr_scheduler_type=vla.lr_scheduler_type, total_steps=total_steps,
        warmup_ratio=vla.warmup_ratio, stage=stage)
    params = shard_params(params, mesh)
    state = create_train_state(params, tx)

    ckpt = CheckpointManager(run_dir)
    start_step, start_epoch = 0, 0
    if cfg.auto_resume and not cfg.is_resume and ckpt.latest() is not None:
        overwatch.info(f"auto-resuming from {ckpt.latest().name} "
                       "(crash-recovery; disable with --auto_resume false)")
        cfg.is_resume = True
    if cfg.is_resume:
        template = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=a.sharding), state)
        state = ckpt.restore(template)
        start_step = int(state.step)
        start_epoch = start_step // steps_per_epoch
        if cfg.resume_step is not None:
            assert cfg.resume_step == start_step, (
                f"resume_step={cfg.resume_step} != checkpoint step {start_step}")

    # --- sidecars (train.py:140-144,214-216) ---
    write_sidecars(run_dir, {"vla": config_to_dict(vla),
                             "run_id": run_id, "seed": cfg.seed},
                   dataset_statistics)

    # --- train ---
    compute_dtype = jnp.bfloat16 if vla.enable_mixed_precision_training \
        else jnp.float32
    if cfg.smoke_test:
        compute_dtype = jnp.float32
    step_fn = jit_train_step(make_train_step(
        vlm_cfg, tx, attn_impl=cfg.attn_impl,
        remat=(False if (not vla.enable_gradient_checkpointing
                         or vla.remat_policy == "none")
               else "dots" if vla.remat_policy == "dots" else True),
        compute_dtype=compute_dtype, transforms=transforms,
        stop_vision_gradient=vla.freeze_vision_backbone,
        # fully-frozen leaves are excluded from differentiation (no
        # frozen-params-sized gradient tree; see make_train_step)
        freeze_mask=trainable_mask(state.params, stage),
        action_vocab_size=tokenizer.vocab_size), mesh=mesh)
    metrics = VLADiscreteMetrics(build_trackers(
        cfg.trackers.split(","), run_id, run_dir,
        hparams=config_to_dict(vla)))
    for t in metrics.trackers:
        t.write_hyperparameters(config_to_dict(vla))

    eval_fn = make_eval_fn(vlm_cfg, transforms=transforms,
                           attn_impl=cfg.attn_impl,
                           compute_dtype=compute_dtype)
    state = run_discrete_vla_training(
        vlm_cfg=vlm_cfg, state=state, train_step=step_fn, loader=loader,
        metrics=metrics,
        loop_cfg=LoopConfig(epochs=vla.epochs, max_steps=vla.max_steps,
                            eval_every=cfg.eval_interval,
                            save_every=cfg.save_interval),
        mesh=mesh, tokenizer=tokenizer, solver=Solver(action_tokenizer),
        eval_fn=eval_fn, ckpt_manager=ckpt, lr_fn=schedule,
        start_step=start_step, start_epoch=start_epoch)
    metrics.finalize()
    overwatch.info(f"done; final step {int(state.step)}; run dir {run_dir}")


if __name__ == "__main__":
    cfg = parse_config(TrainConfig, sys.argv[1:], choice_fields={"vla": VLAConfig})
    main(cfg)
