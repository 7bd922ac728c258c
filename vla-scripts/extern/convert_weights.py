"""Weight conversion CLI: reference checkpoints ↔ emmax_tpu run dirs.

Counterpart of ``/root/reference/vla-scripts/extern/
convert_openvla_weights_to_hf.py`` (and its prismatic sibling), but in the
TPU-relevant directions:

- ``--mode import_pt``: reference Prismatic/OpenVLA ``.pt`` → orbax run dir
  (key remap documented in ``emmax_tpu/models/convert.py``; inverse of the
  reference's ``llm.→language_model.`` / ``gamma→scale_factor`` maps at
  :84-117).
- ``--mode import_hf``: a local HF safetensors dir (Llama/DINOv2/SigLIP
  naming) → orbax run dir.
- ``--mode export_pt``: orbax run dir → reference-layout ``.pt`` (so torch
  users can load weights trained here).

Usage:
  python vla-scripts/extern/convert_weights.py --mode import_pt \
      --src checkpoints/step-....pt --dst runs/imported \
      --base_vlm prism-dinosiglip-224px+7b
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from emmax_tpu.conf import ModelConfig, parse_config
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch("convert")


@dataclass
class ConvertConfig:
    mode: str = "import_pt"        # import_pt | export_pt
    src: Path = Path("checkpoint.pt")
    dst: Path = Path("runs/imported")
    base_vlm: str = "prism-dinosiglip-224px+7b"
    dataset_statistics: Optional[Path] = None


def _vlm_cfg(base_vlm: str):
    from emmax_tpu.models.load import build_vlm

    mc = ModelConfig.get_choice_class(base_vlm)()
    cfg, _ = build_vlm(mc.vision_backbone_id, mc.llm_backbone_id,
                       mc.arch_specifier)
    return cfg, mc


def import_pt(cfg: ConvertConfig) -> None:
    import jax.numpy as jnp

    from emmax_tpu.models.load import (convert_prismatic_pt, save_pretrained,
                                       _cast_tree)

    vlm_cfg, mc = _vlm_cfg(cfg.base_vlm)
    params = _cast_tree(convert_prismatic_pt(cfg.src, vlm_cfg), jnp.bfloat16)
    stats = (json.loads(Path(cfg.dataset_statistics).read_text())
             if cfg.dataset_statistics else None)
    blob = {"vision_backbone_id": mc.vision_backbone_id,
            "llm_backbone_id": mc.llm_backbone_id,
            "arch_specifier": mc.arch_specifier,
            "image_resize_strategy": mc.image_resize_strategy,
            "source_checkpoint": str(cfg.src)}
    out = save_pretrained(cfg.dst, blob, params, dataset_statistics=stats)
    overwatch.info(f"imported {cfg.src} -> {out}")


def export_pt(cfg: ConvertConfig) -> None:
    """Orbax params → reference-layout torch ``.pt`` (model split into
    projector / llm_backbone / vision_backbone, ``fsdp.py:95-136``)."""
    import numpy as np
    import torch

    from emmax_tpu.models.load import _latest_checkpoint, _load_orbax

    vlm_cfg, mc = _vlm_cfg(cfg.base_vlm)
    ckpt = _latest_checkpoint(Path(cfg.src))
    assert ckpt is not None, f"no checkpoints under {cfg.src}"
    params = _load_orbax(ckpt, None)
    if "params" in params:  # full train state saved
        params = params["params"]

    def t(x):
        return torch.tensor(np.asarray(x, np.float32))

    llm = params["llm"]
    llm_sd = {"llm.model.embed_tokens.weight": t(llm["embed"]),
              "llm.model.norm.weight": t(llm["final_norm"]),
              "llm.lm_head.weight": t(np.asarray(llm["lm_head"]).T)}
    L = np.asarray(llm["layers"]["wq"]).shape[0]
    names = {"attn_norm": "input_layernorm.weight",
             "mlp_norm": "post_attention_layernorm.weight"}
    mats = {"wq": "self_attn.q_proj.weight", "wk": "self_attn.k_proj.weight",
            "wv": "self_attn.v_proj.weight", "wo": "self_attn.o_proj.weight",
            "w_gate": "mlp.gate_proj.weight", "w_up": "mlp.up_proj.weight",
            "w_down": "mlp.down_proj.weight"}
    for i in range(L):
        for k, hf in names.items():
            llm_sd[f"llm.model.layers.{i}.{hf}"] = t(llm["layers"][k][i])
        for k, hf in mats.items():
            llm_sd[f"llm.model.layers.{i}.{hf}"] = t(
                np.asarray(llm["layers"][k][i]).T)

    vis_sd = {}
    for name, vcfg in vlm_cfg.vision:
        pre = f"{name}_featurizer."
        p = params["vision"][name]
        D = vcfg.dim
        pk = np.asarray(p["patch_embed"]["kernel"])
        vis_sd[pre + "patch_embed.proj.weight"] = t(
            pk.reshape(vcfg.patch_size, vcfg.patch_size, 3, D)
            .transpose(3, 2, 0, 1))
        vis_sd[pre + "patch_embed.proj.bias"] = t(p["patch_embed"]["bias"])
        vis_sd[pre + "pos_embed"] = t(p["pos_embed"])
        if vcfg.class_token:
            vis_sd[pre + "cls_token"] = t(p["cls_token"])
        if vcfg.num_reg_tokens:
            vis_sd[pre + "reg_token"] = t(p["reg_tokens"])
        b = p["blocks"]
        for i in range(vcfg.depth):
            bp = f"{pre}blocks.{i}."
            vis_sd[bp + "norm1.weight"] = t(b["norm1_scale"][i])
            vis_sd[bp + "norm1.bias"] = t(b["norm1_bias"][i])
            vis_sd[bp + "attn.qkv.weight"] = t(np.asarray(b["wqkv"][i]).T)
            vis_sd[bp + "attn.qkv.bias"] = t(b["bqkv"][i])
            vis_sd[bp + "attn.proj.weight"] = t(np.asarray(b["wo"][i]).T)
            vis_sd[bp + "attn.proj.bias"] = t(b["bo"][i])
            vis_sd[bp + "norm2.weight"] = t(b["norm2_scale"][i])
            vis_sd[bp + "norm2.bias"] = t(b["norm2_bias"][i])
            vis_sd[bp + "mlp.fc1.weight"] = t(np.asarray(b["w1"][i]).T)
            vis_sd[bp + "mlp.fc1.bias"] = t(b["b1"][i])
            vis_sd[bp + "mlp.fc2.weight"] = t(np.asarray(b["w2"][i]).T)
            vis_sd[bp + "mlp.fc2.bias"] = t(b["b2"][i])
            if vcfg.layerscale:
                vis_sd[bp + "ls1.gamma"] = t(b["ls1"][i])
                vis_sd[bp + "ls2.gamma"] = t(b["ls2"][i])
        vis_sd[pre + "norm.weight"] = t(p["final_norm"]["scale"])
        vis_sd[pre + "norm.bias"] = t(p["final_norm"]["bias"])

    proj_sd = {}
    for li, layer in enumerate(params["projector"]["layers"]):
        proj_sd[f"projector.{2 * li}.weight"] = t(np.asarray(layer["kernel"]).T)
        proj_sd[f"projector.{2 * li}.bias"] = t(layer["bias"])

    out = Path(cfg.dst)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"model": {"projector": proj_sd, "llm_backbone": llm_sd,
                          "vision_backbone": vis_sd}}, out)
    overwatch.info(f"exported {cfg.src} -> {out}")


if __name__ == "__main__":
    cfg = parse_config(ConvertConfig, sys.argv[1:])
    {"import_pt": import_pt, "export_pt": export_pt}[cfg.mode](cfg)
