"""Weight conversion CLI: reference checkpoints ↔ emmax_tpu run dirs.

Counterpart of ``/root/reference/vla-scripts/extern/
convert_openvla_weights_to_hf.py`` (and its prismatic sibling), but in the
TPU-relevant directions:

- ``--mode import_pt``: reference Prismatic/OpenVLA ``.pt`` → orbax run dir
  (key remap documented in ``emmax_tpu/models/convert.py``; inverse of the
  reference's ``llm.→language_model.`` / ``gamma→scale_factor`` maps at
  :84-117).
- ``--mode import_hf``: a local HF-hub dir (OpenVLA ``modeling_prismatic``
  safetensors naming) → orbax run dir.
- ``--mode export_pt``: orbax run dir → reference-layout ``.pt`` (so torch
  users can load weights trained here).
- ``--mode export_hf``: orbax run dir → HF-hub dir (``model.safetensors`` in
  OpenVLA naming + ``config.json``), loadable by the HF remote-code class.

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
    mode: str = "import_pt"    # import_pt | export_pt | import_hf | export_hf
    export_dtype: str = "bfloat16"  # export_hf tensor dtype
    src: Path = Path("checkpoint.pt")
    dst: Path = Path("runs/imported")
    base_vlm: str = "prism-dinosiglip-224px+7b"
    dataset_statistics: Optional[Path] = None


def _vlm_cfg(base_vlm: str):
    from emmax_tpu.models.load import build_vlm

    if base_vlm == "tiny":  # smoke-test scale (like train.py --smoke_test)
        from types import SimpleNamespace

        from emmax_tpu.models.vlm import tiny_vlm_config

        mc = SimpleNamespace(vision_backbone_id="tiny", llm_backbone_id="tiny",
                             arch_specifier="fused-gelu-mlp",
                             image_resize_strategy="resize-naive")
        return tiny_vlm_config(), mc
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
    import torch

    from emmax_tpu.models.convert import params_to_prismatic_sd
    from emmax_tpu.models.load import _latest_checkpoint, _load_orbax

    vlm_cfg, mc = _vlm_cfg(cfg.base_vlm)
    ckpt = _latest_checkpoint(Path(cfg.src))
    assert ckpt is not None, f"no checkpoints under {cfg.src}"
    params = _load_orbax(ckpt, None)
    if "params" in params:  # full train state saved
        params = params["params"]
    sd = params_to_prismatic_sd(params, vlm_cfg)
    out = Path(cfg.dst)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"model": sd}, out)
    overwatch.info(f"exported {cfg.src} -> {out}")


def _load_params(cfg: ConvertConfig):
    from emmax_tpu.models.load import _latest_checkpoint, _load_orbax

    vlm_cfg, mc = _vlm_cfg(cfg.base_vlm)
    ckpt = _latest_checkpoint(Path(cfg.src))
    assert ckpt is not None, f"no checkpoints under {cfg.src}"
    params = _load_orbax(ckpt, None)
    if "params" in params:  # full train state saved
        params = params["params"]
    return vlm_cfg, mc, params


def export_hf(cfg: ConvertConfig) -> None:
    """Orbax run dir → HF-hub dir: ``model.safetensors`` in the published
    OpenVLA flat naming + a minimal ``config.json`` (the reference's
    ``convert_openvla_weights_to_hf.py`` output shape)."""
    import torch
    from safetensors.torch import save_file

    from emmax_tpu.models.convert import params_to_hf_sd

    dt = getattr(torch, cfg.export_dtype, None)
    if not isinstance(dt, torch.dtype):
        sys.exit(f"unknown --export_dtype {cfg.export_dtype!r} "
                 "(e.g. bfloat16, float16, float32)")
    vlm_cfg, mc, params = _load_params(cfg)
    sd = {k: v.to(dt).contiguous()
          for k, v in params_to_hf_sd(params, vlm_cfg).items()}
    out = Path(cfg.dst)
    out.mkdir(parents=True, exist_ok=True)
    save_file(sd, out / "model.safetensors")

    # transformers-compatible config (EmmaXVLAConfig ≈ OpenVLAConfig,
    # configuration_prismatic.py:129-138) + serializable processor +
    # remote-code stubs — the full Hub export surface
    from emmax_tpu.extern.hf_config import EmmaXVLAConfig
    from emmax_tpu.extern.hf_processor import (EmmaXImageProcessor,
                                               EmmaXProcessor)
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    norm_stats = None
    if cfg.dataset_statistics:
        norm_stats = json.loads(Path(cfg.dataset_statistics).read_text())
    auto_map = {
        "AutoConfig": "configuration_emmax.EmmaXVLAConfig",
        "AutoModelForVision2Seq": "modeling_emmax.EmmaXForVision2Seq",
        "AutoProcessor": "processing_emmax.EmmaXProcessor",
    }
    try:
        hf_cfg = EmmaXVLAConfig(
            vision_backbone_id=mc.vision_backbone_id,
            llm_backbone_id=mc.llm_backbone_id,
            arch_specifier=mc.arch_specifier,
            image_resize_strategy=mc.image_resize_strategy,
            text_config={"vocab_size": vlm_cfg.llm.vocab_size,
                         "pad_token_id": 32000},
            norm_stats=norm_stats,
            torch_dtype=cfg.export_dtype,
            auto_map=auto_map)
        hf_cfg.save_pretrained(out)
    except ValueError:
        # non-registered backbone (e.g. --base_vlm tiny smoke exports):
        # fall back to the minimal flat blob load() accepts
        blob = {"model_type": "emmax-openvla",
                "vision_backbone_id": mc.vision_backbone_id,
                "llm_backbone_id": mc.llm_backbone_id,
                "arch_specifier": mc.arch_specifier,
                "image_resize_strategy": mc.image_resize_strategy,
                "torch_dtype": cfg.export_dtype,
                "auto_map": auto_map,
                "text_config": {"vocab_size": vlm_cfg.llm.vocab_size,
                                "pad_token_id": 32000}}
        if norm_stats is not None:
            blob["norm_stats"] = norm_stats
        (out / "config.json").write_text(json.dumps(blob, indent=2))
    try:
        img_proc = EmmaXImageProcessor.for_backbone(
            mc.vision_backbone_id, mc.image_resize_strategy)
    except ValueError:  # tiny/unregistered towers: derive from the VLM cfg
        img_proc = EmmaXImageProcessor(
            tower_names=[n for n, _ in vlm_cfg.vision],
            input_sizes=[v.img_size for _, v in vlm_cfg.vision],
            image_resize_strategy=mc.image_resize_strategy)
    processor = EmmaXProcessor(img_proc, ByteLevelTokenizer())
    processor.save_pretrained(out)
    _write_remote_code_stubs(out)
    overwatch.info(f"exported {cfg.src} -> {out} "
                   f"({len(sd)} tensors, {cfg.export_dtype})")


_SIBLING_STUB_TEMPLATE = '''\
"""Remote-code entry for `{auto}`: re-exports from the self-contained
`modeling_emmax.py` bundled in this directory (no package install needed)."""

try:  # HF dynamic-module loading imports these as a package
    from .modeling_emmax import {name}  # noqa: F401
except ImportError:  # plain sys.path import from the export dir
    from modeling_emmax import {name}  # noqa: F401
'''


def _write_remote_code_stubs(out: Path) -> None:
    """Hub-style remote-code files matching the config's ``auto_map``.

    ``modeling_emmax.py`` is a SELF-CONTAINED bundle of the whole inference
    surface (generated by ``emmax_tpu.extern.standalone``) — the exported
    dir loads with no ``emmax_tpu`` install, matching the standalone
    property of the reference Hub file
    (``prismatic/extern/hf/modeling_prismatic.py:213-489``). The
    processing/configuration entries re-export from it.
    """
    from emmax_tpu.extern.standalone import build_standalone_source

    (out / "modeling_emmax.py").write_text(build_standalone_source())
    siblings = {
        "configuration_emmax.py": ("AutoConfig", "EmmaXVLAConfig"),
        "processing_emmax.py": ("AutoProcessor", "EmmaXProcessor"),
    }
    for fname, (auto, name) in siblings.items():
        (out / fname).write_text(
            _SIBLING_STUB_TEMPLATE.format(auto=auto, name=name))


def import_hf(cfg: ConvertConfig) -> None:
    """HF-hub dir (``model*.safetensors``, OpenVLA naming) → orbax run dir."""
    import jax.numpy as jnp
    from safetensors.torch import load_file

    from emmax_tpu.models.convert import convert_hf_openvla_sd
    from emmax_tpu.models.load import _cast_tree, save_pretrained

    vlm_cfg, mc = _vlm_cfg(cfg.base_vlm)
    shards = sorted(Path(cfg.src).glob("*.safetensors"))
    assert shards, f"no *.safetensors under {cfg.src}"
    sd = {}
    for s in shards:
        sd.update(load_file(s))
    params = _cast_tree(convert_hf_openvla_sd(sd, vlm_cfg), jnp.bfloat16)
    stats = (json.loads(Path(cfg.dataset_statistics).read_text())
             if cfg.dataset_statistics else None)
    blob = {"vision_backbone_id": mc.vision_backbone_id,
            "llm_backbone_id": mc.llm_backbone_id,
            "arch_specifier": mc.arch_specifier,
            "image_resize_strategy": mc.image_resize_strategy,
            "source_checkpoint": str(cfg.src)}
    out = save_pretrained(cfg.dst, blob, params, dataset_statistics=stats)
    overwatch.info(f"imported {cfg.src} -> {out}")


if __name__ == "__main__":
    cfg = parse_config(ConvertConfig, sys.argv[1:])
    modes = {"import_pt": import_pt, "export_pt": export_pt,
             "import_hf": import_hf, "export_hf": export_hf}
    if cfg.mode not in modes:
        sys.exit(f"unknown --mode {cfg.mode!r} (choose from {sorted(modes)})")
    modes[cfg.mode](cfg)
