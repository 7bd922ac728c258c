"""Model loading/saving.

Public surface mirrors the reference (``prismatic/models/load.py:52-228``):
``load(model_id_or_path)`` for VLMs and ``load_vla(path)`` for VLA policies.

Two checkpoint formats:
1. **Native** run dirs: ``checkpoints/<name>/`` Orbax tree + ``config.json``
   (+ ``dataset_statistics.json`` sidecar, required at inference for
   un-normalization — reference ``train.py:214-216``).
2. **Reference ``.pt``** files (torch): the Prismatic full-state split
   ``{"model": {"projector", "llm_backbone", "vision_backbone"}}``
   (``fsdp.py:95-136``) converted tensor-by-tensor into our pytrees —
   the TPU-side equivalent of ``convert_openvla_weights_to_hf.py``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.models.convert import (convert_hf_llama, convert_projector,
                                      convert_timm_vit)
from emmax_tpu.models.materialize import (get_image_transforms,
                                          get_llm_config, get_vision_config)
from emmax_tpu.models.vlm import VLMConfig, init_vlm_params
from emmax_tpu.overwatch import initialize_overwatch
from emmax_tpu.vla.tokenizer import load_tokenizer

overwatch = initialize_overwatch(__name__)


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype) if jnp.issubdtype(
            jnp.asarray(a).dtype, jnp.floating) else jnp.asarray(a), tree)


# --- config plumbing ---------------------------------------------------------

def _model_cfg_from_json(blob: dict):
    """Accept both our config.json and the reference's (``train.py:140-144``:
    {"vla": {...}} / {"model": {...}} shapes)."""
    if "model" in blob:
        m = blob["model"]
        return (m["vision_backbone_id"], m["llm_backbone_id"],
                m["arch_specifier"], m.get("image_resize_strategy", "resize-naive"))
    if "vla" in blob:
        from emmax_tpu.conf import ModelConfig

        base_vlm = blob["vla"]["base_vlm"]
        mc = ModelConfig.get_choice_class(str(base_vlm))()
        return (mc.vision_backbone_id, mc.llm_backbone_id, mc.arch_specifier,
                mc.image_resize_strategy)
    return (blob["vision_backbone_id"], blob["llm_backbone_id"],
            blob["arch_specifier"], blob.get("image_resize_strategy",
                                             "resize-naive"))


def build_vlm(vision_backbone_id: str, llm_backbone_id: str,
              arch_specifier: str) -> Tuple[VLMConfig, str]:
    if vision_backbone_id == "tiny" or llm_backbone_id == "tiny":
        # smoke-test scale (train.py --smoke_test / convert --base_vlm tiny)
        from emmax_tpu.models.vlm import tiny_vlm_config

        return tiny_vlm_config(), "llama2"
    vision = get_vision_config(vision_backbone_id)
    llm, family = get_llm_config(llm_backbone_id)
    return VLMConfig(vision=vision, llm=llm,
                     arch_specifier=arch_specifier), family


# --- native (orbax) format ---------------------------------------------------

def save_pretrained(run_dir, cfg_blob: dict, params, step: int = 0,
                    dataset_statistics: Optional[dict] = None) -> Path:
    import orbax.checkpoint as ocp

    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    with open(run_dir / "config.json", "w") as f:
        json.dump(cfg_blob, f, indent=2, default=str)
    if dataset_statistics is not None:
        with open(run_dir / "dataset_statistics.json", "w") as f:
            json.dump(dataset_statistics, f, indent=2)
    ckpt_dir = (run_dir / "checkpoints" / f"step-{step:06d}").absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, params)
    return ckpt_dir


def _load_orbax(ckpt_dir: Path, template):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(ckpt_dir.absolute(), template)
        return ckptr.restore(ckpt_dir.absolute())


def _latest_checkpoint(run_dir: Path) -> Optional[Path]:
    cdir = run_dir / "checkpoints"
    if not cdir.is_dir():
        return None
    steps = sorted(p for p in cdir.iterdir() if p.is_dir())
    return steps[-1] if steps else None


# --- reference .pt format ----------------------------------------------------

def convert_prismatic_pt(pt_path, cfg: VLMConfig):
    """Load a reference Prismatic/OpenVLA ``.pt`` checkpoint
    (``prismatic.py:111-120``) into our param tree."""
    import torch

    blob = torch.load(pt_path, map_location="cpu", weights_only=True)
    model_sd = blob["model"] if "model" in blob else blob
    vision_sd = model_sd["vision_backbone"]
    llm_sd = model_sd["llm_backbone"]
    proj_sd = model_sd["projector"]

    vision_params = {}
    for name, vcfg in cfg.vision:
        prefix = f"{name}_featurizer."
        sub = {k[len(prefix):]: v for k, v in vision_sd.items()
               if k.startswith(prefix)}
        if not sub and len(cfg.vision) == 1:
            sub = {k.split("featurizer.", 1)[-1]: v for k, v in vision_sd.items()}
        vision_params[name] = convert_timm_vit(sub, vcfg)

    llm_sub = {k[len("llm."):]: v for k, v in llm_sd.items()
               if k.startswith("llm.")}
    llm_params = convert_hf_llama(llm_sub, cfg.llm)
    proj_params = convert_projector(proj_sd, prefix="projector.")
    return {"vision": vision_params, "projector": proj_params,
            "llm": llm_params}


# --- public API --------------------------------------------------------------

def load(model_id_or_path, dtype=jnp.bfloat16, tokenizer_path=None,
         init_if_missing: bool = False, quantize_int8: bool = False,
         quantize: str = None):
    """Load a VLM. Returns (cfg, params, tokenizer, transforms, llm_family).

    ``model_id_or_path`` may be a registered model id (fresh init — no hub
    downloads in this environment) or a run directory. ``quantize`` applies
    host-side weight-only quantization to the LLM: ``"int8"`` (per-channel;
    the reference's load_in_8bit equivalent, ``verify_openvla.py:31-60``)
    or ``"int4"`` (nibble-packed group-128, the Pallas dequant kernel — the
    reference's load_in_4bit/bitsandbytes role and the single-chip serving
    headline config). Host-side so the bf16 and quantized trees never
    coexist in HBM. ``quantize_int8=True`` is the back-compat spelling of
    ``quantize="int8"``.
    """
    if quantize_int8:
        quantize = quantize or "int8"
    if quantize not in (None, "int8", "int4"):
        raise ValueError(f"quantize={quantize!r}: expected 'int8' or 'int4'")
    path = Path(str(model_id_or_path))
    if path.is_dir():
        blob = json.loads((path / "config.json").read_text())
        vid, lid, arch, resize = _model_cfg_from_json(blob)
        cfg, family = build_vlm(vid, lid, arch)
        tc_vocab = blob.get("text_config", {}).get("vocab_size")
        if vid == "tiny" and tc_vocab and tc_vocab != cfg.llm.vocab_size:
            from emmax_tpu.models.vlm import tiny_vlm_config

            cfg = tiny_vlm_config(vocab_size=tc_vocab)
        ckpt = _latest_checkpoint(path)
        if ckpt is not None:
            template = jax.eval_shape(
                lambda: init_vlm_params(jax.random.PRNGKey(0), cfg, dtype))
            params = _load_orbax(ckpt, template)
        elif (pt := sorted(path.glob("checkpoints/*.pt"))):
            params = _cast_tree(convert_prismatic_pt(pt[-1], cfg), dtype)
        elif (st := sorted(path.glob("*.safetensors"))):
            # an HF export dir (convert_weights --mode export_hf) loads
            # directly — the published OpenVLA flat naming
            from safetensors.torch import load_file

            from emmax_tpu.models.convert import convert_hf_openvla_sd

            sd = {}
            for shard in st:
                sd.update(load_file(shard))
            params = _cast_tree(convert_hf_openvla_sd(sd, cfg), dtype)
        elif init_if_missing:
            params = init_vlm_params(jax.random.PRNGKey(0), cfg, dtype)
        else:
            raise FileNotFoundError(f"no checkpoint under {path}")
        if vid == "tiny":
            from emmax_tpu.ops.image import ImageTransformConfig

            transforms = {n: ImageTransformConfig(size=v.img_size,
                                                  resize_strategy=resize)
                          for n, v in cfg.vision}
        else:
            transforms = get_image_transforms(vid, resize)
    else:
        from emmax_tpu.conf import ModelConfig

        mc = ModelConfig.get_choice_class(str(model_id_or_path))()
        cfg, family = build_vlm(mc.vision_backbone_id, mc.llm_backbone_id,
                                mc.arch_specifier)
        overwatch.info(f"initializing {model_id_or_path} with random weights "
                       "(no network egress: supply a run dir for real weights)")
        params = init_vlm_params(jax.random.PRNGKey(0), cfg, dtype)
        transforms = get_image_transforms(mc.vision_backbone_id,
                                          mc.image_resize_strategy)
    if quantize is not None:
        import numpy as np

        from emmax_tpu.serving.quant import quantize_vlm_params_np

        host_params = jax.tree_util.tree_map(np.asarray, params)
        del params
        params = jax.tree_util.tree_map(
            jnp.asarray,
            quantize_vlm_params_np(host_params,
                                   bits=4 if quantize == "int4" else 8))
    tokenizer = load_tokenizer(tokenizer_path)
    return cfg, params, tokenizer, transforms, family


def load_vla(path, dtype=jnp.bfloat16, tokenizer_path=None,
             init_if_missing: bool = False, attn_impl: str = "auto",
             quantize_int8: bool = False, speculative: bool = False,
             quantize: str = None):
    """Load a VLA policy (run dir with config + stats sidecars) →
    ``EmmaXVLA`` (reference: ``load_vla``, ``models/load.py:121-228``).
    ``quantize="int8"|"int4"`` selects weight-only serving quantization
    (see :func:`load`)."""
    from emmax_tpu.models.vla import EmmaXVLA

    cfg, params, tokenizer, transforms, family = load(
        path, dtype=dtype, tokenizer_path=tokenizer_path,
        init_if_missing=init_if_missing, quantize_int8=quantize_int8,
        quantize=quantize)
    norm_stats, proprio_stats = {}, None
    p = Path(str(path))
    if p.is_dir() and (p / "config.json").exists():
        # HF export dirs embed the statistics in config.json (reference
        # OpenVLAConfig.norm_stats, configuration_prismatic.py:129-138)
        cfg_blob = json.loads((p / "config.json").read_text())
        if isinstance(cfg_blob.get("norm_stats"), dict):
            norm_stats = cfg_blob["norm_stats"]
            for entry in norm_stats.values():
                if isinstance(entry, dict) and "Q1" in entry:
                    proprio_stats = entry
    stats_file = p / "dataset_statistics.json" if p.is_dir() else None
    if stats_file and stats_file.exists():
        blob = json.loads(stats_file.read_text())
        if "Q1" in blob or "Q99" in blob:
            proprio_stats = blob
        else:
            norm_stats = blob
            for entry in blob.values():
                if isinstance(entry, dict) and "Q1" in entry:
                    proprio_stats = entry
    return EmmaXVLA(cfg, params, tokenizer, transforms,
                    norm_stats=norm_stats, proprio_stats=proprio_stats,
                    llm_family=family, attn_impl=attn_impl,
                    speculative=speculative)
