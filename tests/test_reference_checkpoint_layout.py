"""Importer proof against the REFERENCE's literal checkpoint layouts.

Round-trip tests elsewhere (test_hf_export.py) start from our own exporter,
so a systematic naming error shared by exporter+importer would pass them.
Here the expected key names are written out literally from the reference
source, and the Hub-format fixture is produced by re-implementing the
reference's own remap rules in-test:

- ``.pt`` layout: ``{"model": {"projector", "llm_backbone",
  "vision_backbone"}}`` with ``llm.model.layers.{i}.*`` /
  ``{dino,siglip}_featurizer.*`` / ``projector.{0,2,4}.*`` naming
  (``/root/reference/prismatic/models/vlms/prismatic.py:111-120``, modules
  ``llm_backbone.llm`` = HF LlamaForCausalLM, ``dinosiglip_vit.py``
  featurizers, ``nn_utils.py:37-53`` nn.Sequential projector).
- HF-hub flat layout: the exact remap of
  ``/root/reference/vla-scripts/extern/convert_openvla_weights_to_hf.py:77-117``
  (PROJECTOR_KEY_MAPPING, ``llm.``->``language_model.``,
  ``dino_featurizer.``->``vision_backbone.featurizer.`` with
  ``.gamma``->``.scale_factor``, ``siglip_featurizer.``->
  ``vision_backbone.fused_featurizer.``).
"""

import jax
import numpy as np
import pytest
import torch

from emmax_tpu.models.convert import (convert_hf_openvla_sd, params_to_hf_sd,
                                      params_to_prismatic_sd)
from emmax_tpu.models.load import convert_prismatic_pt
from emmax_tpu.models.vlm import init_vlm_params, text_forward, tiny_vlm_config


@pytest.fixture(scope="module")
def tree():
    cfg = tiny_vlm_config(vocab_size=128)
    params = init_vlm_params(jax.random.PRNGKey(11), cfg)
    return cfg, params


# --- literal key inventories (written from the reference source, NOT from
# --- our exporter) ------------------------------------------------------

_LLM_LAYER_KEYS = [  # HF LlamaForCausalLM under `llm.` (llama2.py wraps it)
    "input_layernorm.weight",
    "self_attn.q_proj.weight", "self_attn.k_proj.weight",
    "self_attn.v_proj.weight", "self_attn.o_proj.weight",
    "post_attention_layernorm.weight",
    "mlp.gate_proj.weight", "mlp.up_proj.weight", "mlp.down_proj.weight",
]

_VIT_BLOCK_KEYS = [  # TIMM VisionTransformer blocks (dinosiglip_vit.py)
    "norm1.weight", "norm1.bias",
    "attn.qkv.weight", "attn.qkv.bias",
    "attn.proj.weight", "attn.proj.bias",
    "norm2.weight", "norm2.bias",
    "mlp.fc1.weight", "mlp.fc1.bias", "mlp.fc2.weight", "mlp.fc2.bias",
]


def expected_prismatic_keys(cfg):
    """The exact key sets a reference fused-backbone checkpoint carries."""
    llm = {"llm.model.embed_tokens.weight", "llm.model.norm.weight",
           "llm.lm_head.weight"}
    for i in range(cfg.llm.n_layers):
        llm |= {f"llm.model.layers.{i}.{k}" for k in _LLM_LAYER_KEYS}
    vis = set()
    for name, vcfg in cfg.vision:
        pre = f"{name}_featurizer."
        vis |= {pre + "patch_embed.proj.weight", pre + "patch_embed.proj.bias",
                pre + "pos_embed", pre + "norm.weight", pre + "norm.bias"}
        if vcfg.class_token:
            vis.add(pre + "cls_token")
        if vcfg.num_reg_tokens:
            vis.add(pre + "reg_token")
        for i in range(vcfg.depth):
            vis |= {f"{pre}blocks.{i}.{k}" for k in _VIT_BLOCK_KEYS}
            if vcfg.layerscale:
                vis |= {f"{pre}blocks.{i}.ls1.gamma",
                        f"{pre}blocks.{i}.ls2.gamma"}
    # fused-gelu-mlp projector: nn.Sequential linears at 0, 2, 4
    proj = {f"projector.{i}.{leaf}" for i in (0, 2, 4)
            for leaf in ("weight", "bias")}
    return {"projector": proj, "llm_backbone": llm, "vision_backbone": vis}


# reference convert_openvla_weights_to_hf.py:77-84, verbatim mapping
PROJECTOR_KEY_MAPPING = {
    "projector.0.weight": "projector.fc1.weight",
    "projector.0.bias": "projector.fc1.bias",
    "projector.2.weight": "projector.fc2.weight",
    "projector.2.bias": "projector.fc2.bias",
    "projector.4.weight": "projector.fc3.weight",
    "projector.4.bias": "projector.fc3.bias",
}


def reference_remap_to_hf(parts):
    """Re-implementation of the reference's fused-backbone remap
    (convert_openvla_weights_to_hf.py:87-117), applied to the
    ``{"projector","llm_backbone","vision_backbone"}`` split."""
    hf = {}
    for key, value in parts["projector"].items():
        hf[PROJECTOR_KEY_MAPPING[key]] = value
    for key, value in parts["llm_backbone"].items():
        hf[key.replace("llm.", "language_model.")] = value
    for key, value in parts["vision_backbone"].items():
        if key.startswith("dino_featurizer"):
            if key.endswith(".gamma"):
                key = key.replace(".gamma", ".scale_factor")
            hf[key.replace("dino_featurizer.",
                           "vision_backbone.featurizer.")] = value
        elif key.startswith("siglip_featurizer"):
            hf[key.replace("siglip_featurizer.",
                           "vision_backbone.fused_featurizer.")] = value
    return hf


def _assert_trees_close(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(b)[0]}
    assert len(fa) == len(fb)
    for k, va in fa:
        np.testing.assert_allclose(
            np.asarray(va, np.float32),
            np.asarray(fb[jax.tree_util.keystr(k)], np.float32),
            rtol=1e-6, atol=1e-6, err_msg=jax.tree_util.keystr(k))


def test_export_matches_reference_key_inventory(tree):
    cfg, params = tree
    parts = params_to_prismatic_sd(params, cfg)
    expected = expected_prismatic_keys(cfg)
    for part in ("projector", "llm_backbone", "vision_backbone"):
        assert set(parts[part]) == expected[part], part


def test_import_pt_consumes_reference_layout(tree, tmp_path):
    """A ``latest-checkpoint.pt`` in the reference's exact on-disk shape
    loads into a param tree equal to the source (and so logit-identical)."""
    cfg, params = tree
    parts = params_to_prismatic_sd(params, cfg)
    pt = tmp_path / "latest-checkpoint.pt"
    torch.save({"model": parts}, pt)
    back = convert_prismatic_pt(pt, cfg)
    _assert_trees_close(params, back)
    ids = jax.numpy.asarray(np.arange(6)[None] + 3)
    lg0, _ = text_forward(params, cfg, ids)
    lg1, _ = text_forward(back, cfg, ids)
    np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg1),
                               rtol=1e-5, atol=1e-5)


def test_import_hf_consumes_reference_converter_output(tree):
    """import_hf must invert the artifact the REFERENCE's converter
    publishes: build the flat Hub state dict with the reference's own remap
    rules (re-implemented above) and check our importer recovers the tree."""
    cfg, params = tree
    parts = params_to_prismatic_sd(params, cfg)
    hub_sd = reference_remap_to_hf(parts)
    assert any(k.endswith(".scale_factor") for k in hub_sd)  # gamma remapped
    back = convert_hf_openvla_sd(hub_sd, cfg)
    _assert_trees_close(params, back)


def test_our_hf_export_matches_reference_converter_naming(tree):
    """params_to_hf_sd must emit byte-identical key names to the
    reference's converter output — so checkpoints trained here upload as
    drop-in Hub artifacts."""
    cfg, params = tree
    ours = params_to_hf_sd(params, cfg)
    ref = reference_remap_to_hf(params_to_prismatic_sd(params, cfg))
    assert set(ours) == set(ref)
    for k in ours:
        np.testing.assert_allclose(np.asarray(ours[k], np.float32),
                                   np.asarray(ref[k], np.float32),
                                   rtol=0, atol=0, err_msg=k)
