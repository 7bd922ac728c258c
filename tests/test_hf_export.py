"""HF-hub (OpenVLA flat naming) export/import roundtrip."""

import jax
import numpy as np
import pytest

from emmax_tpu.models.convert import convert_hf_openvla_sd, params_to_hf_sd
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config


@pytest.fixture(scope="module")
def tree():
    cfg = tiny_vlm_config(vocab_size=128)
    params = init_vlm_params(jax.random.PRNGKey(3), cfg)
    return cfg, params


def _assert_trees_close(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(b)[0]}
    assert len(fa) == len(fb)
    for k, va in fa:
        np.testing.assert_allclose(np.asarray(va),
                                   np.asarray(fb[jax.tree_util.keystr(k)]),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(k))


def test_hf_sd_naming(tree):
    cfg, params = tree
    sd = params_to_hf_sd(params, cfg)
    keys = set(sd)
    assert "language_model.model.embed_tokens.weight" in keys
    assert "language_model.lm_head.weight" in keys
    assert "vision_backbone.featurizer.blocks.0.attn.qkv.weight" in keys
    # dino tower carries LayerScale under the HF-compat name
    assert "vision_backbone.featurizer.blocks.0.ls1.scale_factor" in keys
    assert "vision_backbone.fused_featurizer.blocks.0.mlp.fc1.weight" in keys
    assert "projector.fc1.weight" in keys and "projector.fc3.bias" in keys
    assert not any(".gamma" in k for k in keys)
    # torch [out, in] convention
    V, D = cfg.llm.vocab_size, cfg.llm.dim
    assert tuple(sd["language_model.lm_head.weight"].shape) == (V, D)


def test_hf_roundtrip_exact(tree):
    cfg, params = tree
    back = convert_hf_openvla_sd(params_to_hf_sd(params, cfg), cfg)
    _assert_trees_close(params, back)


def test_safetensors_file_roundtrip(tree, tmp_path):
    safetensors = pytest.importorskip("safetensors.torch")
    cfg, params = tree
    sd = {k: v.contiguous() for k, v in params_to_hf_sd(params, cfg).items()}
    safetensors.save_file(sd, tmp_path / "model.safetensors")
    loaded = safetensors.load_file(tmp_path / "model.safetensors")
    back = convert_hf_openvla_sd(loaded, cfg)
    _assert_trees_close(params, back)
