"""Numerical parity of the JAX ViT vs transformers Dinov2WithRegisters /
SigLIP vision (torch CPU), including the Emma-X second-to-last-layer
feature-extraction contract."""

import numpy as np
import pytest

from emmax_tpu.models.convert import convert_hf_dinov2, convert_hf_siglip
from emmax_tpu.models.vit import ViTConfig, vit_forward

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

DINO_CFG = ViTConfig(img_size=28, patch_size=14, dim=32, depth=4, n_heads=2,
                     hidden_dim=64, class_token=True, num_reg_tokens=4,
                     layerscale=True)
SIGLIP_CFG = ViTConfig(img_size=28, patch_size=14, dim=48, depth=3, n_heads=4,
                       hidden_dim=96, class_token=False, gelu_tanh=True)


@pytest.fixture(scope="module")
def dinov2():
    from transformers import (Dinov2WithRegistersConfig,
                              Dinov2WithRegistersModel)

    torch.manual_seed(0)
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=DINO_CFG.dim, num_hidden_layers=DINO_CFG.depth,
        num_attention_heads=DINO_CFG.n_heads,
        intermediate_size=DINO_CFG.hidden_dim, image_size=DINO_CFG.img_size,
        patch_size=DINO_CFG.patch_size, num_register_tokens=4,
        layerscale_value=1.0, hidden_act="gelu",
        layer_norm_eps=DINO_CFG.norm_eps, attn_implementation="eager")
    hf = Dinov2WithRegistersModel(hf_cfg).eval()
    return hf, convert_hf_dinov2(hf.state_dict(), DINO_CFG)


@pytest.fixture(scope="module")
def siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(1)
    hf_cfg = SiglipVisionConfig(
        hidden_size=SIGLIP_CFG.dim, num_hidden_layers=SIGLIP_CFG.depth,
        num_attention_heads=SIGLIP_CFG.n_heads,
        intermediate_size=SIGLIP_CFG.hidden_dim,
        image_size=SIGLIP_CFG.img_size, patch_size=SIGLIP_CFG.patch_size,
        hidden_act="gelu_pytorch_tanh", attn_implementation="eager")
    hf = SiglipVisionModel(hf_cfg).eval()
    return hf, convert_hf_siglip(hf.state_dict(), SIGLIP_CFG)


def _images(rng, cfg):
    return rng.normal(size=(2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)


def test_dinov2_second_to_last_features(dinov2):
    hf, params = dinov2
    rng = np.random.default_rng(0)
    imgs = _images(rng, DINO_CFG)
    with torch.no_grad():
        out = hf(torch.tensor(imgs.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    # hidden_states[depth-1] == output after depth-1 blocks (second-to-last
    # block output, the Emma-X contract, base_vision.py:124-128); strip
    # cls + 4 register tokens.
    ref = out.hidden_states[DINO_CFG.depth - 1].numpy()[:, DINO_CFG.num_prefix:]
    feats = vit_forward(params, DINO_CFG, jnp.asarray(imgs))
    assert feats.shape == ref.shape
    np.testing.assert_allclose(np.asarray(feats), ref, atol=5e-5, rtol=1e-4)


def test_dinov2_full_forward_with_norm(dinov2):
    hf, params = dinov2
    rng = np.random.default_rng(1)
    imgs = _images(rng, DINO_CFG)
    with torch.no_grad():
        ref = hf(torch.tensor(imgs.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    feats = vit_forward(params, DINO_CFG, jnp.asarray(imgs),
                        num_blocks=DINO_CFG.depth, strip_prefix=False,
                        final_norm=True)
    np.testing.assert_allclose(np.asarray(feats), ref, atol=5e-5, rtol=1e-4)


def test_siglip_second_to_last_features(siglip):
    hf, params = siglip
    rng = np.random.default_rng(2)
    imgs = _images(rng, SIGLIP_CFG)
    with torch.no_grad():
        out = hf(torch.tensor(imgs.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    ref = out.hidden_states[SIGLIP_CFG.depth - 1].numpy()
    feats = vit_forward(params, SIGLIP_CFG, jnp.asarray(imgs))
    assert feats.shape == ref.shape
    np.testing.assert_allclose(np.asarray(feats), ref, atol=5e-5, rtol=1e-4)


def test_timm_conversion_no_embed_class_equivalence():
    """A TIMM-style no_embed_class checkpoint (patch-only pos rows) converts
    to the same function as padding a zero cls-pos row."""
    import jax

    from emmax_tpu.models.convert import convert_timm_vit
    from emmax_tpu.models.vit import init_vit_params

    cfg = ViTConfig(img_size=28, patch_size=14, dim=32, depth=2, n_heads=2,
                    hidden_dim=64, class_token=True, num_reg_tokens=4,
                    layerscale=True)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)

    # build a fake TIMM state dict from our params
    sd = {}
    pe = np.asarray(params["patch_embed"]["kernel"])  # [p*p*3, D]
    sd["patch_embed.proj.weight"] = torch.tensor(
        pe.reshape(14, 14, 3, 32).transpose(3, 2, 0, 1).copy())
    sd["patch_embed.proj.bias"] = torch.tensor(np.asarray(params["patch_embed"]["bias"]))
    sd["cls_token"] = torch.tensor(np.asarray(params["cls_token"]))
    sd["reg_token"] = torch.tensor(np.asarray(params["reg_tokens"]))
    # patch-only pos embed (no_embed_class): rows == num_patches
    pos = rng.normal(size=(1, cfg.num_patches, cfg.dim)).astype(np.float32)
    sd["pos_embed"] = torch.tensor(pos)
    b = params["blocks"]
    for i in range(cfg.depth):
        sd[f"blocks.{i}.norm1.weight"] = torch.tensor(np.asarray(b["norm1_scale"][i]))
        sd[f"blocks.{i}.norm1.bias"] = torch.tensor(np.asarray(b["norm1_bias"][i]))
        sd[f"blocks.{i}.attn.qkv.weight"] = torch.tensor(np.asarray(b["wqkv"][i]).T.copy())
        sd[f"blocks.{i}.attn.qkv.bias"] = torch.tensor(np.asarray(b["bqkv"][i]))
        sd[f"blocks.{i}.attn.proj.weight"] = torch.tensor(np.asarray(b["wo"][i]).T.copy())
        sd[f"blocks.{i}.attn.proj.bias"] = torch.tensor(np.asarray(b["bo"][i]))
        sd[f"blocks.{i}.ls1.gamma"] = torch.tensor(np.asarray(b["ls1"][i]))
        sd[f"blocks.{i}.norm2.weight"] = torch.tensor(np.asarray(b["norm2_scale"][i]))
        sd[f"blocks.{i}.norm2.bias"] = torch.tensor(np.asarray(b["norm2_bias"][i]))
        sd[f"blocks.{i}.mlp.fc1.weight"] = torch.tensor(np.asarray(b["w1"][i]).T.copy())
        sd[f"blocks.{i}.mlp.fc1.bias"] = torch.tensor(np.asarray(b["b1"][i]))
        sd[f"blocks.{i}.mlp.fc2.weight"] = torch.tensor(np.asarray(b["w2"][i]).T.copy())
        sd[f"blocks.{i}.mlp.fc2.bias"] = torch.tensor(np.asarray(b["b2"][i]))
        sd[f"blocks.{i}.ls2.gamma"] = torch.tensor(np.asarray(b["ls2"][i]))
    sd["norm.weight"] = torch.tensor(np.asarray(params["final_norm"]["scale"]))
    sd["norm.bias"] = torch.tensor(np.asarray(params["final_norm"]["bias"]))

    converted = convert_timm_vit(sd, cfg)
    assert converted["pos_embed"].shape == (1, cfg.num_patches + 1, cfg.dim)
    np.testing.assert_allclose(converted["pos_embed"][0, 0], 0.0)
    np.testing.assert_allclose(converted["pos_embed"][:, 1:], pos)
    np.testing.assert_allclose(converted["blocks"]["wqkv"],
                               np.asarray(b["wqkv"]), atol=1e-6)
