import json

import jax
import numpy as np
import pytest

from emmax_tpu.models.llama import LlamaConfig
from emmax_tpu.models.vit import ViTConfig
from emmax_tpu.models.vla import EmmaXVLA
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.ops.image import ImageTransformConfig
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def vla():
    cfg = tiny_vlm_config(vocab_size=1024)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(vocab_size=1024)
    transforms = {name: ImageTransformConfig(size=v.img_size)
                  for name, v in cfg.vision}
    stats = {"bridge_orig": {"action": {
        "q01": [-0.1] * 7, "q99": [0.1] * 7, "mask": [True] * 6 + [False]}}}
    return EmmaXVLA(cfg, params, tok, transforms, norm_stats=stats,
                    proprio_stats={"Q1": [-1.0] * 7, "Q99": [1.0] * 7})


def _frame(rng):
    return rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)


def test_get_prompt_variants(vla):
    p = vla.get_prompt("put the spoon on the towel", gripper_position=(48, 63))
    assert "CURRENT GRIPPER: [48, 63]" in p and p.startswith("In: ")
    q = vla.get_prompt("Put The Spoon")
    assert q == "In: What action should the robot take to put the spoon?\nOut:"


def test_generate_actions_act(vla):
    rng = np.random.default_rng(0)
    prompt = vla.get_prompt("pick the cup", gripper_position=(10, 10))
    actions, text = vla.generate_actions(_frame(rng), prompt, type="act",
                                         max_new_tokens=12)
    assert isinstance(text, str)
    assert len(actions) >= 1 and actions[0].shape == (7,)
    # masked gripper dim is passthrough of the normalized value in [-1, 1]
    assert abs(actions[0][6]) <= 1.0
    # unnormalized xyz dims live within q01..q99
    assert (np.abs(actions[0][:6]) <= 0.1 + 1e-9).all()


def test_generate_actions_pos(vla):
    rng = np.random.default_rng(1)
    actions, text = vla.generate_actions(_frame(rng), "In: go\nOut:",
                                         type="pos", max_new_tokens=8)
    assert actions[0].shape == (7,)


def test_predict_action_shape(vla):
    rng = np.random.default_rng(2)
    a = vla.predict_action(_frame(rng), "Pick Up The Fork",
                           unnorm_key="bridge_orig")
    assert a.shape == (7,)


def test_save_load_roundtrip(tmp_path):
    from emmax_tpu.models.load import load_vla, save_pretrained

    cfg = tiny_vlm_config(vocab_size=1024)
    params = init_vlm_params(jax.random.PRNGKey(1), cfg)
    # persist with explicit backbone ids of the tiny config? the loader needs
    # registered ids — use the registered flagship ids but tiny dims are not
    # registered; instead test the orbax tree + config plumbing directly.
    blob = {"vision_backbone_id": "dinosiglip-vit-so-224px",
            "llm_backbone_id": "llama2-7b-pure",
            "arch_specifier": "no-align+fused-gelu-mlp"}
    stats = {"bridge_orig": {"action": {"q01": [-1] * 7, "q99": [1] * 7}}}
    ckpt = save_pretrained(tmp_path / "run", blob, params,
                           dataset_statistics=stats)
    assert ckpt.exists()
    assert json.loads((tmp_path / "run" / "config.json").read_text())[
        "llm_backbone_id"] == "llama2-7b-pure"
    # restoring the raw tree (no template) preserves structure + values
    from emmax_tpu.models.load import _load_orbax

    restored = _load_orbax(ckpt, None)
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_convert_prismatic_pt_structure(tmp_path):
    """A synthetic reference-style .pt (torch) converts into our tree."""
    torch = pytest.importorskip("torch")
    from emmax_tpu.models.load import convert_prismatic_pt
    from emmax_tpu.models.vlm import VLMConfig

    dino = ViTConfig(img_size=28, patch_size=14, dim=16, depth=2, n_heads=2,
                     hidden_dim=32, class_token=True, num_reg_tokens=4,
                     layerscale=True)
    llm = LlamaConfig(vocab_size=64, dim=16, n_layers=2, n_heads=2,
                      n_kv_heads=2, hidden_dim=32)
    cfg = VLMConfig(vision=(("dino", dino),), llm=llm,
                    arch_specifier="no-align+gelu-mlp")

    g = torch.Generator().manual_seed(0)
    vsd = {}
    pre = "dino_featurizer."
    vsd[pre + "cls_token"] = torch.randn(1, 1, 16, generator=g)
    vsd[pre + "reg_token"] = torch.randn(1, 4, 16, generator=g)
    vsd[pre + "pos_embed"] = torch.randn(1, 5, 16, generator=g)  # 4 patches + cls
    vsd[pre + "patch_embed.proj.weight"] = torch.randn(16, 3, 14, 14, generator=g)
    vsd[pre + "patch_embed.proj.bias"] = torch.randn(16, generator=g)
    for i in range(2):
        b = f"{pre}blocks.{i}."
        vsd[b + "norm1.weight"] = torch.ones(16)
        vsd[b + "norm1.bias"] = torch.zeros(16)
        vsd[b + "attn.qkv.weight"] = torch.randn(48, 16, generator=g)
        vsd[b + "attn.qkv.bias"] = torch.zeros(48)
        vsd[b + "attn.proj.weight"] = torch.randn(16, 16, generator=g)
        vsd[b + "attn.proj.bias"] = torch.zeros(16)
        vsd[b + "ls1.gamma"] = torch.full((16,), 1e-5)
        vsd[b + "norm2.weight"] = torch.ones(16)
        vsd[b + "norm2.bias"] = torch.zeros(16)
        vsd[b + "mlp.fc1.weight"] = torch.randn(32, 16, generator=g)
        vsd[b + "mlp.fc1.bias"] = torch.zeros(32)
        vsd[b + "mlp.fc2.weight"] = torch.randn(16, 32, generator=g)
        vsd[b + "mlp.fc2.bias"] = torch.zeros(16)
        vsd[b + "ls2.gamma"] = torch.full((16,), 1e-5)
    vsd[pre + "norm.weight"] = torch.ones(16)
    vsd[pre + "norm.bias"] = torch.zeros(16)

    lsd = {}
    lsd["llm.model.embed_tokens.weight"] = torch.randn(64, 16, generator=g)
    for i in range(2):
        b = f"llm.model.layers.{i}."
        lsd[b + "input_layernorm.weight"] = torch.ones(16)
        lsd[b + "self_attn.q_proj.weight"] = torch.randn(16, 16, generator=g)
        lsd[b + "self_attn.k_proj.weight"] = torch.randn(16, 16, generator=g)
        lsd[b + "self_attn.v_proj.weight"] = torch.randn(16, 16, generator=g)
        lsd[b + "self_attn.o_proj.weight"] = torch.randn(16, 16, generator=g)
        lsd[b + "post_attention_layernorm.weight"] = torch.ones(16)
        lsd[b + "mlp.gate_proj.weight"] = torch.randn(32, 16, generator=g)
        lsd[b + "mlp.up_proj.weight"] = torch.randn(32, 16, generator=g)
        lsd[b + "mlp.down_proj.weight"] = torch.randn(16, 32, generator=g)
    lsd["llm.model.norm.weight"] = torch.ones(16)
    lsd["llm.lm_head.weight"] = torch.randn(64, 16, generator=g)

    psd = {"projector.0.weight": torch.randn(16, 16, generator=g),
           "projector.0.bias": torch.zeros(16),
           "projector.2.weight": torch.randn(16, 16, generator=g),
           "projector.2.bias": torch.zeros(16)}

    pt = tmp_path / "step-000100-epoch-00-loss=0.1000.pt"
    torch.save({"model": {"vision_backbone": vsd, "llm_backbone": lsd,
                          "projector": psd}}, pt)

    params = convert_prismatic_pt(pt, cfg)
    assert params["llm"]["layers"]["wq"].shape == (2, 16, 16)
    assert params["vision"]["dino"]["blocks"]["wqkv"].shape == (2, 16, 48)
    assert len(params["projector"]["layers"]) == 2
    # converted model runs
    from emmax_tpu.models.vlm import vlm_forward
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)
    ids = jnp.asarray([[1, 5, 6]])
    pixels = {"dino": jnp.zeros((1, 28, 28, 3))}
    logits, _, _ = vlm_forward(params, cfg, ids, pixels)
    assert logits.shape == (1, 3 + 4, 64)


def test_export_import_roundtrip(tmp_path):
    """params → reference .pt layout → convert back → identical params
    (the export converter's correctness)."""
    torch = pytest.importorskip("torch")
    from emmax_tpu.models.convert import params_to_prismatic_sd
    from emmax_tpu.models.load import convert_prismatic_pt
    from emmax_tpu.models.vlm import VLMConfig

    dino = ViTConfig(img_size=28, patch_size=14, dim=16, depth=2, n_heads=2,
                     hidden_dim=32, class_token=True, num_reg_tokens=4,
                     layerscale=True)
    llm = LlamaConfig(vocab_size=64, dim=16, n_layers=2, n_heads=2,
                      n_kv_heads=2, hidden_dim=32)
    cfg = VLMConfig(vision=(("dino", dino),), llm=llm,
                    arch_specifier="no-align+gelu-mlp")
    import jax

    from emmax_tpu.models.vlm import init_vlm_params

    params = init_vlm_params(jax.random.PRNGKey(3), cfg)
    sd = params_to_prismatic_sd(params, cfg)
    pt = tmp_path / "roundtrip.pt"
    torch.save({"model": sd}, pt)
    back = convert_prismatic_pt(pt, cfg)

    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(dict(flat_b)[path]),
            atol=1e-6, err_msg=str(path))


def test_speculative_vla_same_actions(vla):
    """EmmaXVLA(speculative=True) is a drop-in: same actions + text."""
    cfg, params = vla.cfg, vla.engine.params
    spec_vla = EmmaXVLA(cfg, params, vla.tokenizer, vla.transforms,
                        norm_stats=vla.norm_stats,
                        proprio_stats=vla.proprio_stats, speculative=True)
    rng = np.random.default_rng(4)
    frame = _frame(rng)
    prompt = vla.get_prompt("stack the blocks", gripper_position=(20, 30))
    a_ref, t_ref = vla.generate_actions(frame, prompt, max_new_tokens=16)
    a_spec, t_spec = spec_vla.generate_actions(frame, prompt,
                                               max_new_tokens=16)
    assert t_spec == t_ref
    assert len(a_spec) == len(a_ref)
    for x, y in zip(a_spec, a_ref):
        np.testing.assert_allclose(x, y)
    # predict_action path (suffix_ids) also goes through the spec engine
    p_ref = vla.predict_action(frame, "Pick Up The Fork",
                               unnorm_key="bridge_orig")
    p_spec = spec_vla.predict_action(frame, "Pick Up The Fork",
                                     unnorm_key="bridge_orig")
    np.testing.assert_allclose(p_spec, p_ref)


def test_closed_loop_speculative_vla_matches_plain():
    """EmmaXVLA(speculative=True, closed_loop=True) — vision cache +
    cross-frame drafts + prefix tail — produces the same text as the plain
    engine across consecutive frames."""
    import jax

    from emmax_tpu.models.vla import EmmaXVLA
    from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
    from emmax_tpu.ops.image import ImageTransformConfig
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    cfg = tiny_vlm_config(1024)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(1024)
    transforms = {n: ImageTransformConfig(size=v.img_size)
                  for n, v in cfg.vision}
    plain = EmmaXVLA(cfg, params, tok, transforms)
    fast = EmmaXVLA(cfg, params, tok, transforms, speculative=True,
                    draft_k=4, closed_loop=True, prefix_tail=16)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)

    def prompt(x):
        return ("In: What action should the robot take\nINSTRUCTION: \n"
                f"pick\nCURRENT GRIPPER: [{x:03d}, 098]\nOut:")

    for f in range(3):
        ref = plain.generate(frame, prompt(100 + f), max_new_tokens=12)
        got = fast.generate(frame, prompt(100 + f), max_new_tokens=12)
        assert got == ref, f
    assert fast.engine.last_prefill == "tail"
    assert fast.engine.vision_cache.hits >= 2

    # a DIFFERENT frame must miss the cache (default threshold 0.0 = exact
    # reuse only) and still match the plain engine
    frame2 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    misses_before = fast.engine.vision_cache.misses
    ref2 = plain.generate(frame2, prompt(103), max_new_tokens=12)
    got2 = fast.generate(frame2, prompt(103), max_new_tokens=12)
    assert got2 == ref2
    assert fast.engine.vision_cache.misses == misses_before + 1
    assert fast.engine.last_prefill == "full"


@pytest.mark.parametrize("quantize", ["int8", "int4"])
def test_load_vla_quantized(tmp_path, quantize):
    """`load_vla(quantize=...)` returns a serving-ready policy whose LLM
    weights are the quantized dict leaves (the reference's
    load_in_8bit/load_in_4bit role, verify_openvla.py:31-60) and whose
    decode still produces valid actions."""
    from emmax_tpu.models.load import load_vla, save_pretrained

    cfg = tiny_vlm_config(vocab_size=1024)
    params = init_vlm_params(jax.random.PRNGKey(1), cfg)
    stats = {"bridge_orig": {"action": {
        "q01": [-0.1] * 7, "q99": [0.1] * 7, "mask": [True] * 6 + [False]}}}
    save_pretrained(tmp_path / "run",
                    {"vision_backbone_id": "tiny", "llm_backbone_id": "tiny",
                     "arch_specifier": "no-align+gelu-mlp",
                     "text_config": {"vocab_size": 1024}},
                    params, dataset_statistics=stats)
    vla = load_vla(tmp_path / "run", quantize=quantize)
    key = "q4" if quantize == "int4" else "q8"
    wq = vla.engine.params["llm"]["layers"]["wq"]
    assert isinstance(wq, dict) and key in wq and "scale" in wq
    rng = np.random.default_rng(3)
    actions, text = vla.generate_actions(_frame(rng), "In: go\nOut:",
                                         type="act", max_new_tokens=12)
    assert actions[0].shape == (7,)

    # back-compat spelling still works and maps to int8
    vla8 = load_vla(tmp_path / "run", quantize_int8=True)
    assert "q8" in vla8.engine.params["llm"]["layers"]["wq"]
