"""HF-hub (OpenVLA flat naming) export/import roundtrip."""

import json

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


# === transformers-compatible extern surface (hf_config / hf_processor) ======

def test_emmax_config_json_roundtrip(tmp_path):
    from emmax_tpu.extern.hf_config import EmmaXConfig, EmmaXVLAConfig

    cfg = EmmaXVLAConfig(
        vision_backbone_id="dinosiglip-vit-so-224px",
        llm_backbone_id="llama2-7b-pure",
        arch_specifier="no-align+fused-gelu-mlp",
        norm_stats={"bridge_orig": {"action": {"q01": [0.0] * 7}}})
    assert cfg.use_fused_vision_backbone
    assert cfg.image_sizes == [224, 224]
    assert cfg.timm_model_ids[0].startswith("vit_large_patch14_reg4_dinov2")
    assert cfg.pad_to_multiple_of == 64 and cfg.n_action_bins == 256
    cfg.save_pretrained(tmp_path)
    blob = (tmp_path / "config.json").read_text()
    assert "dinosiglip-vit-so-224px" in blob
    back = EmmaXVLAConfig.from_pretrained(tmp_path)
    assert back.vision_backbone_id == cfg.vision_backbone_id
    assert back.norm_stats == cfg.norm_stats
    assert back.text_config.model_type == "llama"

    with pytest.raises(ValueError):
        EmmaXConfig(vision_backbone_id="not-a-backbone")


def test_image_processor_matches_ops_pipeline(tmp_path):
    import jax.numpy as jnp

    from emmax_tpu.extern.hf_processor import EmmaXImageProcessor
    from emmax_tpu.ops.image import (dinosiglip_transform_configs,
                                     preprocess_for_towers)

    proc = EmmaXImageProcessor.for_backbone("dinosiglip-vit-so-224px",
                                            "resize-naive")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    out = proc(img)
    ref = preprocess_for_towers(jnp.asarray(img[None]),
                                dinosiglip_transform_configs())
    assert set(out) == {"dino", "siglip"}
    for k in out:
        np.testing.assert_allclose(out[k], np.asarray(ref[k]), atol=1e-6)
    stacked = proc(img, return_stacked=True)
    assert stacked.shape == (1, 6, 224, 224)  # channel-stacked NCHW

    # JSON round trip through save/from_pretrained
    proc.save_pretrained(tmp_path)
    back = EmmaXImageProcessor.from_pretrained(tmp_path)
    out2 = back(img)
    for k in out:
        np.testing.assert_allclose(out2[k], out[k], atol=1e-6)


def test_processor_carries_task_and_roundtrips(tmp_path):
    from emmax_tpu.extern.hf_processor import (EmmaXImageProcessor,
                                               EmmaXProcessor,
                                               extract_instruction)
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    proc = EmmaXProcessor(
        EmmaXImageProcessor.for_backbone("dinosiglip-vit-so-224px",
                                         "resize-naive"),
        ByteLevelTokenizer(512))
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    prompt, image = proc.get_prompt("put the eggplant in the pot", img)
    assert "INSTRUCTION: \nput the eggplant in the pot" in prompt
    assert "CURRENT GRIPPER: [16, 16]" in prompt

    inputs = proc(prompt, image)
    assert inputs["task"] == "put the eggplant in the pot"
    assert inputs["input_ids"].ndim == 2
    assert set(inputs["pixel_values"]) == {"dino", "siglip"}

    # OpenVLA-style prompt also recovers the task
    assert extract_instruction(
        "In: What action should the robot take to stack the cups?\nOut:"
    ) == "stack the cups"

    proc.save_pretrained(tmp_path)
    back = EmmaXProcessor.from_pretrained(tmp_path)
    assert back.tokenizer.vocab_size == 512
    inputs2 = back(prompt, image)
    assert inputs2["task"] == inputs["task"]
    np.testing.assert_array_equal(inputs2["input_ids"], inputs["input_ids"])


def test_export_hf_dir_loads_through_facade(tmp_path):
    """Full Hub-export round trip: tiny orbax run dir -> export_hf (config +
    preprocessor + remote-code stubs + safetensors) -> facade from_pretrained
    on the export dir alone -> predict_action carries the instruction."""
    import importlib.util
    from pathlib import Path as P

    pytest.importorskip("safetensors.torch")
    from emmax_tpu.models.load import load_vla, save_pretrained

    spec = importlib.util.spec_from_file_location(
        "convert_weights",
        P(__file__).resolve().parent.parent / "vla-scripts" / "extern"
        / "convert_weights.py")
    import sys
    cw = importlib.util.module_from_spec(spec)
    sys.modules["convert_weights"] = cw  # dataclass resolution needs this
    spec.loader.exec_module(cw)

    # vocab matches load_vla's default hermetic tokenizer (32000 + pad -> 32064)
    cfg = tiny_vlm_config(vocab_size=32064)
    params = init_vlm_params(jax.random.PRNGKey(3), cfg)
    run_dir = tmp_path / "run"
    save_pretrained(run_dir, {"vision_backbone_id": "tiny",
                              "llm_backbone_id": "tiny",
                              "arch_specifier": "fused-gelu-mlp"}, params)
    stats = {"bridge_orig": {"action": {
        "q01": [-1.0] * 7, "q99": [1.0] * 7,
        "mask": [True] * 6 + [False]}}}
    stats_file = tmp_path / "stats.json"
    stats_file.write_text(json.dumps(stats))

    out = tmp_path / "export"
    cw.export_hf(cw.ConvertConfig(src=str(run_dir), dst=str(out),
                                  mode="export_hf", base_vlm="tiny",
                                  dataset_statistics=str(stats_file)))
    files = {f.name for f in out.iterdir()}
    assert {"model.safetensors", "config.json", "preprocessor_config.json",
            "configuration_emmax.py", "modeling_emmax.py",
            "processing_emmax.py"} <= files
    blob = json.loads((out / "config.json").read_text())
    assert blob["auto_map"]["AutoProcessor"] == \
        "processing_emmax.EmmaXProcessor"
    assert blob["norm_stats"] == stats

    # the export dir alone loads through the facade
    from emmax_tpu.extern.hf_facade import EmmaXForVision2Seq
    from emmax_tpu.extern.hf_processor import EmmaXProcessor
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    model = EmmaXForVision2Seq.from_pretrained(out)
    rng = np.random.default_rng(2)
    image = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    proc = EmmaXProcessor.from_pretrained(out,
                                          tokenizer=model.vla.tokenizer)
    prompt, image = proc.get_prompt("stack the cups", image)
    inputs = proc(prompt, image)
    assert inputs["task"] == "stack the cups"
    action = model.predict_action(inputs, unnorm_key="bridge_orig")
    assert action.shape == (7,)



def test_export_is_self_contained(tmp_path):
    """VERDICT r2 item 6: the exported dir must load WITHOUT this repo on
    sys.path. Exports a tiny model, then — in a subprocess whose cwd is the
    temp dir, with no PYTHONPATH and every repo path stripped — imports the
    bundled modeling_emmax.py, asserts `import emmax_tpu` fails, and runs
    processor.get_prompt -> predict_action end-to-end."""
    import importlib.util
    import subprocess
    import sys as _sys
    from pathlib import Path as P

    pytest.importorskip("safetensors.torch")
    from emmax_tpu.models.load import save_pretrained

    spec = importlib.util.spec_from_file_location(
        "convert_weights_sc",
        P(__file__).resolve().parent.parent / "vla-scripts" / "extern"
        / "convert_weights.py")
    cw = importlib.util.module_from_spec(spec)
    _sys.modules["convert_weights_sc"] = cw
    spec.loader.exec_module(cw)

    cfg = tiny_vlm_config(vocab_size=32064)
    params = init_vlm_params(jax.random.PRNGKey(5), cfg)
    run_dir = tmp_path / "run"
    save_pretrained(run_dir, {"vision_backbone_id": "tiny",
                              "llm_backbone_id": "tiny",
                              "arch_specifier": "fused-gelu-mlp"}, params)
    stats_file = tmp_path / "stats.json"
    stats_file.write_text(json.dumps({"bridge_orig": {"action": {
        "q01": [-1.0] * 7, "q99": [1.0] * 7, "mask": [True] * 6 + [False]}}}))
    out = tmp_path / "export"
    cw.export_hf(cw.ConvertConfig(src=str(run_dir), dst=str(out),
                                  mode="export_hf", base_vlm="tiny",
                                  dataset_statistics=str(stats_file)))

    driver = tmp_path / "drive_standalone.py"
    driver.write_text(f"""
import sys
repo = {str(P(__file__).resolve().parent.parent)!r}
sys.path = [p for p in sys.path if not p.startswith(repo)]
try:
    import emmax_tpu
    raise SystemExit("emmax_tpu importable - test is vacuous")
except ImportError:
    pass
sys.path.insert(0, {str(out)!r})
import numpy as np
import modeling_emmax as M
from processing_emmax import EmmaXProcessor
from configuration_emmax import EmmaXVLAConfig
model = M.EmmaXForVision2Seq.from_pretrained({str(out)!r})
proc = EmmaXProcessor.from_pretrained({str(out)!r},
                                      tokenizer=model.vla.tokenizer)
rng = np.random.default_rng(0)
prompt, image = proc.get_prompt(
    "wipe the table", rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
inputs = proc(prompt, image)
assert inputs["task"] == "wipe the table"
action = model.predict_action(inputs, unnorm_key="bridge_orig")
assert action.shape == (7,)
print("STANDALONE_OK", float(np.sum(action)))
""")
    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("PYTHONPATH",)}
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([_sys.executable, str(driver)], cwd=tmp_path,
                         capture_output=True, text=True, env=env,
                         timeout=420)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "STANDALONE_OK" in res.stdout
