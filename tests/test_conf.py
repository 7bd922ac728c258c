import json

from emmax_tpu.conf import (EMMA_X_FLAGSHIP_ID, ModelConfig, VLAConfig,
                            config_to_dict, parse_config)


def test_flagship_vla_resolves():
    cls = VLAConfig.get_choice_class(EMMA_X_FLAGSHIP_ID)
    cfg = cls()
    assert cfg.data_mix == "movement_policy"      # conf/vla.py:302-314
    assert cfg.base_vlm == "prism-dinosiglip-224px+7b"
    assert cfg.learning_rate == 2e-5
    assert cfg.epochs == 200
    assert cfg.lr_scheduler_type == "constant"
    assert cfg.train_strategy == "fsdp-full-shard"


def test_all_reference_vla_ids_registered():
    expected = [
        "siglip-224px+mx-bridge",
        "prism-dinosiglip-224px+mx-bridge",
        "prism-dinosiglip-224px+mx-movement-only",
        "prism-dinosiglip-224px+mx-reason-position-movement",
        "prism-dinosiglip-224px+mx-pred-all-aug-multiple-policy",
        "prism-dinosiglip-224px+mx-pred-all-single-policy",
        "prism-dinosiglip-224px+mx-noposition-moveguided-single-policy",
        "prism-dinosiglip-224px+mx-noreason-moveguided-single-policy",
        "prism-dinosiglip-224px+mx-moveonly-moveguided-single-policy",
        "prism-dinosiglip-224px+mx-pred-all-moveguided-singlepolicy",
        "prism-dinosiglip-224px+mx-openvla-single-policy",
        "prism-dinosiglip-224px+mx-policy-only-multiple-policy",
        "prism-dinosiglip-224px+mx-no-movement-single-policy",
        "phi-2+3b-bridge",
        "siglip-224px+mx-oxe-magic-soup",
        "siglip-224px+mx-droid_wipe",
    ]
    known = VLAConfig.get_known_choices()
    for vid in expected:
        assert vid in known, vid


def test_model_ids_registered():
    for mid in ["prism-dinosiglip-224px+7b", "siglip-224px+7b", "phi-2+3b",
                "reproduction-llava-v15+7b", "llama2+7b"]:
        cls = ModelConfig.get_choice_class(mid)
        assert cls().model_id == mid
    flagship = ModelConfig.get_choice_class("prism-dinosiglip-224px+7b")()
    assert flagship.vision_backbone_id == "dinosiglip-vit-so-224px"
    assert flagship.llm_backbone_id == "llama2-7b-pure"
    assert flagship.arch_specifier == "no-align+fused-gelu-mlp"
    assert flagship.image_resize_strategy == "resize-naive"


def test_cli_choice_selection_and_overrides():
    import dataclasses

    @dataclasses.dataclass
    class Root:
        vla: VLAConfig = dataclasses.field(default_factory=VLAConfig)
        run_root_dir: str = "runs"
        seed: int = 7

    cfg = parse_config(
        Root,
        ["--vla.type", "prism-dinosiglip-224px+mx-pred-all-single-policy",
         "--vla.learning_rate", "1e-4", "--seed", "42",
         "--vla.max_steps", "1000", "--run_root_dir=out"],
        choice_fields={"vla": VLAConfig},
    )
    assert cfg.vla.data_mix == "pred_all"
    assert cfg.vla.learning_rate == 1e-4
    assert cfg.vla.max_steps == 1000
    assert cfg.seed == 42
    assert cfg.run_root_dir == "out"


def test_config_json_roundtrip(tmp_path):
    cfg = VLAConfig.get_choice_class(EMMA_X_FLAGSHIP_ID)()
    d = config_to_dict(cfg)
    blob = json.dumps(d)
    assert json.loads(blob)["data_mix"] == "movement_policy"
    assert json.loads(blob)["type"] == EMMA_X_FLAGSHIP_ID


def test_model_registry_covers_all_reference_ids():
    """Every model_id in the reference conf/models.py (checked-in list,
    tests/fixtures/reference_model_ids.txt, extracted from
    /root/reference/prismatic/conf/models.py + registry.py:9-691) resolves
    in both ModelConfig and the generated MODEL_REGISTRY."""
    from pathlib import Path

    from emmax_tpu.conf.models import ModelConfig
    from emmax_tpu.models.registry import MODEL_REGISTRY

    ids = [l.strip() for l in
           (Path(__file__).parent / "fixtures" /
            "reference_model_ids.txt").read_text().splitlines() if l.strip()]
    assert len(ids) == 50
    for mid in ids:
        mc = ModelConfig.get_choice_class(mid)()
        assert mc.model_id == mid
        assert mid in MODEL_REGISTRY
        assert MODEL_REGISTRY[mid]["kind"] == "vlm"
    # spot-check reference-exact overrides
    assert ModelConfig.get_choice_class(
        "train-1.25-epochs+7b")().finetune_max_steps == 6500
    assert ModelConfig.get_choice_class(
        "prism-dinosiglip+13b")().vision_backbone_id == \
        "dinosiglip-vit-so-384px"
    # the reference's prism-siglip+13b uses the CLIP tower (models.py:423)
    assert ModelConfig.get_choice_class(
        "prism-siglip+13b")().vision_backbone_id == "clip-vit-l-336px"
