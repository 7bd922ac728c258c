"""LRV / LVIS-Instruct-4V dataset converters (reference
``scripts/additional-datasets/*.py``)."""

import importlib.util
import json
import random
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts" / "additional-datasets"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, str(SCRIPTS))
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


lrv = _load("lrv_instruct")
lvis = _load("lvis_instruct_4v")


@pytest.fixture
def data_root(tmp_path):
    base = tmp_path
    lrv_dir = base / "lrv"
    (lrv_dir / "lrv-vg").mkdir(parents=True)
    (lrv_dir / "lrv-chart").mkdir(parents=True)
    vg1 = [{"image_id": 101, "question": " What color is it? ",
            "answer": " Red. "}]
    vg2 = [{"image_id": 102, "question": "Is there a dog?",
            "answer": "No, the image shows a cat."}]
    chart = [{"image_id": "stat_1.png", "question": "Max value?",
              "answer": "42"}]
    (lrv_dir / "filter_cap1.json").write_text(json.dumps(vg1))
    (lrv_dir / "filter_cap_more1.json").write_text(json.dumps(vg2))
    (lrv_dir / "chart_release_update.json").write_text(json.dumps(chart))
    for ex in vg1 + vg2:
        (lrv_dir / "lrv-vg" / f"{ex['image_id']}.jpg").write_bytes(b"jpg")
    (lrv_dir / "lrv-chart" / "stat_1.png").write_bytes(b"png")

    base_mix = [{"id": f"llava{i}", "conversations": []} for i in range(5)]
    (base / "llava_v1_5_mix665k.json").write_text(json.dumps(base_mix))
    lvis_raw = [{"id": "lv0", "image": "coco/im0.jpg", "conversations": []}]
    (base / "coco").mkdir()
    (base / "coco" / "im0.jpg").write_bytes(b"jpg")
    (base / "lvis_instruct4v_220k.json").write_text(json.dumps(lvis_raw))
    return base


def test_lrv_conversion_format(data_root):
    examples = json.loads(
        (data_root / "lrv" / "filter_cap1.json").read_text())
    out = lrv.convert_lrv_examples(examples, "lrv/lrv-vg",
                                   image_suffix=".jpg",
                                   image_dir=data_root / "lrv" / "lrv-vg")
    assert out[0]["image"] == "lrv/lrv-vg/101.jpg"
    # reference chat format: question stripped into the <image> human turn
    assert out[0]["conversations"][0] == {
        "from": "human", "value": "<image>\nWhat color is it?"}
    assert out[0]["conversations"][1] == {"from": "gpt", "value": "Red."}
    with pytest.raises(AssertionError, match="Missing Image"):
        lrv.convert_lrv_examples([{"image_id": 999, "question": "q",
                                   "answer": "a"}], "lrv/lrv-vg",
                                 image_suffix=".jpg",
                                 image_dir=data_root / "lrv" / "lrv-vg")


def test_lvis_then_lrv_mix_pipeline(data_root):
    n = lvis.build_lvis_instruct_4v(data_root)
    assert n == 6  # 5 base + 1 lvis
    counts = lrv.build_lrv_instruct(data_root)
    assert counts["llava_v1_5_lrv_mix1008k.json"] == 8        # 5 + 3 lrv
    assert counts["llava_v1_5_lvis4v_lrv_mix1231k.json"] == 9  # 6 + 3 lrv
    merged = json.loads(
        (data_root / "llava_v1_5_lvis4v_lrv_mix1231k.json").read_text())
    imgs = {ex.get("image") for ex in merged}
    assert "lrv/lrv-chart/stat_1.png" in imgs
    assert "lrv/lrv-vg/102.jpg" in imgs

    # ordering parity with the reference shuffle discipline
    # (random.seed(7) + 3 shuffles of base + lrv)
    base = json.loads((data_root / "llava_v1_5_mix665k.json").read_text())
    lrv_data = lrv.convert_lrv_examples(
        json.loads((data_root / "lrv" / "filter_cap1.json").read_text())
        + json.loads(
            (data_root / "lrv" / "filter_cap_more1.json").read_text()),
        "lrv/lrv-vg", image_suffix=".jpg")
    chart_data = lrv.convert_lrv_examples(
        json.loads(
            (data_root / "lrv" / "chart_release_update.json").read_text()),
        "lrv/lrv-chart")
    expect = base + lrv_data + chart_data
    random.seed(7)
    for _ in range(3):
        random.shuffle(expect)
    got = json.loads((data_root / "llava_v1_5_lrv_mix1008k.json").read_text())
    assert [e["id"] for e in got] == [e["id"] for e in expect]
