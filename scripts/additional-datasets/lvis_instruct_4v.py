"""LVIS-Instruct-4V mix builder.

Counterpart of ``/root/reference/scripts/additional-datasets/
lvis_instruct_4v.py:39-77``: verifies every image referenced by the
already-LLaVa-format ``lvis_instruct4v_220k.json`` and emits the merged
``llava_v1_5_lvis4v_mix888k.json`` with the reference's exact shuffle
discipline (``random.seed(7)`` + 3 shuffles). The raw JSON download URL is
documented in the reference script; this builder starts from the file.

Usage:
    python scripts/additional-datasets/lvis_instruct_4v.py \
        --base_dir data/download/llava-v1.5-instruct
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


def build_lvis_instruct_4v(base_dir, *, verify_images: bool = True) -> int:
    from lrv_instruct import triple_shuffle  # shared shuffle discipline

    base_dir = Path(base_dir)
    data = json.loads((base_dir / "lvis_instruct4v_220k.json").read_text())
    if verify_images:
        for ex in data:
            assert (base_dir / ex["image"]).exists(), \
                f"Missing Image `{ex['image']}`"
    base = json.loads((base_dir / "llava_v1_5_mix665k.json").read_text())
    merged = triple_shuffle(base + data)
    out = base_dir / "llava_v1_5_lvis4v_mix888k.json"
    out.write_text(json.dumps(merged))
    overwatch.info(f"{out.name}: {len(merged)} examples")
    return len(merged)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--base_dir",
                        default="data/download/llava-v1.5-instruct")
    parser.add_argument("--skip_image_verification", action="store_true")
    args = parser.parse_args()
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    build_lvis_instruct_4v(args.base_dir,
                           verify_images=not args.skip_image_verification)
