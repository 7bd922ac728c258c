"""Offline evaluation: generate over the GCOT val set + metrics.

Counterpart of ``/root/reference/scripts/generate.py:84-229``: iterate a
``ValDataset``, run batched greedy generation, dump per-sample JSON
(``VLM_Response`` / ``ground_truth``), then compute policy-token
precision/recall/F1 (token-wise over ``;``-separated policies, first
word-boundary token dropped — :162-229) and Solver movement/L1 metrics.

Usage:
  python scripts/generate.py --checkpoint runs/<run> --val_json data/gcot/val.json \
      --out results.json [--smoke_test true]
  python scripts/generate.py --metric_file results.json   # metrics only
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from emmax_tpu.conf import parse_config
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch("generate")


@dataclass
class GenerateConfig:
    checkpoint: Optional[Path] = None
    val_json: Optional[Path] = None
    frames_dir: Optional[Path] = None
    out: Path = Path("generate_results.json")
    metric_file: Optional[Path] = None     # skip generation, just score
    data_mix: str = "movement_policy"
    batch_size: int = 8
    max_new_tokens: int = 512
    limit: Optional[int] = None
    tokenizer_path: Optional[str] = None
    smoke_test: bool = False


def policy_token_prf(results, tokenizer, decode_fn=None):
    """Token-level precision/recall/F1 over POLICIES strings
    (reference :162-229; drops the leading word-boundary token)."""
    correct = predicted = total = 0
    for r in results:
        pred = r["VLM_Response"].split("POLICIES:")[-1].replace("\n", "").split(";")
        gt = r["ground_truth"].split("POLICIES:")[-1].replace("\n", "").split(";")
        pred_tok = [tokenizer.encode(p, add_special_tokens=False) for p in pred]
        gt_tok = [tokenizer.encode(g, add_special_tokens=False) for g in gt]
        for j in range(min(len(pred), len(gt))):
            m = min(len(pred_tok[j]), len(gt_tok[j]))
            predicted += len(pred_tok[j]) - 1
            total += len(gt_tok[j]) - 1
            for k in range(1, m):  # first token is the word-boundary piece
                if pred_tok[j][k] == gt_tok[j][k]:
                    correct += 1
    p = correct / max(predicted, 1)
    r = correct / max(total, 1)
    f1 = 2 * p * r / max(p + r, 1e-9)
    return {"precision": p, "recall": r, "f1": f1,
            "correct": correct, "predicted": predicted, "total": total}


def main(cfg: GenerateConfig) -> None:
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.solver import Solver
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer, load_tokenizer

    if cfg.metric_file is not None:
        results = json.loads(Path(cfg.metric_file).read_text())
        tokenizer = (ByteLevelTokenizer() if cfg.tokenizer_path is None
                     else load_tokenizer(cfg.tokenizer_path))
        _report(results, tokenizer)
        return

    import time

    import jax
    import numpy as np

    from emmax_tpu.data.gcot import (SyntheticFrameSource,
                                     make_dummy_gcot_items)
    from emmax_tpu.data.pretrain import ValDataset

    if cfg.smoke_test:
        from emmax_tpu.models.vla import EmmaXVLA
        from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
        from emmax_tpu.ops.image import ImageTransformConfig

        vlm_cfg = tiny_vlm_config(512)
        tokenizer = ByteLevelTokenizer(512)
        vla = EmmaXVLA(vlm_cfg, init_vlm_params(jax.random.PRNGKey(0), vlm_cfg),
                       tokenizer,
                       {n: ImageTransformConfig(size=v.img_size)
                        for n, v in vlm_cfg.vision})
        items = make_dummy_gcot_items(8)
        frame_source = SyntheticFrameSource(64)
    else:
        from emmax_tpu.models.load import load_vla

        vla = load_vla(cfg.checkpoint, tokenizer_path=cfg.tokenizer_path)
        tokenizer = vla.tokenizer
        with open(cfg.val_json) as f:
            items = json.load(f)
        from emmax_tpu.data.gcot import DirectoryFrameSource

        frame_source = DirectoryFrameSource(cfg.frames_dir)

    at = ActionTokenizer(tokenizer)
    ds = ValDataset(items, at, frame_source, data_mix=cfg.data_mix)
    n = min(len(ds), cfg.limit or len(ds))
    results = []
    t0 = time.time()
    for start in range(0, n, cfg.batch_size):
        batch = [ds[i] for i in range(start, min(start + cfg.batch_size, n))]
        texts = vla.generate_batch([b["image"] for b in batch],
                                   [b["prompt"] for b in batch],
                                   max_new_tokens=cfg.max_new_tokens)
        for b, text in zip(batch, texts):
            results.append({"VLM_Response": text,
                            "ground_truth": b["ground_truth"],
                            "prompt": b["prompt"]})
        overwatch.info(f"{len(results)}/{n} in {time.time() - t0:.1f}s")
    Path(cfg.out).write_text(json.dumps(results, indent=2))
    _report(results, tokenizer)


def _report(results, tokenizer) -> None:
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.solver import Solver

    prf = policy_token_prf(results, tokenizer)
    solver = Solver(ActionTokenizer(tokenizer))
    _, acc, l1, rel, _, _ = solver.evaluate_batch(
        [r["ground_truth"] for r in results],
        [r["VLM_Response"] for r in results])
    import numpy as np

    overwatch.info(
        f"policy tokens: P={prf['precision'] * 100:.2f} "
        f"R={prf['recall'] * 100:.2f} F1={prf['f1'] * 100:.2f} | "
        f"solver acc={np.mean(acc):.3f} L1={np.mean(l1):.4f}")


if __name__ == "__main__":
    main(parse_config(GenerateConfig, sys.argv[1:]))
