"""Offline CPU simulator of the speculative accept loop — draft tuning tool.

Step counts under teacher forcing are weight-independent: they depend only
on the draft sources and the accept rule. This replicates
``serving/speculative.py:_spec_decode`` exactly (n-gram cascade lookup with
full-window history writes, action-bin stride fallback, product-tree
verification walk), so draft policies can be ranked in milliseconds on CPU
before spending a multi-minute relay compile. Round-3/4 tuning used this to
pick the n=5..2 lookup cascade, the lookup>stride priority (stride-first
TRIPLES warm-frame steps), and the (7, 5) tree widths.

``python scripts/sim_spec_drafts.py`` prints the step table for the
bench.py closed-loop streams. ``tests/test_spec_simulator.py`` pins
sim-vs-engine step equality.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional, Sequence, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

TREE_OFFSETS = (0, -1, 1, -2, 2, -3, 3)


def _ngram_best(hist, hlen, n):
    suf = hist[hlen - n:hlen]
    best = -1
    for j in range(hlen - n):
        if np.array_equal(hist[j:j + n], suf):
            best = j
    return best


def lookup_draft(hist, hlen, k, max_n=5):
    """Numpy twin of speculative.lookup_draft (single row)."""
    draft = np.full(k, -1, np.int64)
    for n in range(2, max_n + 1):
        j = _ngram_best(hist, hlen, n)
        if j >= 0:
            start = min(j + n, len(hist) - k)
            d = hist[start:start + k].copy()
            d[np.arange(start, start + k) >= hlen] = -1
            draft = d
    return draft


def stride_draft(hist, hlen, k, bin_lo, bin_hi, period=7):
    """Numpy twin of speculative.action_stride_draft (single row)."""
    if hlen < period:
        return np.full(k, -1, np.int64)
    last = hist[hlen - period:hlen]
    if not ((last >= bin_lo) & (last <= bin_hi)).all():
        return np.full(k, -1, np.int64)
    return np.tile(last, k // period + 1)[:k]


def simulate_steps(forced: np.ndarray, draft_ctx: np.ndarray, *,
                   k: int = 12, bin_lo: int = 0, bin_hi: int = -1,
                   stride: bool = False,
                   tree: Optional[Tuple[int, ...]] = None,
                   period: int = 7, max_new: Optional[int] = None,
                   vocab_size: Optional[int] = None) -> int:
    """Verifier-step count for one row. ``draft_ctx`` must already include
    the prompt tail the engine prepends (``generate_ids``)."""
    max_new = max_new or len(forced)
    forced = np.asarray(forced, np.int64)
    if tree:
        # unified W-wide chunks (round 5, speculative._spec_decode): with a
        # tree compiled in, linear steps draft into all W-1 slots
        n1 = 1 + int(np.sum(np.cumprod(tree)))
        k = max(k + 1, n1) - 1
    H = len(draft_ctx) + max_new * 3 + 64
    hist = np.full(H, -1, np.int64)
    hist[:len(draft_ctx)] = draft_ctx
    hlen = len(draft_ctx)
    hist[hlen] = forced[0]
    hlen += 1
    out_len, steps = 1, 0
    vmax = (vocab_size - 1) if vocab_size else None
    while out_len < max_new:
        steps += 1
        lk = lookup_draft(hist, hlen, k)
        in_run = (hlen >= period and
                  ((hist[hlen - period:hlen] >= bin_lo)
                   & (hist[hlen - period:hlen] <= bin_hi)).all())
        if tree and lk[0] < 0 and in_run:
            # product-tree walk (speculative._spec_decode tree branch)
            D = len(tree)
            guess = [hist[hlen - period + (d % period)] for d in range(D)]
            t_prev = forced[out_len] if out_len < len(forced) else 2
            e = 1
            for d, c in enumerate(tree):
                cands = [guess[d] + o for o in TREE_OFFSETS[:c]]
                if vmax is not None:
                    cands = [min(max(t, 0), vmax) for t in cands]
                if t_prev in cands and out_len + e <= len(forced):
                    t_prev = (forced[out_len + e]
                              if out_len + e < len(forced) else 2)
                    e += 1
                else:
                    break
            e = min(e, max_new - out_len + 1, len(forced) - out_len)
            e = max(e, 1)
            hist[hlen:hlen + e] = forced[out_len:out_len + e]
            hlen += e
            out_len += e
            continue
        draft = lk
        if stride and lk[0] < 0:
            draft = stride_draft(hist, hlen, k, bin_lo, bin_hi, period)
        targets = forced[out_len:out_len + k + 1]
        if len(targets) < k + 1:
            targets = np.concatenate(
                [targets, np.full(k + 1 - len(targets), 2, np.int64)])
        acc = np.cumprod(draft == targets[:k])
        e = min(int(acc.sum()) + 1, max_new - out_len + 1)
        w = min(k + 1, H - hlen)
        hist[hlen:hlen + w] = targets[:w]       # full-window write
        hlen += e
        out_len += e
    return steps


def main():
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    tok = ByteLevelTokenizer()
    atok = ActionTokenizer(tok)
    lo, hi = tok.vocab_size - atok.n_bins, tok.vocab_size - 1

    # bench.py's closed-loop streams, reproduced byte for byte
    A, F, T = 8, 12, 96
    rng_a = np.random.default_rng(1)
    base = rng_a.uniform(-0.4, 0.4, size=7)
    rollout = [np.clip(base + rng_a.normal(scale=0.02, size=7), -1, 1)
               for _ in range(A + F)]

    def frame_stream(f):
        text = ("REASONING: the gripper must reach the eggplant before "
                "grasping it\nSUBTASK: move the gripper to the eggplant"
                f"\nNEXT GRIPPER: [{112 + 2 * f}, {96 + f}]\nMOVEMENT:\n"
                f"move forward {21 - f} steps; move left 3 steps; close "
                "gripper;\nPOLICIES: ")
        ids = tok.encode(text)[:T - A * 7]
        for a in rollout[f:f + A]:
            ids.extend(int(t) for t in atok.encode_to_ids(a))
        return np.asarray(ids[:T], np.int64)

    seed = tok.encode(
        "REASONING: the gripper must \nSUBTASK: move the gripper to "
        "the \nNEXT GRIPPER: [1, 1]\nMOVEMENT:\nmove forward 1 steps; "
        "move left 1 steps; close gripper;\nPOLICIES: "
        "REASONING: the gripper must reach the \nSUBTASK: move the "
        "gripper to the \nNEXT GRIPPER: [10, 10]\nMOVEMENT:\nmove "
        "backward 2 steps; move right 2 steps; open gripper;\nPOLICIES: ",
        add_special_tokens=False)
    prompt_tail = np.asarray(tok.encode(
        "In: What action should the robot take to achieve the instruction"
        "\nINSTRUCTION: \nPut the eggplant in the pot\nCURRENT GRIPPER: "
        "[104, 098]\nOut:"), np.int64)[-8:]

    cold_ctx = np.concatenate([prompt_tail, np.asarray(seed)])
    sess_ctx = np.concatenate([prompt_tail, frame_stream(F - 1)])
    warm_ctx = np.concatenate([prompt_tail, frame_stream(0)])
    nospc_ctx = prompt_tail

    def row(name, **kw):
        kw.setdefault("bin_lo", lo)
        kw.setdefault("bin_hi", hi)
        cold = simulate_steps(frame_stream(0), cold_ctx, **kw)
        sess = simulate_steps(frame_stream(0), sess_ctx, **kw)
        warm = simulate_steps(frame_stream(1), warm_ctx, **kw)
        bare = simulate_steps(frame_stream(0), nospc_ctx, **kw)
        print(f"{name:28s} cold={cold:3d} session_first={sess:3d} "
              f"warm={warm:3d} no_seed={bare:3d}")

    row("lookup only")
    row("+ stride +-0", stride=True)
    for w in ((7,), (5, 5), (7, 5), (7, 5, 1)):
        row(f"+ tree {w}", stride=True, tree=w)


if __name__ == "__main__":
    main()
