"""Parity tests that import ``/root/reference/prismatic`` DIRECTLY and diff
its behavior against this repo (VERDICT round-1 item: the margin-based
parity story needs tests that actually run reference code).

The reference's heavyweight/missing deps are stubbed at module granularity
(timm, torchvision, draccus, dlimp, tensorflow_datasets are not installed
here; the Llama tokenizer download in ``solver.py:188`` is replaced by the
hermetic ``ByteLevelTokenizer``, which reproduces the Llama contracts the
reference relies on). Everything else — ActionTokenizer bin math, Solver
grammar, prompt builders, the PrismaticVLM fusion layout — is the
reference's own code running on torch CPU.
"""

from __future__ import annotations

import sys
import types
import warnings

import numpy as np
import pytest

REF_ROOT = "/root/reference"


def _install_stubs():
    """Make the reference package importable without its GPU/data deps."""
    import torch.nn as nn

    import importlib.machinery

    def module(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec-style probes
        # (e.g. transformers' is_timm_available) don't choke
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for key, val in attrs.items():
            setattr(mod, key, val)
        sys.modules[name] = mod
        return mod

    class _Block(nn.Module):
        pass

    class _VisionTransformer(nn.Module):
        pass

    timm = module("timm", create_model=lambda *a, **k: None)
    timm.models = module("timm.models")
    timm.models.vision_transformer = module(
        "timm.models.vision_transformer", Block=_Block,
        VisionTransformer=_VisionTransformer)
    timm.data = module("timm.data")

    tv = module("torchvision")
    tv.transforms = module(
        "torchvision.transforms",
        Compose=lambda ts: ts, Resize=object)
    tv.transforms.functional = module("torchvision.transforms.functional")

    class ChoiceRegistry:
        @classmethod
        def register_subclass(cls, name, *a, **k):
            def deco(sub):
                reg = cls.__dict__.get("_choice_registry")
                if reg is None:
                    reg = {}
                    setattr(cls, "_choice_registry", reg)
                reg[name] = sub
                return sub
            return deco

        @classmethod
        def get_choice_class(cls, name):
            return cls._choice_registry[name]

        @classmethod
        def get_choice_name(cls, sub):
            for name, klass in cls._choice_registry.items():
                if klass is sub:
                    return name
            raise KeyError(sub)

    module("draccus", ChoiceRegistry=ChoiceRegistry)
    module("dlimp", DLataset=type("DLataset", (), {}),
           transforms=types.SimpleNamespace())
    module("tensorflow_datasets", builder=lambda *a, **k: None)
    tfgx = module("tensorflow_graphics")
    tfgx.geometry = module("tensorflow_graphics.geometry")
    tfgx.geometry.transformation = module(
        "tensorflow_graphics.geometry.transformation",
        euler=types.SimpleNamespace(), rotation_matrix_3d=types.SimpleNamespace(),
        quaternion=types.SimpleNamespace())
    module("jsonlines")
    module("wandb")


class HFStubTokenizer:
    """The PreTrainedTokenizer surface the reference touches, backed by the
    hermetic ByteLevelTokenizer (same instance semantics both sides)."""

    def __init__(self, inner):
        self.inner = inner
        self.vocab_size = inner.vocab_size
        self.model_max_length = 2048

    def __call__(self, text, add_special_tokens=True, **kw):
        return self.inner(text, add_special_tokens=add_special_tokens)

    def encode(self, text, add_special_tokens=True, **kw):
        return self.inner.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids, **kw):
        return self.inner.decode([int(i) for i in ids])

    def batch_decode(self, seqs, **kw):
        return [self.decode(s) for s in seqs]


@pytest.fixture(scope="module")
def ref():
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    _install_stubs()
    import torch
    import transformers
    orig = transformers.AutoTokenizer.from_pretrained
    transformers.AutoTokenizer.from_pretrained = (
        lambda *a, **k: HFStubTokenizer(ByteLevelTokenizer()))
    # reference conf/vla.py divides by the CUDA device count at class
    # definition time (vla.py:240) — pretend one device exists for import
    orig_count = torch.cuda.device_count
    torch.cuda.device_count = lambda: 1
    sys.path.insert(0, REF_ROOT)
    try:
        import prismatic.models.backbones.llm.prompting as ref_prompting
        import prismatic.models.vlms.prismatic as ref_prismatic
        import prismatic.vla.action_tokenizer as ref_action_tokenizer
        import prismatic.vla.solver as ref_solver
    finally:
        transformers.AutoTokenizer.from_pretrained = orig
        torch.cuda.device_count = orig_count
        sys.path.remove(REF_ROOT)
    return types.SimpleNamespace(
        prompting=ref_prompting, prismatic=ref_prismatic,
        action_tokenizer=ref_action_tokenizer, solver=ref_solver)


@pytest.fixture(scope="module")
def pair(ref):
    """(reference Solver+ActionTokenizer, ours) on the same byte tokenizer."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.solver import Solver
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    byte_tok = ByteLevelTokenizer()
    ref_at = ref.action_tokenizer.ActionTokenizer(HFStubTokenizer(byte_tok))
    ref_sv = ref.solver.Solver(ref_at, verbose=False)
    our_at = ActionTokenizer(byte_tok)
    our_sv = Solver(our_at)
    return ref_at, ref_sv, our_at, our_sv


# --------------------------------------------------------------- tokenizer

def test_action_tokenizer_parity(pair):
    """Bin/vocab arithmetic identical to reference action_tokenizer.py:38-68."""
    ref_at, _, our_at, _ = pair
    assert ref_at.action_token_begin_idx == our_at.action_token_begin_idx
    rng = np.random.default_rng(0)
    actions = np.concatenate([
        rng.uniform(-1.3, 1.3, size=(64, 7)),
        np.array([[-1.0, 1.0, 0.0, -0.999, 0.999, 2.0, -2.0]]),
    ])
    for a in actions:
        assert ref_at(a) == our_at(a)
    batch = actions[:5]
    assert list(ref_at(batch)) == list(our_at(batch))

    ids = rng.integers(our_at.tokenizer.vocab_size - 256,
                       our_at.tokenizer.vocab_size, size=(128,))
    np.testing.assert_array_equal(
        ref_at.decode_token_ids_to_actions(ids),
        our_at.decode_token_ids_to_actions(ids))
    # out-of-range clipping edge
    edge = np.array([our_at.tokenizer.vocab_size - 256,
                     our_at.tokenizer.vocab_size - 1])
    np.testing.assert_array_equal(ref_at.decode_token_ids_to_actions(edge),
                                  our_at.decode_token_ids_to_actions(edge))


# ------------------------------------------------------------------ solver

GCOT_CORPUS = [
    # full GCOT answer with textual movement
    ("REASONING: reach the cup\nSUBTASK: approach\nNEXT GRIPPER: [104, 98]\n"
     "MOVEMENT:\nmove forward 12 steps; move left 3 steps; close gripper;\n"
     "POLICIES: abcdefgh; ijklmnop;"),
    # tokenized-normalized movement (no "gripper" word on the line)
    "MOVEMENT:\nqrstuvwx\nPOLICIES: abcdefgh;",
    # policies only
    "POLICIES: zzzzzzzz; yyyyyyyy;",
    # movement grammar with every direction family
    ("MOVEMENT:\nmove backward 4 steps; move right 2 steps; move upward 9 "
     "steps; move downward 1 steps; roll upward 5 steps; pitch downward 7 "
     "steps; yaw upward 2 steps; open gripper;\nPOLICIES: abcdefgh;"),
    # degenerate / garbage inputs must take the same fallback
    "no keywords at all",
    "NEXT GRIPPER: oops MOVEMENT: huh POLICIES:",
    "",
    "NEXT GRIPPER: [12, 34]\nrest",
]


def test_solver_policy_extraction_parity(pair):
    _, ref_sv, _, our_sv = pair
    for text in GCOT_CORPUS:
        ref_pol, ref_rest = ref_sv.extract_action_policies(text)
        our_pol, our_rest = our_sv.extract_action_policies(text)
        assert ref_rest == our_rest, text
        np.testing.assert_allclose(np.asarray(our_pol, dtype=np.float64),
                                   np.asarray(ref_pol, dtype=np.float64),
                                   err_msg=text)


def test_solver_movement_extraction_parity(pair):
    _, ref_sv, _, our_sv = pair
    for text in GCOT_CORPUS:
        ref_unorm, ref_mv = ref_sv.extract_movement_plan(text)
        our_unorm, our_mv = our_sv.extract_movement_plan(text)
        assert ref_unorm == our_unorm, text
        np.testing.assert_allclose(np.asarray(our_mv, np.float64),
                                   np.asarray(ref_mv, np.float64),
                                   err_msg=text)


def test_solver_coordinates_parity(pair):
    _, ref_sv, _, our_sv = pair
    for text in GCOT_CORPUS:
        assert list(our_sv.extract_2d_coordinates(text)) == \
            list(ref_sv.extract_2d_coordinates(text)), text


def test_solver_evaluate_single_parity(pair):
    _, ref_sv, _, our_sv = pair
    gt = GCOT_CORPUS[0]
    pred = gt.replace("abcdefgh", "abcdefgx")
    with warnings.catch_warnings():
        # the reference divides by zero label dims (solver.py:154)
        warnings.simplefilter("ignore")
        ref_out = ref_sv.evaluate_single(gt, pred)
    our_out = our_sv.evaluate_single(gt, pred)
    # state placeholder, policy accuracy, L1 must match exactly
    assert ref_out[0] == our_out[0]
    assert ref_out[1] == our_out[1]
    np.testing.assert_allclose(our_out[2], ref_out[2])
    np.testing.assert_allclose(np.asarray(our_out[4]), np.asarray(ref_out[4]))
    np.testing.assert_allclose(np.asarray(our_out[5]), np.asarray(ref_out[5]))


# --------------------------------------------------------- prompt builders

CONVO = [
    ("human", "What is in the image? <image>"),
    ("gpt", "A red cup."),
    ("human", "Pick it up."),
    ("gpt", ""),
]

FAMILIES = [  # (reference class name, our style key)
    ("PurePromptBuilder", "pure"),
    ("LLaMa2ChatPromptBuilder", "llama2-chat"),
    ("VicunaV15ChatPromptBuilder", "vicuna-v15"),
    ("PhiPromptBuilder", "phi"),
    ("MistralInstructPromptBuilder", "mistral-instruct"),
]


@pytest.mark.parametrize("ref_name,style", FAMILIES)
def test_prompt_builder_parity(ref, ref_name, style):
    from emmax_tpu.vla.prompting import PromptBuilder

    ref_builder = getattr(ref.prompting, ref_name)("prismatic")
    ours = PromptBuilder(style=style)
    for role, msg in CONVO:
        assert ref_builder.add_turn(role, msg) == ours.add_turn(role, msg), \
            (ref_name, role, msg)
        assert ref_builder.get_prompt() == ours.get_prompt(), ref_name
    assert (ref_builder.get_potential_prompt("Now place it.")
            == ours.get_potential_prompt("Now place it."))


# ------------------------------------------------- multimodal fusion layout

def test_fusion_layout_parity(ref):
    """Run the reference PrismaticVLM.forward fusion (prismatic.py:371-424,
    stubbed backbones) and diff the fused embeddings/mask/labels against
    fuse_multimodal byte-for-byte (right-padded batch => BOS at index 0)."""
    import jax.numpy as jnp
    import torch
    import torch.nn as nn
    from transformers.modeling_outputs import CausalLMOutputWithPast

    from emmax_tpu.models.llama import IGNORE_INDEX
    from emmax_tpu.models.vlm import fuse_multimodal

    B, L, P, D = 2, 7, 3, 8
    rng = np.random.default_rng(0)
    embed_table = rng.normal(size=(64, D)).astype(np.float32)
    input_ids = rng.integers(3, 64, size=(B, L))
    input_ids[:, 0] = 1
    attention_mask = np.ones((B, L), dtype=bool)
    attention_mask[1, 5:] = False  # right padding on row 1
    labels = input_ids.copy()
    labels[:, 0] = IGNORE_INDEX
    labels[~attention_mask] = IGNORE_INDEX
    patches = rng.normal(size=(B, P, D)).astype(np.float32)

    captured = {}

    class StubVision(nn.Module):
        def forward(self, pixel_values):
            return torch.as_tensor(patches)

    class StubProjector(nn.Module):
        def forward(self, feats):
            return feats

    class StubLLM(nn.Module):
        def embed_input_ids(self, ids):
            return torch.as_tensor(embed_table)[ids]

        def forward(self, input_ids=None, attention_mask=None,
                    position_ids=None, past_key_values=None,
                    inputs_embeds=None, labels=None, use_cache=None,
                    output_attentions=None, output_hidden_states=None,
                    return_dict=None):
            captured["embeds"] = inputs_embeds.detach().numpy()
            captured["mask"] = attention_mask.detach().numpy()
            captured["labels"] = labels.detach().numpy()
            return CausalLMOutputWithPast(
                loss=torch.zeros(()), logits=torch.zeros(1))

    PrismaticVLM = ref.prismatic.PrismaticVLM
    vlm = object.__new__(PrismaticVLM)
    nn.Module.__init__(vlm)
    vlm.vision_backbone = StubVision()
    vlm.projector = StubProjector()
    vlm.llm_backbone = StubLLM()
    vlm.vision_backbone_requires_grad = False

    vlm.forward(
        input_ids=torch.as_tensor(input_ids),
        attention_mask=torch.as_tensor(attention_mask),
        pixel_values=torch.as_tensor(np.zeros((B, 3, 4, 4), np.float32)),
        labels=torch.as_tensor(labels))

    our_embeds, our_mask, our_labels, _ = fuse_multimodal(
        jnp.asarray(patches),
        jnp.asarray(embed_table)[jnp.asarray(input_ids)],
        jnp.asarray(attention_mask), jnp.asarray(labels))

    np.testing.assert_array_equal(np.asarray(our_mask), captured["mask"])
    np.testing.assert_array_equal(np.asarray(our_labels), captured["labels"])
    np.testing.assert_array_equal(np.asarray(our_embeds), captured["embeds"])


def test_mixed_modality_fusion_parity(ref):
    """Mixed multimodal/text-only batch: reference forward with
    multimodal_indices (unimodal merge, prismatic.py:426-471) vs our
    fuse_multimodal(multimodal_mask=...). The reference REORDERS the fused
    batch to [multimodal rows..., unimodal rows...]; ours preserves row
    order, so the comparison permutes accordingly."""
    import jax.numpy as jnp
    import torch
    import torch.nn as nn
    from transformers.modeling_outputs import CausalLMOutputWithPast

    from emmax_tpu.models.llama import IGNORE_INDEX
    from emmax_tpu.models.vlm import fuse_multimodal

    B, L, P, D = 4, 6, 3, 8
    rng = np.random.default_rng(1)
    embed_table = rng.normal(size=(64, D)).astype(np.float32)
    input_ids = rng.integers(3, 64, size=(B, L))
    input_ids[:, 0] = 1
    attention_mask = np.ones((B, L), dtype=bool)
    attention_mask[2, 4:] = False
    labels = input_ids.copy()
    labels[:, 0] = IGNORE_INDEX
    labels[~attention_mask] = IGNORE_INDEX
    mm_idx = np.asarray([0, 2])          # rows 1, 3 are text-only
    patches_mm = rng.normal(size=(len(mm_idx), P, D)).astype(np.float32)

    captured = {}

    class StubVision(nn.Module):
        def forward(self, pixel_values):
            return torch.as_tensor(patches_mm)

    class StubProjector(nn.Module):
        def forward(self, feats):
            return feats

    class StubLLM(nn.Module):
        def embed_input_ids(self, ids):
            return torch.as_tensor(embed_table)[ids]

        def forward(self, inputs_embeds=None, attention_mask=None,
                    labels=None, **kw):
            captured["embeds"] = inputs_embeds.detach().numpy()
            captured["mask"] = attention_mask.detach().numpy()
            captured["labels"] = labels.detach().numpy()
            return CausalLMOutputWithPast(loss=torch.zeros(()),
                                          logits=torch.zeros(1))

    vlm = object.__new__(ref.prismatic.PrismaticVLM)
    nn.Module.__init__(vlm)
    vlm.vision_backbone = StubVision()
    vlm.projector = StubProjector()
    vlm.llm_backbone = StubLLM()
    vlm.vision_backbone_requires_grad = False
    vlm.forward(
        input_ids=torch.as_tensor(input_ids),
        attention_mask=torch.as_tensor(attention_mask),
        pixel_values=torch.as_tensor(np.zeros((B, 3, 4, 4), np.float32)),
        labels=torch.as_tensor(labels),
        multimodal_indices=torch.as_tensor(mm_idx))

    # ours: full-batch patches (text rows' patches are ignored/zeroed)
    patches_full = np.zeros((B, P, D), np.float32)
    patches_full[mm_idx] = patches_mm
    mm_mask = np.zeros(B, bool)
    mm_mask[mm_idx] = True
    our_embeds, our_mask, our_labels, _ = fuse_multimodal(
        jnp.asarray(patches_full),
        jnp.asarray(embed_table)[jnp.asarray(input_ids)],
        jnp.asarray(attention_mask), jnp.asarray(labels),
        multimodal_mask=jnp.asarray(mm_mask))

    perm = np.concatenate([mm_idx, [i for i in range(B) if i not in mm_idx]])
    np.testing.assert_array_equal(np.asarray(our_mask)[perm],
                                  captured["mask"])
    np.testing.assert_array_equal(np.asarray(our_labels)[perm],
                                  captured["labels"])
    np.testing.assert_array_equal(np.asarray(our_embeds)[perm],
                                  captured["embeds"])


def test_end_to_end_forward_parity_with_real_llama(ref):
    """Reference PrismaticVLM.forward with a REAL tiny HF Llama backbone vs
    our vlm path with converted weights: fused-sequence logits and loss
    match end to end (fusion + attention masking + HF label shifting)."""
    import jax.numpy as jnp
    import torch
    import torch.nn as nn
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from emmax_tpu.models.convert import convert_hf_llama
    from emmax_tpu.models.llama import (IGNORE_INDEX, LlamaConfig,
                                        cross_entropy_loss, embed_tokens,
                                        llama_forward)
    from emmax_tpu.models.vlm import fuse_multimodal

    cfg = LlamaConfig(vocab_size=128, dim=32, n_layers=2, n_heads=4,
                      n_kv_heads=2, hidden_dim=64, max_seq_len=64)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, intermediate_size=cfg.hidden_dim,
        max_position_embeddings=cfg.max_seq_len, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, attn_implementation="eager",
        tie_word_embeddings=False)).eval()
    import jax

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_hf_llama(hf.state_dict(), cfg))

    B, L, P = 2, 9, 3
    rng = np.random.default_rng(0)
    input_ids = rng.integers(3, cfg.vocab_size, size=(B, L))
    input_ids[:, 0] = 1
    attention_mask = np.ones((B, L), dtype=bool)
    attention_mask[1, 7:] = False
    labels = input_ids.copy()
    labels[:, 0] = IGNORE_INDEX
    labels[~attention_mask] = IGNORE_INDEX
    patches = rng.normal(scale=0.02, size=(B, P, cfg.dim)).astype(np.float32)

    class StubVision(nn.Module):
        def forward(self, pixel_values):
            return torch.as_tensor(patches)

    class StubProjector(nn.Module):
        def forward(self, feats):
            return feats

    class RealLLM(nn.Module):
        def __init__(self):
            super().__init__()
            self.hf = hf

        def embed_input_ids(self, ids):
            return self.hf.get_input_embeddings()(ids)

        def forward(self, input_ids=None, attention_mask=None,
                    position_ids=None, past_key_values=None,
                    inputs_embeds=None, labels=None, **kw):
            return self.hf(input_ids=input_ids,
                           attention_mask=attention_mask,
                           inputs_embeds=inputs_embeds, labels=labels)

    vlm = object.__new__(ref.prismatic.PrismaticVLM)
    nn.Module.__init__(vlm)
    vlm.vision_backbone = StubVision()
    vlm.projector = StubProjector()
    vlm.llm_backbone = RealLLM()
    vlm.vision_backbone_requires_grad = False
    with torch.no_grad():
        ref_out = vlm.forward(
            input_ids=torch.as_tensor(input_ids),
            attention_mask=torch.as_tensor(attention_mask),
            pixel_values=torch.as_tensor(np.zeros((B, 3, 4, 4), np.float32)),
            labels=torch.as_tensor(labels))

    embeds, fmask, flabels, positions = fuse_multimodal(
        jnp.asarray(patches), embed_tokens(params, jnp.asarray(input_ids)),
        jnp.asarray(attention_mask), jnp.asarray(labels))
    logits, _ = llama_forward(params, cfg, embeds, mask=fmask,
                              positions=positions)
    loss = cross_entropy_loss(logits, flabels)

    # compare only VALID fused positions: for right-pad slots HF uses
    # arange position ids while we use mask-aware positions — pad logits
    # are masked out of the loss on both sides and never consumed
    valid = np.asarray(fmask)[..., None]
    np.testing.assert_allclose(np.asarray(logits) * valid,
                               ref_out.logits.numpy() * valid,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(loss), float(ref_out.loss),
                               atol=1e-5, rtol=1e-5)


# ------------------------------------------------- OXE transform parity

def _tf():
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    return tf


def _run_both(ref, name, make_traj):
    """Run the reference and our standardize fns on IDENTICAL synthetic
    trajectories (inside tf.data graph mode, the real context). The traj is
    built once; both fns map over fresh tensor copies of it."""
    import copy
    import importlib

    tf = _tf()
    ref_transforms = importlib.import_module(
        "prismatic.vla.datasets.rlds.oxe.transforms")
    from emmax_tpu.data import oxe as our_oxe

    ref_fn = ref_transforms.OXE_STANDARDIZATION_TRANSFORMS[name]
    our_fn = our_oxe.OXE_STANDARDIZATION_TRANSFORMS[name]
    traj = make_traj()
    outs = []
    for fn in (ref_fn, our_fn):
        ds = tf.data.Dataset.from_tensors(copy.deepcopy(traj)).map(fn)
        outs.append(next(iter(ds.as_numpy_iterator())))
    return outs


@pytest.mark.parametrize("name", ["fractal20220817_data", "jaco_play", "taco_play",
                                  "berkeley_autolab_ur5", "bridge_oxe"])
def test_oxe_transform_parity(ref, name):
    tf = _tf()
    rng = np.random.default_rng(3)
    T = 6

    def base_action():
        return {
            "world_vector": tf.constant(rng.normal(size=(T, 3)), tf.float32),
            "rotation_delta": tf.constant(rng.normal(size=(T, 3)),
                                          tf.float32),
            "gripper_closedness_action": tf.constant(
                [[0.0], [1.0], [0.0], [-1.0], [0.0], [1.0]], tf.float32),
        }

    def make_traj():
        lang = tf.constant([b"pick up the block"] * T)
        if name == "fractal20220817_data":
            return {"action": base_action(),
                    "observation": {
                        "natural_language_instruction": lang}}
        if name == "jaco_play":
            return {"action": base_action(),
                    "observation": {
                        "natural_language_instruction": lang,
                        "end_effector_cartesian_pos": tf.constant(
                            rng.normal(size=(T, 7)), tf.float32)}}
        if name == "taco_play":
            return {"action": {"rel_actions_world": tf.constant(
                        rng.normal(size=(T, 7)), tf.float32)},
                    "observation": {
                        "natural_language_instruction": lang,
                        "robot_obs": tf.constant(rng.normal(size=(T, 15)),
                                                 tf.float32)}}
        if name == "berkeley_autolab_ur5":
            act = base_action()
            act["gripper_closedness_action"] = tf.constant(
                [0.0, 1.0, 0.0, -1.0, 0.0, 1.0], tf.float32)
            return {"action": act,
                    "observation": {
                        "natural_language_instruction": lang,
                        "robot_state": tf.constant(rng.normal(size=(T, 15)),
                                                   tf.float32),
                        "image_with_depth": tf.constant(
                            rng.normal(size=(T, 4, 4, 1)), tf.float32)}}
        if name == "bridge_oxe":
            act = base_action()
            act.pop("gripper_closedness_action")
            act["open_gripper"] = tf.constant([True, True, False, False,
                                               True, True])
            return {"action": act,
                    "observation": {
                        "natural_language_instruction": lang,
                        "state": tf.constant(rng.normal(size=(T, 7)),
                                             tf.float32)},
                    "traj_metadata": {"episode_id": tf.constant([7] * T)}}
        raise KeyError(name)

    ref_out, our_out = _run_both(ref, name, make_traj)
    np.testing.assert_allclose(our_out["action"], ref_out["action"],
                               atol=1e-6, err_msg=name)
    np.testing.assert_array_equal(our_out["language_instruction"],
                                  ref_out["language_instruction"])
    for key in ("EEF_state", "gripper_state", "state_eef", "state_gripper",
                "state"):
        if key in ref_out.get("observation", {}):
            assert key in our_out["observation"], (name, key)
            np.testing.assert_allclose(our_out["observation"][key],
                                       ref_out["observation"][key],
                                       atol=1e-6, err_msg=(name, key))
