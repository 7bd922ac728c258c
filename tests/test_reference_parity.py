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
