from emmax_tpu.vla.prompting import (PromptBuilder, build_emma_x_task_prompt,
                                     get_prompt_builder)


def test_pure_prompt_single_turn():
    """Matches PurePromptBuilder wraps (base_prompter.py:36-37,71-73)."""
    pb = PromptBuilder("pure")
    pb.add_turn("human", "What action should the robot take?")
    assert pb.get_prompt() == "In: What action should the robot take?\nOut:"


def test_pure_prompt_multi_turn():
    pb = PromptBuilder("pure")
    pb.add_turn("human", "q1")
    pb.add_turn("gpt", "a1")
    pb.add_turn("human", "q2")
    assert pb.get_prompt() == "In: q1\nOut: a1</s>In: q2\nOut:"


def test_image_sentinel_stripped():
    pb = PromptBuilder("pure")
    pb.add_turn("human", "<image>\nlook at this")
    assert "<image>" not in pb.get_prompt()


def test_empty_gpt_message():
    pb = PromptBuilder("pure")
    pb.add_turn("human", "q")
    wrapped = pb.add_turn("gpt", "")
    assert wrapped == " </s>"


def test_potential_prompt_is_nondestructive():
    pb = PromptBuilder("pure")
    pb.add_turn("human", "q1")
    pb.add_turn("gpt", "a1")
    before = pb.get_prompt()
    potential = pb.get_potential_prompt("q2")
    assert potential.endswith("In: q2\nOut:")
    assert pb.get_prompt() == before


def test_llama2_chat_system_prompt():
    pb = PromptBuilder("llama2-chat")
    pb.add_turn("human", "hi")
    p = pb.get_prompt()
    assert p.startswith("[INST] <<SYS>")
    assert "[/INST]" in p


def test_vicuna_system_prompt():
    pb = PromptBuilder("vicuna-v15")
    pb.add_turn("human", "hi")
    p = pb.get_prompt()
    assert p.startswith("A chat between")
    assert "USER: hi ASSISTANT:" in p


def test_family_dispatch():
    assert get_prompt_builder("llama2-pure").style.name == "pure"
    assert get_prompt_builder("vicuna").style.name == "vicuna-v15"
    assert get_prompt_builder("phi").style.name == "phi"


def test_emma_x_task_prompt():
    """Shape of the closed-loop eval prompt (run_bridgev2_eval.py:167)."""
    p = build_emma_x_task_prompt("Put the pot next to the cans.", (48, 63))
    assert p == (
        "In: What action should the robot take to achieve the instruction\n"
        "INSTRUCTION: \nPut the pot next to the cans.\n"
        "CURRENT GRIPPER: [48, 63]\nOut:"
    )
