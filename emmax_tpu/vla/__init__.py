from emmax_tpu.vla.action_tokenizer import (ActionTokenizer,
                                            unnormalize_actions,
                                            unnormalize_proprio)
from emmax_tpu.vla.prompting import (PromptBuilder, build_emma_x_task_prompt,
                                     get_prompt_builder)
from emmax_tpu.vla.solver import Solver
from emmax_tpu.vla.tokenizer import (ByteLevelTokenizer, HFTokenizerAdapter,
                                     Tokenizer, load_tokenizer)

__all__ = [
    "ActionTokenizer", "Solver", "PromptBuilder", "Tokenizer",
    "ByteLevelTokenizer", "HFTokenizerAdapter", "load_tokenizer",
    "get_prompt_builder", "build_emma_x_task_prompt",
    "unnormalize_actions", "unnormalize_proprio",
]
