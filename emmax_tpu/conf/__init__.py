from emmax_tpu.conf.datasets import DatasetConfig
from emmax_tpu.conf.models import ModelConfig
from emmax_tpu.conf.registry import (ChoiceRegistry, config_to_dict,
                                     dump_config, parse_config)
from emmax_tpu.conf.vla import EMMA_X_FLAGSHIP_ID, VLAConfig

__all__ = [
    "ChoiceRegistry", "DatasetConfig", "ModelConfig", "VLAConfig",
    "EMMA_X_FLAGSHIP_ID", "parse_config", "dump_config", "config_to_dict",
]
