from .config import Config, load_config, merge_config, coerce_value, apply_dotted_override
from .registry import register_dataset, register_model, build_dataset, build_model
