from tst.models.decoder import ModelSpec, apply_model, init_params, spec_by_name  # noqa: F401
from tst.models.lora import LoraSpec, init_lora, lora_scale  # noqa: F401
