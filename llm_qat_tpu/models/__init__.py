"""GPT-2 model assemblies: switchable-precision (SP), CPT, and QA variants."""

from .config import (
    CPTConfig,
    GPT2Config,
    QuantConfig,
    SPModelConfig,
    TrainConfig,
    default_quantizer_kind,
    tiny_test_config,
)
from .sp_model import (
    PrecTables,
    dynamic_scale,
    init_sp_params,
    lm_cross_entropy,
    prec_tables,
    sp_block,
    sp_forward,
    sp_linear,
    switchable_layernorm,
)

__all__ = [
    "CPTConfig",
    "GPT2Config",
    "QuantConfig",
    "SPModelConfig",
    "TrainConfig",
    "default_quantizer_kind",
    "tiny_test_config",
    "PrecTables",
    "dynamic_scale",
    "init_sp_params",
    "lm_cross_entropy",
    "prec_tables",
    "sp_block",
    "sp_forward",
    "sp_linear",
    "switchable_layernorm",
]
