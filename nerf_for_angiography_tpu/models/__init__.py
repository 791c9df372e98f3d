from .cppn import (
    CPPN,
    CPPNConfig,
    barf_alpha_schedule,
    barf_k_values,
    barf_weights,
    init_cppn,
    sine,
)

__all__ = [
    "CPPN",
    "CPPNConfig",
    "barf_alpha_schedule",
    "barf_k_values",
    "barf_weights",
    "init_cppn",
    "sine",
]
