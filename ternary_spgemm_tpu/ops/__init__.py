"""Compute kernels: XLA formulations + Pallas TPU kernels.

The TPU-native analogue of the reference's kernel layer
(``cpp_impl/comp.h`` / ``cpp_impl/comp_prelu.h``). Kernels are registered in
:mod:`ternary_spgemm_tpu.ops.api` (the ``add_function`` analogue,
``main.cpp:21-33``) and dispatched via :func:`ternary_spgemm`.
"""

from ternary_spgemm_tpu.ops.autotune import autotune
from ternary_spgemm_tpu.ops.api import (
    KernelSpec,
    all_kernels,
    get_kernel,
    kernels_for_format,
    register_kernel,
    ternary_spgemm,
)
from ternary_spgemm_tpu.ops import xla_kernels  # noqa: F401  (registers kernels)
from ternary_spgemm_tpu.ops import pallas_kernels  # noqa: F401  (registers kernels)
from ternary_spgemm_tpu.ops.fused_ffn import (
    fused_bitplane_ffn,
    fused_bitplane_swiglu,
    requantize_rows,
)
from ternary_spgemm_tpu.ops.pallas_kernels import stack_mode

__all__ = [
    "KernelSpec", "all_kernels", "get_kernel", "kernels_for_format",
    "register_kernel", "ternary_spgemm", "autotune",
    "fused_bitplane_ffn", "fused_bitplane_swiglu", "requantize_rows",
    "stack_mode",
]
