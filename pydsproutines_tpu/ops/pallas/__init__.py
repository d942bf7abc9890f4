"""Pallas TPU kernels for ops where XLA's fusion is insufficient
(SURVEY.md §7: sliding-window working sets that should live in VMEM)."""

from pydsproutines_tpu.ops.pallas.sliding import (
    sliding_multiply_normalised,
    sliding_multiply_normalised_reference,
)
from pydsproutines_tpu.ops.pallas.fused_xcorr import (
    FusedXcorrPlan,
    fused_freq_scan_xcorr,
)

__all__ = [
    "sliding_multiply_normalised",
    "sliding_multiply_normalised_reference",
    "FusedXcorrPlan",
    "fused_freq_scan_xcorr",
]
