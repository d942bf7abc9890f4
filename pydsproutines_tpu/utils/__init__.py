"""Core utilities: dtype policy, FFT-friendly lengths, frequency axes,
verification helpers and timing."""

from pydsproutines_tpu.utils.dtypes import (
    COMPLEX_DTYPE,
    FLOAT_DTYPE,
    complex_dtype_for,
    real_dtype_for,
)
from pydsproutines_tpu.utils.fftlen import next_fast_len, prev_fast_len, prime_factors
from pydsproutines_tpu.utils.freq import make_freq, freqshift_signal, tone
from pydsproutines_tpu.utils.verify import compare_values
from pydsproutines_tpu.utils.timing import Timer, trace, annotate

__all__ = [
    "COMPLEX_DTYPE",
    "FLOAT_DTYPE",
    "complex_dtype_for",
    "real_dtype_for",
    "next_fast_len",
    "prev_fast_len",
    "prime_factors",
    "make_freq",
    "freqshift_signal",
    "tone",
    "compare_values",
    "Timer",
    "trace",
    "annotate",
]
