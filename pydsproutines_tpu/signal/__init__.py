"""Synthetic signal generation: PSK/CPFSK symbol streams, calibrated-SNR noise,
burst placement, sub-sample propagation. These are both product API and the
test-fixture layer (SURVEY.md §4)."""

from pydsproutines_tpu.signal.creation import (
    rand_bits,
    syms_from_bits,
    rand_psk_syms,
    randnoise,
    add_sig_to_noise,
    add_many_sig_to_noise,
    make_cpfsk_syms,
    make_pulsed_cpfsk_syms,
    propagate_signal,
    propagate_signal_exact,
    PSK_CONSTELLATIONS,
)
from pydsproutines_tpu.signal.pulses import make_src4, make_scaled_src4
from pydsproutines_tpu.signal.channelsim import (
    SampledLinearInterpolator,
    ConstAmpSigLerp,
    ConstAmpSigLerpBursty,
    ConstAmpSigLerpBurstyMulti,
)

__all__ = [
    "rand_bits",
    "syms_from_bits",
    "rand_psk_syms",
    "randnoise",
    "add_sig_to_noise",
    "add_many_sig_to_noise",
    "make_cpfsk_syms",
    "make_pulsed_cpfsk_syms",
    "propagate_signal",
    "propagate_signal_exact",
    "PSK_CONSTELLATIONS",
    "make_src4",
    "make_scaled_src4",
    "SampledLinearInterpolator",
    "ConstAmpSigLerp",
    "ConstAmpSigLerpBursty",
    "ConstAmpSigLerpBurstyMulti",
]
