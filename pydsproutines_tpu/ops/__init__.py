"""DSP ops layer — the heart of the framework (SURVEY.md §2.1).

Each module re-expresses one reference component as jax-traced ops (single
implementation for CPU parity tier and TPU compiled tier), with Pallas kernels
for paths where XLA fusion is insufficient.
"""

from pydsproutines_tpu.ops.spectral import (
    CZT,
    czt,
    dft,
    tone_spectrum,
    IntegerMultipleFFT,
    burst_fft,
)
from pydsproutines_tpu.ops.filters import (
    lfilter_fir,
    StreamFilter,
    upfirdn,
    get_upfirdn_size,
    StreamUpfirdn,
    moving_average,
    multi_moving_average,
    complex_moving_sum,
    medfilt,
    resample_factor_wizard,
)
from pydsproutines_tpu.ops.wola import wola, Channeliser
from pydsproutines_tpu.ops.detection import (
    Edges,
    threshold_edges,
    find_local_maxima,
    auto_detect_threshold,
    BurstDetector,
    energy_detection,
)
from pydsproutines_tpu.ops.multicorr import MultiPreambleCorrelator
from pydsproutines_tpu.ops.groupxcorr import (
    GroupXcorrCZTPermutations,
    GroupXcorr,
    GroupXcorrCZT,
    GroupXcorrFFT,
    TemplateCrossCorrelator,
)
from pydsproutines_tpu.ops.demod import (
    SimpleDemodulatorPSK,
    SimpleDemodulatorBPSK,
    SimpleDemodulatorQPSK,
    SimpleDemodulator8PSK,
    DemodulatorBatchPSK,
    DemodulatorBatchQPSK,
    BatchDemodResult,
    BurstyDemodulatorCP2FSK,
    demodulate_cp2fsk,
    detect_b_or_q,
    ml_demod_qpsk,
)
from pydsproutines_tpu.ops.viterbi import ViterbiDemodulator, BurstyViterbiDemodulator
from pydsproutines_tpu.ops.music import (MUSIC, CAPON, ESPRIT, music_alg,
                                          music_xcorr, music_xcorr_device)
from pydsproutines_tpu.ops.cyclostationary import (
    PSKOrderDetector,
    estimate_baud,
    estimate_offset_via_cm,
)
from pydsproutines_tpu.ops.matrixprofile import MatrixProfile, matrix_profile
from pydsproutines_tpu.ops.cancellation import cancel_signal_at_idx
from pydsproutines_tpu.ops.masked import (multiply_only_masked_rows,
                                          multiply_rows_based_on_mask,
                                          multiply_masked_rows_gathered)
from pydsproutines_tpu.ops.minmax import multichannel_minmax_scale
from pydsproutines_tpu.ops.xcorr import (
    fast_xcorr,
    czt_xcorr,
    calc_qf2,
    fine_freq_time_search,
    make_time_scan_steervec,
    convert_qf2_to_snr,
    convert_qf2_to_eff_snr,
    convert_eff_snr_to_qf2,
    expected_eff_snr,
    sigma_dto,
    sigma_dfo,
    theoretical_multi_peak,
    argmax2d,
    compute_fast_xcorr_complexity,
    compute_group_xcorr_czt_complexity,
)

__all__ = [
    "multiply_only_masked_rows",
    "multiply_rows_based_on_mask",
    "multiply_masked_rows_gathered",
    "GroupXcorrCZTPermutations",
    "BurstyViterbiDemodulator",
    "music_xcorr",
    "music_xcorr_device",
    "GroupXcorr",
    "GroupXcorrCZT",
    "GroupXcorrFFT",
    "TemplateCrossCorrelator",
    "MultiPreambleCorrelator",
    "SimpleDemodulatorPSK",
    "SimpleDemodulatorBPSK",
    "SimpleDemodulatorQPSK",
    "SimpleDemodulator8PSK",
    "DemodulatorBatchPSK",
    "DemodulatorBatchQPSK",
    "BatchDemodResult",
    "BurstyDemodulatorCP2FSK",
    "demodulate_cp2fsk",
    "detect_b_or_q",
    "ml_demod_qpsk",
    "ViterbiDemodulator",
    "MUSIC",
    "CAPON",
    "ESPRIT",
    "music_alg",
    "PSKOrderDetector",
    "estimate_baud",
    "estimate_offset_via_cm",
    "MatrixProfile",
    "matrix_profile",
    "cancel_signal_at_idx",
    "multichannel_minmax_scale",
    "lfilter_fir",
    "StreamFilter",
    "upfirdn",
    "get_upfirdn_size",
    "StreamUpfirdn",
    "moving_average",
    "multi_moving_average",
    "complex_moving_sum",
    "medfilt",
    "resample_factor_wizard",
    "wola",
    "Channeliser",
    "Edges",
    "threshold_edges",
    "find_local_maxima",
    "auto_detect_threshold",
    "BurstDetector",
    "energy_detection",
    "CZT",
    "czt",
    "dft",
    "tone_spectrum",
    "IntegerMultipleFFT",
    "burst_fft",
    "fast_xcorr",
    "czt_xcorr",
    "calc_qf2",
    "fine_freq_time_search",
    "make_time_scan_steervec",
    "convert_qf2_to_snr",
    "convert_qf2_to_eff_snr",
    "convert_eff_snr_to_qf2",
    "expected_eff_snr",
    "sigma_dto",
    "sigma_dfo",
    "theoretical_multi_peak",
    "argmax2d",
]
