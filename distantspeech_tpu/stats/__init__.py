from distantspeech_tpu.stats.psd import update_csd, update_psd, rank1_update
from distantspeech_tpu.stats.weights import (
    blind_analytic_normalization,
    diag_load_inv,
    mvdr_weights,
    phase_correction,
    pmwf_weights,
    tfgsc_weights,
)
from distantspeech_tpu.stats.metrics import array_gain, beampattern, wng_di
from distantspeech_tpu.stats.evaluation import (
    best_aligned_si_sdr,
    pesq_score,
    segmental_snr_db,
    si_sdr,
    snr_db,
    stoi_score,
)

__all__ = [
    "si_sdr",
    "best_aligned_si_sdr",
    "snr_db",
    "segmental_snr_db",
    "pesq_score",
    "stoi_score",
    "update_psd",
    "update_csd",
    "rank1_update",
    "mvdr_weights",
    "pmwf_weights",
    "tfgsc_weights",
    "diag_load_inv",
    "blind_analytic_normalization",
    "phase_correction",
    "array_gain",
    "beampattern",
    "wng_di",
]
