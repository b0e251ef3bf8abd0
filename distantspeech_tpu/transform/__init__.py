from distantspeech_tpu.transform.stft import (
    StftConfig,
    magphase,
    analysis,
    istft_stream,
    sqrt_hann_window,
    stft_frames,
    stft_stream,
    synthesis,
)
from distantspeech_tpu.transform.filterbank_design import (
    design_analysis_prototype,
    design_synthesis_prototype,
    nyquist_prototypes,
)
from distantspeech_tpu.transform.subband import (
    SubbandConfig,
    subband_analysis,
    subband_analysis_frames,
    subband_analysis_stream,
    subband_synthesis,
    subband_synthesis_init,
    subband_synthesis_step,
)

__all__ = [
    "StftConfig",
    "magphase",
    "sqrt_hann_window",
    "stft_frames",
    "analysis",
    "synthesis",
    "stft_stream",
    "istft_stream",
    "SubbandConfig",
    "subband_analysis",
    "subband_analysis_frames",
    "subband_analysis_stream",
    "subband_synthesis",
    "subband_synthesis_init",
    "subband_synthesis_step",
    "design_analysis_prototype",
    "design_synthesis_prototype",
    "nyquist_prototypes",
]
