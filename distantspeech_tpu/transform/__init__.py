from distantspeech_tpu.transform.stft import (
    StftConfig,
    analysis,
    istft_stream,
    sqrt_hann_window,
    stft_frames,
    stft_stream,
    synthesis,
)

__all__ = [
    "StftConfig",
    "sqrt_hann_window",
    "stft_frames",
    "analysis",
    "synthesis",
    "stft_stream",
    "istft_stream",
]
