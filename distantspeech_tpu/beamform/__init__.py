from distantspeech_tpu.beamform.fixed import FixedBeamformerConfig, fixed_beamformer_weights, fixed_process
from distantspeech_tpu.beamform.mvdr import MvdrConfig, mvdr_init, mvdr_process, mvdr_step

__all__ = [
    "FixedBeamformerConfig",
    "fixed_beamformer_weights",
    "fixed_process",
    "MvdrConfig",
    "mvdr_init",
    "mvdr_step",
    "mvdr_process",
]
