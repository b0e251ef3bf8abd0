from distantspeech_tpu.doa.srp import SrpConfig, srp_angle_spectrum
from distantspeech_tpu.doa.idoa import IdoaConfig, IdoaState, idoa_init, idoa_run, idoa_step
