from distantspeech_tpu.kws.dual_mic import DualMicKwsConfig, DualMicKwsState, kws_init, kws_process, kws_step
