from distantspeech_tpu.derev.wpe import WpeConfig, WpeState, wpe_init, wpe_process, wpe_run, wpe_step
