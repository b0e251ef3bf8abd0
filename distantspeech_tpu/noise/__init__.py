from distantspeech_tpu.noise.mcra import McraConfig, McraState, mcra_init, mcra_run, mcra_step
from distantspeech_tpu.noise.mcra2 import Mcra2Config, Mcra2State, mcra2_init, mcra2_run, mcra2_step
from distantspeech_tpu.noise.mc_mcra import McMcraConfig, McMcraOut, McMcraState, mc_mcra_init, mc_mcra_run, mc_mcra_step
from distantspeech_tpu.noise.mccdr import McCdrConfig, McCdrState, mccdr_init, mccdr_step
from distantspeech_tpu.noise.mcspp import McSppConfig, McSppState, mcspp_init, mcspp_run, mcspp_step
from distantspeech_tpu.noise.mcspp_base import (
    McSppBaseConfig,
    McSppBaseState,
    McSppOut,
    mcspp_base_init,
    mcspp_base_run,
    mcspp_base_step,
)
from distantspeech_tpu.noise.omlsa import OmlsaConfig, OmlsaState, omlsa_init, omlsa_run, omlsa_step
