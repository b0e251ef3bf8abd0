from distantspeech_tpu.adaptive.feature import (
    DcNotchState,
    EmphasisState,
    dc_notch,
    dc_notch_init,
    de_emphasis,
    emphasis_init,
    pre_emphasis,
)
from distantspeech_tpu.adaptive.flms import FlmsConfig, FlmsState, flms_init, flms_step
from distantspeech_tpu.adaptive.nlms import (
    BlockLmsState,
    NlmsState,
    RlsState,
    awgn,
    block_lms_init,
    block_lms_step,
    nlms_filter,
    nlms_init,
    nlms_step,
    rls_filter,
    rls_init,
    rls_step,
)
from distantspeech_tpu.adaptive.aec import AecConfig, AecState, aec_init, aec_step
from distantspeech_tpu.adaptive.mdf import MdfConfig, MdfState, mdf_adjust_prop, mdf_init, mdf_step
from distantspeech_tpu.adaptive.subband import (
    SubbandAfConfig,
    SubbandLmsState,
    SubbandRlsState,
    subband_lms_init,
    subband_lms_mc_step,
    subband_lms_step,
    subband_rls_init,
    subband_rls_step,
)
