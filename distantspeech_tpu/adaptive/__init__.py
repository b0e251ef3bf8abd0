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
    block_lms_init,
    block_lms_step,
    nlms_filter,
    nlms_init,
    nlms_step,
    rls_filter,
    rls_init,
    rls_step,
)
