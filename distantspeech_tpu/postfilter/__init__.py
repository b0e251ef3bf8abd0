from distantspeech_tpu.postfilter.mccowan import (
    McCowanConfig,
    mccowan_gain,
    mccowan_process,
)
