from distantspeech_tpu.beamform.fixed import FixedBeamformerConfig, fixed_beamformer_weights, fixed_process
from distantspeech_tpu.beamform.mvdr import MvdrConfig, mvdr_init, mvdr_process, mvdr_step
from distantspeech_tpu.beamform.gsc import GscConfig, GscState, gsc_init, gsc_process, gsc_process_time, gsc_steering, gsc_step
from distantspeech_tpu.beamform.gsc_filters import aic_step, bm_bounds, bm_step
from distantspeech_tpu.beamform.tdgsc import TdGscConfig, TdGscState, tdgsc_init, tdgsc_process, tdgsc_step
from distantspeech_tpu.beamform.fdgsc import FdGscConfig, FdGscState, fdgsc_init, fdgsc_process, fdgsc_step
from distantspeech_tpu.beamform.subband_gsc import (
    SubbandGscConfig,
    SubbandGscState,
    subband_gsc_init,
    subband_gsc_process,
    subband_gsc_step,
)
from distantspeech_tpu.beamform.ccaf import ccafbounds
from distantspeech_tpu.beamform.enhance import EnhanceConfig, EnhanceState, enhance_init, enhance_process, enhance_scan, enhance_step
from distantspeech_tpu.beamform.mvdr import adaptive_mvdr2_process, offline_mvdr_weights
from distantspeech_tpu.beamform.pmwf import PmwfConfig, pmwf_process
from distantspeech_tpu.beamform.dios_gsc import DiosGscConfig, dios_gsc_process
