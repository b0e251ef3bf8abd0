from distantspeech_tpu.coherence.msc import MscState, msc_init, msc_update, pair_index, pair_indices
from distantspeech_tpu.coherence.weights import coherent_gain
