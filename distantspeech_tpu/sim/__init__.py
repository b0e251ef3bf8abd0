from distantspeech_tpu.sim.ism import batched_propagation, batched_rir, default_rir_length
from distantspeech_tpu.sim.room import (
    RoomConfig, generate_scene, hybrid_rir, image_source_rir, sabine_rt60, simulate_propagation,
)
