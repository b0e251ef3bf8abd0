from distantspeech_tpu.sim.room import RoomConfig, generate_scene, image_source_rir, simulate_propagation
