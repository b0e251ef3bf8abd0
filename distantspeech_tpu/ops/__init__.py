from distantspeech_tpu.ops.framing import frame_signal, overlap_add

__all__ = ["frame_signal", "overlap_add"]
