from distantspeech_tpu.runtime.io import find_files, load_audio, load_pcm, load_wav_dir, pcmread, save_audio
from distantspeech_tpu.runtime.streaming import StreamingProcessor
