"""Realtime-style streaming driver: host ring buffer feeding a jitted step.

Capability parity with realtime_processing
(/root/reference/DistantSpeech/realtime/realtime_processing.py:9-137): a
capture source delivers fixed-size chunks; each chunk runs through one
jitted streaming step carrying the pipeline state; a latency monitor flags
overflow when a chunk takes longer than its real-time budget
(realtime_processing.py:126-127).  The audio-device layer is pluggable —
any iterator of [C, chunk] arrays works; a PyAudio source is provided when
the package is installed (it is not in this image).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Iterator, Optional, Tuple

import numpy as np
import jax


class StreamingProcessor:
    """Drive a ``step(state, chunk) -> (state, out)`` function chunk by chunk.

    Parameters
    ----------
    step : callable
        Pure streaming step; jitted on first use.
    init_state : pytree
        Initial carry (from the pipeline's ``*_init``).
    chunk_size : int
        Samples per chunk per channel (the reference uses 1024).
    fs : int
        Sample rate, for the real-time overflow check.
    """

    def __init__(self, step: Callable, init_state: Any, chunk_size: int = 1024, fs: int = 16000):
        self.step = jax.jit(step)
        self.state = init_state
        self.chunk_size = chunk_size
        self.fs = fs
        self.overflows = 0
        self.chunks = 0

    def process_chunk(self, chunk: np.ndarray) -> np.ndarray:
        budget = self.chunk_size / self.fs
        t0 = time.perf_counter()
        self.state, out = self.step(self.state, chunk)
        out = np.asarray(out)
        if time.perf_counter() - t0 > budget:
            self.overflows += 1  # "time_cost overflow" (realtime_processing.py:126-127)
        self.chunks += 1
        return out

    def run(self, source: Iterable[np.ndarray], sink: Optional[Callable[[np.ndarray], None]] = None):
        """Consume a chunk iterator; returns concatenated output if no sink."""
        outs = []
        for chunk in source:
            out = self.process_chunk(chunk)
            if sink is not None:
                sink(out)
            else:
                outs.append(out)
        if outs:
            return np.concatenate(outs, axis=-1)
        return None


def wav_chunks(x: np.ndarray, chunk_size: int) -> Iterator[np.ndarray]:
    """Slice [C, S] audio into [C, chunk_size] chunks (tail dropped)."""
    for i in range(0, x.shape[-1] - chunk_size + 1, chunk_size):
        yield x[..., i : i + chunk_size]


def pyaudio_chunks(chunk_size: int = 1024, fs: int = 16000, channels: int = 6, pick=slice(1, 5)):
    """Live capture source (requires pyaudio; mirrors realtime_processing.py:86-123)."""
    import pyaudio  # noqa: optional dependency, absent in this image

    pa = pyaudio.PyAudio()
    stream = pa.open(format=pyaudio.paInt16, channels=channels, rate=fs, input=True,
                     frames_per_buffer=chunk_size)
    try:
        while True:
            raw = stream.read(chunk_size)
            data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
            yield data.reshape(chunk_size, channels).T[pick]
    finally:
        stream.stop_stream()
        stream.close()
        pa.terminate()
