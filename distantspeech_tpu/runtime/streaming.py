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
        self.latencies: list = []  # seconds per chunk, incl. host<->device

    def process_chunk(self, chunk: np.ndarray) -> np.ndarray:
        budget = self.chunk_size / self.fs
        t0 = time.perf_counter()
        self.state, out = self.step(self.state, chunk)
        out = np.asarray(out)
        dt = time.perf_counter() - t0
        self.latencies.append(dt)
        if dt > budget:
            self.overflows += 1  # "time_cost overflow" (realtime_processing.py:126-127)
        self.chunks += 1
        return out

    def latency_report(self, skip_warmup: int = 1) -> dict:
        """Machine-readable chunk-latency summary (the reference's overflow
        contract, realtime_processing.py:126-127, as an artifact).

        ``skip_warmup`` chunks (jit compile) are excluded from the
        percentile stats AND from ``overflows`` — a compile is not a
        latency miss, and a consumer gating on ``overflows == 0`` should
        see the steady-state realtime contract.  The raw count including
        warmup is reported as ``overflows_incl_warmup``; the actual
        exclusion is capped so at least one chunk remains, and the report
        records it as ``warmup_excluded``.
        """
        skipped = min(skip_warmup, max(len(self.latencies) - 1, 0))
        lat = np.asarray(self.latencies[skipped:])
        budget = self.chunk_size / self.fs
        ms = lambda v: round(float(v) * 1e3, 4)
        return {
            "chunks": self.chunks,
            "overflows": int(np.sum(lat > budget)),
            "overflows_incl_warmup": self.overflows,
            "chunk_size": self.chunk_size,
            "fs": self.fs,
            "budget_ms": ms(budget),
            "warmup_excluded": skipped,
            "p50_ms": ms(np.percentile(lat, 50)) if lat.size else None,
            "p95_ms": ms(np.percentile(lat, 95)) if lat.size else None,
            "max_ms": ms(lat.max()) if lat.size else None,
            "mean_ms": ms(lat.mean()) if lat.size else None,
            "realtime_factor": round(budget / float(lat.mean()), 2) if lat.size else None,
        }

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


def make_enhance_stream(
    geometry, look_angle_deg=(90.0, 0.0), cfg=None, chunk_size: int = 1024, fs: int = 16000
) -> "StreamingProcessor":
    """Streaming flagship pipeline (MVDR + OM-LSA) as a StreamingProcessor.

    The realtime app loop of the reference (realtime_processing.py:70-136)
    with the per-chunk enhancement step jitted: chunk [M, chunk_size] in,
    [chunk_size] enhanced samples out (hop-aligned; cfg.stft.hop must
    divide chunk_size).  The carry (STFT tails + covariances + MCRA minima)
    is built under jit — eager complex-zero creation is unimplemented on
    remote-attached TPUs.
    """
    import jax.numpy as jnp

    from distantspeech_tpu.array.steering import steering_vector
    from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_init, enhance_step
    from distantspeech_tpu.transform.stft import istft_stream, stft_stream

    if cfg is None:
        cfg = EnhanceConfig()
    if chunk_size % cfg.stft.hop != 0:
        raise ValueError(f"chunk_size {chunk_size} must be a multiple of hop {cfg.stft.hop}")
    M = geometry.n_mics
    angle_rad = np.asarray(look_angle_deg, dtype=np.float64) / 180.0 * np.pi
    steer = np.asarray(steering_vector(geometry, angle_rad, cfg.stft.n_fft), dtype=np.complex64)

    def step(state, x_chunk):
        cin, cout, enh = state
        cin, Z = stft_stream(cin, x_chunk, cfg.stft)  # [M, J, F]
        Zt = jnp.moveaxis(Z, -2, 0).swapaxes(-1, -2)  # [J, F, M]
        enh, Y = jax.lax.scan(lambda s, z: enhance_step(cfg, jnp.asarray(steer), s, z), enh, Zt)
        cout, y = istft_stream(cout, jnp.moveaxis(Y, 0, -2), cfg.stft)
        return (cin, cout, enh), y

    init = jax.jit(lambda: (
        jnp.zeros((M, cfg.stft.overlap), jnp.float32),
        jnp.zeros(cfg.stft.overlap, jnp.float32),
        enhance_init(cfg, M),
    ))()
    return StreamingProcessor(step, init, chunk_size=chunk_size, fs=fs)


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
