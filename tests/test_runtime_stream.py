"""Realtime streaming contract tests.

Capability parity with the reference app loop
(/root/reference/DistantSpeech/realtime/realtime_processing.py:70-136): a
fake chunk source drives the StreamingProcessor, the 64 ms-per-1024-sample
overflow check fires deterministically, the latency report is a
machine-readable artifact, and the --stream CLI mode round-trips a wav.
"""

import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.runtime.streaming import StreamingProcessor, make_enhance_stream, wav_chunks


class _FakeClock:
    """perf_counter stub advancing a fixed dt per process_chunk bracket."""

    def __init__(self, dt):
        self.dt = dt
        self.t = 0.0

    def __call__(self):
        self.t += self.dt  # t0..t1 difference within one chunk = dt
        return self.t


def _identity_proc(chunk_size, fs=16000):
    return StreamingProcessor(lambda s, c: (s, c), (), chunk_size=chunk_size, fs=fs)


def test_overflow_contract(monkeypatch):
    """Chunk slower than chunk_size/fs counts as overflow — the reference's
    'time_cost overflow' check (realtime_processing.py:126-127)."""
    import distantspeech_tpu.runtime.streaming as streaming

    x = np.zeros((2, 1024 * 5), dtype=np.float32)

    # budget 1024/16000 = 64 ms; fake 100 ms per chunk -> every chunk overflows
    monkeypatch.setattr(streaming.time, "perf_counter", _FakeClock(0.100))
    proc = _identity_proc(1024)
    proc.run(wav_chunks(x, 1024))
    assert proc.chunks == 5 and proc.overflows == 5
    report = proc.latency_report(skip_warmup=1)
    # the report separates the steady-state contract from compile warmup
    assert report["overflows"] == 4 and report["overflows_incl_warmup"] == 5
    assert report["warmup_excluded"] == 1

    # fake 1 ms per chunk -> none overflow
    monkeypatch.setattr(streaming.time, "perf_counter", _FakeClock(0.001))
    proc = _identity_proc(1024)
    proc.run(wav_chunks(x, 1024))
    assert proc.chunks == 5 and proc.overflows == 0

    report = proc.latency_report(skip_warmup=1)
    assert report["chunks"] == 5 and report["overflows"] == 0
    assert abs(report["budget_ms"] - 64.0) < 1e-9
    assert abs(report["p50_ms"] - 1.0) < 0.2 and abs(report["max_ms"] - 1.0) < 0.2
    assert report["realtime_factor"] > 50


def test_streaming_enhance_matches_offline():
    """The chunked realtime path equals the offline flagship pipeline."""
    from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_process

    cfg = EnhanceConfig()
    geom = ArrayGeometry.linear(4, 0.032)
    rng = np.random.default_rng(7)
    chunk, n_chunks = 512, 8
    x = (rng.standard_normal((4, chunk * n_chunks)) * 0.1).astype(np.float32)

    proc = make_enhance_stream(geom, (90.0, 0.0), cfg, chunk_size=chunk)
    got = proc.run(wav_chunks(x, chunk))
    want = np.asarray(enhance_process(jnp.asarray(x), geom, (90.0, 0.0), cfg))
    n = min(len(got), len(want))
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-5)
    assert proc.chunks == n_chunks
    assert len(proc.latencies) == n_chunks


def test_cli_stream_writes_output_and_latency_artifact():
    from distantspeech_tpu.runtime.cli import build_parser, run

    rng = np.random.default_rng(8)
    S = 1024 * 6 + 300  # deliberately not chunk-aligned: tail must be kept
    x = (rng.standard_normal((S, 4)) * 0.1).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        inp, outp = os.path.join(d, "in.wav"), os.path.join(d, "out.wav")
        from distantspeech_tpu.runtime.io import load_audio, save_audio

        save_audio(inp, x)
        args = build_parser().parse_args([inp, outp, "--pipeline", "enhance", "--stream"])
        y = run(args)
        assert np.isfinite(y).all() and y.ndim == 1
        assert y.shape == (S,)  # zero-padded last chunk, trimmed back
        assert os.path.exists(outp)
        with open(outp + ".latency.json") as f:
            report = json.load(f)
        assert report["chunks"] == 7 and report["budget_ms"] == 64.0
        assert report["p50_ms"] is not None and report["realtime_factor"] is not None
        out = load_audio(outp)
        assert np.isfinite(out).all() and out.shape == (len(y),)


def test_cli_stream_rejects_unsupported_pipeline():
    import pytest

    from distantspeech_tpu.runtime.cli import build_parser, run

    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.wav")
        from distantspeech_tpu.runtime.io import save_audio

        save_audio(inp, np.zeros((2048, 2), dtype=np.float32))
        args = build_parser().parse_args([inp, os.path.join(d, "o.wav"), "--pipeline", "gsc", "--stream"])
        with pytest.raises(SystemExit):
            run(args)
