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
        args = build_parser().parse_args([inp, os.path.join(d, "o.wav"), "--pipeline", "mccowan", "--stream"])
        with pytest.raises(SystemExit):
            run(args)


def _stream_scene(M, S, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(S) / 16000
    env = (np.sin(2 * np.pi * 2.0 * t) > 0).astype(np.float32)
    tgt = env * rng.standard_normal(S).astype(np.float32)
    return (0.2 * rng.standard_normal((M, S)) + 0.5 * tgt).astype(np.float32)


def test_streaming_gsc_matches_offline():
    """--stream capability for the GSC pipeline (reference
    example/streaming_gsc.py): chunked output equals gsc_process."""
    from distantspeech_tpu.beamform.gsc import GscConfig, gsc_process
    from distantspeech_tpu.runtime.streaming import make_gsc_stream

    M, chunk, n_chunks = 4, 512, 6
    cfg = GscConfig(n_mics=M, normalize_aic=True, spp_rel_diag=1e-5)
    geom = ArrayGeometry.circular(M, 0.032)
    x = _stream_scene(M, chunk * n_chunks)
    angle_rad = (np.pi / 2, 0.0)

    proc = make_gsc_stream(geom, (90.0, 0.0), cfg, chunk_size=chunk)
    got = proc.run(wav_chunks(x, chunk))
    want = np.asarray(gsc_process(jnp.asarray(x), geom, angle_rad, cfg))
    n = min(len(got), len(want))
    scale = max(np.max(np.abs(want)), 1e-9)
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-4 * scale)


def test_streaming_fdgsc_matches_offline():
    """--stream capability for FDGSC (reference example/streaming_fdgsc.py)."""
    from distantspeech_tpu.beamform.fdgsc import FdGscConfig, fdgsc_process
    from distantspeech_tpu.runtime.streaming import make_fdgsc_stream

    M, chunk, n_chunks = 4, 512, 4
    cfg = FdGscConfig(n_mics=M)
    geom = ArrayGeometry.linear(M, 0.032)
    x = _stream_scene(M, chunk * n_chunks, seed=12)
    angle_rad = (np.pi / 2, 0.0)

    proc = make_fdgsc_stream(geom, (90.0, 0.0), cfg, chunk_size=chunk)
    got = proc.run(wav_chunks(x, chunk))
    want, _, _ = fdgsc_process(jnp.asarray(x), geom, angle_rad, cfg)
    want = np.asarray(want)
    n = min(len(got), len(want))
    scale = max(np.max(np.abs(want)), 1e-9)
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-4 * scale)


def test_streaming_subband_gsc_matches_offline():
    from distantspeech_tpu.beamform.subband_gsc import SubbandGscConfig, subband_gsc_process
    from distantspeech_tpu.runtime.streaming import make_subband_gsc_stream

    M, chunk, n_chunks = 4, 512, 4
    cfg = SubbandGscConfig(n_mics=M)
    geom = ArrayGeometry.circular(M, 0.032)
    x = _stream_scene(M, chunk * n_chunks, seed=13)
    angle_rad = (np.pi / 2, 0.0)

    proc = make_subband_gsc_stream(geom, (90.0, 0.0), cfg, chunk_size=chunk)
    got = proc.run(wav_chunks(x, chunk))
    want, _, _ = subband_gsc_process(jnp.asarray(x), geom, angle_rad, cfg)
    want = np.asarray(want)
    n = min(len(got), len(want))
    scale = max(np.max(np.abs(want)), 1e-9)
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-4 * scale)


def test_streaming_wpe_matches_offline():
    from distantspeech_tpu.derev.wpe import WpeConfig, wpe_process
    from distantspeech_tpu.runtime.streaming import make_wpe_stream

    C = 2
    cfg = WpeConfig(n_channels=C)
    chunk = cfg.subband.hop * 8
    x = _stream_scene(C, chunk * 4, seed=14)

    proc = make_wpe_stream(cfg=cfg, chunk_size=chunk)
    got = proc.run(wav_chunks(x, chunk))
    want = np.asarray(wpe_process(jnp.asarray(x), cfg))
    n = min(len(got), len(want))
    scale = max(np.max(np.abs(want)), 1e-9)
    np.testing.assert_allclose(got[:n], want[:n], atol=1e-4 * scale)


def test_streaming_tdgsc_matches_offline():
    from distantspeech_tpu.beamform.tdgsc import TdGscConfig, tdgsc_process
    from distantspeech_tpu.runtime.streaming import make_tdgsc_stream

    geom = ArrayGeometry.linear(4, 0.032)
    cfg = TdGscConfig(n_mics=4)
    rng = np.random.default_rng(12)
    chunk, n_chunks = 1024, 4
    x = (rng.standard_normal((4, chunk * n_chunks)) * 0.1).astype(np.float32)

    proc = make_tdgsc_stream(geom, (197.0, 0.0), cfg, chunk_size=chunk)
    got = proc.run(wav_chunks(x, chunk))
    want = np.asarray(tdgsc_process(jnp.asarray(x), geom, cfg=cfg)[0])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_streaming_full_stack_matches_offline():
    """BASELINE config 5 actually STREAMS: chunk rows 0..M-1 mics + last row
    far-end, output equals the offline composed stack frame-exactly."""
    from distantspeech_tpu.runtime.full_stack import FullStackConfig, full_stack_process
    from distantspeech_tpu.runtime.streaming import make_full_stack_stream

    geom = ArrayGeometry.linear(4, 0.032)
    cfg = FullStackConfig(n_mics=4)
    rng = np.random.default_rng(13)
    chunk, n_chunks = 1024, 4
    S = chunk * n_chunks
    far = (rng.standard_normal(S) * 0.3).astype(np.float32)
    h = rng.standard_normal(64).astype(np.float32) * np.exp(-np.arange(64) / 12).astype(np.float32)
    echo = np.convolve(far, h)[:S].astype(np.float32)
    x = (0.1 * rng.standard_normal((4, S)) + echo[None, :]).astype(np.float32)

    proc = make_full_stack_stream(geom, (197.0, 0.0), cfg, chunk_size=chunk)
    stacked = np.concatenate([x, far[None, :]], axis=0)
    got = proc.run(wav_chunks(stacked, chunk))
    want = np.asarray(full_stack_process(jnp.asarray(x), jnp.asarray(far), geom, cfg=cfg)[0])
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert proc.latency_report()["chunks"] == n_chunks
