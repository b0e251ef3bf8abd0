"""End-to-end integration tests on simulated reverberant scenes.

Mirrors the reference's examples-as-integration-tests pattern (SURVEY §4):
ArraySim-style fixtures (here: the vectorised image-source simulator) run
through full pipelines, asserting enhancement actually happens.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.beamform import FixedBeamformerConfig, fixed_beamformer_weights, fixed_process
from distantspeech_tpu.beamform.enhance import enhance_process
from distantspeech_tpu.doa.srp import SrpConfig, srp_process
from distantspeech_tpu.sim import RoomConfig, generate_scene, simulate_propagation


def _speechlike(S, seed=0, lead=12000):
    rng = np.random.default_rng(seed)
    t = np.arange(S) / 16000
    env = (np.sin(2 * np.pi * 0.6 * t + 0.7) > -0.2).astype(float)
    env[:lead] = 0.0  # noise-only lead-in so the SPP trackers can converge
    k = np.hanning(9)  # broadband target
    return np.convolve(rng.standard_normal(S), k / k.sum(), "same") * env


@pytest.fixture(scope="module")
def scene():
    geom = ArrayGeometry.linear(4, 0.05)
    src = _speechlike(16000 * 2)
    rng = np.random.default_rng(7)
    mix = generate_scene(
        src, geom.mic_loc, interference=rng.standard_normal(len(src)),
        source_angle=90.0, interf_angle=20.0, snr=25.0, sir=10.0,
        cfg=RoomConfig(max_order=1), seed=3,
    )
    return geom, src, mix.astype(np.float32)


def test_enhance_pipeline_improves_sisdr(scene):
    from distantspeech_tpu.stats import best_aligned_si_sdr

    geom, src, mix = scene
    y = np.asarray(enhance_process(jnp.asarray(mix), geom, (90.0, 0.0)))

    # align over RIR delay (~47) + the transform's one-hop latency (128)
    best_in = best_aligned_si_sdr(mix[0], src)
    best_out = best_aligned_si_sdr(y, src)
    assert best_out > best_in + 1.0, (best_in, best_out)


def test_enhance_high_rt60_improves_sisdr():
    """Stress scene: 8th-order ISM with 0.3 energy absorption (Sabine RT60
    ~0.31 s for the 5x3x3 room — the reference's ArraySim hybrid ray-traced
    scenes live in this regime, ArraySim.py:166-238).  The flagship must
    still enhance, not just at the easy max_order=1 fixture."""
    from distantspeech_tpu.stats import best_aligned_si_sdr

    geom = ArrayGeometry.linear(4, 0.05)
    src = _speechlike(16000 * 2)
    rng = np.random.default_rng(7)
    mix = generate_scene(
        src, geom.mic_loc, interference=rng.standard_normal(len(src)),
        source_angle=90.0, interf_angle=20.0, snr=15.0, sir=5.0,
        cfg=RoomConfig(max_order=8, energy_absorption=0.3), seed=3,
    ).astype(np.float32)
    y = np.asarray(enhance_process(jnp.asarray(mix), geom, (90.0, 0.0)))
    best_in = best_aligned_si_sdr(mix[0], src)
    best_out = best_aligned_si_sdr(y, src)
    assert best_out > best_in + 2.0, (best_in, best_out)  # measured +3.1 dB


def test_gsc_strong_interference_improves_sisdr():
    """SIR 0 dB directional interferer at 30 deg off target: the GSC's
    blocking-matrix/AIC path must cancel it (measured +4.6 dB SI-SDR)."""
    from distantspeech_tpu.beamform import GscConfig, gsc_process
    from distantspeech_tpu.stats import best_aligned_si_sdr

    geom = ArrayGeometry.circular(4, 0.05)
    src = _speechlike(16000 * 2)
    mix = generate_scene(
        src, geom.mic_loc, interference=np.random.default_rng(7).standard_normal(len(src)),
        source_angle=90.0, interf_angle=30.0, snr=25.0, sir=0.0,
        cfg=RoomConfig(max_order=4, energy_absorption=0.5), seed=4,
    ).astype(np.float32)
    y = np.asarray(gsc_process(
        jnp.asarray(mix), geom, (np.pi / 2, 0.0),
        GscConfig(n_mics=4, normalize_aic=True, spp_rel_diag=1e-5),
    ))
    best_in = best_aligned_si_sdr(mix[0], src)
    best_out = best_aligned_si_sdr(y, src)
    assert best_out > best_in + 3.0, (best_in, best_out)


def test_srp_finds_source_direction():
    geom = ArrayGeometry.circular(4, 0.05)
    src = _speechlike(16000, seed=5, lead=0)
    x = simulate_propagation(
        src, np.array([2.5 + np.cos(np.pi / 3) * 1.0, 1.5 + np.sin(np.pi / 3) * 1.0, 0.5]),
        geom.mic_loc + np.array([2.5, 1.5, 0.5]), RoomConfig(max_order=0),
    )
    spec, _ = srp_process(jnp.asarray(x), geom, SrpConfig(n_fft=256, resolution=5))
    mean_spec = np.asarray(spec).mean(axis=0)  # [Theta]
    est = np.argmax(mean_spec) * 5
    err = min(abs(est - 60), 360 - abs(est - 60))
    assert err <= 15, (est, err)


def test_ds_beamformer_array_gain(scene):
    """DS weights must deliver the theoretical white-noise array gain
    (10 log10 M = 6.02 dB for 4 mics, every bin) and positive directivity
    against diffuse noise in the non-aliased band — actual array gain, not
    just finiteness."""
    from distantspeech_tpu.stats.metrics import wng_di

    geom, src, mix = scene
    cfg = FixedBeamformerConfig(weight_type="DS")
    W = fixed_beamformer_weights(geom, (90.0, 0.0), cfg)
    y = np.asarray(fixed_process(jnp.asarray(mix), jnp.asarray(W), cfg.stft))
    assert np.isfinite(y).all() and y.shape == (mix.shape[1],)

    wng, di = wng_di(geom, jnp.asarray(W), (90.0, 0.0), cfg.stft.n_fft)
    np.testing.assert_allclose(np.asarray(wng), 10 * np.log10(4), atol=0.01)
    # diffuse-noise gain: positive once the array is not sub-wavelength
    # (5 cm spacing -> above ~1 kHz, bins >= 16 of 129)
    assert np.all(np.asarray(di)[16:] > 0.0), np.asarray(di)[16:].min()


def test_pmwf_pipeline_enhances(scene):
    from distantspeech_tpu.beamform.pmwf import PmwfConfig, pmwf_process

    from distantspeech_tpu.stats import best_aligned_si_sdr

    geom, src, mix = scene
    y = np.asarray(pmwf_process(jnp.asarray(mix), geom, PmwfConfig(n_mics=4, full=True)))
    assert np.isfinite(y).all()

    best_in = best_aligned_si_sdr(mix[0], src)
    best_out = best_aligned_si_sdr(y, src)
    assert best_out > best_in + 1.0, (best_in, best_out)  # actual enhancement
