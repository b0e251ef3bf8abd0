"""Parity tests for fixed and adaptive beamformers vs. the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.array import ArrayGeometry
from distantspeech_tpu.array.steering import steering_vector
from distantspeech_tpu.beamform import (
    FixedBeamformerConfig,
    MvdrConfig,
    adaptive_mvdr2_process,
    fixed_beamformer_weights,
    fixed_process,
    mvdr_process,
    offline_mvdr_weights,
)
from distantspeech_tpu.transform import StftConfig


@pytest.fixture(scope="module")
def ref_mods():
    refutil.patch_beamformer_base()
    return {
        "MicArray": refutil.load("DistantSpeech.beamformer.MicArray"),
        "beamformer": refutil.load("DistantSpeech.beamformer.beamformer"),
        "adaptive": refutil.load("DistantSpeech.beamformer.adaptivebeamformer"),
        "transform": refutil.load("DistantSpeech.transform.transform"),
    }


def _mic_and_geom(ref_mods, M=4, r=0.032):
    mic = ref_mods["MicArray"].MicArray(arrayType="circular", r=r, M=M)
    geom = ArrayGeometry.circular(M, r)
    return mic, geom


@pytest.mark.parametrize("weight_type", ["DS", "SD"])
@pytest.mark.parametrize("look", [(0, 0), (197, 0), (90, 30)])
def test_fixed_weights_parity(ref_mods, weight_type, look):
    mic, geom = _mic_and_geom(ref_mods)
    ref_bf = ref_mods["beamformer"].beamformer(mic, 256, 128, 256)
    W_ref = ref_bf.compute_weights(look_angle=list(look), weightType=weight_type, diag_value=1e-3)

    cfg = FixedBeamformerConfig(StftConfig(256, 128), weight_type=weight_type, diag_value=1e-3)
    W_ours = fixed_beamformer_weights(geom, look, cfg)
    np.testing.assert_allclose(W_ours, W_ref, atol=1e-9)


def test_fixed_process_parity(ref_mods):
    """End-to-end fixed SD beamforming: our batched path vs. the reference
    composition Transform.stft -> per-frame einsum -> Transform.istft (the
    FixedBeamformer.process pipeline, fixedbeamformer.py:167-207)."""
    mic, geom = _mic_and_geom(ref_mods)
    rng = np.random.default_rng(11)
    S, M = 128 * 60, 4
    x = rng.standard_normal((S, M)) * 0.1

    ref_bf = ref_mods["beamformer"].beamformer(mic, 256, 128, 256)
    W = ref_bf.compute_weights(look_angle=[197, 0], weightType="SD")
    tr = ref_mods["transform"].Transform(n_fft=256, hop_length=128, channel=M)
    D = tr.stft(x)  # [F, T, C]
    Yf = np.einsum("ij,ijn->in", W.conj(), D.transpose(0, 2, 1))[:, :, None].transpose(0, 2, 1)
    Yf = np.einsum("fc,ftc->ft", W.conj(), D)[:, :, None]
    y_ref = tr.istft(Yf)

    cfg = FixedBeamformerConfig(StftConfig(256, 128), weight_type="SD")
    W_ours = fixed_beamformer_weights(geom, (197, 0), cfg)
    y_ours = np.asarray(fixed_process(jnp.asarray(x.T), jnp.asarray(W_ours), cfg.stft))
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-6)


def test_mvdr_process_parity(ref_mods):
    """Full adaptive MVDR + MCRA pipeline vs. adaptivebeamfomer.process
    (adaptivebeamformer.py:44-128), including the per-bin VAD gating."""
    mic, geom = _mic_and_geom(ref_mods)
    rng = np.random.default_rng(5)
    M, S = 4, 128 * 80
    # noise + a "speech" sinusoid burst so the VAD gate actually toggles
    x = 0.05 * rng.standard_normal((M, S))
    t = np.arange(S // 2)
    tone = 0.5 * np.sin(2 * np.pi * 1000 / 16000 * t) * np.hanning(S // 2)
    x[:, S // 4 : S // 4 + S // 2] += tone

    angle_rad = np.array([0.0, 0.0])
    ref_obj = ref_mods["adaptive"].adaptivebeamfomer(mic, 256, 128, 256)
    # oracle repair: process() hands istft a 2-D [F, T] array, which the
    # reference Transform.istft misreads as one frame of T channels
    # (transform.py:463-466); route it through as [F, T, 1] as intended.
    orig_istft = ref_obj.transformer.istft
    ref_obj.transformer.istft = lambda Y: orig_istft(Y[:, :, None])
    y_ref = ref_obj.process(x, angle_rad, method=2)["data"]

    y_ours = np.asarray(mvdr_process(jnp.asarray(x), geom, (0.0, 0.0), MvdrConfig()))
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-6)


def test_adaptive_mvdr2_output_parity(ref_mods):
    """adaptive_mvdr2_process vs the reference AdaptiveMVDR2
    (adaptivebeamformer.py:130-180) frame-exactly: frame-tracking weights
    during the 200-frame estimation window, then frozen, window^2-normalised
    OLA.  The removed getMVDRweight helper is restored by
    refutil.patch_adaptive_mvdr."""
    refutil.patch_adaptive_mvdr()
    mic, geom = _mic_and_geom(ref_mods)
    rng = np.random.default_rng(11)
    M, S = 4, 128 * 60
    x = 0.1 * rng.standard_normal((M, S))

    angle_rad = np.array([0.0, 0.0])
    ref_obj = ref_mods["adaptive"].adaptivebeamfomer(mic, 256, 128, 256)
    y_ref = ref_obj.AdaptiveMVDR2(x, angle_rad)

    steer = steering_vector(geom, (0.0, 0.0), 256)
    y_ours = np.asarray(
        adaptive_mvdr2_process(jnp.asarray(x), jnp.asarray(steer), n_est_frames=200)
    )
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-8)


def test_offline_mvdr_weights_match_adaptive_mvdr(ref_mods):
    """offline_mvdr_weights vs the reference AdaptiveMVDR
    (adaptivebeamformer.py:181-230): same scipy spectrogram in, our fixed
    weights applied + istft must reproduce the reference waveform (any
    weight divergence shows up in the output)."""
    from scipy import signal as ssig

    refutil.patch_adaptive_mvdr()
    mic, geom = _mic_and_geom(ref_mods)
    rng = np.random.default_rng(12)
    M = 4
    S = 128 * 210  # > 200 stft frames for the estimation loop
    x = 0.1 * rng.standard_normal((M, S))

    angle_rad = np.array([0.0, 0.0])
    ref_obj = ref_mods["adaptive"].adaptivebeamfomer(mic, 256, 128, 256)
    # retH=None skips the (removed) beampattern call but still defines the
    # return slot (adaptivebeamformer.py:199-201,227)
    res = ref_obj.AdaptiveMVDR(x, angle_rad, retH=None, retWNG=False, retDI=False)
    y_ref = np.squeeze(res["out"])

    f, t, Zxx = ssig.stft(x, 16000)
    # the reference divides the rank-1 update by win_scale^2
    # (adaptivebeamformer.py:211-214); equivalently scale Z by 1/win_scale
    X = np.moveaxis(Zxx, 0, -1) / ref_obj.win_scale  # [F, T, M] -> need [T, F, M]
    X = np.swapaxes(X, 0, 1)  # [T, F, M]
    steer = steering_vector(geom, (0.0, 0.0), 256)
    w = np.asarray(
        offline_mvdr_weights(jnp.asarray(X), jnp.asarray(steer), n_est_frames=200, alpha=0.9, diag=1e-6)
    )  # [F, M]

    Zout = np.einsum("fm,fmt->ft", np.conj(w), np.moveaxis(Zxx, 0, 1))[None]
    _, y_ours = ssig.istft(Zout, 16000)
    y_ours = np.squeeze(y_ours)
    n = min(len(y_ours), len(y_ref))
    np.testing.assert_allclose(y_ours[:n], y_ref[:n], atol=1e-8)
