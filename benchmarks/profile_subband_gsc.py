"""Where does the SubbandGSC iteration go?  (round-5 profile)

Times each piece of subband_gsc_process in isolation on the attached
device: the full pipeline, a scan of mcspp_step alone, mccdr_step alone,
the gauss_jordan_inv calls alone (mcspp_step computes THREE per frame:
Pinv plus BOTH branches of the xi<0 repair where), the BM/AIC subband-LMS
scans, and the stft_stream round-trips.  Interleaved slope timing
(docs/performance.md "Benchmarking on TPU correctly").

    python -u benchmarks/profile_subband_gsc.py [--cpu] [--batch N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distantspeech_tpu.adaptive.subband import (
        SubbandAfConfig, subband_lms_init, subband_lms_mc_step, subband_lms_step,
    )
    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.beamform.subband_gsc import (
        SubbandGscConfig, subband_gsc_init, subband_gsc_process,
    )
    from distantspeech_tpu.noise.mccdr import mccdr_init, mccdr_step
    from distantspeech_tpu.noise.mcspp import mcspp_init, mcspp_step
    from distantspeech_tpu.stats.linalg import gauss_jordan_inv, matvec, trace_mm, vecmat
    from distantspeech_tpu.transform.stft import istft_stream, stft_stream

    fs = 16000
    B, M = args.batch, 4
    S = int(args.seconds * fs) // 256 * 256
    cfg = SubbandGscConfig(n_mics=M)
    geom = ArrayGeometry.linear(M, 0.032, fs=fs)
    ang = (np.pi / 2, 0.0)
    L = cfg.frame_len
    T = S // L
    F = cfg.half_bin
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, M, S)).astype(np.float32))
    Fn = jnp.asarray(cfg.spp.mccdr.fn_pair(), dtype=jnp.float32)

    # complex frame inputs for the isolated scans, created inside jit
    # (eager complex constants are UNIMPLEMENTED on axon)
    yr = jnp.asarray(rng.standard_normal((T, B, F, M)).astype(np.float32))
    yi = jnp.asarray(rng.standard_normal((T, B, F, M)).astype(np.float32))

    def scan_of(step):
        def run(a, b):
            ys = a + 1j * b
            state = mcspp_init(cfg.spp, (B,), cdtype=jnp.complex64)
            st, out = jax.lax.scan(lambda s, y: step(s, y), state, ys)
            return out.p
        return run

    def full(xx):
        return subband_gsc_process(xx, geom, ang, cfg)[0]

    def mcspp_only(a, b):
        return scan_of(lambda s, y: mcspp_step(cfg.spp, Fn, s, y))(a, b)

    def mccdr_only(a, b):
        ys = a + 1j * b
        state = mccdr_init(cfg.spp.mccdr, (B,), cdtype=jnp.complex64)
        _, ps = jax.lax.scan(
            lambda s, y: mccdr_step(cfg.spp.mccdr, Fn, s, y), state, ys)
        return ps

    def inv3_only(a, b):
        """The three per-frame gauss_jordan_inv calls in isolation, carried
        so the scan cannot collapse."""
        ys = a + 1j * b
        psd0 = ys[0][..., :, None] * jnp.conj(ys[0])[..., None, :]

        def step(Phi, y):
            psd = y[..., :, None] * jnp.conj(y)[..., None, :]
            Phi = 0.92 * Phi + 0.08 * psd
            eye = jnp.eye(M, dtype=Phi.dtype) * 1e-3
            i1 = gauss_jordan_inv(Phi + eye)
            i2 = gauss_jordan_inv(Phi + 2 * eye)
            i3 = gauss_jordan_inv(Phi + 3 * eye)
            return Phi, jnp.real(i1[..., 0, 0] + i2[..., 0, 0] + i3[..., 0, 0])

        _, o = jax.lax.scan(step, psd0, ys)
        return o

    def quad_only(a, b):
        """The trace/quadratic-form multiply-reduce chain in isolation."""
        ys = a + 1j * b
        psd0 = ys[0][..., :, None] * jnp.conj(ys[0])[..., None, :]

        def step(Phi, y):
            psd = y[..., :, None] * jnp.conj(y)[..., None, :]
            Phi = 0.92 * Phi + 0.08 * psd
            xi = jnp.real(trace_mm(Phi, Phi))
            lv = vecmat(jnp.conj(y), Phi)
            rv = matvec(Phi, y)
            g = jnp.real(jnp.sum(lv * matvec(Phi, rv), axis=-1) - jnp.sum(lv * y, axis=-1))
            return Phi, xi + g

        _, o = jax.lax.scan(step, psd0, ys)
        return o

    bm_cfg = cfg.bm
    aic_cfg = cfg.aic

    def bm_only(a, b):
        xs = a + 1j * b  # [T, B, F, M] -> per-mic LMS fbf->mic
        st = subband_lms_init(bm_cfg, (B, M), cdtype=jnp.complex64)

        def step(s, y):
            xin = jnp.broadcast_to(y[..., :1].swapaxes(-1, -2), y.swapaxes(-1, -2).shape)
            s, e = subband_lms_step(bm_cfg, s, xin, y.swapaxes(-1, -2), p=jnp.ones(()))
            return s, jnp.real(e[..., 0])

        _, o = jax.lax.scan(step, st, xs)
        return o

    def aic_only(a, b):
        xs = a + 1j * b
        st = subband_lms_init(aic_cfg, (B,), cdtype=jnp.complex64)

        def step(s, y):
            s, e = subband_lms_mc_step(aic_cfg, s, y, y[..., 0], p=jnp.ones(()))
            return s, jnp.real(e)

        _, o = jax.lax.scan(step, st, xs)
        return o

    blocks = jnp.asarray(rng.standard_normal((T, B, M, L)).astype(np.float32))
    scfg = cfg.stft

    def stft_only(bl):
        def step(c, blk):
            c2, D = stft_stream(c, blk, scfg)
            return c2, jnp.abs(D[..., 0, :])

        _, o = jax.lax.scan(step, jnp.zeros((B, M, L)), bl)
        return o

    def istft_only(a, b):
        ys = (a + 1j * b)[..., 0]  # [T, B, F] mic-0 spectra

        def step(c, blk):
            c2, y = istft_stream(c, blk[..., None, :], scfg)
            return c2, y

        _, o = jax.lax.scan(step, jnp.zeros((B, L)), ys)
        return o

    cases = {
        "full_pipeline": (full, (x,)),
        "mcspp_scan": (mcspp_only, (yr, yi)),
        "mccdr_scan": (mccdr_only, (yr, yi)),
        "inv3_scan": (inv3_only, (yr, yi)),
        "quadforms_scan": (quad_only, (yr, yi)),
        "bm_lms_scan": (bm_only, (yr, yi)),
        "aic_lms_scan": (aic_only, (yr, yi)),
        "stft_scan": (stft_only, (blocks,)),
        "istft_scan": (istft_only, (yr, yi)),
    }
    fns = {n: jax.jit(f) for n, (f, _) in cases.items()}

    def timed(n, iters):
        f, a = fns[n], cases[n][1]
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(*a)
        s = float(jax.device_get(jnp.sum(jnp.abs(y.ravel()[:8]))[None])[0])
        assert np.isfinite(s), (n, s)
        return time.perf_counter() - t0

    for n in cases:
        timed(n, 1)
        timed(n, 1)
        print(f"[compiled] {n}", file=sys.stderr, flush=True)

    LO, HI = 3, 13
    slopes = {n: [] for n in cases}
    for r in range(args.rounds):
        for n in cases:
            lo, hi = timed(n, LO), timed(n, HI)
            slopes[n].append((hi - lo) / (HI - LO))
            print(f"round {r} [{n}] {slopes[n][-1] * 1e3:.2f} ms/iter", file=sys.stderr, flush=True)

    out = {n: round(float(np.median(s)) * 1e3, 3) for n, s in slopes.items()}
    out["batch"] = B
    out["seconds_per_utt"] = args.seconds
    out["audio_s_per_s_full"] = round(B * args.seconds / (out["full_pipeline"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
