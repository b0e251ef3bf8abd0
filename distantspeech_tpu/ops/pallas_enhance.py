"""Fully-fused flagship fast paths: STFT -> MCRA -> MVDR -> OM-LSA -> ISTFT.

Two generations live here:

- ``fused_enhance`` (round 2): XLA windowed-DFT matmuls + two Pallas calls
  (main bins + Nyquist companion) with in-kernel MCRA;
- ``fused_enhance_full`` (round 3, the bench default): the ENTIRE pipeline
  in ONE Pallas call — framing via a 1-block BlockSpec halo, analysis DFT
  dots (optionally 3-pass bf16 against hi/lo-split constants), in-lane MCRA
  cross-bin smoothing, gated MVDR, OM-LSA, inverse DFT and overlap-add —
  plus the same tiny Nyquist companion.  The signal is read from HBM once
  and the spectra never exist in HBM.

Same math as ``beamform.enhance.enhance_scan`` (oracle:
/root/reference/DistantSpeech/beamformer/adaptivebeamformer.py:44-128 +
noise_estimation/mcra.py:27-77 + mcspp_base.py:140-156), restructured
around what the round-2 profile showed:

- the frame-recursion kernel is COMPUTE-bound (~50% of VPU), so the MCRA
  recursion moves INSIDE it (a ~2% op-count increase) instead of running as
  a separate ~0.5 ms jnp scan; only the 3-tap cross-bin smoothing stays
  outside (one elementwise pass — it needs a frequency halo the per-bin
  kernel doesn't have);
- everything AROUND the kernel is HBM-bound, so the layout is chosen to
  make every repack a free reshape: the windowed-DFT matmul writes
  ``[T, M, B, 2F-2]`` f32 with a column permutation that puts the real
  parts of bins 0..F-2 in lane-tile 0 and the imaginary parts in lane-tile
  1, with the (real-valued) Nyquist bin packed into the imag plane's lane 0
  — the two structurally-zero sin columns (k=0 and k=F-1) are dropped so
  the matmul is exactly two lane-tiles wide instead of padding 258->384.
  The Pallas BlockSpec index maps then slice real/imag views straight out
  of the matmul output during the HBM->VMEM DMA.  Zero transposes or pad
  copies on the hot tensor (the round-1 path spent ~1.4 ms on them);
- bins 0..F-2 fill the 128-lane axis exactly (fl = n_fft/2); batch items
  fill sublanes 8 at a time, so B multiples of 8 pack with NO padding
  waste (the round-1 joint (batch x bin) packing wasted 19% at B=32);
  the Nyquist bin runs as one extra single-tile kernel call.

The MCRA bin-edge semantics (interior bins 1..F-2, k=0 pinned p, k=F-1
pinned noise floor) become lane-iota masks in the main call and a static
``last_bin`` specialisation for the Nyquist call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distantspeech_tpu.ops.framing import overlap_add
from distantspeech_tpu.ops.pallas_mvdr import (
    _ldl_factor_into,
    _refresh_loading,
    _mvdr_frame,
    _mvdr_output,
    _mvdr_update_ldl,
    _mvdr_update_rank1,
)

_SUB = 8

# inv_mode='rank1': frames of exact per-frame LDL before the Bennett handover
# (rounded up to whole frame chunks).  64 covers MCRA's 2L = 30 forced-update
# window plus rank completion of Rvv, past the early window where the trace
# (and so rel_diag loading) still grows fast and lanes are load-dominated —
# the regime where the frozen-loading deviation peaks (measured 2.8e-2
# on-device with a 16-frame warmup vs the per-frame-LDL kernel).
_RANK1_WARM_FRAMES = 64


def _mcra_frame(tg, Yp, Sf_t, S, Smin, Stmp, Pp, Lam, interior, mask0,
                *, L, alpha_s, alpha_p, alpha_d, delta_s, p_min, p_max):
    """One MCRA frame on a vreg tile, bit-matching noise.mcra.mcra_step
    (oracle mcra.py:27-77) for bins 0..F-2.  ``tg`` is the global frame
    index (the scalar counters ell/frm_cnt are closed forms of it: the
    minima window resets at tg % L == L-1, speech presence is forced to 0
    for tg < 2L, frame 0 seeds).  Scratch: S, Smin, Stmp, Pp (clipped p),
    Lam (noise PSD), all [8, fl]."""
    is_first = tg == 0
    reset = (tg % L) == (L - 1)

    S_upd = alpha_s * S[...] + (1.0 - alpha_s) * Sf_t
    S_new = jnp.where(interior, S_upd, S[...])

    Smin1 = jnp.minimum(Smin[...], S_new)
    Stmp1 = jnp.minimum(Stmp[...], S_new)
    Smin2 = jnp.where(reset, jnp.minimum(Stmp1, S_new), Smin1)
    Stmp2 = jnp.where(reset, S_new, Stmp1)
    Smin_new = jnp.where(interior, Smin2, Smin[...])
    Stmp_new = jnp.where(interior, Stmp2, Stmp[...])

    Sr = S_new / (Smin_new + 1e-6)
    I = (Sr > delta_s).astype(jnp.float32)
    p_upd = alpha_p * Pp[...] + (1.0 - alpha_p) * I
    p_upd = jnp.where(tg < 2 * L, jnp.zeros_like(p_upd), p_upd)
    p_rec = jnp.where(interior, p_upd, Pp[...])
    p_rec = jnp.where(mask0, jnp.zeros_like(p_rec), p_rec)

    # frame-0 seeding (every main-call lane is a "lead" bin k <= F-2)
    S_out = jnp.where(is_first, S[...], S_new)
    Smin_out = jnp.where(is_first, Yp, Smin_new)
    Stmp_out = jnp.where(is_first, Yp, Stmp_new)
    p_sel = jnp.where(is_first, jnp.zeros_like(p_rec), p_rec)
    p_out = jnp.clip(p_sel, p_min, p_max)

    lam_pre = jnp.where(is_first, Yp, Lam[...])
    alpha_t = alpha_d + (1.0 - alpha_d) * p_out
    lam_out = alpha_t * lam_pre + (1.0 - alpha_t) * Yp

    S[...] = S_out
    Smin[...] = Smin_out
    Stmp[...] = Stmp_out
    Pp[...] = p_out
    Lam[...] = lam_out
    sr = S_out / (Smin_out + 1e-6)  # raw speech indicator (mvdr.vad_guard)
    return p_out, lam_out, sr


def _enhance_kernel(
    zr_ref, zi_ref, sf_ref, ar_ref, ai_ref,  # inputs
    yr_ref, yi_ref,  # outputs
    Rr, Ri, Ur, Ui, S, Smin, Stmp, Pp, Lam, Gh, Gam, Ld,  # scratch
    *, Tc: int, M: int, fl: int,
    L: int, alpha_s: float, alpha_p: float, alpha_d: float, delta_s: float,
    p_min: float, p_max: float,
    alpha_v: float, diag: float, rel_diag: float, p_vad: float,
    alpha_xi: float, gmin: float, last_bin: bool, vad_guard: bool = False,
    inv_mode: str = "ldl", warm_chunks: int = 1,
):
    """The full flagship frame loop: in-kernel MCRA -> gated MVDR (LDL^H
    solve) -> decision-directed OM-LSA gain, state resident in VMEM across
    frame chunks.  ``last_bin=True`` specialises for the Nyquist bin: p is
    pinned at its clip floor (it is never updated, mcra.py:44,70), the
    noise PSD is pinned to 1e-8 before each update (mcra.py:73), and the
    covariance gate is therefore always open."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (Rr, Ri, Ur, Ui, S, Smin, Stmp, Pp, Lam):
            ref[...] = jnp.zeros_like(ref)
        Gh[...] = jnp.ones_like(Gh)
        Gam[...] = jnp.ones_like(Gam)

    ar = [ar_ref[m] for m in range(M)]
    ai = [ai_ref[m] for m in range(M)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, fl), 1)
    interior = lane >= 1  # k in 1..F-2 (lane k=F-1 lives in the Nyquist call)
    mask0 = lane == 0
    log_gmin = float(np.log(gmin))
    refresh = inv_mode == "rank1" and bool(rel_diag)
    chunk_base = pl.program_id(1) * Tc  # hoisted: program_id binds at kernel top level

    def frame(t, _, rank1=False):
        tg = chunk_base + t
        zr = [zr_ref[t, m] for m in range(M)]
        zi = [zi_ref[t, m] for m in range(M)]
        if not last_bin:
            # imag-plane lane 0 carries the Nyquist REAL sample (the N=256
            # matmul packing); bin 0's true imag part is identically zero.
            zi = [jnp.where(mask0, 0.0, v) for v in zi]

        Yp = zr[0] * zr[0] + zi[0] * zi[0]
        if last_bin:
            p_out = jnp.full((_SUB, fl), p_min, jnp.float32)
            alpha_t = alpha_d + (1.0 - alpha_d) * p_min
            lam_out = alpha_t * 1e-8 + (1.0 - alpha_t) * Yp
            upd = None  # p_min < p_vad: the gate is always open
        else:
            p_out, lam_out, sr = _mcra_frame(
                tg, Yp, sf_ref[t, 0], S, Smin, Stmp, Pp, Lam, interior, mask0,
                L=L, alpha_s=alpha_s, alpha_p=alpha_p, alpha_d=alpha_d,
                delta_s=delta_s, p_min=p_min, p_max=p_max,
            )
            upd = p_out < p_vad
            if vad_guard:
                upd = upd & (sr <= delta_s)

        if rank1:
            _mvdr_update_rank1(zr, zi, upd, ar, ai, Rr, Ri, Ur, Ui, M, alpha_v,
                               Ld=Ld if refresh else None)
        else:
            _mvdr_update_ldl(zr, zi, upd, ar, ai, Rr, Ri, Ur, Ui, M, alpha_v, diag, rel_diag)
        yr, yi = _mvdr_output(zr, zi, ar, ai, Ur, Ui, M)

        gamma = (yr * yr + yi * yi) / jnp.maximum(lam_out, 1e-10)
        xi = alpha_xi * Gh[...] ** 2 * Gam[...] + (1.0 - alpha_xi) * jnp.maximum(gamma - 1.0, 0.0)
        G_H1 = xi / (1.0 + xi)
        logG = p_out * jnp.log(jnp.maximum(G_H1, 1e-30)) + (1.0 - p_out) * log_gmin
        G = jnp.clip(jnp.exp(logG), gmin, 1.0)
        Gh[...] = G_H1
        Gam[...] = gamma
        yr_ref[t, 0] = yr * G
        yi_ref[t, 0] = yi * G
        return 0

    if inv_mode == "rank1":
        # chunk 0 = exact-LDL warmup, then convert the covariance scratch to
        # its inverse in place; later chunks run the Sherman-Morrison path
        # (see _mvdr_update_rank1 for the numerics contract)
        pid = pl.program_id(1)  # hoisted: bind outside the nested conds

        @pl.when(pid < warm_chunks)
        def _warm_chunk():
            jax.lax.fori_loop(0, Tc, frame, 0)

            @pl.when(pid == warm_chunks - 1)  # handover: factor in place
            def _convert():
                load = _ldl_factor_into(Rr, Ri, M, diag, rel_diag)
                if refresh:
                    Ld[...] = jnp.broadcast_to(load, Ld.shape)

        @pl.when(pid >= warm_chunks)
        def _steady_chunk():
            if refresh:
                @pl.when(pid >= warm_chunks + 1)  # first steady chunk starts anchored
                def _reanchor():
                    _refresh_loading(Rr, Ri, Ld, M, diag, rel_diag)
            jax.lax.fori_loop(0, Tc, partial(frame, rank1=True), 0)
    else:
        jax.lax.fori_loop(0, Tc, frame, 0)


def _pick_t_chunk(T: int, cap: int = 64):
    """Largest divisor of T <= cap (so no frame padding is needed), or None
    if every divisor is degenerate (< 8) and padding is the better deal."""
    for tc in range(min(cap, T), 7, -1):
        if T % tc == 0:
            return tc
    return None


def fused_enhance(
    x: jnp.ndarray,
    steer: np.ndarray,
    cfg,
    interpret: bool = False,
    t_chunk: int = None,
    inv_mode: str = "ldl",
) -> jnp.ndarray:
    """Time-domain in/out flagship pipeline (EnhanceConfig semantics).

    x: [B, M, S] with B % 8 == 0 and S % hop == 0; steer: [F, M] complex
    (NumPy: it is embedded as a compiled constant — eager complex transfer
    is unsupported on the axon tunnel).  Returns y [B, S].

    Matches ``enhance_process(..., backend='scan')`` to float32 rounding;
    bench.py gates on that parity on-device before timing.
    """
    from distantspeech_tpu.noise.mcra import _freq_smooth
    from distantspeech_tpu.transform.stft import _dft_matrices, _idft_matrices

    stft = cfg.stft
    F = stft.half_bin
    fl = F - 1
    if fl % 128 != 0:
        raise ValueError(f"fused_enhance needs n_fft a multiple of 256, got {stft.n_fft}")
    if x.ndim != 3 or x.shape[0] % _SUB:
        raise ValueError(f"fused_enhance needs x of shape [B, M, S] with B % 8 == 0, got {x.shape}")
    if x.shape[-1] % stft.hop:
        # drop the sub-hop tail, matching the scan path (stft_frames truncates
        # partial frames) instead of an opaque reshape error on arbitrary wavs
        x = x[..., : x.shape[-1] // stft.hop * stft.hop]
    B, M, S = x.shape
    mv = cfg.mvdr
    mc = mv.mcra
    steer = np.asarray(steer)

    # ---- analysis: one windowed-DFT matmul into the kernel's layout --------
    # lane-tile 0 of the output is the main-bin real plane, lane-tile 1 the
    # imag plane, and the BlockSpec index maps read both straight from this
    # one array.  N=256 packing: the sin columns for k=0 and k=F-1 are
    # identically zero, so the Nyquist REAL column takes the imag plane's
    # lane 0 instead (masked to 0 inside the kernel) — the matmul output is
    # then exactly two lane-tiles wide.  The naive [cos|sin] layout is 258
    # columns, which the MXU pads to 384 lanes: a third more column passes
    # spent on two all-zero columns.
    # Column order: [cos 0..F-2 | cos F-1 | sin 1..F-2].
    C, Sn = _dft_matrices(stft)
    CS = np.concatenate([C[:, :fl], C[:, fl:], Sn[:, 1:fl]], axis=1).astype(np.float32)
    # Never materialise the 2x-sized overlapping-frame tensor: with 50%
    # overlap, frame t is the concatenation of hop-blocks t and t+1, both
    # free reshapes of the padded signal — so the windowed DFT is two
    # half-frame matmuls on non-overlapping blocks.  Measured: the frame
    # gather alone cost 1.9 ms/iter of the 2.3 ms framed matmul.
    xp = jnp.pad(x, [(0, 0), (0, 0), (stft.overlap, 0)])
    blocks = xp.reshape(B, M, -1, stft.hop)  # [B, M, T+1, hop]
    W1 = jnp.asarray(CS[: stft.hop])
    W2 = jnp.asarray(CS[stft.hop :])
    Y = jnp.einsum("bmtl,lk->tmbk", blocks[:, :, :-1], W1, precision="highest")
    Y = Y + jnp.einsum("bmtl,lk->tmbk", blocks[:, :, 1:], W2, precision="highest")
    T = Y.shape[0]  # [T, M, B, 2F-2]

    tc = t_chunk or _pick_t_chunk(T)
    if tc is None:  # awkward T: pad frames (the copy is the fallback, not the rule)
        tc = 64
        Tp = -(-T // tc) * tc
        Y = jnp.pad(Y, [(0, Tp - T), (0, 0), (0, 0), (0, 0)])
    Tp = Y.shape[0]
    nb = B // _SUB

    # ---- MCRA cross-bin smoothing (the only part with a frequency halo) ----
    Yi0 = Y[:, 0, :, fl:]  # imag plane: lane 0 = Nyquist REAL, lanes 1.. = imag 1..F-2
    imag_mask = jnp.asarray(np.concatenate([[0.0], np.ones(fl - 1)]).astype(np.float32))
    p0 = (
        Y[:, 0, :, :fl] ** 2 + (Yi0 * imag_mask) ** 2,  # bins 0..F-2 (bin-0 imag is 0)
        Yi0[..., :1] ** 2,  # Nyquist (real-valued for real input)
    )
    Sf = _freq_smooth(jnp.concatenate(p0, axis=-1), mc.b)[..., :fl]  # [Tp, B, fl]
    Sf = Sf.reshape(Tp, nb, _SUB, fl)

    # ---- steering as materialised vreg tiles (compiled constants) ----------
    a_main_r = np.broadcast_to(np.real(steer[:fl]).T[:, None, :], (M, _SUB, fl)).astype(np.float32)
    a_main_i = np.broadcast_to(np.imag(steer[:fl]).T[:, None, :], (M, _SUB, fl)).astype(np.float32)
    a_nyq_r = np.broadcast_to(np.real(steer[fl])[:, None, None], (M, _SUB, fl)).astype(np.float32)
    a_nyq_i = np.broadcast_to(np.imag(steer[fl])[:, None, None], (M, _SUB, fl)).astype(np.float32)

    kern_kwargs = dict(
        Tc=tc, M=M, fl=fl,
        L=mc.L, alpha_s=mc.alpha_s, alpha_p=mc.alpha_p, alpha_d=mc.alpha_d,
        delta_s=mc.delta_s, p_min=mc.p_min, p_max=mc.p_max,
        alpha_v=mv.alpha_v, diag=mv.diag, rel_diag=mv.rel_diag, p_vad=mv.p_vad,
        vad_guard=getattr(mv, "vad_guard", False), inv_mode=inv_mode,
        warm_chunks=max(1, -(-_RANK1_WARM_FRAMES // tc)),
        alpha_xi=cfg.alpha_xi, gmin=cfg.gmin,
    )
    if inv_mode not in ("ldl", "rank1"):
        raise ValueError(f"inv_mode must be 'ldl' or 'rank1', got {inv_mode!r}")
    scratch = [
        pltpu.VMEM((M, M, _SUB, fl), jnp.float32),
        pltpu.VMEM((M, M, _SUB, fl), jnp.float32),
        pltpu.VMEM((M, _SUB, fl), jnp.float32),
        pltpu.VMEM((M, _SUB, fl), jnp.float32),
    ] + [pltpu.VMEM((_SUB, fl), jnp.float32)] * 8
    tspec = pl.BlockSpec((tc, 1, _SUB, fl), lambda n, t: (t, n, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((M, _SUB, fl), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((Tp, nb, _SUB, fl), jnp.float32),
        jax.ShapeDtypeStruct((Tp, nb, _SUB, fl), jnp.float32),
    ]

    # ---- main call: bins 0..F-2, grid (batch-blocks, frame-chunks) ---------
    # zr/zi are two views of the SAME matmul output, sliced by the index map
    # during the block DMA (lane-tile 0 = real, lane-tile 1 = imag).
    zspec_r = pl.BlockSpec((tc, M, _SUB, fl), lambda n, t: (t, 0, n, 0), memory_space=pltpu.VMEM)
    zspec_i = pl.BlockSpec((tc, M, _SUB, fl), lambda n, t: (t, 0, n, 1), memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        partial(_enhance_kernel, last_bin=False, **kern_kwargs),
        grid=(nb, Tp // tc),
        in_specs=[zspec_r, zspec_i, tspec, aspec, aspec],
        out_specs=[tspec, tspec],
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(Y, Y, Sf, jnp.asarray(a_main_r), jnp.asarray(a_main_i))

    # ---- Nyquist call: one tile, batch packed (sublane = b%8, lane = b//8) -
    # Y[..., fl] is the Nyquist real sample (its imag is identically 0)
    ynr = _run_nyquist(Y[:, :, :, fl : fl + 1], a_nyq_r, a_nyq_i, kern_kwargs, tc, Tp, nb, fl, M, interpret)

    # ---- synthesis: free reshapes back, one inverse-DFT matmul -------------
    yr = yr[:T].reshape(T, B, fl)
    yi = yi[:T].reshape(T, B, fl)
    ynr = jnp.moveaxis(ynr[:T, 0, :, :nb], 2, 1).reshape(T, B, 1)
    # K=256 packing for the inverse matmul: the sin rows for k=0 and k=F-1
    # are identically zero, so bin-0 imag and Nyquist imag drop out exactly
    # (258 rows would pad to a third more contraction tiles on the MXU).
    Yri = jnp.concatenate([yr, ynr, yi[..., 1:]], axis=-1)  # [T, B, 2F-2]
    A, Bm = _idft_matrices(stft)
    AB = jnp.asarray(np.concatenate([A, Bm[1:fl]], axis=0).astype(np.float32))
    out_frames = jnp.einsum("tbk,kl->btl", Yri, AB, precision="highest")  # [B, T, L]
    y = overlap_add(out_frames, stft.hop)
    return y[..., : stft.hop * T] * jnp.asarray(stft.synthesis_gain, y.dtype)


def _dot3(a, w_hi, w_lo):
    """Three-pass bf16 matmul of an f32 operand against a constant matrix
    pre-split as w = w_hi + w_lo (both bf16): a@w = a_hi@w_hi + a_hi@w_lo +
    a_lo@w_hi, dropping the ~2^-16 a_lo@w_lo term.  ~1e-5 relative error
    with f32 accumulation — half the MXU passes of precision='highest'."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.dot(a_hi, w_hi, preferred_element_type=jnp.float32)
    out = out + jnp.dot(a_hi, w_lo, preferred_element_type=jnp.float32)
    return out + jnp.dot(a_lo, w_hi, preferred_element_type=jnp.float32)


def _mega_kernel(
    sig_ref, halo_ref, cs_ref, ab_ref, ar_ref, ai_ref,  # inputs
    y_ref,  # output: [Tc, 1, 8, hop] overlap-added time-domain chunk
    Zr, Zi, Yor, Yoi, OAc, Rr, Ri, Ur, Ui, S, Smin, Stmp, Pp, Lam, Gh, Gam, Ld,  # scratch
    *, Tc: int, M: int, fl: int,
    L: int, alpha_s: float, alpha_p: float, alpha_d: float, delta_s: float,
    p_min: float, p_max: float, b: tuple,
    alpha_v: float, diag: float, rel_diag: float, p_vad: float,
    alpha_xi: float, gmin: float, mxu: str = "highest", unroll: int = 1,
    sub: int = _SUB, vad_guard: bool = False, inv_mode: str = "ldl", warm_chunks: int = 1,
):
    """The whole flagship pipeline in ONE kernel: framing + windowed DFT +
    MCRA (cross-bin smoothing via lane shifts) + gated MVDR + OM-LSA +
    inverse DFT + overlap-add.  The signal is the only HBM input and the
    overlap-added waveform the only HBM output — the round-2 profile showed
    the separate XLA analysis matmul ran at ~10% of the chip's matmul rate
    and its [T, M, B, 2F-2] spectra round-tripped HBM three times (write,
    MCRA-smooth read, kernel read).

    sig_ref: [Tc, M, 8, hop] hop-blocks (frame-major); halo_ref: [1, M, 8,
    hop] the one extra hop-block frame Tc-1 needs (50% overlap: frame t =
    blocks t, t+1).  cs_ref [n_fft, 2fl]: packed windowed-DFT matrix
    (columns [cos 0..F-2 | cos F-1 | sin 1..F-2]); ab_ref [2fl, n_fft]: the
    packed inverse (its Nyquist row multiplies the zeroed lane 128 — the
    Nyquist bin's contribution is added OUTSIDE from the tiny companion
    kernel).  Oracle semantics: transform.py:430-481 + mcra.py:27-77 +
    adaptivebeamformer.py:44-128 + mcspp_base.py:140-156.
    """

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (OAc, Rr, Ri, Ur, Ui, S, Smin, Stmp, Pp, Lam):
            ref[...] = jnp.zeros_like(ref)
        Gh[...] = jnp.ones_like(Gh)
        Gam[...] = jnp.ones_like(Gam)

    # ---- analysis: two half-frame dots per mic (framing never materialised).
    # The real/imag lane-halves split ONCE here in bulk; the frame loop then
    # reads pure [sub, fl] tiles with no per-frame lane slicing.
    for m in range(M):
        a1 = sig_ref[:, m]  # [Tc, sub, hop]
        a2 = jnp.concatenate([a1[1:], halo_ref[:, m]], axis=0)
        if mxu == "bf16x3":
            a12 = jnp.concatenate([a1, a2], axis=-1).reshape(Tc * sub, 2 * fl)
            z = _dot3(a12, cs_ref[0], cs_ref[1])
        else:
            z = jnp.dot(a1.reshape(Tc * sub, fl), cs_ref[:fl],
                        precision="highest", preferred_element_type=jnp.float32)
            z = z + jnp.dot(a2.reshape(Tc * sub, fl), cs_ref[fl:],
                            precision="highest", preferred_element_type=jnp.float32)
        z = z.reshape(Tc, sub, 2 * fl)
        Zr[m] = z[:, :, :fl]
        Zi[m] = z[:, :, fl:]

    ar = [ar_ref[m] for m in range(M)]
    ai = [ai_ref[m] for m in range(M)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, fl), 1)
    interior = lane >= 1
    mask0 = lane == 0
    log_gmin = float(np.log(gmin))
    refresh = inv_mode == "rank1" and bool(rel_diag)
    chunk_base = pl.program_id(1) * Tc

    def frame(t, _, rank1=False):
        tg = chunk_base + t
        zr = [Zr[m, t] for m in range(M)]  # [8, fl]
        zi_raw = [Zi[m, t] for m in range(M)]
        # imag-plane lane 0 carries the Nyquist REAL sample (packing);
        # bin 0's true imag part is identically zero.
        zi = [jnp.where(mask0, 0.0, v) for v in zi_raw]

        # MCRA 3-tap cross-bin smoothing entirely in-lane: the main bins
        # 0..F-2 fill one 128-lane tile, so the neighbours are lane shifts;
        # the k=F-2 right-neighbour is the Nyquist power, read from the
        # packed lane (mcra._freq_smooth edges are unused: interior-only).
        Yp = zr[0] * zr[0] + zi[0] * zi[0]
        Pn = zi_raw[0][:, :1] * zi_raw[0][:, :1]  # [8, 1] Nyquist power
        Pl = jnp.concatenate([Yp[:, :1], Yp[:, :-1]], axis=1)
        Pr = jnp.concatenate([Yp[:, 1:], Pn], axis=1)
        Sf_t = b[0] * Pl + b[1] * Yp + b[2] * Pr

        p_out, lam_out, sr = _mcra_frame(
            tg, Yp, Sf_t, S, Smin, Stmp, Pp, Lam, interior, mask0,
            L=L, alpha_s=alpha_s, alpha_p=alpha_p, alpha_d=alpha_d,
            delta_s=delta_s, p_min=p_min, p_max=p_max,
        )
        upd = p_out < p_vad
        if vad_guard:
            upd = upd & (sr <= delta_s)
        if rank1:
            _mvdr_update_rank1(zr, zi, upd, ar, ai, Rr, Ri, Ur, Ui, M, alpha_v,
                               Ld=Ld if refresh else None)
        else:
            _mvdr_update_ldl(zr, zi, upd, ar, ai, Rr, Ri, Ur, Ui, M, alpha_v, diag, rel_diag)
        yr, yi = _mvdr_output(zr, zi, ar, ai, Ur, Ui, M)

        gamma = (yr * yr + yi * yi) / jnp.maximum(lam_out, 1e-10)
        xi = alpha_xi * Gh[...] ** 2 * Gam[...] + (1.0 - alpha_xi) * jnp.maximum(gamma - 1.0, 0.0)
        G_H1 = xi / (1.0 + xi)
        logG = p_out * jnp.log(jnp.maximum(G_H1, 1e-30)) + (1.0 - p_out) * log_gmin
        G = jnp.clip(jnp.exp(logG), gmin, 1.0)
        Gh[...] = G_H1
        Gam[...] = gamma
        Yor[t] = yr * G
        Yoi[t] = jnp.where(mask0, 0.0, yi * G)  # lane 0 = the Nyquist slot, filled outside
        return 0

    if inv_mode == "rank1":
        # chunk 0 = exact-LDL warmup, then convert the covariance scratch to
        # its inverse in place; later chunks run the Sherman-Morrison path
        pid = pl.program_id(1)  # hoisted: bind outside the nested conds

        @pl.when(pid < warm_chunks)
        def _warm_chunk():
            jax.lax.fori_loop(0, Tc, frame, 0, unroll=unroll)

            @pl.when(pid == warm_chunks - 1)  # handover: factor in place
            def _convert():
                load = _ldl_factor_into(Rr, Ri, M, diag, rel_diag)
                if refresh:
                    Ld[...] = jnp.broadcast_to(load, Ld.shape)

        @pl.when(pid >= warm_chunks)
        def _steady_chunk():
            if refresh:
                @pl.when(pid >= warm_chunks + 1)  # first steady chunk starts anchored
                def _reanchor():
                    _refresh_loading(Rr, Ri, Ld, M, diag, rel_diag)
            jax.lax.fori_loop(0, Tc, partial(frame, rank1=True), 0, unroll=unroll)
    else:
        jax.lax.fori_loop(0, Tc, frame, 0, unroll=unroll)

    # ---- synthesis + overlap-add (50% overlap: y[t] = f[t,:hop]+f[t-1,hop:])
    # packed inverse layout: [yr bins 0..F-2 | 0 (Nyquist slot) | yi 1..F-2],
    # concatenated ONCE per chunk in bulk
    yri_flat = jnp.concatenate([Yor[...], Yoi[...]], axis=-1).reshape(Tc * sub, 2 * fl)
    if mxu == "bf16x3":
        f = _dot3(yri_flat, ab_ref[0], ab_ref[1])
    else:
        f = jnp.dot(yri_flat, ab_ref[...], precision="highest", preferred_element_type=jnp.float32)
    f = f.reshape(Tc, sub, 2 * fl)
    prev = jnp.concatenate([OAc[...], f[:-1, :, fl:]], axis=0)
    y_ref[:, 0] = f[:, :, :fl] + prev
    OAc[...] = f[-1:, :, fl:]


def fused_enhance_full(
    x: jnp.ndarray,
    steer: np.ndarray,
    cfg,
    interpret: bool = False,
    t_chunk: int = None,
    mxu: str = "highest",
    unroll: int = 1,
    sub: int = _SUB,
    inv_mode: str = "ldl",
    _skip_nyquist: bool = False,
) -> jnp.ndarray:
    """Mega-fused flagship: the ENTIRE pipeline (STFT analysis included) in
    one Pallas call plus the tiny Nyquist companion.

    Versus ``fused_enhance`` (which leaves the windowed-DFT matmuls to XLA),
    this reads the [B, M, S] signal from HBM once and writes the [B, S]
    waveform once: the [T, M, B, 2F-2] spectra (~2x the signal size) never
    exist in HBM, and the analysis dots run on non-overlapping hop-block
    reshapes streamed through VMEM.  Same restrictions: B % 8 == 0, n_fft a
    multiple of 256, 50% overlap.  Parity: matches enhance_scan to float32
    rounding (bench.py gate).
    """
    from distantspeech_tpu.transform.stft import _dft_matrices, _idft_matrices

    stft = cfg.stft
    F = stft.half_bin
    fl = F - 1
    if fl % 128 != 0:
        raise ValueError(f"fused_enhance_full needs n_fft a multiple of 256, got {stft.n_fft}")
    if stft.n_fft != 2 * stft.hop:
        raise ValueError("fused_enhance_full needs 50% overlap (n_fft == 2*hop)")
    if sub % _SUB:
        raise ValueError(f"sub must be a multiple of 8, got {sub}")
    if x.ndim != 3 or x.shape[0] % sub:
        raise ValueError(f"fused_enhance_full needs x of shape [B, M, S] with B % {sub} == 0, got {x.shape}")
    if x.shape[-1] % stft.hop:
        x = x[..., : x.shape[-1] // stft.hop * stft.hop]
    B, M, S = x.shape
    hop = stft.hop
    T = S // hop
    nb = B // sub
    mv = cfg.mvdr
    mc = mv.mcra
    steer = np.asarray(steer)

    # VMEM-bounded frame chunk: the Z scratch is [M, Tc, sub, 2fl] f32 and
    # the double-buffered signal block [Tc, M, sub, hop] x2 — cap ~8 MB.
    cap = max(8, min(64, (8 << 20) // (M * sub * 2 * fl * 4 * 2)))
    tc = t_chunk or _pick_t_chunk(T, cap) or cap
    Tp = -(-T // tc) * tc

    # hop-block tensor, frame-major: [Tp+1, M, B, hop].  One XLA transpose
    # (~0.1 ms at flagship size) buys frame-major rows for the in-kernel
    # dots and contiguous per-frame tiles — measured cheaper than in-kernel
    # sublane shuffles.
    xp = jnp.pad(x, [(0, 0), (0, 0), (stft.overlap, 0)])
    blocks = xp.reshape(B, M, T + 1, hop)
    if Tp != T:
        blocks = jnp.pad(blocks, [(0, 0), (0, 0), (0, Tp - T), (0, 0)])
    blocksT = jnp.transpose(blocks, (2, 1, 0, 3))  # [Tp+1, M, B, hop]

    if mxu not in ("highest", "bf16x3"):
        raise ValueError(f"mxu must be 'highest' or 'bf16x3', got {mxu!r}")
    C, Sn = _dft_matrices(stft)
    CS = np.concatenate([C[:, :fl], C[:, fl:], Sn[:, 1:fl]], axis=1).astype(np.float32)
    A, Bm = _idft_matrices(stft)
    AB = np.concatenate([A, Bm[1:fl]], axis=0).astype(np.float32)
    if mxu == "bf16x3":
        import ml_dtypes

        def hi_lo(W):
            hi = W.astype(ml_dtypes.bfloat16)
            lo = (W - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            return np.stack([hi, lo])

        CS_in, AB_in = hi_lo(CS), hi_lo(AB)
    else:
        CS_in, AB_in = CS, AB

    a_main_r = np.broadcast_to(np.real(steer[:fl]).T[:, None, :], (M, sub, fl)).astype(np.float32)
    a_main_i = np.broadcast_to(np.imag(steer[:fl]).T[:, None, :], (M, sub, fl)).astype(np.float32)
    a_nyq_r = np.broadcast_to(np.real(steer[fl])[:, None, None], (M, _SUB, fl)).astype(np.float32)
    a_nyq_i = np.broadcast_to(np.imag(steer[fl])[:, None, None], (M, _SUB, fl)).astype(np.float32)

    kern_kwargs = dict(
        Tc=tc, M=M, fl=fl,
        L=mc.L, alpha_s=mc.alpha_s, alpha_p=mc.alpha_p, alpha_d=mc.alpha_d,
        delta_s=mc.delta_s, p_min=mc.p_min, p_max=mc.p_max,
        alpha_v=mv.alpha_v, diag=mv.diag, rel_diag=mv.rel_diag, p_vad=mv.p_vad,
        vad_guard=getattr(mv, "vad_guard", False), inv_mode=inv_mode,
        warm_chunks=max(1, -(-_RANK1_WARM_FRAMES // tc)),
    )
    kern_kwargs.update(alpha_xi=cfg.alpha_xi, gmin=cfg.gmin)
    if inv_mode not in ("ldl", "rank1"):
        raise ValueError(f"inv_mode must be 'ldl' or 'rank1', got {inv_mode!r}")

    sig_spec = pl.BlockSpec((tc, M, sub, hop), lambda n, t: (t, 0, n, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, M, sub, hop), lambda n, t: (t * tc + tc, 0, n, 0), memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec(CS_in.shape, lambda n, t: (0,) * CS_in.ndim, memory_space=pltpu.VMEM)
    ab_spec = pl.BlockSpec(AB_in.shape, lambda n, t: (0,) * AB_in.ndim, memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((M, sub, fl), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((tc, 1, sub, hop), lambda n, t: (t, n, 0, 0), memory_space=pltpu.VMEM)

    mega_scratch = [
        pltpu.VMEM((M, tc, sub, fl), jnp.float32),  # Zr
        pltpu.VMEM((M, tc, sub, fl), jnp.float32),  # Zi
        pltpu.VMEM((tc, sub, fl), jnp.float32),  # Yor
        pltpu.VMEM((tc, sub, fl), jnp.float32),  # Yoi
        pltpu.VMEM((1, sub, fl), jnp.float32),  # OAc
        pltpu.VMEM((M, M, sub, fl), jnp.float32),
        pltpu.VMEM((M, M, sub, fl), jnp.float32),
        pltpu.VMEM((M, sub, fl), jnp.float32),
        pltpu.VMEM((M, sub, fl), jnp.float32),
    ] + [pltpu.VMEM((sub, fl), jnp.float32)] * 8

    # batch blocks are independent -> the n grid axis is 'parallel': on
    # megacore chips Mosaic splits it across the two TensorCores (the t axis
    # carries VMEM state and must stay sequential)
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    # Mosaic's fori_loop lowering supports unroll=1 or full unroll only
    unroll_n = tc if unroll == "full" else int(unroll)
    if unroll_n not in (1, tc):
        raise ValueError(f"unroll must be 1 or 'full' (got {unroll!r})")
    y_main = pl.pallas_call(
        partial(_mega_kernel, b=tuple(float(v) for v in mc.b), mxu=mxu, unroll=unroll_n, sub=sub, **kern_kwargs),
        grid=(nb, Tp // tc),
        in_specs=[sig_spec, halo_spec, cs_spec, ab_spec, aspec, aspec],
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct((Tp, nb, sub, hop), jnp.float32),
        scratch_shapes=mega_scratch,
        interpret=interpret,
        **({} if params is None else {"compiler_params": params}),
    )(blocksT, blocksT, jnp.asarray(CS_in), jnp.asarray(AB_in), jnp.asarray(a_main_r), jnp.asarray(a_main_i))

    if _skip_nyquist:  # part-isolation mode for the A/B profiler only
        y = y_main[:T].reshape(T, B, hop)
        return jnp.moveaxis(y, 0, 1).reshape(B, T * hop) * jnp.asarray(stft.synthesis_gain, y.dtype)

    # ---- Nyquist branch: windowed-DFT matvec -> companion kernel -----------
    w_nyq = CS[:, fl]
    zn = jnp.einsum("tmbl,l->tmb", blocksT[:-1], jnp.asarray(w_nyq[:hop]), precision="highest")
    zn = zn + jnp.einsum("tmbl,l->tmb", blocksT[1:], jnp.asarray(w_nyq[hop:]), precision="highest")
    nb8 = B // _SUB  # the Nyquist companion always packs 8 sublanes
    ynr = _run_nyquist(zn[..., None], a_nyq_r, a_nyq_i, kern_kwargs, tc, Tp, nb8, fl, M, interpret)

    # its inverse-DFT row contribution, overlap-added inline
    ynr = jnp.moveaxis(ynr[:T, 0, :, :nb8], 2, 1).reshape(T, B)  # [T, B]
    fn = ynr[:, :, None] * jnp.asarray(AB[fl])[None, None, :]  # [T, B, n_fft]
    contrib = fn[:, :, :hop] + jnp.concatenate(
        [jnp.zeros_like(fn[:1, :, hop:]), fn[:-1, :, hop:]], axis=0
    )
    y = y_main[:T].reshape(T, B, hop) + contrib
    return jnp.moveaxis(y, 0, 1).reshape(B, T * hop) * jnp.asarray(stft.synthesis_gain, y.dtype)


def _run_nyquist(zn4, a_nyq_r, a_nyq_i, kern_kwargs, tc, Tp, nb, fl, M, interpret):
    """Run the single-tile Nyquist-bin companion kernel.

    zn4: [Tp, M, B, 1] real Nyquist spectra.  Returns the OM-LSA-gained
    beamformer output packed as [Tp, 1, 8, fl] (sublane = b%8, lane = b//8).
    """
    zn = zn4.reshape(Tp, M, nb, _SUB, 1)
    zn = jnp.transpose(zn, (0, 1, 4, 3, 2))  # [Tp, M, (plane), 8, b//8]
    zn = jnp.pad(zn, [(0, 0), (0, 0), (0, 1), (0, 0), (0, fl - nb)])  # plane 1 (imag) = zeros
    nyspec_r = pl.BlockSpec((tc, M, 1, _SUB, fl), lambda n, t: (t, 0, 0, 0, 0), memory_space=pltpu.VMEM)
    nyspec_i = pl.BlockSpec((tc, M, 1, _SUB, fl), lambda n, t: (t, 0, 1, 0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((tc, 1, _SUB, fl), lambda n, t: (t, n, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((M, _SUB, fl), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((M, M, _SUB, fl), jnp.float32),
        pltpu.VMEM((M, M, _SUB, fl), jnp.float32),
        pltpu.VMEM((M, _SUB, fl), jnp.float32),
        pltpu.VMEM((M, _SUB, fl), jnp.float32),
    ] + [pltpu.VMEM((_SUB, fl), jnp.float32)] * 8
    sf_dummy = jnp.zeros((Tp, 1, _SUB, fl), jnp.float32)
    ynr, _ = pl.pallas_call(
        partial(_nyq_kernel, **kern_kwargs),
        grid=(1, Tp // tc),
        in_specs=[nyspec_r, nyspec_i, tspec, aspec, aspec],
        out_specs=[tspec, tspec],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, 1, _SUB, fl), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, _SUB, fl), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(zn, zn, sf_dummy, jnp.asarray(a_nyq_r), jnp.asarray(a_nyq_i))
    return ynr


def _nyq_kernel(zr_ref, zi_ref, sf_ref, ar_ref, ai_ref, yr_ref, yi_ref, *refs, **kw):
    """Nyquist-bin call: same kernel, 5-D z refs (the extra plane axis
    selects real/imag), last_bin specialisation."""

    def squeeze_view(ref):
        class _V:
            def __getitem__(self, idx):
                t, m = idx
                return ref[t, m, 0, :, :]

        return _V()

    _enhance_kernel(
        squeeze_view(zr_ref), squeeze_view(zi_ref), sf_ref, ar_ref, ai_ref,
        yr_ref, yi_ref, *refs, last_bin=True, **kw,
    )
