"""Recursive magnitude-squared-coherence (MSC) estimation between mic pairs.

Oracle: BinauralEnhancement.update_CSD_PSD / updateMSC
(/root/reference/DistantSpeech/coherence/BinauralEnhancement.py:24-60): a
first-order recursion of per-channel auto-PSDs and upper-triangle cross-PSDs,
with the estimated coherence Fvv_est[i,j] = Pxij / sqrt(Pxii_i * Pxii_j).

State is kept in packed pair form ``[..., F, P]`` with P = M(M-1)/2 in the
reference's (0,1),(0,2),...,(1,2),... ordering — no [M, M] matrix is ever
materialised on device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


def pair_indices(n_ch: int) -> Tuple[np.ndarray, np.ndarray]:
    """Upper-triangle (i < j) pairs in reference ordering (t-counter loops,
    BinauralEnhancement.py:26-29)."""
    iu = np.triu_indices(n_ch, k=1)
    return iu[0], iu[1]


def pair_index(n_ch: int, i: int, j: int) -> int:
    """Packed index t of pair (i, j), i < j."""
    ii, jj = pair_indices(n_ch)
    return int(np.nonzero((ii == i) & (jj == j))[0][0])


class MscState(NamedTuple):
    Pxii: jnp.ndarray  # auto PSDs   [..., F, M] real
    Pxij: jnp.ndarray  # cross PSDs  [..., F, P] complex


def msc_init(n_ch: int, half_bin: int, batch_shape=(), cdtype=jnp.complex64) -> MscState:
    P = n_ch * (n_ch - 1) // 2
    rdtype = jnp.zeros(0, dtype=cdtype).real.dtype
    return MscState(
        Pxii=jnp.zeros((*batch_shape, half_bin, n_ch), dtype=rdtype),
        Pxij=jnp.zeros((*batch_shape, half_bin, P), dtype=cdtype),
    )


def msc_update(state: MscState, Z: jnp.ndarray, alpha: float) -> Tuple[MscState, jnp.ndarray]:
    """One recursion frame.

    Z: [..., F, M] complex spectrum.  Returns (new_state, Fvv_est [..., F, P])
    where Fvv_est[t] is the estimated complex coherence of pair t.
    """
    i_idx, j_idx = pair_indices(Z.shape[-1])
    Pxii = alpha * state.Pxii + (1.0 - alpha) * jnp.real(Z * jnp.conj(Z))
    Pxij = alpha * state.Pxij + (1.0 - alpha) * Z[..., i_idx] * jnp.conj(Z[..., j_idx])
    denom = jnp.sqrt(Pxii[..., i_idx] * Pxii[..., j_idx])
    Fvv_est = Pxij / denom.astype(Pxij.dtype)
    return MscState(Pxii=Pxii, Pxij=Pxij), Fvv_est
