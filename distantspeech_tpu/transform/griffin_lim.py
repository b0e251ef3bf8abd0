"""Griffin-Lim phase reconstruction on the framework's STFT.

Capability parity with coherence/gl.py (a vendored pyroomacoustics
griffin_lim, /root/reference/DistantSpeech/coherence/gl.py): iterate
synthesise -> re-analyse -> restore the known magnitude.  Expressed as a
``lax.fori_loop`` so the whole reconstruction is one compiled program and
batches over leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from distantspeech_tpu.transform.stft import StftConfig, analysis, synthesis


def griffin_lim(
    mag: jnp.ndarray, cfg: StftConfig = StftConfig(256, 128), n_iter: int = 50,
    init_phase: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reconstruct a signal from an STFT magnitude.

    mag: [..., T, F] magnitude spectrogram.  Returns y [..., hop*T].
    ``init_phase``: optional [..., T, F] complex initialisation (defaults to
    zero phase like the reference's default path).
    """
    if init_phase is None:
        X = mag.astype(jnp.complex64)
    else:
        X = mag * init_phase / jnp.maximum(jnp.abs(init_phase), 1e-12)

    def body(_, X):
        y = synthesis(X, cfg)
        Y = analysis(y, cfg)
        phase = Y / jnp.maximum(jnp.abs(Y), 1e-12).astype(Y.dtype)
        return mag.astype(Y.dtype) * phase

    X = jax.lax.fori_loop(0, n_iter, body, X)
    return synthesis(X, cfg)
