"""Transform round-trip demo (reference ``example/run_transform.py``).

STFT analysis/synthesis and the Nyquist(M) subband filterbank, round-tripping
a signal and reporting reconstruction error.

    python examples/run_transform.py [--cpu]
"""

import numpy as np

from _common import demo_args, speech_like


def main():
    args = demo_args(__doc__)
    import jax.numpy as jnp

    from distantspeech_tpu.transform import (
        StftConfig, SubbandConfig, analysis, subband_analysis, subband_synthesis, synthesis,
    )

    x = speech_like(16000, 2.0)
    cfg = StftConfig(256, 128)
    X = analysis(jnp.asarray(x), cfg)
    y = np.asarray(synthesis(X, cfg))
    n = min(len(x), len(y))
    # sqrt-Hann analysis+synthesis with hop = n_fft/2 is a perfect-
    # reconstruction pair up to the hop-sample latency
    err = np.max(np.abs(y[cfg.hop:n] - x[: n - cfg.hop]))
    print(f"STFT round-trip: {X.shape[-2]} frames x {X.shape[-1]} bins, max|err| = {err:.2e}")

    scfg = SubbandConfig()
    S = subband_analysis(jnp.asarray(x), scfg)
    ys = np.asarray(subband_synthesis(S, scfg))
    d = scfg.latency_samples if hasattr(scfg, "latency_samples") else 0
    print(f"Subband round-trip: {S.shape[-2]} frames x {S.shape[-1]} bands, "
          f"out RMS {float(np.sqrt(np.mean(ys ** 2))):.4f} (in {float(np.sqrt(np.mean(x ** 2))):.4f})")


if __name__ == "__main__":
    main()
