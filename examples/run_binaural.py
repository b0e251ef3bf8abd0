"""Dual-mic coherence enhancement demo (reference ``example/run_binaural.py``).

Estimated-vs-diffuse magnitude-squared-coherence gains on a 2-mic scene,
with the published gain rule selected by ``method`` (1-5, BinauralEnhancement
/root/reference/DistantSpeech/coherence/BinauralEnhancement.py).

Note these published rules are tuned for real binaural recordings in diffuse
fields; on synthetic scenes the short-window MSC estimate is biased high and
the gains are aggressive — identical behaviour to the reference (parity:
tests/test_doa_postfilter.py::test_binaural_parity).

    python examples/run_binaural.py [--wav in.wav] [--save out.wav] [--cpu]
"""

import numpy as np

from _common import demo_args, load_or_make, maybe_save


def main():
    args = demo_args(__doc__)
    import jax.numpy as jnp

    from distantspeech_tpu.coherence.enhance import BinauralConfig, binaural_process

    mix, geom, src = load_or_make(args, n_mics=2, snr=5.0, sir=60.0)
    y = None
    for method in (1, 3):
        y, snr = binaural_process(jnp.asarray(mix), geom, BinauralConfig(method=method))
        y = np.asarray(y)
        if src is not None:
            n = min(len(y), len(src))
            env = np.convolve(np.abs(src), np.ones(512) / 512, "same")[:n]
            gap = env < 0.02 * env.max()
            act = env > 0.2 * env.max()
            gap[:16000] = act[:16000] = False
            sup = 10 * np.log10(np.mean(y[:n][gap] ** 2) / np.mean(mix[0][:n][gap] ** 2))
            keep = 10 * np.log10(np.mean(y[:n][act] ** 2) / np.mean(mix[0][:n][act] ** 2))
            print(f"method {method}: noise-gap change {sup:6.1f} dB | speech-region change {keep:6.1f} dB | "
                  f"mean est. SNR {float(np.mean(np.asarray(snr))):.2f}")
        else:
            print(f"method {method}: out RMS {float(np.sqrt(np.mean(y ** 2))):.4f}")
    maybe_save(args, y)


if __name__ == "__main__":
    main()
