"""Fixed beamformer demo: DS and superdirective weights + array metrics.

The reference's ``example/run_fixedbeamformer.py`` path: design weights once
from the look direction, apply to a 4-mic mixture, report SI-SDR and the
white-noise gain / directivity index of both designs.

    python examples/run_fixedbeamformer.py [--wav in.wav] [--save out.wav] [--cpu]
"""

from _common import demo_args, load_or_make, maybe_save, si_sdr


def main():
    args = demo_args(__doc__)
    import jax.numpy as jnp
    import numpy as np

    from distantspeech_tpu.beamform import (
        FixedBeamformerConfig, fixed_beamformer_weights, fixed_process,
    )
    from distantspeech_tpu.stats import wng_di

    mix, geom, src = load_or_make(args)
    look = (90.0, 0.0)
    outs = {}
    for wt in ("DS", "SD"):
        cfg = FixedBeamformerConfig(weight_type=wt)
        W = fixed_beamformer_weights(geom, look, cfg)
        outs[wt] = np.asarray(fixed_process(jnp.asarray(mix), jnp.asarray(W), cfg.stft))
        wng, di = wng_di(geom, jnp.asarray(W), look, cfg.stft.n_fft)
        print(f"{wt}: mean WNG {float(np.mean(wng)):6.2f} dB | mean DI {float(np.mean(di)):5.2f} dB")

    if src is not None:
        print(f"SI-SDR: input {si_sdr(mix[0], src):.2f} dB | DS {si_sdr(outs['DS'], src):.2f} dB | "
              f"SD {si_sdr(outs['SD'], src):.2f} dB")
    maybe_save(args, outs["SD"])


if __name__ == "__main__":
    main()
