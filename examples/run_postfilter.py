"""McCowan/Zelinski postfilter demo (reference ``example/run_postfilter.py``).

DS fixed beamformer followed by the coherence-model Wiener postfilter.

    python examples/run_postfilter.py [--wav in.wav] [--save out.wav] [--cpu]
"""

import numpy as np

from _common import demo_args, load_or_make, maybe_save, si_sdr


def main():
    args = demo_args(__doc__)
    import jax.numpy as jnp

    from distantspeech_tpu.beamform import (
        FixedBeamformerConfig, fixed_beamformer_weights, fixed_process,
    )
    from distantspeech_tpu.postfilter import McCowanConfig, mccowan_process

    mix, geom, src = load_or_make(args, n_mics=4)
    cfg = FixedBeamformerConfig(weight_type="DS")
    W = fixed_beamformer_weights(geom, (90.0, 0.0), cfg)
    x = jnp.asarray(mix)
    ds = fixed_process(x, jnp.asarray(W), cfg.stft)
    y = np.asarray(mccowan_process(x, ds, geom, McCowanConfig(n_mics=mix.shape[0])))

    if src is not None:
        print(f"SI-SDR: input {si_sdr(mix[0], src):.2f} dB | DS {si_sdr(np.asarray(ds), src):.2f} dB | "
              f"DS+McCowan {si_sdr(y, src):.2f} dB")
    maybe_save(args, y)


if __name__ == "__main__":
    main()
