"""IDOA spatial speech-presence demo (reference ``DistantSpeech/doa/idoa.py``):
per-bin instantaneous-DOA likelihoods against a free-field RTF grid — a
spatial SPP map over (frequency, angle).

    python examples/run_idoa.py [--cpu]
"""

import numpy as np

from _common import demo_args, make_scene


def main():
    args = demo_args(__doc__)
    import jax.numpy as jnp

    from distantspeech_tpu.doa import IdoaConfig, idoa_run
    from distantspeech_tpu.transform import StftConfig, analysis

    true_angle = 60.0
    mix, geom, src = make_scene(n_mics=4, source_angle=true_angle, sir=40.0, snr=25.0)

    cfg = IdoaConfig(n_fft=512, n_theta=180)  # linear array: 180-degree grid
    X = analysis(jnp.asarray(mix), StftConfig(cfg.n_fft, cfg.n_fft // 2))  # [M, T, F]
    Xt = jnp.moveaxis(X, -2, 0).swapaxes(-1, -2)  # [T, F, M]
    p = np.asarray(idoa_run(cfg, geom, Xt))  # [T, F, Theta]

    # aggregate the spatial likelihood over frames and speech-band bins
    spec = p[:, 8:100].mean(axis=(0, 1))
    est = int(np.argmax(spec))
    print(f"true source angle {true_angle:.0f} deg -> IDOA spatial-likelihood peak {est} deg")
    top = np.argsort(spec)[-3:][::-1]
    print("top-3:", ", ".join(f"{int(i)}deg" for i in top))


if __name__ == "__main__":
    main()
