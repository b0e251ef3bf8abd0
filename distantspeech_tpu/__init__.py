"""distantspeech_tpu — a TPU-native multichannel speech-enhancement framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
wangwei2009/DistantSpeech (reference at /root/reference), redesigned TPU-first:

- Data layout: batched, channels-last tensors.  Time signals are
  ``[..., samples, channels]``; spectra are ``[..., frame, bin, channel]``
  (scan axis leading so per-frame recursions are ``lax.scan`` steps);
  per-bin spatial matrices are ``[..., bin, M, M]``.
- Every reference "class with mutable buffers" becomes a pure
  ``step(carry, x) -> (carry, y)`` function plus an ``init(...) -> carry``;
  offline processing scans the step over a whole batch, streaming jits the
  same step per chunk.
- Frame axis is recursive (IIR smoothing) and therefore scanned; frequency
  bins are embarrassingly parallel and are the unit of model-parallel
  sharding; utterances are the data-parallel axis (see
  ``distantspeech_tpu.parallel``).

Subpackages
-----------
array      geometry, TDOA/steering, diffuse-field coherence, room simulation
transform  STFT/ISTFT, subband (Nyquist-M) filterbanks, multirate filters
ops        framing/overlap-add primitives and Pallas kernels
stats      recursive PSD/CSD/covariance estimation, beamformer weight rules
noise      MCRA/MC-SPP/MC-CDR/OMLSA noise & speech-presence estimation
adaptive   NLMS/RLS/FLMS/MDF/subband adaptive filters, AEC
beamform   fixed (DS/SD) and adaptive (MVDR/TFGSC/GEV/PMWF) beamformers
pipelines  GSC family, postfilters, WPE, DOA, KWS front-end
parallel   mesh construction, sharded batch processing, halo exchange
runtime    streaming drivers, config, I/O
"""

__version__ = "0.1.0"
