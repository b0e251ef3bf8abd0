from distantspeech_tpu.array.geometry import (
    ArrayGeometry,
    cart2sph,
    circular_array,
    linear_array,
    sph2cart,
)
from distantspeech_tpu.array.steering import compute_tau, omega_bins, steering_vector
from distantspeech_tpu.array.coherence import diffuse_coherence

__all__ = [
    "ArrayGeometry",
    "cart2sph",
    "sph2cart",
    "linear_array",
    "circular_array",
    "compute_tau",
    "omega_bins",
    "steering_vector",
    "diffuse_coherence",
]
