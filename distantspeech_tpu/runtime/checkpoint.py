"""Checkpoint / resume of streaming pipeline carries.

SURVEY §5: the reference's only persistence is its prototype-filter pickle
cache; a streaming production system additionally needs to snapshot the
recursive state (filter weights, noise covariances, minima trackers) so a
stream can resume after preemption.  Any pipeline state in this framework
is a NamedTuple pytree of arrays, so one .npz holds it; restore rebuilds
the exact pytree structure from a template produced by the ``*_init``.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax


def save_state(path: str, state: Any) -> None:
    """Serialise a pytree of arrays to ``path`` (.npz)."""
    leaves = jax.tree.leaves(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)})


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_state``; ``template`` supplies the
    structure (use the pipeline's ``*_init`` output)."""
    z = np.load(path)
    leaves = jax.tree.leaves(template)
    if len(z.files) != len(leaves):
        raise ValueError(f"checkpoint has {len(z.files)} leaves, template has {len(leaves)}")
    new_leaves = [z[f"leaf_{i}"].astype(np.asarray(leaf).dtype) for i, leaf in enumerate(leaves)]
    return jax.tree.unflatten(jax.tree.structure(template), new_leaves)
