"""Device mesh construction for data-parallel Monte-Carlo simulation."""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(num_devices: int = 0, axis_name: str = "mc") -> Mesh:
    """1-D mesh over the first ``num_devices`` local devices (0 = all).

    The Monte-Carlo batch axis is sharded over this mesh; within a codeword
    everything stays on one chip (SURVEY.md section 5: the stage-wise
    butterfly is all-to-neighbor *within* a codeword, so there is nothing to
    gain from splitting one codeword across chips at these block lengths).
    """
    devices = jax.devices()
    if num_devices <= 0:
        num_devices = len(devices)
    assert num_devices <= len(devices), (
        f"requested {num_devices} devices, only {len(devices)} available")
    return Mesh(np.array(devices[:num_devices]), (axis_name,))
