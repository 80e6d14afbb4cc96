"""In-graph video normalization.

Hosts transfer raw uint8 frames (4x less tunnel/PCIe traffic and no eager
dispatch per batch); the /255 normalization (eval/dataset.py:91) happens
inside the jitted step where XLA fuses the cast into the first convolution.
Float inputs (tests, golden fixtures, device-resident benches) pass through
unchanged.
"""

import jax.numpy as jnp


def normalize_video(video):
    if video.dtype == jnp.uint8:
        return video.astype(jnp.float32) / 255.0
    return video
