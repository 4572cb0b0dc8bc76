"""CNN image encoder producing multi-scale feature maps (flax).

Reference (SURVEY.md §2.1 #7): a VGG-ish conv stack over the 137×137 ShapeNet
render whose intermediate feature maps at several strides feed Pixel2Mesh-style
perceptual pooling.  We keep the multi-scale contract (list of NHWC maps at
strides 2, 4, 8, 16) but choose channel widths that pad well to TPU lanes
(final stages at 128/256 channels) and run convs in bf16 — convolutions lower
onto the MXU and are the only place in the whole model where image-sized
activations exist, so this is the model's FLOP hot spot after Chamfer.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ImageEncoder(nn.Module):
    """VGG-style stack; returns feature maps at strides 2, 4, 8, 16.

    Input: ``[B, H, W, 3]`` float in [0, 1].  Output: tuple of four
    ``[B, H/s, W/s, C_s]`` maps with ``C_s = widths``.
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images: jax.Array) -> Tuple[jax.Array, ...]:
        conv = lambda c, s, n: nn.Conv(
            c, (3, 3), strides=(s, s), padding="SAME", dtype=self.dtype, name=n)
        h = images
        maps = []
        for stage, width in enumerate(self.widths):
            h = nn.relu(conv(width, 2, f"s{stage}_down")(h))
            h = nn.relu(conv(width, 1, f"s{stage}_a")(h))
            h = nn.relu(conv(width, 1, f"s{stage}_b")(h))
            maps.append(h.astype(jnp.float32))
        return tuple(maps)

    @property
    def feature_dim(self) -> int:
        return sum(self.widths)
