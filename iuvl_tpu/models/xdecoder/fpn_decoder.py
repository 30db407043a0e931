"""Plain-FPN pixel decoder (alternative to the deformable one).

Parity target: /root/reference/modeling/vision/encoder/transformer_encoder_fpn.py
BasePixelDecoder (:35-194): top-down lateral 1x1 + 3x3 output convs from
res5 to res2, mask features from the finest level, top-3 coarse maps for
the transformer decoder. (Registered as 'transformer_encoder_fpn' in the
reference; unused by shipped configs but part of the model zoo.)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasePixelDecoder(nn.Module):
    conv_dim: int = 512
    mask_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: dict[str, jax.Array]):
        """features: NHWC {res2..res5}. Returns (mask_features, [3 coarse
        maps coarse->fine]) matching DeformablePixelDecoder's contract."""
        gn = lambda name: nn.GroupNorm(num_groups=min(32, self.conv_dim), epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        names = ["res5", "res4", "res3", "res2"]
        outs = []
        y = None
        for i, f in enumerate(names):
            x = features[f]
            if i == 0:
                y = nn.Conv(self.conv_dim, (3, 3), padding="SAME",
                            use_bias=False, dtype=self.dtype,
                            name=f"output_conv{i}")(x)
                y = nn.relu(gn(f"output_gn{i}")(y))
            else:
                lateral = nn.Conv(self.conv_dim, (1, 1), use_bias=False,
                                  dtype=self.dtype, name=f"lateral_conv{i}")(x)
                lateral = gn(f"lateral_gn{i}")(lateral)
                up = jax.image.resize(
                    y, (y.shape[0], lateral.shape[1], lateral.shape[2], self.conv_dim),
                    method="nearest",
                ).astype(lateral.dtype)
                y = lateral + up
                y = nn.Conv(self.conv_dim, (3, 3), padding="SAME",
                            use_bias=False, dtype=self.dtype,
                            name=f"output_conv{i}")(y)
                y = nn.relu(gn(f"output_gn{i}")(y))
            outs.append(y)

        mask_features = nn.Conv(self.mask_dim, (1, 1), dtype=self.dtype,
                                name="mask_features")(outs[-1])
        return mask_features, outs[:3]  # res5', res4', res3'
