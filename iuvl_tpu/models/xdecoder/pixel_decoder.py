"""Deformable-attention pixel decoder, TPU-native.

Parity target: /root/reference/modeling/vision/encoder/transformer_encoder_deform.py
(MSDeformAttnPixelDecoder): a 6-layer deformable-DETR encoder over the
{res3, res4, res5} FPN levels (d_model = conv_dim = 512, 8 heads, 4 points,
FFN 1024) followed by top-down FPN fusion into res2 and a 1x1 mask-features
projection. The CUDA MSDeformAttn op is replaced by
``iuvl_tpu.ops.msdeform.ms_deform_attn_core`` (gather-based XLA / Pallas).

TPU design: all levels are flattened once into a single (B, S, C) token
stream with static per-level offsets; reference points are constant grids
(the reference's valid_ratios are identically 1 because it passes all-False
masks — transformer_encoder_deform.py:63); everything is NHWC and
static-shaped. The reference forces this module to fp32 under AMP
(@autocast(enabled=False)); here the deformable core accumulates in fp32
while matmuls may run bf16.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ...ops.msdeform import ms_deform_attn_core
from ...ops.position_embedding import position_embedding_sine


def _sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference init (ops/modules/ms_deform_attn.py:66-74): per-head unit
    directions on a compass, scaled by point index."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (heads, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for i in range(n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype=dtype)

    return init


class MSDeformAttn(nn.Module):
    """Deformable attention module (reference ops/modules/ms_deform_attn.py:34-125)."""

    d_model: int = 512
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Lq, C) — content + positional
        reference_points: jax.Array,  # (B, Lq, n_levels, 2) in [0, 1]
        value_src: jax.Array,  # (B, S, C)
        spatial_shapes: Sequence[tuple[int, int]],
        sg: str = "",  # profiling knob: stop-gradient one cotangent chain
        # ("loc" | "attn" | "value") to attribute backward cost
        # (scripts/bench_layer_bwd.py); "" in production.
    ) -> jax.Array:
        b, lq, _ = query.shape
        s = value_src.shape[1]
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        head_dim = self.d_model // nh

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value_src)
        value = value.reshape(b, s, nh, head_dim)

        offsets = nn.Dense(
            nh * nl * npts * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offset_bias_init(nh, nl, npts),
            dtype=jnp.float32,
            name="sampling_offsets",
        )(query).reshape(b, lq, nh, nl, npts, 2)

        attn = nn.Dense(
            nh * nl * npts,
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="attention_weights",
        )(query).reshape(b, lq, nh, nl * npts)
        attn = jax.nn.softmax(attn, axis=-1).reshape(b, lq, nh, nl, npts)

        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=jnp.float32
        )  # (L, 2) in (x, y) order
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )

        # Tag the gather-core INPUTS for the remat policy (round 4): with
        # value/locations/attn saved (~95 MB/layer at 1024^2 B=2), the
        # backward replay of a layer reduces to the single re-gather the
        # bilinear-sampling VJP intrinsically needs — the projection/offsets
        # replay disappears and, with the core output below also saved, so
        # does the forward weighted-reduce.
        value = checkpoint_name(value, "deform_value")
        locations = checkpoint_name(locations, "deform_loc")
        attn = checkpoint_name(attn, "deform_attn")
        if sg == "loc":
            locations = jax.lax.stop_gradient(locations)
        elif sg == "attn":
            attn = jax.lax.stop_gradient(attn)
        elif sg == "value":
            value = jax.lax.stop_gradient(value)

        out = ms_deform_attn_core(
            value, spatial_shapes, locations, attn, impl=self.impl
        )
        # Tag the gather-core output so the remat policy keeps it ((B, S, C)
        # bf16 ~45 MB/layer at 1024^2 B=2). Measured effect is small
        # (3321.6 -> 3299.6 ms/step, B=2 @1024^2 v5e): the VJP of bilinear
        # sampling intrinsically RE-gathers the tap rows to form d_attn /
        # d_locations (saving the output cannot remove those), so the policy
        # only spares the projection/FFN replay. Kept because it is free.
        out = checkpoint_name(out, "deform_core")
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)



class _Conv1x1MM(nn.Module):
    """1x1 conv as a per-pixel matmul — param tree identical to nn.Conv
    (kernel (1, 1, cin, cout) [+ bias]); see DeformablePixelDecoder._conv1x1."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features)
        )
        y = x.astype(jnp.bfloat16) @ kernel[0, 0].astype(jnp.bfloat16)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.bfloat16)
        return y


class DeformableEncoderLayer(nn.Module):
    """Reference transformer_encoder_deform.py:92-131 (dropout = 0)."""

    d_model: int = 512
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        attn_out = MSDeformAttn(
            d_model=self.d_model, n_levels=self.n_levels, n_heads=self.n_heads,
            n_points=self.n_points, dtype=self.dtype, impl=self.impl,
            name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(src + attn_out)

        y = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(src + y)


def encoder_reference_points(spatial_shapes: Sequence[tuple[int, int]]):
    """Per-query normalized center coordinates, broadcast over levels
    (reference transformer_encoder_deform.py:141-153 with valid_ratios == 1).
    Returns (S, L, 2)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gx, gy = np.meshgrid(xs, ys)
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, axis=0)  # (S, 2)
    return jnp.asarray(np.tile(ref[:, None, :], (1, len(spatial_shapes), 1)))


class DeformablePixelDecoder(nn.Module):
    """Reference transformer_encoder_deform.py:165-359. Input: FPN dict
    {res2..res5} NHWC from the SAM SimpleFPN. Output:
    (mask_features (B, H/4, W/4, mask_dim), [res5', res4', res3'] maps)."""

    conv_dim: int = 512
    mask_dim: int = 512
    num_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"
    remat: bool = False  # rematerialize encoder layers in backward: each
    # layer otherwise stores ~1 GB of deformable-gather rows at 1024^2 B=2
    remat_group: int = 2  # encoder layers per remat region: the
    # jax.checkpoint boundary itself costs ~50 ms/region at 1024^2 B=2
    # (ROADMAP r4), so grouping layers halves that tax. Implemented as the
    # FUNCTION form of nn.remat over a slice of the layer loop — the layers
    # stay direct children of this module, so parameter names are identical
    # for any group size (no key remapping, checkpoint-compatible).

    def _conv1x1(self, name: str, features: int, use_bias: bool = True):
        """1x1 conv as a channel matmul in bf16 (XLA's conv lowering can pick
        layouts that degrade downstream consumers — measured on the patch
        embed, image_encoder.py); nn.Conv (identical param tree) in fp32."""
        if self.dtype == jnp.bfloat16:
            return _Conv1x1MM(features, use_bias=use_bias, name=name)
        return nn.Conv(
            features, (1, 1), use_bias=use_bias, dtype=self.dtype, name=name
        )

    @nn.compact
    def __call__(self, features: dict[str, jax.Array]):
        # Top-down transformer inputs: res5, res4, res3.
        names = ["res5", "res4", "res3"]
        srcs, poss, shapes = [], [], []
        for i, f in enumerate(names):
            x = features[f]
            y = self._conv1x1(f"input_proj{i}", self.conv_dim)(x)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name=f"input_gn{i}")(y)
            srcs.append(y)
            h, w = y.shape[1], y.shape[2]
            shapes.append((h, w))
            poss.append(position_embedding_sine(h, w, self.conv_dim // 2))

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (len(names), self.conv_dim)
        )
        b = srcs[0].shape[0]
        src_flat = jnp.concatenate(
            [s.reshape(b, -1, self.conv_dim) for s in srcs], axis=1
        )
        pos_flat = jnp.concatenate(
            [
                (p.reshape(1, -1, self.conv_dim) + level_embed[i][None, None, :])
                for i, p in enumerate(poss)
            ],
            axis=1,
        ).astype(src_flat.dtype)

        ref_pts = encoder_reference_points(shapes)[None]  # (1, S, L, 2)
        ref_pts = jnp.broadcast_to(ref_pts, (b, *ref_pts.shape[1:]))

        shapes_t = tuple(shapes)

        def _layer(mdl, y, pos, ref, i: int):
            return DeformableEncoderLayer(
                d_model=mdl.conv_dim, n_heads=mdl.n_heads,
                n_points=mdl.n_points, n_levels=len(names), dtype=mdl.dtype,
                impl=mdl.impl, name=f"layer{i}",
            )(y, pos, ref, shapes_t)

        y = src_flat
        if self.remat:
            policy = jax.checkpoint_policies.save_only_these_names(
                "deform_core", "deform_value", "deform_loc", "deform_attn",
            )
            group = max(1, self.remat_group)
            i = 0
            while i < self.num_layers:
                idxs = tuple(range(i, min(i + group, self.num_layers)))

                def _span(mdl, y, pos, ref, _idxs=idxs):
                    for j in _idxs:
                        y = _layer(mdl, y, pos, ref, j)
                    return y

                # prevent_cse stays at the default True: the layer loop is
                # UNROLLED (not a scan), so with CSE allowed XLA merges the
                # backward replay with the original forward and silently
                # un-remats the region (measured: B=2 pix_grad
                # RESOURCE_EXHAUSTED with prevent_cse=False).
                y = nn.remat(_span, policy=policy)(self, y, pos_flat, ref_pts)
                i += group
        else:
            for i in range(self.num_layers):
                y = _layer(self, y, pos_flat, ref_pts, i)

        # Split back to maps (coarse -> fine): res5', res4', res3'.
        outs = []
        start = 0
        for h, w in shapes:
            outs.append(
                jax.lax.slice_in_dim(y, start, start + h * w, axis=1).reshape(
                    b, h, w, self.conv_dim
                )
            )
            start += h * w

        # FPN fusion into res2 (reference :344-352).
        lateral = self._conv1x1("fpn_lateral", self.conv_dim, use_bias=False)(
            features["res2"]
        )
        lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="fpn_lateral_gn")(lateral)
        top = jax.image.resize(
            outs[-1],
            (b, lateral.shape[1], lateral.shape[2], self.conv_dim),
            method="bilinear",
        ).astype(lateral.dtype)
        fused = lateral + top
        fused = nn.Conv(
            self.conv_dim, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
            name="fpn_output",
        )(fused)
        fused = nn.relu(
            nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="fpn_output_gn")(fused)
        )

        mask_features = self._conv1x1("mask_features", self.mask_dim)(fused)
        return mask_features, outs
