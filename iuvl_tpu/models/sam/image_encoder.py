"""SAM ViT image encoder, TPU-native.

Functional parity with /root/reference/sam/modeling/image_encoder.py
(ImageEncoderViT + SimpleFPN, the "LBK" variant): patch-embed conv 16x16 ->
abs pos -> depth x transformer blocks (windowed attention with decomposed
rel-pos bias; a few global-attention blocks) -> two necks:

- ``sam_neck`` (reference ``orig_neck``, image_encoder.py:88-104): 1x1 conv
  -> LN2d -> 3x3 conv -> LN2d producing the 256-ch SAM embedding consumed by
  the prompt-conditioned mask decoder.
- ``fpn``      (reference ``SimpleFPN``, image_encoder.py:413-466): four
  branches producing {res2: 1/4, res3: 1/8, res4: 1/16, res5: 1/32} features
  of widths (128, 256, 512, 1024) for the X-Decoder pixel decoder.

TPU-first design choices: NHWC layout throughout (conv + reshape friendly);
windows are formed by a single reshape/transpose (static shapes — 64x64 grid
pads to 70x70 for 5x5 windows of 14x14=196 tokens); attention runs through
``iuvl_tpu.ops.rel_pos_attention`` which is swappable between a pure-XLA path
and the fused Pallas kernel; all matmuls hit the MXU in the module ``dtype``
(bf16 by default) with fp32 softmax.

Note: the reference's ``forward`` returns only the FPN dict while its callers
unpack two values (SURVEY.md §2.9); we implement the *intended* contract:
``__call__`` returns ``(sam_embedding NHWC 256ch, {res2..res5} NHWC)``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.rel_pos_attention import rel_pos_attention_proj


def gelu(x: jax.Array) -> jax.Array:
    """GELU matched to storage precision: exact erf in fp32 (bit-parity with
    the torch reference), tanh approximation in half precision — the approx
    error (~3e-4 absolute) is below bf16 resolution (~8e-3), and the exact
    erf costs ~2x on the VPU (measured 17.5 -> 8.1 ms on the 256-prompt
    mask-upscale stack at 1024^2)."""
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (reference
    sam/modeling/common.py:31 does the same over NCHW channel dim)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * weight + bias).astype(x.dtype)


def window_partition(x: jax.Array, window: int) -> tuple[jax.Array, tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, win, win, C) with zero padding.

    Reference: sam/modeling/image_encoder.py:258-279. Static shapes only.
    """
    b, h, w, c = x.shape
    pad_h = (-h) % window
    pad_w = (-w) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jax.Array, window: int, pad_hw: tuple[int, int], hw: tuple[int, int]
) -> jax.Array:
    """Inverse of window_partition. Reference: image_encoder.py:282-304."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact tree (kernel + bias,
    default inits), so the XLA path and the fused whole-attention kernel
    (ops/pallas/window_block.py) share one checkpoint layout regardless of
    which path a config selects."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Attention(nn.Module):
    """Multi-head attention over an (H, W) token grid with decomposed
    rel-pos bias. Reference: sam/modeling/image_encoder.py:200-255.

    ``attn_impl='block'`` routes windowed square inputs through the fused
    whole-attention kernel (qkv proj + rel-pos attention + out proj in one
    Pallas call — the windowed blocks are dispatch/latency bound in-model,
    see ops/pallas/window_block.py)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple[int, int] = (14, 14)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        wqkv, bqkv = _DenseParams(self.dim * 3, self.dim, name="qkv")()
        wo, bo = _DenseParams(self.dim, self.dim, name="proj")()

        use_block = (
            self.use_rel_pos
            and self.attn_impl in ("auto", "block")
            and h == w
            and h * w < 1024  # windowed blocks only; global goes to flash
            and jax.default_backend() == "tpu"
        )  # measured v5e 1024^2 bf16: encode 14.07 -> 12.71 ms vs the
        #    separate qkv/attention/proj ops (scripts/ab_encode.py)
        if use_block or self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, head_dim)
            )
        if use_block:
            from ...ops.pallas.window_block import window_attention_block

            xw = x.astype(self.dtype).reshape(b, h * w, self.dim)
            out = window_attention_block(
                xw, wqkv, bqkv, wo, bo, rel_pos_h, rel_pos_w, h,
                self.num_heads,
            )
            return out.reshape(b, h, w, self.dim)

        xd = x.astype(self.dtype)
        qkv = xd @ wqkv.astype(self.dtype) + bqkv.astype(self.dtype)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (b, hw, heads, d)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))

        if self.use_rel_pos:
            impl = "auto" if self.attn_impl == "block" else self.attn_impl
            out = rel_pos_attention_proj(
                q, k, v, rel_pos_h, rel_pos_w,
                wo.astype(self.dtype), bo.astype(self.dtype), (h, w),
                impl=impl,
            )  # (b, h*w, C) — projection folded (fused kernel on the
            #    global-block auto path; plain relayout+matmul otherwise)
            return out.reshape(b, h, w, self.dim)

        scale = head_dim ** -0.5
        attn = jnp.einsum(
            "bnqd,bnkd->bnqk", q * scale, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return out @ wo.astype(self.dtype) + bo.astype(self.dtype)


class _LayerNormParams(nn.Module):
    """Parameter container with nn.LayerNorm's exact tree (scale + bias,
    default inits) — same role as _DenseParams: one checkpoint layout
    whether a config runs the flax-op path or a fused Pallas kernel."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class Block(nn.Module):
    """Pre-norm transformer block with optional windowing.
    Reference: sam/modeling/image_encoder.py:134-197."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0  # 0 => global attention
    input_size: tuple[int, int] = (64, 64)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ...ops.pallas.mlp_block import _tail_xla, block_tail

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        # Cast to the working dtype BEFORE the window transpose: the
        # partition permutation commutes with the cast, and moving it here
        # halves the transpose's HBM traffic (fp32 -> bf16).
        y = y.astype(self.dtype)
        if self.window_size > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = window_partition(y, self.window_size)
        attn_size = (
            (self.window_size, self.window_size)
            if self.window_size > 0
            else self.input_size
        )
        y = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            input_size=attn_size,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, (h, w))
        # Tag for the encoder's remat policy: saving the attention output
        # ((B, H, W, C) bf16, ~12.6 MB/block at 1024^2 B=2) lets the
        # backward replay skip BOTH fused forward kernels (attention and
        # tail take only their inputs as custom-VJP residuals, so with `y`
        # saved the replay reduces to norm1 + window partition).
        from jax.ad_checkpoint import checkpoint_name

        y = checkpoint_name(y, "attn_out")

        # Block tail (residual + norm2 + MLP + residual) through the ops
        # module: one fused Pallas call on TPU bf16 (ops/pallas/mlp_block),
        # the numerics-identical XLA composition otherwise.
        hidden = int(self.dim * self.mlp_ratio)
        scale, bias = _LayerNormParams(self.dim, name="norm2")()
        w1, b1 = _DenseParams(hidden, self.dim, name="mlp_lin1")()
        w2, b2 = _DenseParams(self.dim, hidden, name="mlp_lin2")()
        use_tail = (
            self.dtype == jnp.bfloat16
            and self.attn_impl in ("auto", "block")
            and jax.default_backend() == "tpu"
        )
        fn = block_tail if use_tail else _tail_xla
        b_, h_, w_, c_ = x.shape
        out = fn(shortcut.reshape(-1, c_), y.reshape(-1, c_),
                 scale, bias, w1, b1, w2, b2)
        return out.reshape(b_, h_, w_, c_)


class SimpleFPN(nn.Module):
    """Four-branch neck producing hierarchical features from the single-scale
    ViT output. Reference: sam/modeling/image_encoder.py:413-466. Input and
    outputs are NHWC; GroupNorm(1) == LayerNorm over channels."""

    in_dim: int = 768
    out_dims: Sequence[int] = (128, 256, 512, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        gn = lambda name: nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=jnp.float32, name=name)
        # Norm stats in fp32, activations stored in the working dtype.
        act = lambda t: gelu(t.astype(self.dtype))

        d4c = max(self.out_dims[0] * 2, self.in_dim // 2)
        y = nn.ConvTranspose(d4c, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=self.dtype, name="down4_deconv1")(x)
        y = act(gn("down4_gn1")(y))
        y = nn.ConvTranspose(d4c // 2, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=self.dtype, name="down4_deconv2")(y)
        y = gn("down4_gn2")(y)
        y = nn.Conv(self.out_dims[0], (1, 1), dtype=self.dtype, name="down4_conv")(y)
        res2 = act(gn("down4_gn3")(y))

        d8c = max(self.out_dims[1], self.in_dim // 2)
        y = nn.ConvTranspose(d8c, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=self.dtype, name="down8_deconv")(x)
        y = gn("down8_gn1")(y)
        y = nn.Conv(self.out_dims[1], (1, 1), dtype=self.dtype, name="down8_conv")(y)
        res3 = act(gn("down8_gn2")(y))

        y = nn.Conv(self.out_dims[2], (1, 1), dtype=self.dtype, name="down16_conv")(x)
        res4 = act(gn("down16_gn")(y))

        d32c = max(self.out_dims[3], self.in_dim * 2)
        y = nn.Conv(d32c, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype, name="down32_conv1")(x)
        y = gn("down32_gn1")(y)
        y = nn.Conv(self.out_dims[3], (1, 1), dtype=self.dtype, name="down32_conv2")(y)
        res5 = act(gn("down32_gn2")(y))

        return {"res2": res2, "res3": res3, "res4": res4, "res5": res5}


class _PatchEmbedMM(nn.Module):
    """Patch embedding as one per-patch matmul (tree-compatible with the
    nn.Conv it replaces: "kernel" (p, p, cin, cout) + "bias" (cout,))."""

    embed_dim: int
    patch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, cin = x.shape
        p = self.patch
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, cin, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        gh, gw = hh // p, ww // p
        xp = x.astype(self.dtype).reshape(b, gh, p, gw, p, cin)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * cin)
        y = xp @ kernel.reshape(p * p * cin, self.embed_dim).astype(self.dtype)
        return (y + bias.astype(self.dtype)).reshape(b, gh, gw, self.embed_dim)


class ImageEncoderViT(nn.Module):
    """See module docstring. Returns (sam_embedding, fpn_dict)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM)

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, dict[str, jax.Array]]:
        # x: (B, H, W, 3) normalized pixels.
        grid = self.img_size // self.patch_size
        if self.dtype == jnp.bfloat16:
            # Non-overlapping stride-p conv == per-patch matmul; the matmul
            # lowering is 3.9x faster than XLA's conv at 1024^2 (1.19 ->
            # 0.31 ms, v5e). Param tree identical to nn.Conv.
            x = _PatchEmbedMM(
                self.embed_dim, self.patch_size, dtype=self.dtype,
                name="patch_embed",
            )(x)
        else:
            x = nn.Conv(
                self.embed_dim,
                (self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                padding="VALID",
                dtype=self.dtype,
                name="patch_embed",
            )(x)

        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim)
        )
        h, w = x.shape[1], x.shape[2]
        if (h, w) != (grid, grid):
            # Bicubic interpolation of the stored table for non-default sizes
            # (reference image_encoder.py:124-132).
            pos_embed = jax.image.resize(
                pos_embed, (1, h, w, self.embed_dim), method="bicubic"
            )
        x = x + pos_embed.astype(x.dtype)

        block_cls = (
            nn.remat(
                Block,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out"),
            )
            if self.remat else Block
        )
        for i in range(self.depth):
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                input_size=(h, w),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"block{i}",
            )(x)

        # SAM 256-ch neck (reference orig_neck).
        y = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        y = LayerNorm2d(name="neck_ln1")(y)
        y = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="neck_conv2")(y)
        sam_embedding = LayerNorm2d(name="neck_ln2")(y)

        fpn = SimpleFPN(in_dim=self.embed_dim, dtype=self.dtype, name="fpn")(x)
        return sam_embedding, fpn
