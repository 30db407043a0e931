"""SAM two-way-transformer mask decoder, TPU-native.

Parity targets: /root/reference/sam/modeling/transformer.py (TwoWayTransformer)
and /root/reference/sam/modeling/mask_decoder.py (MaskDecoder, "LBK" variant).

The decoder returns BOTH output conventions (SURVEY.md §7 step 2):
- the classic SAM outputs ``masks`` (hyper_in @ upscaled) and ``iou_pred``;
- the reference-intended unified-head inputs ``upscaled_embedding`` (NHWC,
  transformer_dim/8 channels at 4x the embedding grid) and ``hyper_in``
  (B, num_mask_tokens, transformer_dim/8), which GeneralizedXdecoder injects
  into the X-Decoder head for interactive/vlp/llm tasks.

All prompt batching is dense: callers tile the image embedding per prompt set
(the one-encode/many-decode flow lives in models/xdecoder/model.py).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .image_encoder import LayerNorm2d, gelu


@functools.lru_cache(maxsize=None)
def _bd_constants(h: int, d: int, per: int):
    """Static constants for block-diagonal head packing (see
    DownsampledAttention). P (h, d, h*d) places head h's d-dim chunk at
    column offset h*d; G (h*per, h*per) is the same-head group indicator
    (grouped-softmax denominators via one matmul); headmask (h, h*d) marks
    which output columns belong to which head."""
    hd = h * d
    P = np.zeros((h, d, hd), np.float32)
    for hh in range(h):
        P[hh, np.arange(d), hh * d + np.arange(d)] = 1.0
    G = np.kron(np.eye(h, dtype=np.float32), np.ones((per, per), np.float32))
    headmask = np.repeat(np.eye(h, dtype=np.float32), d, axis=1)
    return P, G, headmask


def _pack_bd(x: jax.Array, h: int, d: int, per: int) -> jax.Array:
    """(B, T, h*d) -> (B, h*per, h*d) block-diagonal: row h*per + t holds
    head h's d-dim chunk of token t at columns [h*d, (h+1)*d), zeros
    elsewhere. Keeps every HBM tensor's minor dim at h*d (XLA pads minor
    dims to the 128-lane tile, so a head-split (..., d=16) layout would
    occupy 8x its logical size — the packed form never materializes one).
    Only ever applied to the short token axis (T <= ~64), so the small
    (B, h, per, d) intermediate is negligible."""
    b, t, hd = x.shape
    P, _, _ = _bd_constants(h, d, per)
    xh = x.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    if per != t:
        xh = jnp.pad(xh, ((0, 0), (0, 0), (0, per - t), (0, 0)))
    return jnp.einsum(
        "bhtd,hde->bhte", xh, jnp.asarray(P, x.dtype)
    ).reshape(b, h * per, hd)


class _Proj(nn.Module):
    """Raw Dense parameters (same tree paths/inits as nn.Dense) returned
    unapplied, so the caller can fuse matmuls and fold PE terms."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class DownsampledAttention(nn.Module):
    """Attention with internal-dim downsampling
    (reference sam/modeling/transformer.py:185-240).

    TPU notes (this path dominates the one-encode/many-decode bench):
    - q/k/v positional terms are passed separately (``q_pe``/``k_pe``) and
      folded through the projections: proj(x + pe) == proj(x) + pe @ W. With
      a batch-1 image PE this removes two (B, HW, C)-sized adds per call and
      projects the PE once instead of per prompt.
    - when k and v are the same tensor (token->image cross attention), their
      projections run as ONE wider matmul.
    - head split/merge is expressed inside the einsums (bqhd/bkhd layouts),
      avoiding 4 materialized (B, HW, internal) transposes per call.
    All algebraically identical to the reference (linear reassociation)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32
    # "auto" = block-diagonal head packing in bf16 (serving); "on"/"off"
    # force it (tests compare packed vs reference path in fp32).
    packing: str = "auto"

    @nn.compact
    def __call__(
        self,
        q: jax.Array | None,
        k: jax.Array | None = None,
        v: jax.Array | None = None,
        q_pe: jax.Array | None = None,
        k_pe: jax.Array | None = None,
        weights_only: bool = False,
    ):
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        h = self.num_heads
        in_dim = self.embedding_dim if q is None else q.shape[-1]
        wq, bq = _Proj(in_dim, internal, name="q_proj")()
        wk, bk = _Proj(in_dim, internal, name="k_proj")()
        wv, bv = _Proj(in_dim, internal, name="v_proj")()
        if weights_only:
            # The fused Pallas block steps (ops/pallas/twoway_attention.py)
            # consume the raw projections; creating them here keeps the
            # param tree identical between fused and unfused paths.
            wo, bo = _Proj(internal, self.embedding_dim, name="out_proj")()
            return dict(wq=wq, bq=bq, wk=wk, bk=bk, wv=wv, bv=bv,
                        wo=wo, bo=bo, head_dim=head_dim, internal=internal)
        dt = self.dtype
        cast = lambda t: t.astype(dt)

        qp = cast(q) @ cast(wq)
        if q_pe is not None:
            qp = qp + cast(q_pe) @ cast(wq)
        qp = qp + cast(bq)

        if k is v:
            kvp = cast(k) @ cast(jnp.concatenate([wk, wv], axis=1))
            kp = kvp[..., :internal] + cast(bk)
            vp = kvp[..., internal:] + cast(bv)
        else:
            kp = cast(k) @ cast(wk) + cast(bk)
            vp = cast(v) @ cast(wv) + cast(bv)
        if k_pe is not None:
            kp = kp + cast(k_pe) @ cast(wk)

        nq, nk = qp.shape[1], kp.shape[1]
        scale = head_dim ** -0.5

        # bmm with batch-1 broadcast on either operand (the shared image
        # embedding stays batch-1 until token->image attention first writes
        # into it — see TwoWayTransformer docstring).
        def bmm(spec, a, b_, **kw):
            lhs, rhs = spec.split("->")
            sa, sb = lhs.split(",")
            if a.shape[0] == 1 and b_.shape[0] != 1:
                return jnp.einsum(f"{sa[1:]},{sb}->{rhs}", a[0], b_, **kw)
            if b_.shape[0] == 1 and a.shape[0] != 1:
                return jnp.einsum(f"{sa},{sb[1:]}->{rhs}", a, b_[0], **kw)
            return jnp.einsum(spec, a, b_, **kw)

        use_pack = head_dim < 128 and (
            self.packing == "on"
            or (self.packing == "auto" and dt == jnp.bfloat16)
        )

        if use_pack and nk <= 64 and nq > nk:
            # image->token: block-diagonal K/V over the short token axis.
            # scores = Qp @ Kbd^T give per-(head, token) columns; softmax is
            # EXACT (the per-row max shift is constant across head groups);
            # group denominators come from one matmul with the indicator G;
            # P @ Vbd merges heads for free (Vbd's off-head columns are 0).
            per = -(-nk // 8) * 8
            _, G, _ = _bd_constants(h, head_dim, per)
            kbd = _pack_bd(kp, h, head_dim, per)
            vbd = _pack_bd(vp, h, head_dim, per)
            slot_ok = jnp.tile(jnp.arange(per) < nk, (h,))
            smask = jnp.where(slot_ok, 0.0, -1e30).astype(jnp.float32)
            s = bmm("bqc,bkc->bqk", qp, kbd,
                    preferred_element_type=jnp.float32) * scale + smask
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.einsum("bqk,kj->bqj", e, jnp.asarray(G))
            p = (e / denom).astype(dt)
            out = bmm("bqk,bkc->bqc", p, vbd)
        elif use_pack and nq <= 64 and nk > nq:
            # token->image: block-diagonal Q; rows are (head, token) pairs
            # with standard softmax over the image axis; outputs carry the
            # true value in the owning head's columns (cross-head columns
            # are discarded by the static head-merge mask).
            per = -(-nq // 8) * 8
            _, _, headmask = _bd_constants(h, head_dim, per)
            qbd = _pack_bd(qp, h, head_dim, per)
            s = bmm("bqc,bkc->bqk", qbd, kp,
                    preferred_element_type=jnp.float32)
            # hand-staged softmax: the fused (max+exp) kernel XLA builds for
            # the (b, h*per, nk) tensor blows the 16M scoped-VMEM stack, so
            # barrier the row-max to split it into two small fusions.
            s = s * scale
            m = jax.lax.optimization_barrier(jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s - m)
            p = (e / e.sum(axis=-1, keepdims=True)).astype(dt)
            obd = bmm("bqk,bkc->bqc", p, vp)
            b_out = obd.shape[0]
            obd = obd.reshape(b_out, h, per, internal)
            out = (obd * jnp.asarray(headmask, dt)[:, None, :]).sum(axis=1)
            out = out[:, :nq]
        else:
            qh = qp.reshape(qp.shape[0], nq, h, head_dim)
            kh = kp.reshape(kp.shape[0], nk, h, head_dim)
            vh = vp.reshape(vp.shape[0], nk, h, head_dim)
            if kh.shape[0] == 1 and qh.shape[0] != 1:
                attn = jnp.einsum(
                    "bqhd,khd->bhqk", qh, kh[0], preferred_element_type=jnp.float32
                )
            elif qh.shape[0] == 1 and kh.shape[0] != 1:
                attn = jnp.einsum(
                    "qhd,bkhd->bhqk", qh[0], kh, preferred_element_type=jnp.float32
                )
            else:
                attn = jnp.einsum(
                    "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
                )
            attn = jax.nn.softmax(attn / (head_dim ** 0.5), axis=-1).astype(vh.dtype)
            if vh.shape[0] == 1 and attn.shape[0] != 1:
                out = jnp.einsum("bhqk,khd->bqhd", attn, vh[0])
            else:
                out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
            out = out.reshape(attn.shape[0], nq, internal)
        wo, bo = _Proj(internal, self.embedding_dim, name="out_proj")()
        return out @ cast(wo) + cast(bo)


class _LNParams(nn.Module):
    """Raw LayerNorm parameters — same tree paths ("scale"/"bias"), shapes
    and inits as nn.LayerNorm, returned unapplied for the fused kernels."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def _fused_t2i(queries, query_pe, keys, key_pe, w, h):
    """Token->image cross attention through the streamed Pallas kernel:
    q-side packing + out-proj in XLA (tiny tensors), one fused pass over
    the keys tensor for k/v projection + online softmax."""
    from ...ops.pallas.twoway_attention import t2i_stream

    dt = keys.dtype
    d = w["head_dim"]
    qp = (queries.astype(dt) @ w["wq"].astype(dt)
          + query_pe.astype(dt) @ w["wq"].astype(dt) + w["bq"].astype(dt))
    nq = qp.shape[1]
    per = -(-nq // 8) * 8
    _, _, headmask = _bd_constants(h, d, per)
    qbd = _pack_bd(qp * (d ** -0.5), h, d, per)
    pe_wk = (key_pe[:1].astype(dt) @ w["wk"].astype(dt))
    obd = t2i_stream(qbd, keys, pe_wk, w["wk"].astype(dt), w["bk"].astype(dt),
                     w["wv"].astype(dt), w["bv"].astype(dt))
    b_out = obd.shape[0]
    obd = obd.reshape(b_out, h, per, w["internal"])
    out = (obd * jnp.asarray(headmask, dt)[:, None, :]).sum(axis=1)[:, :nq]
    return out @ w["wo"].astype(dt) + w["bo"].astype(dt)


def _fused_i2t(keys, key_pe, queries, query_pe, w, h, ln_w, ln_b):
    """Image->token block step through the fused Pallas kernel: token-side
    k/v packing in XLA, one pass over keys doing q-proj + grouped attention
    + out-proj + residual + the block's LayerNorm."""
    from ...ops.pallas.twoway_attention import i2t_block_step

    dt = keys.dtype
    d = w["head_dim"]
    kvp = queries.astype(dt) @ jnp.concatenate(
        [w["wk"], w["wv"]], axis=1).astype(dt)
    internal = w["internal"]
    kp = kvp[..., :internal] + w["bk"].astype(dt)
    kp = kp + query_pe.astype(dt) @ w["wk"].astype(dt)
    vp = kvp[..., internal:] + w["bv"].astype(dt)
    nk = kp.shape[1]
    per = -(-nk // 8) * 8
    _, G, _ = _bd_constants(h, d, per)
    kbd = _pack_bd(kp, h, d, per)
    vbd = _pack_bd(vp, h, d, per)
    slot_ok = np.tile(np.arange(per) < nk, h)
    smask = np.where(slot_ok, 0.0, -1e30).astype(np.float32)
    pe_wq = key_pe[:1].astype(dt) @ w["wq"].astype(dt)
    return i2t_block_step(
        keys, pe_wq, kbd, vbd, w["wq"].astype(dt), w["bq"].astype(dt),
        w["wo"].astype(dt), w["bo"].astype(dt), ln_w, ln_b,
        jnp.asarray(G), jnp.asarray(smask), d ** -0.5,
    )


class TwoWayAttentionBlock(nn.Module):
    """Reference sam/modeling/transformer.py:109-182."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32
    fused: bool = False  # Pallas block kernels (bf16 TPU serving path)

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe,
                 front_only: bool = False, weights_only: bool = False):
        """query_pe: (B, T, C); key_pe: (1 or B, HW, C) — PE tensors are
        passed into the attention modules unfused (folded through the
        projections there), so a batch-1 key_pe is never tiled per prompt.

        ``front_only``: run self-attn + t2i + mlp, then return
        ``(queries, i2t_weights, (norm4_scale, norm4_bias))`` with keys
        untouched — the whole-chunk fused decode (ops/pallas/decode_chunk.py)
        takes over from the i2t step. ``weights_only``: create every
        submodule with the identical param tree and return the raw weights.
        """
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        h = self.num_heads
        if weights_only:
            w = {}
            w["self"] = DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn")(None, weights_only=True)
            w["ln1"] = dict(zip(("scale", "bias"),
                                _LNParams(self.embedding_dim, name="norm1")()))
            w["t2i"] = DownsampledAttention(
                self.embedding_dim, self.num_heads,
                self.attention_downsample_rate, dtype=self.dtype,
                name="cross_attn_t2i")(None, weights_only=True)
            w["ln2"] = dict(zip(("scale", "bias"),
                                _LNParams(self.embedding_dim, name="norm2")()))
            w["mlp"] = {}
            w["mlp"]["w1"], w["mlp"]["b1"] = _Proj(
                self.embedding_dim, self.mlp_dim, name="mlp_lin1")()
            w["mlp"]["w2"], w["mlp"]["b2"] = _Proj(
                self.mlp_dim, self.embedding_dim, name="mlp_lin2")()
            w["ln3"] = dict(zip(("scale", "bias"),
                                _LNParams(self.embedding_dim, name="norm3")()))
            w["i2t"] = DownsampledAttention(
                self.embedding_dim, self.num_heads,
                self.attention_downsample_rate, dtype=self.dtype,
                name="cross_attn_i2t")(None, weights_only=True)
            w["ln4"] = dict(zip(("scale", "bias"),
                                _LNParams(self.embedding_dim, name="norm4")()))
            return w
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(queries, queries, queries)
        else:
            queries = queries + DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(queries, queries, queries, q_pe=query_pe, k_pe=query_pe)
        queries = ln("norm1")(queries)

        t2i = DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_t2i",
        )
        if self.fused:
            w = t2i(None, weights_only=True)
            queries = queries + _fused_t2i(queries, query_pe, keys, key_pe, w, h)
        else:
            queries = queries + t2i(queries, keys, keys, q_pe=query_pe, k_pe=key_pe)
        queries = ln("norm2")(queries)

        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        y = nn.relu(y)
        y = nn.Dense(self.embedding_dim, dtype=self.dtype, name="mlp_lin2")(y)
        queries = ln("norm3")(queries + y)

        i2t = DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_i2t",
        )
        if front_only:
            w = i2t(None, weights_only=True)
            ln_w, ln_b = _LNParams(self.embedding_dim, name="norm4")()
            return queries, w, (ln_w, ln_b)
        if self.fused:
            w = i2t(None, weights_only=True)
            ln_w, ln_b = _LNParams(self.embedding_dim, name="norm4")()
            keys = _fused_i2t(keys, key_pe, queries, query_pe, w, h, ln_w, ln_b)
        else:
            keys = keys + i2t(keys, queries, queries, q_pe=key_pe, k_pe=query_pe)
            # LN stats in fp32, but STORE keys in the working dtype: keys is
            # the per-prompt (B, HW, C) tensor that dominates decode HBM
            # traffic, and an fp32 norm output would double every downstream
            # read of it.
            keys = ln("norm4")(keys).astype(self.dtype)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Reference sam/modeling/transformer.py:16-106."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32
    # "auto": fused Pallas block kernels iff bf16 on a TPU backend;
    # "pallas"/"off" force. See ops/pallas/twoway_attention.py.
    impl: str = "auto"

    def _use_fused(self) -> bool:
        if self.impl == "pallas":
            return True
        if self.impl == "auto":
            return self.dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
        return False

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding,
                 chunk_front: bool = False):
        """image_embedding: (1 or B, H, W, C); image_pe: (1 or B, H, W, C);
        point_embedding: (B, N, C). Returns (queries (B, N, C), keys (B, HW, C)).

        ``chunk_front`` (whole-chunk fused decode, ops/pallas/decode_chunk.py):
        run only block 0's token-side front (self + t2i + mlp) — which never
        writes into the shared batch-1 keys — and collect the raw weights of
        everything keys-dependent (block 0 i2t, all of block 1, the final
        attention + its norm). Returns ``(queries, W, keys, key_pe)`` with W
        keyed as decode_tail expects; requires depth == 2.

        One-encode/many-decode optimization: with a batch-1 image embedding
        (point/box prompts share one image), the key-side tensors stay
        batch-1 through block 0's token->image attention — k/v projections
        over the 4096-token image run ONCE instead of per prompt — and only
        become per-prompt at block 0's image->token residual (the first op
        whose value actually depends on the prompt). Algebraically identical
        to tiling the embedding up front (reference semantics)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, c).astype(keys.dtype)
        queries = point_embedding
        fused = self._use_fused()

        if chunk_front:
            assert self.depth == 2, "chunk decode assumes the SAM depth-2 stack"
            blk = lambda i, skip: TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=skip,
                dtype=self.dtype,
                fused=False,
                name=f"layer{i}",
            )
            q0, w_i2t0, ln40 = blk(0, True)(
                queries, keys, point_embedding, key_pe, front_only=True)
            w1 = blk(1, False)(None, None, None, None, weights_only=True)
            wf = DownsampledAttention(
                self.embedding_dim, self.num_heads,
                self.attention_downsample_rate, dtype=self.dtype,
                name="final_attn_t2i")(None, weights_only=True)
            lnf_w, lnf_b = _LNParams(
                self.embedding_dim, name="norm_final_attn")()
            strip = lambda d: {k: d[k] for k in
                               ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")}
            W = dict(
                i2t0=strip(w_i2t0),
                ln40=dict(scale=ln40[0], bias=ln40[1]),
                self1=strip(w1["self"]), ln11=w1["ln1"],
                t2i1=strip(w1["t2i"]), ln21=w1["ln2"],
                mlp1=w1["mlp"], ln31=w1["ln3"],
                i2t1=strip(w1["i2t"]), ln41=w1["ln4"],
                final=strip(wf),
                lnf=dict(scale=lnf_w, bias=lnf_b),
            )
            return q0, W, keys, key_pe

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                fused=fused,
                name=f"layer{i}",
            )(queries, keys, point_embedding, key_pe)

        final = DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="final_attn_t2i",
        )
        if fused:
            wgt = final(None, weights_only=True)
            queries = queries + _fused_t2i(
                queries, point_embedding, keys, key_pe, wgt, self.num_heads
            )
        else:
            queries = queries + final(
                queries, keys, keys, q_pe=point_embedding, k_pe=key_pe
            )
        queries = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="norm_final_attn"
        )(queries)
        return queries, keys


class HyperMLP(nn.Module):
    """3-layer ReLU MLP (reference mask_decoder.py:177-199).

    ``weights_only`` creates the identical param tree via _Proj and returns
    the raw ``[(kernel, bias), ...]`` per layer for the whole-chunk fused
    decode (ops/pallas/decode_chunk.py); ``in_dim`` is the input feature
    count (defaults to hidden_dim, which holds for every SAM use)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32
    in_dim: int | None = None

    @nn.compact
    def __call__(self, x, weights_only: bool = False):
        if weights_only:
            ws = []
            d_in = self.in_dim if self.in_dim is not None else self.hidden_dim
            for i in range(self.num_layers):
                d_out = (self.output_dim if i == self.num_layers - 1
                         else self.hidden_dim)
                ws.append(_Proj(d_in, d_out, name=f"lin{i}")())
                d_in = d_out
            return ws
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"lin{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype, name=f"lin{self.num_layers - 1}")(x)


class _ConvTParams(nn.Module):
    """Raw ConvTranspose parameters — same tree paths ("kernel"/"bias"),
    shapes ((2, 2, out, in) with transpose_kernel=True) and inits as
    nn.ConvTranspose, returned unapplied for the fused upscale kernel."""

    out_features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, self.out_features, self.in_features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return kernel, bias


class _LN2dParams(nn.Module):
    """Raw LayerNorm2d parameters (tree-compatible with LayerNorm2d)."""

    dim: int

    @nn.compact
    def __call__(self):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return weight, bias


def _upscaled_from_keys(keys, k1, b1, lnw, lnb, k2, b2, hgrid, wgrid, dt):
    """(B, 4H, 4W, C/8) upscaled embedding from flat keys (B, HW, C) and raw
    deconv params, in the flat-matmul formulation (each 2x2/2 transposed conv
    is a per-site matmul — see ops/pallas/mask_upscale.py docstring)."""
    from ...ops.pallas.mask_upscale import _blockdiag_w2, _flat_w1

    c4, c8 = k1.shape[2], k2.shape[2]
    y1 = keys @ _flat_w1(k1).astype(dt) + jnp.tile(b1, 4).astype(dt)
    y1 = y1.reshape(-1, hgrid * wgrid * 4, c4)
    xf = y1.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y1 = (((xf - mu) * jax.lax.rsqrt(var + 1e-6)) * lnw + lnb).astype(dt)
    y1 = gelu(y1).reshape(-1, hgrid * wgrid, 4 * c4)
    y2 = y1 @ _blockdiag_w2(k2).astype(dt) + jnp.tile(b2, 16).astype(dt)
    y2 = gelu(y2)
    # cols (di, dj, ei, ej, c) -> (B, 4H, 4W, C/8)
    up = y2.reshape(-1, hgrid, wgrid, 2, 2, 2, 2, c8)
    return up.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, 4 * hgrid, 4 * wgrid, c8)


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    twoway_impl: str = "auto"  # see TwoWayTransformer.impl

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(
        self,
        image_embeddings: jax.Array,  # (1 or B, H, W, C) — batch-1 is the
        #   fast one-encode/many-decode path (see TwoWayTransformer)
        image_pe: jax.Array,  # (H, W, C) or (1 or B, H, W, C)
        sparse_prompt_embeddings: jax.Array,  # (B, T, C)
        dense_prompt_embeddings: jax.Array,  # (1 or B, H, W, C)
    ) -> dict[str, Any]:
        b = sparse_prompt_embeddings.shape[0]
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim)
        )
        mask_tokens = self.param(
            "mask_tokens",
            nn.initializers.normal(1.0),
            (self.num_mask_tokens, self.transformer_dim),
        )
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(output_tokens[None], (b, *output_tokens.shape)),
                sparse_prompt_embeddings,
            ],
            axis=1,
        ).astype(self.dtype)

        src = image_embeddings + dense_prompt_embeddings
        if image_pe.ndim == 3:
            image_pe = image_pe[None]  # stays batch-1; folded downstream
        _, hgrid, wgrid, c = src.shape

        if self.twoway_impl in ("chunk", "chunk_xla"):
            # Whole-chunk fused decode: ONE kernel pass per prompt with the
            # keys row resident in VMEM (ops/pallas/decode_chunk.py);
            # "chunk_xla" runs the batched XLA oracle of the same math.
            if src.shape[0] != 1:
                raise ValueError(
                    "chunk decode is the one-encode/many-decode serving path "
                    "and needs a shared batch-1 image embedding; got "
                    f"{src.shape}")
            from ...ops.pallas.decode_chunk import (
                decode_tail, decode_tail_xla, unflatten_masks_ge)

            m = self.num_mask_tokens
            nh = self.transformer_num_heads
            q0, W, keys0, key_pe_f = TwoWayTransformer(
                embedding_dim=self.transformer_dim,
                mlp_dim=self.transformer_mlp_dim,
                num_heads=nh,
                dtype=self.dtype,
                impl="off",
                name="transformer",
            )(src.astype(self.dtype), image_pe, tokens, chunk_front=True)
            c4, c8 = self.transformer_dim // 4, self.transformer_dim // 8
            hws = [
                HyperMLP(self.transformer_dim, c8, dtype=self.dtype,
                         name=f"hyper_mlp{i}")(None, weights_only=True)
                for i in range(m)
            ]
            for li, nm in enumerate(("hyper_w1", "hyper_w2", "hyper_w3")):
                W[nm] = jnp.stack([hws[i][li][0] for i in range(m)])
                W[nm.replace("w", "b")] = jnp.stack(
                    [hws[i][li][1] for i in range(m)])
            k1, b1 = _ConvTParams(c4, c, name="upscale_deconv1")()
            lnw, lnb = _LN2dParams(c4, name="upscale_ln")()
            k2, b2 = _ConvTParams(c8, c4, name="upscale_deconv2")()
            W.update(up_k1=k1, up_b1=b1, up_lnw=lnw, up_lnb=lnb,
                     up_k2=k2, up_b2=b2)

            t_valid = q0.shape[1]
            tp = -(-t_valid // 16) * 16  # token slots padded to the sublane tile
            pad = ((0, 0), (0, tp - t_valid), (0, 0))
            q0p = jnp.pad(q0.astype(self.dtype), pad)
            tpep = jnp.pad(tokens, pad)
            if self.twoway_impl == "chunk":
                tout, flat = decode_tail(q0p, tpep, keys0, key_pe_f, W,
                                         nh, t_valid)
            else:
                tout, flat, _ = decode_tail_xla(
                    q0p, tpep, keys0, key_pe_f, W, n_heads=nh,
                    t_valid=t_valid)
            masks = unflatten_masks_ge(flat, hgrid, wgrid, m)
            dt = self.dtype
            x = tout[:, 1:1 + m].astype(dt)
            mm = lambda x, wn, bn: (
                jnp.einsum("bmc,mcd->bmd", x, W[wn].astype(dt))
                + W[bn].astype(dt))
            x = jnp.maximum(mm(x, "hyper_w1", "hyper_b1"), 0)
            x = jnp.maximum(mm(x, "hyper_w2", "hyper_b2"), 0)
            hyper_in = mm(x, "hyper_w3", "hyper_b3")
            # upscaled embedding: the kernel never materializes keys2 (that
            # is the point), so reconstruct through the XLA oracle — DCEd
            # entirely under jit when the caller only consumes masks.
            keys2 = decode_tail_xla(q0p, tpep, keys0, key_pe_f, W,
                                    n_heads=nh, t_valid=t_valid)[2]
            upscaled = _upscaled_from_keys(keys2, k1, b1, lnw, lnb, k2, b2,
                                           hgrid, wgrid, dt)
            iou_pred = HyperMLP(
                self.iou_head_hidden_dim, self.num_mask_tokens,
                num_layers=self.iou_head_depth, dtype=self.dtype,
                name="iou_head",
            )(tout[:, 0].astype(self.dtype))
            return {
                "masks": masks,
                "iou_pred": iou_pred,
                "upscaled_embedding": upscaled,
                "hyper_in": hyper_in,
            }

        hs, keys = TwoWayTransformer(
            embedding_dim=self.transformer_dim,
            mlp_dim=self.transformer_mlp_dim,
            num_heads=self.transformer_num_heads,
            dtype=self.dtype,
            impl=self.twoway_impl,
            name="transformer",
        )(src.astype(self.dtype), image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens]

        hyper_in = jnp.stack(
            [
                HyperMLP(
                    self.transformer_dim, self.transformer_dim // 8,
                    dtype=self.dtype, name=f"hyper_mlp{i}",
                )(mask_tokens_out[:, i])
                for i in range(self.num_mask_tokens)
            ],
            axis=1,
        )  # (B, M, C/8)

        fused = self.twoway_impl == "pallas" or (
            self.twoway_impl == "auto"
            and self.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
        )
        if fused:
            # One fused pass over keys: deconvs + LN2d + gelu + hypernetwork
            # contraction (ops/pallas/mask_upscale.py). The spatial upscaled
            # embedding is reconstructed from the same raw params below and
            # DCEd by XLA when the caller only consumes masks.
            from ...ops.pallas.mask_upscale import masks_upscale, unflatten_masks

            c4, c8 = self.transformer_dim // 4, self.transformer_dim // 8
            k1, b1 = _ConvTParams(c4, c, name="upscale_deconv1")()
            lnw, lnb = _LN2dParams(c4, name="upscale_ln")()
            k2, b2 = _ConvTParams(c8, c4, name="upscale_deconv2")()
            flat = masks_upscale(keys, k1.astype(self.dtype), b1, lnw, lnb,
                                 k2.astype(self.dtype), b2, hyper_in)
            masks = unflatten_masks(flat, hgrid, wgrid, self.num_mask_tokens)
            # upscaled embedding, flat-matmul XLA path on the shared params
            upscaled = _upscaled_from_keys(keys, k1, b1, lnw, lnb, k2, b2,
                                           hgrid, wgrid, self.dtype)
        else:
            src_out = keys.reshape(keys.shape[0], hgrid, wgrid, c)
            # Upscaling stack (reference mask_decoder.py:53-59).
            y = nn.ConvTranspose(
                self.transformer_dim // 4, (2, 2), strides=(2, 2),
                transpose_kernel=True, dtype=self.dtype,
                name="upscale_deconv1",
            )(src_out)
            y = gelu(LayerNorm2d(name="upscale_ln")(y))
            y = nn.ConvTranspose(
                self.transformer_dim // 8, (2, 2), strides=(2, 2),
                transpose_kernel=True, dtype=self.dtype,
                name="upscale_deconv2",
            )(y)
            upscaled = gelu(y)  # (B, 4H, 4W, C/8)

            masks = jnp.einsum(
                "bmc,bhwc->bmhw", hyper_in, upscaled,
                preferred_element_type=jnp.float32,
            )
        iou_pred = HyperMLP(
            self.iou_head_hidden_dim, self.num_mask_tokens,
            num_layers=self.iou_head_depth, dtype=self.dtype, name="iou_head",
        )(iou_token_out)

        return {
            "masks": masks,  # (B, M, 4H, 4W) logits
            "iou_pred": iou_pred,  # (B, M)
            "upscaled_embedding": upscaled,  # (B, 4H, 4W, C/8)
            "hyper_in": hyper_in,  # (B, M, C/8)
        }
