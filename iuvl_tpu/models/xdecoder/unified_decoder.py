"""Unified latent/text-query transformer decoder ("X-Decoder interface").

Parity target: /root/reference/modeling/interface/xdecoder.py. 9 layers
(3 feature levels x 3 rounds) of masked cross-attention over pixel-decoder
features, block-masked self-attention over [100 object queries + 1 class
query (+ grounding slots / caption-context tokens)], and FFN; prediction
heads compute class logits by similarity against text embeddings, mask
logits via ``mask_embed x mask_features`` einsum, and caption embeddings.

TPU-first redesign:
- batch-first (B, N, C) layouts; all attention masks are fp32 additive
  biases; every ``task`` is a separate static branch compiled once;
- grounding tokens are padded to a static ``max_grounding`` with a validity
  mask instead of the reference's ragged pad_sequence;
- the block self-attention mask (reference xdecoder.py:148-154) is built
  once in numpy at trace time;
- mask-attention (reference :463-468): bicubic-resized mask logits ->
  sigmoid < 0.5 -> disallowed, with the reference's exact quirks kept:
  fully-masked rows get unmasked (:266) and row ``num_queries`` (the slot
  directly after the class token, when present) is force-unmasked (:471).

Class-token recompute (reference :440-445): the class query is replaced by
a similarity-weighted mixture of object-query features before the heads.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.position_embedding import position_embedding_sine

NEG_INF = -1e9


def build_base_self_mask(num_queries: int, contxt_len: int) -> np.ndarray:
    """Static block mask, True = disallowed (reference xdecoder.py:148-154)."""
    n = num_queries + contxt_len
    m = np.zeros((n, n), dtype=bool)
    m[:num_queries, num_queries:] = True  # queries don't see caption tokens
    m[num_queries:, num_queries:] = np.triu(
        np.ones((contxt_len, contxt_len), dtype=bool), k=1
    )  # caption tokens are causal
    m[: num_queries - 1, num_queries - 1 : num_queries] = True  # obj !see cls
    m[num_queries - 1 : num_queries, : num_queries - 1] = True  # cls !see obj
    return m


class MHA(nn.Module):
    """Multi-head attention with additive bias mask; packed qkv when q is k.
    Matches torch MultiheadAttention math (modeling/modules/attention.py).

    setup-style so the captioning KV-cache path can call ``project_kv`` /
    ``attend`` separately (param paths are unchanged: q_proj/k_proj/v_proj/
    out_proj)."""

    d_model: int
    nhead: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.d_model
        self.q_proj = nn.Dense(c, dtype=self.dtype)
        self.k_proj = nn.Dense(c, dtype=self.dtype)
        self.v_proj = nn.Dense(c, dtype=self.dtype)
        self.out_proj = nn.Dense(c, dtype=self.dtype)

    def project_kv(self, k, v):
        """Projected keys/values (B, N, C) — cacheable across decode steps."""
        return self.k_proj(k), self.v_proj(v)

    def attend(self, q, kp, vp, bias: Optional[jax.Array] = None):
        """Attention over ALREADY-projected keys/values."""
        b, nq, c = q.shape
        head_dim = c // self.nhead
        qp = self.q_proj(q)

        def split(t):
            return t.reshape(b, t.shape[1], self.nhead, head_dim).transpose(0, 2, 1, 3)

        qs, ks, vs = split(qp), split(kp), split(vp)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, ks, preferred_element_type=jnp.float32
        ) / (head_dim ** 0.5)
        if bias is not None:
            attn = attn + bias
        attn = jax.nn.softmax(attn, axis=-1).astype(vs.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vs)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
        return self.out_proj(out)

    def __call__(self, q, k, v, bias: Optional[jax.Array] = None):
        kp, vp = self.project_kv(k, v)
        return self.attend(q, kp, vp, bias)


class DecoderLayer(nn.Module):
    """One round: masked cross-attn -> (optional grounding append) ->
    self-attn -> FFN. Post-norm (PRE_NORM False in shipped configs).

    setup-style (identical param paths) so the captioning decode can run a
    single caption row against cached query-block K/V (``caption_step``)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cross_attn = MHA(self.d_model, self.nhead, dtype=self.dtype)
        self.self_attn = MHA(self.d_model, self.nhead, dtype=self.dtype)
        self.cross_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.self_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.ffn_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.ffn_lin1 = nn.Dense(self.dim_feedforward, dtype=self.dtype)
        self.ffn_lin2 = nn.Dense(self.d_model, dtype=self.dtype)

    def _ffn(self, tgt):
        y = self.ffn_lin2(nn.relu(self.ffn_lin1(tgt)))
        return self.ffn_norm(tgt + y)

    def __call__(self, tgt, memory, query_pos, mem_pos, cross_bias, self_bias,
                 grounding: Optional[jax.Array] = None,
                 grounding_pos: Optional[jax.Array] = None,
                 collect_kv: bool = False):
        y = self.cross_attn(tgt + query_pos, memory + mem_pos, memory,
                            cross_bias)
        tgt = self.cross_norm(tgt + y)

        n_ground = 0
        if grounding is not None:
            n_ground = grounding.shape[1]
            tgt = jnp.concatenate([tgt, grounding], axis=1)
            query_pos = jnp.concatenate([query_pos, grounding_pos], axis=1)

        q = tgt + query_pos
        kp, vp = self.self_attn.project_kv(q, tgt)
        y = self.self_attn.attend(q, kp, vp, self_bias)
        tgt = self.self_norm(tgt + y)
        tgt = self._ffn(tgt)

        if n_ground:
            return tgt[:, :-n_ground], tgt[:, -n_ground:]
        if collect_kv:
            # Projected self-attn K/V of these rows — the caption decode
            # attends to them as a frozen prefix (they never read captions).
            return tgt, (kp, vp)
        return tgt, None

    def caption_step(self, e, e_pos, memory, mem_pos, q_k, q_v,
                     cap_k, cap_v, step_idx):
        """One caption row through this layer with cached K/V.

        e (B, 1, C) caption-token activation; e_pos its positional stream;
        q_k/q_v (B, nq, C) frozen query-block self-attn K/V; cap_k/cap_v
        (B, L, C) the growing caption K/V (entries > step_idx are masked).
        The caption row's cross-attention bias is zero (reference
        xdecoder.py:266-269: appended rows are unmasked). Returns
        (e_out, cap_k, cap_v)."""
        y = self.cross_attn(e + e_pos, memory + mem_pos, memory, None)
        e = self.cross_norm(e + y)

        q_row = e + e_pos
        nk, nv = self.self_attn.project_kv(q_row, e)
        cap_k = jax.lax.dynamic_update_slice(cap_k, nk, (0, step_idx, 0))
        cap_v = jax.lax.dynamic_update_slice(cap_v, nv, (0, step_idx, 0))
        keys = jnp.concatenate([q_k, cap_k], axis=1)
        vals = jnp.concatenate([q_v, cap_v], axis=1)
        # Causal over caption slots: only positions <= step_idx visible.
        l = cap_k.shape[1]
        cap_cols = jnp.arange(l) > step_idx
        bias = jnp.concatenate(
            [jnp.zeros((q_k.shape[1],), jnp.float32),
             jnp.where(cap_cols, NEG_INF, 0.0)]
        )[None, None, None, :]
        y = self.self_attn.attend(q_row, keys, vals, bias)
        e = self.self_norm(e + y)
        return self._ffn(e), cap_k, cap_v


class MLP3(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="lin0")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="lin1")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="lin2")(x)


class UnifiedDecoder(nn.Module):
    hidden_dim: int = 512
    dim_proj: int = 512
    num_queries: int = 101  # MASK_PROPOSAL + 1 (class query)
    contxt_len: int = 77
    nheads: int = 8
    dim_feedforward: int = 2048
    mask_dim: int = 512
    num_feature_levels: int = 3
    num_rounds: int = 3
    captioning_step: int = 50
    task_captioning: bool = True
    task_interactive: bool = True
    task_bbox: bool = False  # reference task_switch['bbox'] (xdecoder.py:477)
    sam_dim: int = 32  # SAM mask-decoder channel (transformer_dim // 8)
    dtype: jnp.dtype = jnp.float32

    @property
    def num_layers(self) -> int:
        return self.num_feature_levels * self.num_rounds

    def setup(self):
        self.query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim)
        )
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.hidden_dim),
        )
        self.layers = [
            DecoderLayer(
                d_model=self.hidden_dim, nhead=self.nheads,
                dim_feedforward=self.dim_feedforward, dtype=self.dtype,
                name=f"layer{i}",
            )
            for i in range(self.num_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="decoder_norm")
        self.mask_embed = MLP3(self.hidden_dim, self.mask_dim, dtype=self.dtype, name="mask_embed")
        self.class_embed = self.param(
            "class_embed", nn.initializers.truncated_normal(0.02),
            (self.hidden_dim, self.dim_proj),
        )
        if self.task_captioning:
            self.caping_embed = self.param(
                "caping_embed", nn.initializers.truncated_normal(0.02),
                (self.hidden_dim, self.dim_proj),
            )
            self.pos_embed_caping = self.param(
                "pos_embed_caping", nn.initializers.normal(1.0),
                (self.contxt_len, self.hidden_dim),
            )
        if self.task_bbox:
            # Box regression head (reference xdecoder.py:139 bbox_embed MLP
            # hidden->4, outputs cxcywh in [0,1] after sigmoid).
            self.bbox_embed = MLP3(
                self.hidden_dim, 4, dtype=self.dtype, name="bbox_embed"
            )
        if self.task_interactive:
            # SAM prompt-decode injection (SURVEY §2.9 intended contract:
            # reference xdecoder_model.py:741-742 + sam/modeling/sam.py:103-136
            # pass src_output_features/hyper_in_features into the head; the
            # committed reference drops them — here they are first-class):
            # hyper_in mask-token vectors become extra decoder queries, the
            # prompt-conditioned upscaled embedding modulates mask features.
            self.sam_query_proj = nn.Dense(
                self.hidden_dim, dtype=self.dtype, name="sam_query_proj"
            )
            self.sam_feat_proj = nn.Dense(
                self.mask_dim, dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name="sam_feat_proj",
            )

    # ------------------------------------------------------------------ #
    def _prepare_memory(self, multi_scale: Sequence[jax.Array]):
        """Flatten each level map to tokens + sine PE + level embedding.
        Reference xdecoder.py:202-209. Input maps are NHWC."""
        srcs, poss, sizes = [], [], []
        for i, x in enumerate(multi_scale):
            b, h, w, c = x.shape
            sizes.append((h, w))
            pos = position_embedding_sine(h, w, self.hidden_dim // 2)
            poss.append(jnp.broadcast_to(pos.reshape(1, h * w, -1), (b, h * w, c)))
            srcs.append(
                x.reshape(b, h * w, c) + self.level_embed[i][None, None, :]
            )
        return srcs, poss, sizes

    def _attn_bias_from_mask(
        self, outputs_mask: jax.Array, size: tuple[int, int], extra_rows: int = 0,
        force_unmask_first_extra: bool = True,
    ) -> jax.Array:
        """Mask-attention bias for the next layer's cross-attention.
        Reference xdecoder.py:463-471 + :266-269. Returns (B, 1, N, HW) fp32
        additive bias broadcast over heads."""
        h, w = size
        b, q = outputs_mask.shape[:2]
        resized = jax.image.resize(
            outputs_mask.astype(jnp.float32), (b, q, h, w), method="bicubic"
        )
        disallow = (jax.nn.sigmoid(resized) < 0.5).reshape(b, q, h * w)
        # Un-mask rows that are fully masked (no foreground predicted).
        all_masked = disallow.all(axis=-1, keepdims=True)
        disallow = jnp.where(all_masked, False, disallow)
        # Reference :471: the row right after the class token (when present)
        # is force-unmasked. With extra rows appended (caption/llm), those
        # rows are unmasked (zeros, :269).
        if extra_rows > 0:
            disallow = jnp.concatenate(
                [disallow, jnp.zeros((b, extra_rows, h * w), bool)], axis=1
            )
        if disallow.shape[1] > self.num_queries and force_unmask_first_extra:
            disallow = disallow.at[:, self.num_queries].set(False)
        return jnp.where(disallow, NEG_INF, 0.0)[:, None].astype(jnp.float32)

    def _prediction_heads(
        self,
        output: jax.Array,  # (B, N, C)
        mask_features: jax.Array,  # (B, H, W, mask_dim) NHWC
        text_embeddings: Optional[jax.Array],
        task: str,
        grounding_slots: bool = False,
        logit_scale: Optional[jax.Array] = None,
    ) -> dict[str, Any]:
        """Reference xdecoder.py:429-493."""
        dec = self.decoder_norm(output)
        nq = self.num_queries

        outputs_captioning = None
        if self.task_captioning and task in ("vlp", "captioning_infer"):
            outputs_captioning = dec[:, nq:] @ self.caping_embed

        # Class-token recompute: similarity-weighted mixture of obj queries.
        norm_dec = dec / (jnp.linalg.norm(dec, axis=-1, keepdims=True) + 1e-7)
        obj = norm_dec[:, : nq - 1]
        cls = norm_dec[:, nq - 1 : nq]
        sim = jax.nn.softmax(
            jnp.einsum("bic,bqc->bqi", obj, cls), axis=-1
        )[:, 0, :, None]
        cls_token = (sim * dec[:, : nq - 1]).sum(axis=1, keepdims=True)

        if grounding_slots:
            dec = jnp.concatenate(
                [dec[:, : nq - 1], cls_token, dec[:, nq : 2 * nq - 1]], axis=1
            )
        elif task == "interactive":
            # Keep the SAM prompt-query slots after [obj; cls].
            dec = jnp.concatenate([dec[:, : nq - 1], cls_token, dec[:, nq:]], axis=1)
        else:
            dec = jnp.concatenate([dec[:, : nq - 1], cls_token], axis=1)

        class_embed = dec @ self.class_embed
        outputs_class = None
        if text_embeddings is not None:
            v = class_embed / (jnp.linalg.norm(class_embed, axis=-1, keepdims=True) + 1e-7)
            outputs_class = jnp.einsum("bqd,kd->bqk", v, text_embeddings)
            if logit_scale is not None:
                outputs_class = jnp.exp(logit_scale) * outputs_class

        mask_embed = self.mask_embed(dec)
        outputs_mask = jnp.einsum(
            "bqc,bhwc->bqhw", mask_embed, mask_features,
            preferred_element_type=jnp.float32,
        )
        outputs_bbox = None
        if self.task_bbox:
            outputs_bbox = jax.nn.sigmoid(
                self.bbox_embed(dec).astype(jnp.float32)
            )
        return {
            "class_embed": class_embed,  # caption embeddings (pred_captions)
            "outputs_class": outputs_class,  # similarity logits (unscaled)
            "outputs_mask": outputs_mask,
            "outputs_bbox": outputs_bbox,
            "outputs_captioning": outputs_captioning,
        }

    # ------------------------------------------------------------------ #
    def __call__(
        self,
        multi_scale: Sequence[jax.Array],  # 3 maps NHWC, coarse -> fine
        mask_features: jax.Array,  # (B, H/4, W/4, mask_dim) NHWC
        text_embeddings: Optional[jax.Array] = None,  # (K, dim_proj), normed
        task: str = "seg",
        grounding_tokens: Optional[jax.Array] = None,  # (B, G, C)
        grounding_valid: Optional[jax.Array] = None,  # (B, G) bool
        caption_tokens: Optional[jax.Array] = None,  # (B, 77, C) embeddings
        logit_scale: Optional[jax.Array] = None,
        sam_queries: Optional[jax.Array] = None,  # (B, P, sam_dim) hyper_in
        sam_features: Optional[jax.Array] = None,  # (B, H/4, W/4, sam_dim)
        training: bool = False,
    ) -> dict[str, Any]:
        assert len(multi_scale) == self.num_feature_levels
        srcs, poss, sizes = self._prepare_memory(multi_scale)
        b = srcs[0].shape[0]
        nq = self.num_queries

        if sam_features is not None:
            # Prompt-conditioned mask-feature modulation (zero-init proj: the
            # seg path is untouched at init, training learns the injection).
            mask_features = mask_features + self.sam_feat_proj(
                sam_features.astype(self.dtype)
            )

        output = jnp.broadcast_to(
            self.query_feat[None], (b, nq, self.hidden_dim)
        ).astype(self.dtype)
        query_pos = jnp.broadcast_to(
            self.query_embed[None], (b, nq, self.hidden_dim)
        ).astype(self.dtype)

        base_mask = build_base_self_mask(nq, self.contxt_len)
        use_grounding = task in ("seg_grounding", "grounding_eval")
        use_context = task in ("vlp", "llm", "vqa")
        use_interactive = task == "interactive"

        grounding = grounding_pos = None
        if use_interactive:
            assert sam_queries is not None
            p = sam_queries.shape[1]
            sq = self.sam_query_proj(sam_queries.astype(self.dtype))
            total = nq + p
            m = np.ones((total, total), dtype=bool)
            m[:nq, :nq] = base_mask[:nq, :nq]
            m[nq:, :] = False  # prompt slots attend obj/cls/each other
            m[:nq, nq:] = True  # base queries blind to prompts (seg intact)
            self_bias = jnp.where(jnp.asarray(m), NEG_INF, 0.0)[None, None]
            output = jnp.concatenate([output, sq], axis=1)
            query_pos = jnp.concatenate([query_pos, sq], axis=1)
        elif use_grounding:
            assert grounding_tokens is not None
            g = grounding_tokens.shape[1]
            total = nq + (nq - 1) + g
            m = np.ones((total, total), dtype=bool)
            m[:nq, :nq] = base_mask[:nq, :nq]
            m[nq:, nq:] = False  # dup queries + grounding attend each other
            self_bias = jnp.where(jnp.asarray(m), NEG_INF, 0.0)[None, None]
            if grounding_valid is not None:
                # Disallow attending to padded grounding slots.
                pad_cols = jnp.concatenate(
                    [jnp.ones((b, nq + nq - 1), bool), grounding_valid], axis=1
                )
                self_bias = self_bias + jnp.where(
                    pad_cols[:, None, None, :], 0.0, NEG_INF
                )
            # Reference :242-243: duplicate the object-query slots.
            output = jnp.concatenate([output, output[:, : nq - 1]], axis=1)
            query_pos_full = jnp.concatenate([query_pos, query_pos[:, : nq - 1]], axis=1)
            grounding = jax.lax.stop_gradient(grounding_tokens).astype(self.dtype)
            grounding_pos = grounding_tokens.astype(self.dtype)
            query_pos = query_pos_full
        elif use_context:
            assert caption_tokens is not None
            total = nq + self.contxt_len
            if task == "vlp":
                m = base_mask
            else:  # llm / vqa: context tokens attend each other freely
                m = np.ones((total, total), dtype=bool)
                m[:nq, :nq] = base_mask[:nq, :nq]
                m[nq:, nq:] = False
            self_bias = jnp.where(jnp.asarray(m), NEG_INF, 0.0)[None, None]
            ctx = jax.lax.stop_gradient(caption_tokens).astype(self.dtype)
            output = jnp.concatenate([output, ctx], axis=1)
            ctx_pos = caption_tokens.astype(self.dtype)
            if task == "vlp" and self.task_captioning:
                ctx_pos = ctx_pos + self.pos_embed_caping[None]
            query_pos = jnp.concatenate([query_pos, ctx_pos], axis=1)
        else:
            self_bias = jnp.where(
                jnp.asarray(base_mask[:nq, :nq]), NEG_INF, 0.0
            )[None, None]

        predictions = []
        results = self._prediction_heads(
            output, mask_features, text_embeddings, task,
            grounding_slots=use_grounding, logit_scale=logit_scale,
        )
        predictions.append(results)

        for i in range(self.num_layers):
            lvl = i % self.num_feature_levels
            extra_rows = self.contxt_len if use_context else 0
            cross_bias = self._attn_bias_from_mask(
                results["outputs_mask"], sizes[lvl], extra_rows=extra_rows,
                # Interactive prompt rows keep their own mask-attention; the
                # reference quirk of force-unmasking row nq applies only to
                # the grounding/caption extra blocks.
                force_unmask_first_extra=not use_interactive,
            )
            output, new_grounding = self.layers[i](
                output, srcs[lvl], query_pos, poss[lvl].astype(self.dtype),
                cross_bias, self_bias,
                grounding=grounding, grounding_pos=grounding_pos,
            )
            if use_grounding:
                grounding = new_grounding
                # query_pos for grounding stays the original tokens.
            results = self._prediction_heads(
                output, mask_features, text_embeddings, task,
                grounding_slots=use_grounding, logit_scale=logit_scale,
            )
            predictions.append(results)

        out: dict[str, Any] = {
            "pred_logits": predictions[-1]["outputs_class"],
            "pred_masks": predictions[-1]["outputs_mask"],
            "pred_captions": predictions[-1]["class_embed"],
            "aux_outputs": [
                {
                    "pred_logits": p["outputs_class"],
                    "pred_masks": p["outputs_mask"],
                    "pred_captions": p["class_embed"],
                }
                for p in predictions[:-1]
            ],
        }
        if self.task_bbox:
            out["pred_boxes"] = predictions[-1]["outputs_bbox"]
            for a, p in zip(out["aux_outputs"], predictions[:-1]):
                a["pred_boxes"] = p["outputs_bbox"]
        if task == "vlp":
            out["pred_captionings"] = predictions[-1]["outputs_captioning"]
            out["aux_captionings"] = [p["outputs_captioning"] for p in predictions[:-1]]
        if task in ("llm", "vqa"):
            # Final-layer object-query features for the LLM projector
            # (reference xdecoder.py:306-308).
            out["image_feature"] = self.decoder_norm(output)[:, : nq - 1]
        if use_interactive:
            # Per-prompt masks from the unified head (rows after [obj; cls]).
            out["pred_interactive_masks"] = predictions[-1]["outputs_mask"][:, nq:]
        return out

    # ------------------------------------------------------------------ #
    # Cached captioning decode (VERDICT r2 item 4). The reference re-runs
    # all 9 layers over [queries; 77 caption slots] per emitted token
    # (interface/xdecoder.py:331-426). Structure makes exact caching
    # possible: query rows never attend to caption rows (build_base_self_
    # mask), so their activations — and every cross-attention mask bias —
    # are DECODE-INVARIANT; caption rows are causal. captioning_prefill
    # runs the query block once and freezes each layer's projected
    # self-attn K/V; caption_decode_step pushes ONE caption row per token.
    # ------------------------------------------------------------------ #
    def captioning_prefill(self, multi_scale, mask_features):
        """Run the 9-layer query block once; returns the per-layer frozen
        state the per-token step needs."""
        srcs, poss, sizes = self._prepare_memory(multi_scale)
        b = srcs[0].shape[0]
        nq = self.num_queries
        output = jnp.broadcast_to(
            self.query_feat[None], (b, nq, self.hidden_dim)
        ).astype(self.dtype)
        query_pos = jnp.broadcast_to(
            self.query_embed[None], (b, nq, self.hidden_dim)
        ).astype(self.dtype)
        base_mask = build_base_self_mask(nq, self.contxt_len)
        self_bias = jnp.where(
            jnp.asarray(base_mask[:nq, :nq]), NEG_INF, 0.0
        )[None, None]

        results = self._prediction_heads(output, mask_features, None, "seg")
        q_kv = []
        for i in range(self.num_layers):
            lvl = i % self.num_feature_levels
            cross_bias = self._attn_bias_from_mask(
                results["outputs_mask"], sizes[lvl]
            )
            output, kv = self.layers[i](
                output, srcs[lvl], query_pos, poss[lvl].astype(self.dtype),
                cross_bias, self_bias, collect_kv=True,
            )
            q_kv.append(kv)
            results = self._prediction_heads(output, mask_features, None, "seg")
        return {
            "srcs": srcs,
            "poss": [p.astype(self.dtype) for p in poss],
            "q_kv": q_kv,
        }

    def init_caption_cache(self, batch: int):
        """Zeroed per-layer caption K/V (entries beyond the current step are
        causally masked, so zeros are never read)."""
        z = jnp.zeros((batch, self.contxt_len, self.hidden_dim), self.dtype)
        return [(z, z) for _ in range(self.num_layers)]

    def caption_decode_step(self, prefill, cap_caches, tok_emb_t, step_idx):
        """One caption token through all layers with cached K/V.

        tok_emb_t (B, 1, C): the text tower's embedding of caption position
        ``step_idx``. Returns (captioning logits row (B, width), updated
        cap_caches). Matches the full run bit-for-bit in exact arithmetic:
        the caption row's cross-attn bias is zero and its self-attn sees
        [queries; captions <= step_idx], exactly its rows in __call__.
        """
        e = jax.lax.stop_gradient(tok_emb_t).astype(self.dtype)
        pos_cap = jax.lax.dynamic_slice_in_dim(
            self.pos_embed_caping, step_idx, 1, axis=0
        )[None].astype(self.dtype)
        e_pos = tok_emb_t.astype(self.dtype) + pos_cap
        new_caches = []
        for i in range(self.num_layers):
            lvl = i % self.num_feature_levels
            q_k, q_v = prefill["q_kv"][i]
            cap_k, cap_v = cap_caches[i]
            e, cap_k, cap_v = self.layers[i].caption_step(
                e, e_pos, prefill["srcs"][lvl], prefill["poss"][lvl],
                q_k, q_v, cap_k, cap_v, step_idx,
            )
            new_caches.append((cap_k, cap_v))
        dec = self.decoder_norm(e)
        return (dec @ self.caping_embed)[:, 0], new_caches
