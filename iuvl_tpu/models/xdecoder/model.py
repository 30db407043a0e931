"""SysLearner — the unified top model (TPU-native GeneralizedXdecoder).

Parity target: /root/reference/modeling/architectures/xdecoder_model.py.
Composition: SAM backbone (image encoder + prompt encoder + mask decoder)
-> SimpleFPN features -> deformable pixel decoder -> 9-layer unified decoder
with a CLIP-style text encoder; optional LLM projector (512 -> llm_dim,
reference :80-84).

Task routing (reference forward :250-315) becomes a set of jittable methods,
each a static compiled program:
- ``forward_seg``        : training features for the seg criterion
- ``forward_vlp``        : captioning/retrieval training outputs
- ``evaluate_seg``       : mask_cls + full-res mask logits (semantic /
                           panoptic / instance heads post-process these)
- ``evaluate_grounding`` : text-grounded mask selection (reference :632-689)
- ``encode_image`` / ``decode_interactive``: the one-encode/many-decode
  interactive path (reference :691-903 + SURVEY.md §2.9 intended contract)

Host-side panoptic merge and evaluator logic live in iuvl_tpu.inference /
iuvl_tpu.evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..sam.build import PIXEL_MEAN, PIXEL_STD, SAM_VARIANTS, SamConfig
from ..sam.image_encoder import ImageEncoderViT
from ..sam.mask_decoder import MaskDecoder
from ..sam.prompt_encoder import PromptEncoder
from .lang_encoder import LanguageEncoder
from .pixel_decoder import DeformablePixelDecoder
from .unified_decoder import UnifiedDecoder


@dataclasses.dataclass(frozen=True)
class SysLearnerConfig:
    sam_size: str = "base"  # base / large / huge (configs SAM_SIZE)
    img_size: int = 1024
    syslearner_dim: int = 512  # SYSLEARNER_DIM
    mask_proposals: int = 100  # MASK_PROPOSAL
    contxt_len: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    pixel_decoder_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 2048
    llm_dim: int = 0  # 0 disables the LLM projector; 4096 for Vicuna-7B
    retrieval_ensemble: bool = False  # backbone ITC branch (reference
    # xdecoder_model.py:111-115 retrieval_emsemble + backbone_proj)
    dtype: str = "float32"
    attn_impl: str = "xla"  # SAM windowed attention implementation
    remat: bool = False
    remat_group: int = 3  # pixel-decoder layers per remat region (round-5
    # composed A/B at B=2 1024^2, scripts/ab_pixgrad_r5.py: pix fwd+bwd
    # 938.6 (1 layer/region) -> 898.8 ms (3) at scoped-vmem 48M; 2 measures
    # 981.8 — grouping amortizes the ~50 ms/region checkpoint boundary)
    msdeform_impl: str = "auto"
    pixel_decoder: str = "msdeform"  # or "fpn" (reference
    # transformer_encoder_fpn registration, unused by shipped configs)
    detection: bool = False  # bbox head (reference task_switch['bbox'])

    @property
    def num_queries(self) -> int:
        return self.mask_proposals + 1

    def sam_config(self) -> SamConfig:
        return SamConfig(
            **SAM_VARIANTS[self.sam_size],
            img_size=self.img_size,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
        )


class SysLearner(nn.Module):
    cfg: SysLearnerConfig = SysLearnerConfig()

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        sam_cfg = c.sam_config()
        self.image_encoder = ImageEncoderViT(
            img_size=sam_cfg.img_size,
            patch_size=sam_cfg.patch_size,
            embed_dim=sam_cfg.embed_dim,
            depth=sam_cfg.depth,
            num_heads=sam_cfg.num_heads,
            out_chans=sam_cfg.prompt_embed_dim,
            window_size=sam_cfg.window_size,
            global_attn_indexes=tuple(sam_cfg.global_attn_indexes),
            dtype=dtype,
            attn_impl=c.attn_impl,
            remat=sam_cfg.remat,
        )
        self.prompt_encoder = PromptEncoder(
            embed_dim=sam_cfg.prompt_embed_dim,
            image_embedding_size=(sam_cfg.grid, sam_cfg.grid),
            input_image_size=(sam_cfg.img_size, sam_cfg.img_size),
            dtype=dtype,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=sam_cfg.prompt_embed_dim, dtype=dtype
        )
        if c.pixel_decoder == "fpn":
            from .fpn_decoder import BasePixelDecoder

            self.pixel_decoder = BasePixelDecoder(
                conv_dim=c.syslearner_dim, mask_dim=c.syslearner_dim,
                dtype=dtype,
            )
        else:
            self.pixel_decoder = DeformablePixelDecoder(
                conv_dim=c.syslearner_dim,
                mask_dim=c.syslearner_dim,
                num_layers=c.pixel_decoder_layers,
                n_heads=c.nheads,
                dtype=dtype,
                impl=c.msdeform_impl,
                remat=c.remat,
                remat_group=c.remat_group,
            )
        self.predictor = UnifiedDecoder(
            hidden_dim=c.syslearner_dim,
            dim_proj=c.syslearner_dim,
            num_queries=c.num_queries,
            contxt_len=c.contxt_len,
            nheads=c.nheads,
            dim_feedforward=c.dim_feedforward,
            mask_dim=c.syslearner_dim,
            task_bbox=c.detection,
            dtype=dtype,
        )
        self.lang_encoder = LanguageEncoder(
            width=c.text_width,
            proj_dim=c.syslearner_dim,
            layers=c.text_layers,
            heads=c.text_heads,
            context_length=c.contxt_len,
            vocab_size=c.vocab_size,
            dtype=dtype,
        )
        if c.llm_dim:
            # Reference xdecoder_model.py:84: img_to_lang Linear 512 -> 4096.
            self.img_to_lang = nn.Dense(c.llm_dim, dtype=dtype, name="img_to_lang")
        if c.retrieval_ensemble:
            # Reference xdecoder_model.py:113-115: backbone_proj (768 x
            # dim_proj, trunc-normal 0.02, no bias) projects the avg-pooled
            # res5 feature into the retrieval space for the backbone ITC
            # branch; Dense infers the input width from our res5 channels.
            self.backbone_proj = nn.Dense(
                c.syslearner_dim, use_bias=False, dtype=dtype,
                kernel_init=nn.initializers.truncated_normal(0.02),
                name="backbone_proj",
            )

    # ------------------------------------------------------------------ #
    # Preprocessing / backbone
    # ------------------------------------------------------------------ #
    def normalize(self, images: jax.Array) -> jax.Array:
        mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
        std = jnp.asarray(PIXEL_STD, jnp.float32)
        return (images.astype(jnp.float32) - mean) / std

    def encode_image(self, images: jax.Array):
        """Raw RGB (B, H, W, 3) -> (sam_embedding, fpn dict). One heavy pass."""
        return self.image_encoder(self.normalize(images))

    def encode_text_embeddings(self, input_ids, attention_mask=None, norm=True):
        """Batched class/prompt text embedding (used to build the class-name
        embedding cache host-side). Reference vlpencoder.py:74-131."""
        return self.lang_encoder.forward_language(input_ids, attention_mask, norm=norm)

    def encode_text_tokens(self, input_ids, attention_mask=None, norm=False):
        return self.lang_encoder.forward_language_token(
            input_ids, attention_mask, norm=norm
        )

    def logit_scale(self):
        return self.lang_encoder.logit_scale

    # ------------------------------------------------------------------ #
    # Unified head
    # ------------------------------------------------------------------ #
    def _head(self, fpn, text_embeddings, task, **kw):
        mask_features, multi_scale = self.pixel_decoder(fpn)
        return self.predictor(
            multi_scale,
            mask_features,
            text_embeddings=text_embeddings,
            logit_scale=self.lang_encoder.logit_scale,
            task=task,
            **kw,
        )

    def forward_seg(
        self,
        images: jax.Array,
        text_embeddings: jax.Array,
        grounding_tokens: Optional[jax.Array] = None,
        grounding_valid: Optional[jax.Array] = None,
    ) -> dict[str, Any]:
        """Training forward for the seg stream (reference forward_seg:331-390).
        Returns raw head outputs; slicing into obj/grounding blocks and the
        criterion live in iuvl_tpu.losses."""
        _, fpn = self.encode_image(images)
        task = "seg_grounding" if grounding_tokens is not None else "seg"
        return self._head(
            fpn, text_embeddings, task,
            grounding_tokens=grounding_tokens, grounding_valid=grounding_valid,
            training=True,
        )

    def forward_vlp(
        self, images: jax.Array, caption_tokens: jax.Array
    ) -> dict[str, Any]:
        """Captioning/retrieval training stream (reference forward_vlp:392-436).
        caption_tokens: (B, 77, C) caption token embeddings."""
        _, fpn = self.encode_image(images)
        return self._head(fpn, None, "vlp", caption_tokens=caption_tokens,
                          training=True)

    def forward_vlp_train(
        self, images: jax.Array, caption_ids: jax.Array, caption_mask: jax.Array
    ) -> dict[str, Any]:
        """Full VLP training forward (reference forward_vlp:392-436 +
        prepare_vlp_targets): embed GT caption tokens with the text tower,
        run the unified head in 'vlp' mode (teacher forcing via the causal
        caption block of the self-attn mask), and return everything the
        captioning + retrieval losses need."""
        token_emb, class_emb = self.lang_encoder.forward_language_token(
            caption_ids, caption_mask
        )
        _, fpn = self.encode_image(images)
        out = self._head(fpn, None, "vlp", caption_tokens=token_emb,
                         training=True)
        out["caption_class_emb"] = class_emb  # pooled caption embedding
        if self.cfg.retrieval_ensemble:
            # Backbone ITC branch (reference forward_vlp:427-435): res5
            # avg-pooled over space, projected into the retrieval space.
            out["backbone_emb"] = self.backbone_retrieval_emb(fpn)
        # Raw token table (V, width): the captioning logits use it directly
        # (reference xdecoder.py:359 — width == dim_proj in shipped configs;
        # when they differ, project the table with lang_proj).
        table = self.lang_encoder.lang_encoder.token_table()
        if table.shape[-1] != self.cfg.syslearner_dim:
            table = table @ self.lang_encoder.lang_proj
        out["token_table"] = table
        out["logit_scale"] = self.lang_encoder.logit_scale
        return out

    def evaluate_seg(self, images: jax.Array, text_embeddings: jax.Array):
        """Eval forward (reference evaluate:480-543): returns
        (mask_cls (B, Q, K), mask_pred upsampled to input size)."""
        _, fpn = self.encode_image(images)
        out = self._head(fpn, text_embeddings, "seg")
        mask_cls = out["pred_logits"]
        mask_pred = out["pred_masks"]
        b, q = mask_pred.shape[:2]
        mask_pred = jax.image.resize(
            mask_pred,
            (b, q, images.shape[1], images.shape[2]),
            method="bilinear",
        )
        return mask_cls, mask_pred

    def evaluate_grounding(
        self,
        images: jax.Array,
        grounding_tokens: jax.Array,  # (B, G, C) token embeddings
        grounding_valid: jax.Array,  # (B, G)
        class_emb: jax.Array,  # (B, G_text, C) pooled phrase embeddings
    ):
        """Reference evaluate_grounding:632-689: run the grounding head, pick
        per-phrase the query whose caption embedding best matches the phrase
        embedding. Returns (B, G_text, H, W) mask logits at input size."""
        _, fpn = self.encode_image(images)
        out = self._head(
            fpn, None, "grounding_eval",
            grounding_tokens=grounding_tokens, grounding_valid=grounding_valid,
        )
        nq = self.cfg.num_queries
        pred_gmasks = out["pred_masks"][:, nq : 2 * nq - 1]
        v_emb = out["pred_captions"][:, nq : 2 * nq - 1]
        v_emb = v_emb / (jnp.linalg.norm(v_emb, axis=-1, keepdims=True) + 1e-7)
        t_emb = class_emb / (jnp.linalg.norm(class_emb, axis=-1, keepdims=True) + 1e-7)
        sim = jnp.exp(self.lang_encoder.logit_scale) * jnp.einsum(
            "bqc,btc->btq", v_emb, t_emb
        )
        matched = jnp.argmax(sim, axis=-1)  # (B, G_text)
        masks = jnp.take_along_axis(
            pred_gmasks, matched[..., None, None], axis=1
        )
        b, t = masks.shape[:2]
        return jax.image.resize(
            masks, (b, t, images.shape[1], images.shape[2]), method="bicubic"
        )

    def evaluate_retrieval(self, images: jax.Array) -> jax.Array:
        """Image-side retrieval/classification embedding: the class query's
        caption embedding, normalized (reference evaluate_retrieval /
        evaluate_classification use pred_captions[:, -1])."""
        _, fpn = self.encode_image(images)
        out = self._head(fpn, None, "seg")
        v = out["pred_captions"][:, -1]
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-7)

    def backbone_retrieval_emb(self, fpn: dict) -> jax.Array:
        """Backbone-side retrieval embedding: res5 spatially avg-pooled,
        then backbone_proj (reference forward_vlp:427-432's
        adaptive_avg_pool1d + @ backbone_proj)."""
        v = fpn["res5"].mean(axis=(1, 2))  # (B, C) — NHWC pool over space
        v = self.backbone_proj(v.astype(jnp.float32))
        return v.astype(jnp.float32)

    def evaluate_retrieval_ensemble(self, images: jax.Array):
        """Both retrieval embeddings in one backbone pass: (decoder class
        query, backbone-projected res5). The evaluator averages their
        similarity matrices 0.5/0.5 (retrieval_evaluation.py:162-166)."""
        _, fpn = self.encode_image(images)
        out = self._head(fpn, None, "seg")
        v = out["pred_captions"][:, -1]
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-7)
        v2 = self.backbone_retrieval_emb(fpn)
        v2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + 1e-7)
        return v, v2

    def evaluate_captioning(
        self, images: jax.Array, steps: int = 50, sot_id: int = 49406
    ) -> jax.Array:
        """Autoregressive CLIP-token caption decode (reference
        XDecoder.forward_captioning, interface/xdecoder.py:331-426): greedy
        argmax over the token-embedding similarity, re-running the full
        unified decoder per emitted token, as one jitted lax.scan.
        Returns (B, contxt_len) token ids."""
        _, fpn = self.encode_image(images)
        mask_features, multi_scale = self.pixel_decoder(fpn)
        b = images.shape[0]
        ids0 = jnp.full((b, self.cfg.contxt_len), sot_id, jnp.int32)
        table = self.lang_encoder.lang_encoder.token_table()  # (V, width)

        def step_fn(ids, cap_idx):
            tok_emb, _ = self.lang_encoder.forward_language_token(ids)
            out = self.predictor(
                multi_scale, mask_features, text_embeddings=None,
                logit_scale=self.lang_encoder.logit_scale,
                task="vlp", caption_tokens=tok_emb,
            )
            logits = out["pred_captionings"].astype(jnp.float32) @ table.T.astype(
                jnp.float32
            )  # (B, T, V)
            cur = jax.lax.dynamic_slice_in_dim(logits, cap_idx, 1, axis=1)[:, 0]
            nxt = jnp.argmax(cur, -1).astype(jnp.int32)
            ids = jax.lax.dynamic_update_slice(ids, nxt[:, None], (0, cap_idx + 1))
            return ids, None

        ids, _ = jax.lax.scan(
            step_fn, ids0, jnp.arange(min(steps, self.cfg.contxt_len - 1))
        )
        return ids

    def evaluate_captioning_cached(
        self, images: jax.Array, steps: int = 50, sot_id: int = 49406
    ) -> jax.Array:
        """KV-cached captioning decode — same token ids as
        :meth:`evaluate_captioning`, one caption ROW per step instead of
        re-running the 9-layer decoder over [queries; 77 slots]
        (the reference's worst hot loop, interface/xdecoder.py:331-426).
        The query block runs once (captioning_prefill); each step pushes a
        single caption token against frozen query K/V + the growing caption
        K/V. The CLIP text tower is ALSO KV-cached (it is causal, so
        position ``t`` is stable once emitted): each step embeds exactly
        ONE new token through the 12-layer tower instead of re-running all
        77 positions (the round-3 residual cost,
        lang_encoder.ResidualAttentionBlock.step).
        """
        _, fpn = self.encode_image(images)
        mask_features, multi_scale = self.pixel_decoder(fpn)
        b = images.shape[0]
        ids0 = jnp.full((b, self.cfg.contxt_len), sot_id, jnp.int32)
        table = self.lang_encoder.lang_encoder.token_table()  # (V, width)
        prefill = self.predictor.captioning_prefill(multi_scale, mask_features)
        caches0 = self.predictor.init_caption_cache(b)
        tcaches0 = self.lang_encoder.init_text_cache(b)

        def step_fn(carry, cap_idx):
            ids, cur_id, caches, tcaches = carry
            e_t, tcaches = self.lang_encoder.forward_token_step(
                cur_id, cap_idx, tcaches
            )  # (B, 1, proj) — the projected tower output at cap_idx
            row, caches = self.predictor.caption_decode_step(
                prefill, caches, e_t, cap_idx
            )
            logits = row.astype(jnp.float32) @ table.T.astype(jnp.float32)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            ids = jax.lax.dynamic_update_slice(ids, nxt[:, None], (0, cap_idx + 1))
            return (ids, nxt, caches, tcaches), None

        (ids, _, _, _), _ = jax.lax.scan(
            step_fn, (ids0, ids0[:, 0], caches0, tcaches0),
            jnp.arange(min(steps, self.cfg.contxt_len - 1)),
        )
        return ids

    # ------------------------------------------------------------------ #
    # Interactive path (one encode, many decodes)
    # ------------------------------------------------------------------ #
    def decode_prompts(
        self, sam_embedding: jax.Array, points=None, labels=None, boxes=None,
        masks=None,
    ) -> dict[str, Any]:
        """SAM prompt decode from a cached embedding (reference
        Sam.decode_from_embedding, sam/modeling/sam.py:103-136)."""
        sparse, dense = self.prompt_encoder(
            points=points, labels=labels, boxes=boxes, masks=masks,
            batch=sam_embedding.shape[0],
        )
        image_pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(sam_embedding, image_pe, sparse, dense)

    def encode_interactive(self, images: jax.Array):
        """One-encode stage of the interactive path: the SAM embedding plus
        the pixel-decoder products, all prompt-independent and cached across
        click rounds (reference forward_image_embedding, sam.py:98-100)."""
        sam_embedding, fpn = self.encode_image(images)
        mask_features, multi_scale = self.pixel_decoder(fpn)
        return sam_embedding, mask_features, multi_scale

    def decode_interactive(
        self,
        sam_embedding: jax.Array,  # (1 or N, 64, 64, 256) — batch-1 is the
        #   fast path (broadcast lazily inside the mask decoder)
        mask_features: jax.Array,  # (1, H/4, W/4, C) cached
        multi_scale: Any,  # cached pixel-decoder levels (batch 1)
        points=None, labels=None, boxes=None, masks=None,
    ) -> jax.Array:
        """Many-decode stage: SAM prompt decode feeds the unified decoder
        (the SURVEY §2.9 intended contract — reference xdecoder_model.py:
        741-742 passes src_output_features/hyper_in into sem_seg_head; the
        committed reference drops them, here they are consumed for real).
        Returns (N, H/4, W/4) unified-head mask logits, one per prompt set."""
        dec = self.decode_prompts(
            sam_embedding, points=points, labels=labels, boxes=boxes, masks=masks
        )
        n = dec["hyper_in"].shape[0]  # prompt batch (emb may stay batch-1)

        def tile(x):
            if x.shape[0] == n:
                return x
            if x.shape[0] == 1:
                return jnp.broadcast_to(x, (n, *x.shape[1:]))
            return jnp.repeat(x, n // x.shape[0], axis=0)

        mf = tile(mask_features)
        ms = [tile(x) for x in multi_scale]
        out = self.predictor(
            ms, mf, text_embeddings=None,
            logit_scale=self.lang_encoder.logit_scale,
            task="interactive",
            # hyper_in[:, 0]: the primary mask-token hypernet vector
            # (reference sam.py:132 collects hyper_in[:, 0, :]).
            sam_queries=dec["hyper_in"][:, :1],
            sam_features=dec["upscaled_embedding"],
        )
        return out["pred_interactive_masks"][:, 0]

    def forward_spatial_train(
        self,
        images: jax.Array,  # (B, H, W, 3)
        points: jax.Array,  # (B, P, 2) one click per prompt, input space
        labels: jax.Array,  # (B, P) 1 = positive, -1 = pad
    ) -> jax.Array:
        """Training forward for the spatial-prompt stream: each prompt is
        SAM-decoded separately (batch B*P) and injected into the unified
        decoder, so ``loss_spatials`` supervision trains the injection
        (sam_query_proj / sam_feat_proj). Counterpart of the reference's
        spatial task (criterion.py:511-686), whose decoder path is dead
        code in the snapshot — here it rides the interactive path.
        Returns (B, P, H/4, W/4) mask logits."""
        b, p = points.shape[:2]
        sam_embedding, mask_features, multi_scale = self.encode_interactive(images)
        emb = (
            sam_embedding if b == 1  # batch-1 broadcasts lazily in the decoder
            else jnp.repeat(sam_embedding, p, axis=0)
        )
        logits = self.decode_interactive(
            emb, mask_features, multi_scale,
            points=points.reshape(b * p, 1, 2),
            labels=labels.reshape(b * p, 1),
        )  # (B*P, H/4, W/4)
        return logits.reshape(b, p, *logits.shape[1:])

    def evaluate_interactive_step(
        self,
        sam_embedding: jax.Array,  # (B, 64, 64, 256) cached
        fpn: dict[str, jax.Array],  # cached FPN features
        points: jax.Array,  # (B, P, 2)
        labels: jax.Array,  # (B, P)
    ):
        """One click-refinement round scored by raw SAM masks — kept as the
        ablation baseline (flag INTERACTIVE_SAM_ONLY); the product path is
        ``decode_interactive`` through the unified decoder."""
        out = self.decode_prompts(sam_embedding, points=points, labels=labels)
        return out

    def project_image_features(self, image_feature: jax.Array) -> jax.Array:
        """LLM projector (reference :84 + :611-617)."""
        return self.img_to_lang(image_feature)

    def forward_llm_features(self, images: jax.Array, context_tokens: jax.Array):
        """Vision path of the LLM stage (reference forward_llm:438-464):
        unified head in 'llm' task mode -> 100 object-query features ->
        projector. Returns (B, 100, llm_dim)."""
        _, fpn = self.encode_image(images)
        out = self._head(fpn, None, "llm", caption_tokens=context_tokens)
        feat = jax.lax.stop_gradient(out["image_feature"])  # reference :457
        return self.project_image_features(feat)

    def __call__(self, images: jax.Array, text_embeddings: jax.Array):
        """Default = evaluate_seg (flagship jit target)."""
        return self.evaluate_seg(images, text_embeddings)

    def warmup(self, images: jax.Array, text_embeddings: jax.Array):
        """Trace every submodule once so ``init`` creates all parameters
        (flax creates params lazily per traced branch)."""
        c = self.cfg
        b = images.shape[0]
        sam_embedding, fpn = self.encode_image(images)
        out = self._head(
            fpn, text_embeddings, "seg_grounding",
            grounding_tokens=jnp.zeros((b, 1, c.syslearner_dim)),
            grounding_valid=jnp.ones((b, 1), bool),
        )
        vlp = self._head(
            fpn, None, "vlp",
            caption_tokens=jnp.zeros((b, c.contxt_len, c.syslearner_dim)),
        )
        grid4 = 4 * images.shape[1] // 16
        dec = self.decode_prompts(
            sam_embedding,
            points=jnp.zeros((b, 1, 2)),
            labels=jnp.zeros((b, 1), jnp.int32),
            boxes=jnp.zeros((b, 4)),
            masks=jnp.zeros((b, grid4, grid4, 1)),
        )
        mask_features, multi_scale = self.pixel_decoder(fpn)
        self.predictor(
            multi_scale, mask_features, text_embeddings=None,
            logit_scale=self.lang_encoder.logit_scale, task="interactive",
            sam_queries=dec["hyper_in"][:, :1],
            sam_features=dec["upscaled_embedding"],
        )
        ids = jnp.zeros((1, c.contxt_len), jnp.int32)
        text = self.encode_text_tokens(ids)
        llm_out = None
        if c.llm_dim:
            llm_out = self.project_image_features(
                jnp.zeros((b, c.num_queries - 1, c.syslearner_dim))
            )
        if c.retrieval_ensemble:
            vlp = (vlp, self.backbone_retrieval_emb(fpn))
        return out, vlp, dec, text, llm_out
