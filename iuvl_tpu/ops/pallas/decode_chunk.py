"""Whole-chunk fused SAM prompt decode (one Pallas kernel per prompt).

The one-encode/many-decode serving path (256 point prompts against one
encoded 1024^2 image) is bound by HBM traffic on the per-prompt image keys
tensor: after block 0's image->token residual, ``keys`` is (B=256, N=4096,
C=256) and the per-op fused kernels (ops/pallas/twoway_attention.py,
mask_upscale.py) still stream it through HBM five times (i2t0 write, t2i1
read, i2t1 read+write, final-t2i read, upscale read) — ~3.2 GB per chunk.

This kernel runs the ENTIRE keys-dependent tail per prompt with the 2 MB
keys row tensor resident in VMEM:

    i2t0 -> [self1 -> t2i1 -> mlp1] -> i2t1 -> final t2i -> norm_final
    -> hyper MLPs -> upscale deconvs (flat-matmul form) -> mask logits

writing only the tiny token state and the flat mask logits. The shared
(batch-1) image-side tensors — keys0, the i2t q-projections and the
key-PE projections — are grid-constant inputs computed once in XLA.

Reference semantics: sam/modeling/transformer.py:16-240 (TwoWayTransformer
block 0 tail + block 1 + final attention) and mask_decoder.py:53-59,163-199
(hypernetwork MLPs + upscale), reassociated linearly exactly as the per-op
kernels do (block-diagonal token packing, PE folded through projections,
deconvs as per-site matmuls — each reassociation is parity-tested in
tests/test_attention_ops.py).

Everything inside the kernel is 2-D: token block-diagonal packing, head
merging and the per-prompt hypernetwork matrix are built with static
selector/mask matrices via matmuls (Mosaic-friendly; no 3-D reshapes).

Backward: custom VJP recomputing through ``decode_tail_xla``.

NEGATIVE RESULT (v5e, 2026-08): the fused whole-chunk kernel measures
18.63 ms per 256-prompt chunk vs 14.93 ms for the per-op fused kernels
(scripts/profile_chunk.py, chained-scan differencing). The one-prompt-per-
grid-step kernel serializes the op chain — every LN/softmax (VPU) gates the
next matmul (MXU) with no cross-prompt overlap — and that costs more than
the ~4 ms of HBM traffic it saves (~3.2 GB -> ~0.3 GB per chunk). XLA's
schedule pipelines the per-op kernels across the prompt batch instead.
Kept selectable (``twoway_impl="chunk"``) + parity-tested
(tests/test_decode_chunk.py); ``auto`` stays on the per-op kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mask_upscale import (_blockdiag_w2, _flat_w1, _group_sum_matrix,
                           _ln2d_grouped)


# --------------------------------------------------------------------- #
# static selector / mask constants (all 2-D, fed as grid-constant inputs)
# --------------------------------------------------------------------- #

@functools.lru_cache(maxsize=None)
def _chunk_consts(h: int, per: int, internal: int, c: int, t_valid: int,
                  m: int, c8: int):
    d_i = internal // h
    d_c = c // h
    r = h * per
    # token -> block-diagonal packing: X_bd = (sel @ X) * headmask
    sel = np.tile(np.eye(per, dtype=np.float32), (h, 1))            # (R, per)
    hm_i = np.repeat(np.eye(h, dtype=np.float32), d_i, axis=1)      # (h, internal)
    headmask_i = np.repeat(hm_i, per, axis=0)                       # (R, internal)
    hm_c = np.repeat(np.eye(h, dtype=np.float32), d_c, axis=1)
    headmask_c = np.repeat(hm_c, per, axis=0)                       # (R, C)
    # same-head group indicator for grouped softmax denominators
    G = np.kron(np.eye(h, dtype=np.float32), np.ones((per, per), np.float32))
    # slot validity (tokens beyond t_valid are padding)
    slot_ok = np.tile(np.arange(per) < t_valid, h)
    smask = np.where(slot_ok, 0.0, -1e30).astype(np.float32)[None]  # (1, R)
    # hypernetwork block-diagonal build: X_bd = (X @ ecol) * mask_m
    ecol = np.tile(np.eye(c, dtype=np.float32), (1, m))             # (C, m*C)
    mm = np.repeat(np.eye(m, dtype=np.float32), c, axis=1)          # (m, m*C)
    # per-prompt hyper matrix: HT = ((arow @ hyperT) @ espread) * gmask
    arow = np.tile(np.eye(c8, dtype=np.float32), (16, 1))           # (16c8, c8)
    espread = np.tile(np.eye(m, dtype=np.float32), (1, 16))         # (m, 16m)
    gr = np.arange(16 * c8)[:, None] // c8
    gc = np.arange(16 * m)[None, :] // m
    gmask = (gr == gc).astype(np.float32)                           # (16c8, 16m)
    return dict(sel=sel, headmask_i=headmask_i, headmask_c=headmask_c,
                G=G, smask=smask, ecol=ecol, mask_m=mm, arow=arow,
                espread=espread, gmask=gmask)


def _pack_bd2(x, sel, headmask):
    """(T, dim) tokens -> (R, dim) block-diagonal via static matrices.
    (Mosaic requires 32-bit matmul accumulators, hence the explicit
    preferred_element_type + cast back.)"""
    y = jnp.dot(sel, x, preferred_element_type=jnp.float32)
    return y.astype(x.dtype) * headmask


def _merge_heads2(obd, sel, headmask):
    """(R, dim) per-(head, token) rows -> (T, dim) merged token rows."""
    y = jnp.dot(sel.T, obd * headmask, preferred_element_type=jnp.float32)
    return y.astype(obd.dtype)


def _ln_rows(y, w, b, eps=1e-5):
    yf = y.astype(jnp.float32)
    mu = yf.mean(axis=-1, keepdims=True)
    var = ((yf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((yf - mu) * jax.lax.rsqrt(var + eps)) * w.astype(jnp.float32) \
        + b.astype(jnp.float32)


# --------------------------------------------------------------------- #
# XLA oracle (also the custom-VJP backward)
# --------------------------------------------------------------------- #

def decode_tail_xla(t, tpe, keys0, key_pe, W, *, n_heads: int,
                    t_valid: int):
    """Batched XLA reference of the fused tail.

    t/tpe (B, Tp, C) tokens after block 0's mlp+norm3 and their PE, padded
    to Tp slots (pad rows zero); keys0/key_pe (1, N, C). W: raw weight
    pytree (see ``collect_tail_weights`` in models/sam/mask_decoder.py).
    Returns (tokens_out (B, Tp, C), masks_flat (B, N, m*16) fp32 with
    columns ordered (di, dj, ei, ej, t), keys2 (B, N, C)).
    """
    dt = keys0.dtype
    b, tp, c = t.shape
    n = keys0.shape[1]
    h = n_heads
    internal = W["i2t0"]["wo"].shape[0]
    d_i = internal // h
    m = W["hyper_w1"].shape[0]
    c8 = W["up_k2"].shape[2]
    cst = _chunk_consts(h, tp, internal, c, t_valid, m, c8)
    f32 = jnp.float32
    sel = jnp.asarray(cst["sel"], dt)
    hm_i = jnp.asarray(cst["headmask_i"], dt)
    hm_c = jnp.asarray(cst["headmask_c"], dt)
    G = jnp.asarray(cst["G"], f32)
    smask = jnp.asarray(cst["smask"], f32)

    def pack(x, hm):  # (B, T, dim) -> (B, R, dim)
        return jnp.einsum("rt,btd->brd", sel, x) * hm

    def merge(o, hm):  # (B, R, dim) -> (B, T, dim)
        return jnp.einsum("rt,brd->btd", sel, o * hm)

    def lnr(y, p):
        return _ln_rows(y, p["scale"], p["bias"]).astype(dt)

    cast = lambda x: x.astype(dt)

    # ---- i2t0: shared q-side, per-prompt token k/v ----
    w0 = W["i2t0"]
    qp0 = (keys0 @ cast(w0["wq"]) + key_pe @ cast(w0["wq"])
           + cast(w0["bq"]))                                       # (1, N, I)
    kbd0 = pack(cast(t @ w0["wk"] + tpe @ w0["wk"] + w0["bk"]), hm_i)
    vbd0 = pack(cast(t @ w0["wv"] + w0["bv"]), hm_i)
    s = jnp.einsum("qi,bri->bqr", qp0[0], kbd0,
                   preferred_element_type=f32) * (d_i ** -0.5) + smask
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    p = (e / jnp.einsum("bqr,rj->bqj", e, G)).astype(dt)
    att = jnp.einsum("bqr,bri->bqi", p, vbd0)
    keys1 = lnr(keys0 + att @ cast(w0["wo"]) + cast(w0["bo"]), W["ln40"])

    # ---- self1 (internal == C) ----
    ws = W["self1"]
    qs = cast((t + tpe) @ ws["wq"] + ws["bq"])
    kbds = pack(cast((t + tpe) @ ws["wk"] + ws["bk"]), hm_c)
    vbds = pack(cast(t @ ws["wv"] + ws["bv"]), hm_c)
    d_c = c // h
    s = jnp.einsum("bqc,brc->bqr", qs, kbds,
                   preferred_element_type=f32) * (d_c ** -0.5) + smask
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    p = (e / jnp.einsum("bqr,rj->bqj", e, G)).astype(dt)
    att = jnp.einsum("bqr,brc->bqc", p, vbds)
    t1 = lnr(t + att @ cast(ws["wo"]) + cast(ws["bo"]), W["ln11"])

    # ---- t2i1 ----
    w1 = W["t2i1"]
    qbd = pack(cast((t1 + tpe) @ w1["wq"] + w1["bq"]), hm_i) * (d_i ** -0.5)
    kp1 = keys1 @ cast(w1["wk"]) + key_pe @ cast(w1["wk"]) + cast(w1["bk"])
    vp1 = keys1 @ cast(w1["wv"]) + cast(w1["bv"])
    s = jnp.einsum("bri,bni->brn", qbd, kp1, preferred_element_type=f32)
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    p = (p / p.sum(axis=-1, keepdims=True)).astype(dt)
    obd = jnp.einsum("brn,bni->bri", p, vp1)
    t1 = lnr(t1 + merge(obd, hm_i) @ cast(w1["wo"]) + cast(w1["bo"]),
             W["ln21"])

    # ---- mlp1 ----
    y = jnp.maximum(t1 @ cast(W["mlp1"]["w1"]) + cast(W["mlp1"]["b1"]), 0)
    t1 = lnr(t1 + y @ cast(W["mlp1"]["w2"]) + cast(W["mlp1"]["b2"]),
             W["ln31"])

    # ---- i2t1 ----
    wi = W["i2t1"]
    qp1 = keys1 @ cast(wi["wq"]) + key_pe @ cast(wi["wq"]) + cast(wi["bq"])
    kbd1 = pack(cast(t1 @ wi["wk"] + tpe @ wi["wk"] + wi["bk"]), hm_i)
    vbd1 = pack(cast(t1 @ wi["wv"] + wi["bv"]), hm_i)
    s = jnp.einsum("bni,bri->bnr", qp1, kbd1,
                   preferred_element_type=f32) * (d_i ** -0.5) + smask
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    p = (e / jnp.einsum("bnr,rj->bnj", e, G)).astype(dt)
    att = jnp.einsum("bnr,bri->bni", p, vbd1)
    keys2 = lnr(keys1 + att @ cast(wi["wo"]) + cast(wi["bo"]), W["ln41"])

    # ---- final t2i ----
    wf = W["final"]
    qbd = pack(cast((t1 + tpe) @ wf["wq"] + wf["bq"]), hm_i) * (d_i ** -0.5)
    kpf = keys2 @ cast(wf["wk"]) + key_pe @ cast(wf["wk"]) + cast(wf["bk"])
    vpf = keys2 @ cast(wf["wv"]) + cast(wf["bv"])
    s = jnp.einsum("bri,bni->brn", qbd, kpf, preferred_element_type=f32)
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    p = (p / p.sum(axis=-1, keepdims=True)).astype(dt)
    obd = jnp.einsum("brn,bni->bri", p, vpf)
    tout = lnr(t1 + merge(obd, hm_i) @ cast(wf["wo"]) + cast(wf["bo"]),
               W["lnf"])

    # ---- hyper MLPs (m separate 3-layer MLPs on mask tokens 1..m) ----
    x = tout[:, 1:1 + m]  # (B, m, C)
    hw1, hb1 = cast(W["hyper_w1"]), cast(W["hyper_b1"])
    hw2, hb2 = cast(W["hyper_w2"]), cast(W["hyper_b2"])
    hw3, hb3 = cast(W["hyper_w3"]), cast(W["hyper_b3"])
    x = jnp.maximum(jnp.einsum("bmc,mcd->bmd", x, hw1) + hb1, 0)
    x = jnp.maximum(jnp.einsum("bmc,mcd->bmd", x, hw2) + hb2, 0)
    hyper = jnp.einsum("bmc,mcd->bmd", x, hw3) + hb3  # (B, m, c8)

    # ---- upscale (flat matmul form) + mask contraction ----
    c4 = W["up_k1"].shape[2]
    w1f = _flat_w1(W["up_k1"]).astype(dt)
    y1 = keys2 @ w1f + jnp.tile(W["up_b1"], 4).astype(dt)
    msum = jnp.asarray(_group_sum_matrix(4 * c4, c4))
    y1 = _ln2d_grouped(y1, msum, jnp.tile(W["up_lnw"], 4),
                       jnp.tile(W["up_lnb"], 4), c4)
    y1 = jax.nn.gelu(y1.astype(dt), approximate=(dt == jnp.bfloat16))
    w2bd = _blockdiag_w2(W["up_k2"]).astype(dt)
    y2 = y1 @ w2bd + jnp.tile(W["up_b2"], 16).astype(dt)
    y2 = jax.nn.gelu(y2, approximate=(dt == jnp.bfloat16))
    # per-prompt hyper matrix (16c8, 16m) via static selectors
    arow = jnp.asarray(cst["arow"], dt)
    espread = jnp.asarray(cst["espread"], dt)
    gmask = jnp.asarray(cst["gmask"], dt)
    hyperT = hyper.transpose(0, 2, 1)  # (B, c8, m)
    ht = (jnp.einsum("rc,bcm->brm", arow, hyperT) @ espread) * gmask
    masks = jnp.einsum("bnr,brk->bnk", y2, ht, preferred_element_type=f32)
    return tout, masks, keys2


# --------------------------------------------------------------------- #
# the kernel
# --------------------------------------------------------------------- #

def _chunk_kernel(t_ref, tpe_ref, k0_ref, qp0_ref, pewq1_ref, pewk1_ref,
                  pewkf_ref, kbd0_ref, vbd0_ref,
                  sel_ref, hmi_ref, hmc_ref, g_ref, smask_ref,
                  ecol_ref, maskm_ref, arow_ref, espread_ref, gmask_ref,
                  msum_ref,
                  w_refs, o_tok_ref, o_mask_ref, *,
                  h: int, internal: int, scale_i: float, scale_c: float,
                  c4: int, c8: int, m: int, approx: bool):
    f32 = jnp.float32
    k0 = k0_ref[...]
    dt = k0.dtype
    t = t_ref[0]
    tpe = tpe_ref[0]
    sel = sel_ref[...]
    hmi = hmi_ref[...]
    hmc = hmc_ref[...]
    G = g_ref[...]
    smask = smask_ref[...]
    w = {k: r[...] for k, r in w_refs.items()}

    def lnr(y, nm):
        return _ln_rows(y, w[nm + "_s"], w[nm + "_b"]).astype(dt)

    def grouped_softmax(s):
        mx = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - mx)
        return (e / jnp.dot(e, G, preferred_element_type=f32)).astype(dt)

    def rowsoftmax(s):
        mx = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - mx)
        return (e / e.sum(axis=-1, keepdims=True)).astype(dt)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    # ---- i2t0 ----
    s = dot(qp0_ref[...], kbd0_ref[0].T) * scale_i + smask
    p = grouped_softmax(s)
    att = dot(p, vbd0_ref[0]).astype(dt)
    keys1 = lnr(k0 + dot(att, w["i2t0_wo"]).astype(dt) + w["i2t0_bo"], "ln40")

    # ---- self1 ----
    tq = (t + tpe).astype(dt)
    qs = dot(tq, w["self1_wq"]).astype(dt) + w["self1_bq"]
    kbds = _pack_bd2(dot(tq, w["self1_wk"]).astype(dt) + w["self1_bk"],
                     sel, hmc)
    vbds = _pack_bd2(dot(t, w["self1_wv"]).astype(dt) + w["self1_bv"],
                     sel, hmc)
    s = dot(qs, kbds.T) * scale_c + smask
    p = grouped_softmax(s)
    att = dot(p, vbds).astype(dt)
    t1 = lnr(t + dot(att, w["self1_wo"]).astype(dt) + w["self1_bo"], "ln11")

    # ---- t2i1 ----
    t1q = (t1 + tpe).astype(dt)
    qbd = _pack_bd2(dot(t1q, w["t2i1_wq"]).astype(dt) + w["t2i1_bq"],
                    sel, hmi) * scale_i
    kp1 = dot(keys1, w["t2i1_wk"]).astype(dt) + pewk1_ref[...] + w["t2i1_bk"]
    vp1 = dot(keys1, w["t2i1_wv"]).astype(dt) + w["t2i1_bv"]
    s = dot(qbd, kp1.T)
    p = rowsoftmax(s)
    obd = dot(p, vp1).astype(dt)
    mrg = _merge_heads2(obd, sel, hmi)
    t1 = lnr(t1 + dot(mrg, w["t2i1_wo"]).astype(dt) + w["t2i1_bo"], "ln21")

    # ---- mlp1 ----
    y = jnp.maximum(dot(t1, w["mlp1_w1"]).astype(dt) + w["mlp1_b1"], 0)
    t1 = lnr(t1 + dot(y, w["mlp1_w2"]).astype(dt) + w["mlp1_b2"], "ln31")

    # ---- i2t1 ----
    qp1 = dot(keys1, w["i2t1_wq"]).astype(dt) + pewq1_ref[...] + w["i2t1_bq"]
    t1pe = (t1 + tpe).astype(dt)
    kbd1 = _pack_bd2(dot(t1pe, w["i2t1_wk"]).astype(dt) + w["i2t1_bk"],
                     sel, hmi)
    vbd1 = _pack_bd2(dot(t1, w["i2t1_wv"]).astype(dt) + w["i2t1_bv"],
                     sel, hmi)
    s = dot(qp1, kbd1.T) * scale_i + smask
    p = grouped_softmax(s)
    att = dot(p, vbd1).astype(dt)
    keys2 = lnr(keys1 + dot(att, w["i2t1_wo"]).astype(dt) + w["i2t1_bo"],
                "ln41")

    # ---- final t2i ----
    qbd = _pack_bd2(dot(t1pe, w["final_wq"]).astype(dt) + w["final_bq"],
                    sel, hmi) * scale_i
    kpf = dot(keys2, w["final_wk"]).astype(dt) + pewkf_ref[...] + w["final_bk"]
    vpf = dot(keys2, w["final_wv"]).astype(dt) + w["final_bv"]
    s = dot(qbd, kpf.T)
    p = rowsoftmax(s)
    obd = dot(p, vpf).astype(dt)
    mrg = _merge_heads2(obd, sel, hmi)
    tout = lnr(t1 + dot(mrg, w["final_wo"]).astype(dt) + w["final_bo"], "lnf")
    o_tok_ref[0] = tout.astype(o_tok_ref.dtype)

    # ---- hyper MLPs (block-diagonal batched over the m mask tokens) ----
    ecol = ecol_ref[...]
    maskm = maskm_ref[...]
    x = tout[1:1 + m].astype(dt)  # (m, C)

    def hyper_layer(x, wst, b, relu):
        xbd = dot(x, ecol).astype(dt) * maskm  # (m, m*C)
        y = dot(xbd, wst).astype(dt) + b
        return jnp.maximum(y, 0) if relu else y

    x = hyper_layer(x, w["hyper_w1"], w["hyper_b1"], True)
    x = hyper_layer(x, w["hyper_w2"], w["hyper_b2"], True)
    hyper = hyper_layer(x, w["hyper_w3"], w["hyper_b3"], False)  # (m, c8)

    # ---- upscale + mask contraction ----
    y1 = dot(keys2, w["up_w1f"]).astype(dt) + w["up_b1t"]
    y1 = _ln2d_grouped(y1, msum_ref[...], w["up_lnwt"].astype(f32),
                       w["up_lnbt"].astype(f32), c4)
    y1 = jax.nn.gelu(y1.astype(dt), approximate=approx)
    y2 = dot(y1, w["up_w2bd"]).astype(dt) + w["up_b2t"]
    y2 = jax.nn.gelu(y2, approximate=approx)
    ht = (dot(dot(arow_ref[...], hyper.T).astype(dt),
              espread_ref[...]).astype(dt) * gmask_ref[...])
    o_mask_ref[0] = dot(y2, ht)


def _prep_weights(W, dt):
    """Flatten the weight pytree into kernel operands (all 2-D, biases and
    LN params as (1, dim) rows)."""
    row = lambda x: x.reshape(1, -1)
    out = {}
    for site in ("i2t0", "self1", "t2i1", "i2t1", "final"):
        s = W[site]
        if site != "i2t0":
            out[f"{site}_wq"] = s["wq"].astype(dt)
            out[f"{site}_bq"] = row(s["bq"]).astype(dt)
            out[f"{site}_wk"] = s["wk"].astype(dt)
            out[f"{site}_bk"] = row(s["bk"]).astype(dt)
            out[f"{site}_wv"] = s["wv"].astype(dt)
            out[f"{site}_bv"] = row(s["bv"]).astype(dt)
        out[f"{site}_wo"] = s["wo"].astype(dt)
        out[f"{site}_bo"] = row(s["bo"]).astype(dt)
    out["mlp1_w1"] = W["mlp1"]["w1"].astype(dt)
    out["mlp1_b1"] = row(W["mlp1"]["b1"]).astype(dt)
    out["mlp1_w2"] = W["mlp1"]["w2"].astype(dt)
    out["mlp1_b2"] = row(W["mlp1"]["b2"]).astype(dt)
    for nm in ("ln40", "ln11", "ln21", "ln31", "ln41", "lnf"):
        out[nm + "_s"] = row(W[nm]["scale"]).astype(jnp.float32)
        out[nm + "_b"] = row(W[nm]["bias"]).astype(jnp.float32)
    m, c, _ = W["hyper_w1"].shape
    c8 = W["hyper_w3"].shape[2]
    out["hyper_w1"] = W["hyper_w1"].reshape(m * c, -1).astype(dt)
    out["hyper_b1"] = W["hyper_b1"].astype(dt)
    out["hyper_w2"] = W["hyper_w2"].reshape(m * c, -1).astype(dt)
    out["hyper_b2"] = W["hyper_b2"].astype(dt)
    out["hyper_w3"] = W["hyper_w3"].reshape(m * c, -1).astype(dt)
    out["hyper_b3"] = W["hyper_b3"].astype(dt)
    c4 = W["up_k1"].shape[2]
    out["up_w1f"] = _flat_w1(W["up_k1"]).astype(dt)
    out["up_b1t"] = row(jnp.tile(W["up_b1"], 4)).astype(dt)
    out["up_lnwt"] = row(jnp.tile(W["up_lnw"], 4)).astype(jnp.float32)
    out["up_lnbt"] = row(jnp.tile(W["up_lnb"], 4)).astype(jnp.float32)
    out["up_w2bd"] = _blockdiag_w2(W["up_k2"]).astype(dt)
    out["up_b2t"] = row(jnp.tile(W["up_b2"], 16)).astype(dt)
    return out


def _decode_tail_forward(t, tpe, keys0, key_pe, W, n_heads, t_valid):
    dt = keys0.dtype
    b, tp, c = t.shape
    n = keys0.shape[1]
    h = n_heads
    internal = W["i2t0"]["wo"].shape[0]
    d_i = internal // h
    d_c = c // h
    m = W["hyper_w1"].shape[0]
    c4 = W["up_k1"].shape[2]
    c8 = W["up_k2"].shape[2]
    cst = _chunk_consts(h, tp, internal, c, t_valid, m, c8)
    f32 = jnp.float32

    # shared (batch-1) precomputes — XLA, once per chunk
    w0 = W["i2t0"]
    cast = lambda x: x.astype(dt)
    qp0 = (keys0[0] @ cast(w0["wq"]) + key_pe[0] @ cast(w0["wq"])
           + cast(w0["bq"]))                                      # (N, I)
    pewq1 = key_pe[0] @ cast(W["i2t1"]["wq"])                     # (N, I)
    pewk1 = key_pe[0] @ cast(W["t2i1"]["wk"])
    pewkf = key_pe[0] @ cast(W["final"]["wk"])
    # per-prompt token-side k/v of i2t0 (tiny)
    sel = jnp.asarray(cst["sel"], dt)
    hmi = jnp.asarray(cst["headmask_i"], dt)
    kbd0 = jnp.einsum(
        "rt,btd->brd", sel,
        cast(t @ w0["wk"] + tpe @ w0["wk"] + w0["bk"])) * hmi
    vbd0 = jnp.einsum("rt,btd->brd", sel, cast(t @ w0["wv"] + w0["bv"])) * hmi

    wk = _prep_weights(W, dt)
    wkeys = sorted(wk)
    msum = jnp.asarray(_group_sum_matrix(4 * c4, c4))

    const2 = lambda shp: pl.BlockSpec(shp, lambda bb: (0, 0))
    pspec = lambda shp: pl.BlockSpec((1, *shp), lambda bb: (bb, 0, 0))

    consts = [jnp.asarray(cst["sel"], dt), jnp.asarray(cst["headmask_i"], dt),
              jnp.asarray(cst["headmask_c"], dt),
              jnp.asarray(cst["G"], f32), jnp.asarray(cst["smask"], f32),
              jnp.asarray(cst["ecol"], dt), jnp.asarray(cst["mask_m"], dt),
              jnp.asarray(cst["arow"], dt), jnp.asarray(cst["espread"], dt),
              jnp.asarray(cst["gmask"], dt), msum]

    def kernel(*refs):
        (t_ref, tpe_ref, k0_ref, qp0_ref, pq1_ref, pk1_ref, pkf_ref,
         kbd0_ref, vbd0_ref, sel_ref, hmi_ref, hmc_ref, g_ref, smask_ref,
         ecol_ref, maskm_ref, arow_ref, espr_ref, gmask_ref, msum_ref,
         *rest) = refs
        w_refs = dict(zip(wkeys, rest[:len(wkeys)]))
        o_tok_ref, o_mask_ref = rest[len(wkeys):]
        _chunk_kernel(
            t_ref, tpe_ref, k0_ref, qp0_ref, pq1_ref, pk1_ref, pkf_ref,
            kbd0_ref, vbd0_ref, sel_ref, hmi_ref, hmc_ref, g_ref, smask_ref,
            ecol_ref, maskm_ref, arow_ref, espr_ref, gmask_ref, msum_ref,
            w_refs, o_tok_ref, o_mask_ref,
            h=h, internal=internal, scale_i=d_i ** -0.5, scale_c=d_c ** -0.5,
            c4=c4, c8=c8, m=m, approx=(dt == jnp.bfloat16),
        )

    in_specs = (
        [pspec((tp, c)), pspec((tp, c)), const2((n, c)), const2((n, internal)),
         const2((n, internal)), const2((n, internal)), const2((n, internal)),
         pspec((h * tp, internal)), pspec((h * tp, internal))]
        + [const2(x.shape) for x in consts]
        + [const2(wk[k].shape) for k in wkeys]
    )
    tok_out, masks = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[pspec((tp, c)), pspec((n, m * 16))],
        out_shape=[jax.ShapeDtypeStruct((b, tp, c), dt),
                   jax.ShapeDtypeStruct((b, n, m * 16), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The whole-tail working set (keys row + keys1/keys2 + y1/y2 +
            # weights) is ~20-25 MB — over the 16 MB default scoped-vmem
            # stack, comfortably inside v5e's 128 MB VMEM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(t, tpe, keys0[0], qp0, pewq1, pewk1, pewkf, kbd0, vbd0,
      *consts, *[wk[k] for k in wkeys])
    return tok_out, masks


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def decode_tail(t, tpe, keys0, key_pe, W, n_heads, t_valid):
    """Fused whole-chunk decode tail (see module docstring).

    Returns (tokens_out (B, Tp, C), masks_flat (B, N, m*16) fp32, cols
    ordered (di, dj, ei, ej, t)). keys2 is NOT materialized (that is the
    point); callers needing upscaled_embedding use the per-op kernel path.
    """
    tok, masks = _decode_tail_forward(t, tpe, keys0, key_pe, W, n_heads,
                                      t_valid)
    return tok, masks


def _dt_fwd(t, tpe, keys0, key_pe, W, n_heads, t_valid):
    out = _decode_tail_forward(t, tpe, keys0, key_pe, W, n_heads, t_valid)
    return out, (t, tpe, keys0, key_pe, W)


def _dt_bwd(n_heads, t_valid, res, g):
    t, tpe, keys0, key_pe, W = res
    _, vjp = jax.vjp(
        lambda *a: decode_tail_xla(*a, n_heads=n_heads, t_valid=t_valid)[:2],
        t, tpe, keys0, key_pe, W,
    )
    return vjp(g)


decode_tail.defvjp(_dt_fwd, _dt_bwd)


def unflatten_masks_ge(flat: jax.Array, h: int, w: int, m: int) -> jax.Array:
    """(B, H*W, 16*m) cols (di, dj, ei, ej, t) -> (B, m, 4H, 4W)."""
    b = flat.shape[0]
    x = flat.reshape(b, h, w, 2, 2, 2, 2, m)
    x = x.transpose(0, 7, 1, 3, 5, 2, 4, 6)
    return x.reshape(b, m, 4 * h, 4 * w)
