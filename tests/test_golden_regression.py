"""Golden-value drift guard: a fixed-seed tiny SysLearner forward must keep
producing the same statistics across refactors (loose tolerance — guards
against silent semantic changes, not ULP-level compiler drift)."""

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = {
    "cls_mean": 0.3630659580230713,
    "pred_mean": -0.5524876713752747,
    "pred_std": 0.8615142107009888,
}


def test_fixed_seed_forward_statistics():
    import iuvl_tpu.models.sam.build as sb
    from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = SysLearnerConfig(
        sam_size="tiny_test", img_size=64, syslearner_dim=32, mask_proposals=10,
        contxt_len=7, text_width=32, text_layers=2, text_heads=4, vocab_size=64,
        pixel_decoder_layers=2, nheads=4, dim_feedforward=64,
    )
    model = SysLearner(cfg=cfg)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text = jnp.ones((5, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(42), images, text, method=SysLearner.warmup
    )
    img = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3)) * 255
    cls, pred = model.apply(params, img, text, method=SysLearner.evaluate_seg)
    np.testing.assert_allclose(float(cls.mean()), GOLDEN["cls_mean"], rtol=2e-3)
    np.testing.assert_allclose(float(pred.mean()), GOLDEN["pred_mean"], rtol=2e-3)
    np.testing.assert_allclose(float(pred.std()), GOLDEN["pred_std"], rtol=2e-3)
