"""Stage-2 instruction-tuning step: projector-only training through the
frozen tiny LLM."""

import jax
import jax.numpy as jnp
import numpy as np

from iuvl_tpu.models.llm.llama import LlamaConfig, LlamaForCausalLM
from iuvl_tpu.models.llm.multimodal import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from iuvl_tpu.train.llm_step import make_llm_train_step, prepare_llm_batch
from iuvl_tpu.train.optimizer import build_optimizer
from iuvl_tpu.train.train_step import TrainState


def test_llm_train_step_updates_projector_only():
    import iuvl_tpu.models.sam.build as sb
    from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = SysLearnerConfig(
        sam_size="tiny_test", img_size=64, syslearner_dim=32, mask_proposals=10,
        contxt_len=7, text_width=32, text_layers=2, text_heads=4, vocab_size=64,
        pixel_decoder_layers=2, nheads=4, dim_feedforward=64, llm_dim=32,
    )
    model = SysLearner(cfg=cfg)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), images, text_emb, method=SysLearner.warmup
    )

    lcfg = LlamaConfig(vocab_size=64, dim=32, layers=2, heads=4, kv_heads=4,
                       ffn_dim=64, max_seq_len=64, dtype="float32")
    llm = LlamaForCausalLM(cfg=lcfg)
    llm_params = llm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 32)), jnp.ones((1, 4), jnp.int32)
    )

    # Freeze everything except the projector (reference trains the
    # projector + adapters only, load_llm.py freeze + :457 detach).
    tx = build_optimizer(
        params, base_lr=1e-2, total_steps=10,
        frozen_substrings=("image_encoder", "pixel_decoder", "predictor",
                           "lang_encoder", "prompt_encoder", "mask_decoder"),
    )
    step_fn = make_llm_train_step(model, llm, tx, donate=False)
    state = TrainState.create(params, tx)

    ids = [3, 5, IMAGE_TOKEN_INDEX, 7, 9, 11]
    labels = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 9, 11, 2]
    base_embeds, img_start, attn, labs = prepare_llm_batch(
        None, llm, llm_params, [ids], [labels],
        num_image_tokens=10, max_len=32,
    )
    ctx = jnp.zeros((1, 7, 32), jnp.float32)
    new_state, metrics = step_fn(
        state, llm_params, jnp.ones((1, 64, 64, 3)), ctx, base_embeds,
        img_start, attn, labs,
    )
    assert np.isfinite(float(metrics["loss_llm"]))
    # projector changed; backbone unchanged
    old_proj = params["params"]["img_to_lang"]["kernel"]
    new_proj = new_state.params["params"]["img_to_lang"]["kernel"]
    assert not np.allclose(np.asarray(old_proj), np.asarray(new_proj))
    old_enc = jax.tree.leaves(params["params"]["image_encoder"])[0]
    new_enc = jax.tree.leaves(new_state.params["params"]["image_encoder"])[0]
    np.testing.assert_array_equal(np.asarray(old_enc), np.asarray(new_enc))
