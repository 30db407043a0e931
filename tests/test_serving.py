"""Multi-chip serving layer on the 8-virtual-device CPU mesh: data-parallel
vision serving + tensor-parallel LLM VQA."""

import jax
import jax.numpy as jnp
import numpy as np


def test_serve_seg_data_parallel():
    from tests.test_syslearner import _tiny_model
    from iuvl_tpu.models.xdecoder.model import SysLearner
    from iuvl_tpu.parallel import ServingContext, serve_seg

    model = _tiny_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.ones((5, 32)), method=SysLearner.warmup,
    )
    ctx = ServingContext.create(data=8, model=1)
    imgs = np.random.RandomState(0).rand(8, 64, 64, 3).astype(np.float32) * 255
    cls_, pred = serve_seg(ctx, model, params, imgs, np.ones((5, 32), np.float32))
    assert cls_.shape[0] == 8 and pred.shape[0] == 8
    assert np.isfinite(pred).all()


def test_serve_vqa_tensor_parallel():
    from tests.test_syslearner import _tiny_model
    from iuvl_tpu.data.tokenizer import build_tokenizer
    from iuvl_tpu.models.llm.llama import LlamaConfig, LlamaForCausalLM
    from iuvl_tpu.models.xdecoder.model import SysLearner
    from iuvl_tpu.parallel import ServingContext, serve_vqa

    model = _tiny_model(llm_dim=32, vocab_size=49408)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.ones((5, 32)), method=SysLearner.warmup,
    )
    lcfg = LlamaConfig(
        vocab_size=49408, dim=32, layers=2, heads=4, kv_heads=4, ffn_dim=64,
        max_seq_len=96, dtype="float32",
    )
    llm = LlamaForCausalLM(cfg=lcfg)
    llm_params = llm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 32)), jnp.ones((1, 4), jnp.int32)
    )
    ctx = ServingContext.create(data=2, model=4)
    imgs = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32) * 255
    answers = serve_vqa(
        ctx, model, params, llm, llm_params, build_tokenizer(), imgs,
        ["what is this?", "what color?"], max_new_tokens=2, max_len=80,
    )
    assert len(answers) == 2
    assert all(isinstance(a, str) for a in answers)
