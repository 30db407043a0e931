"""End-to-end VQA generation: tiny SysLearner (with LLM projector) + tiny
LLaMA + offline tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np

from iuvl_tpu.data.tokenizer import build_tokenizer
from iuvl_tpu.models.llm.llama import LlamaConfig, LlamaForCausalLM
from iuvl_tpu.models.llm.vqa_pipeline import answer_questions, build_vqa_prompt


def test_build_vqa_prompt():
    p = build_vqa_prompt("what color is the cat?")
    assert "<image>" in p and "USER" in p and p.rstrip().endswith("ASSISTANT:")


def test_answer_questions_end_to_end():
    import iuvl_tpu.models.sam.build as sb
    from iuvl_tpu.models.xdecoder.model import SysLearner, SysLearnerConfig

    sb.SAM_VARIANTS["tiny_test"] = dict(
        embed_dim=32, depth=2, num_heads=2, global_attn_indexes=(1,)
    )
    cfg = SysLearnerConfig(
        sam_size="tiny_test", img_size=64, syslearner_dim=32, mask_proposals=10,
        contxt_len=7, text_width=32, text_layers=2, text_heads=4,
        vocab_size=49408, pixel_decoder_layers=2, nheads=4, dim_feedforward=64,
        llm_dim=32,
    )
    model = SysLearner(cfg=cfg)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    text_emb = jnp.ones((5, 32), jnp.float32)
    sl_params = model.init(
        jax.random.PRNGKey(0), images, text_emb, method=SysLearner.warmup
    )

    lcfg = LlamaConfig(
        vocab_size=49408, dim=32, layers=2, heads=4, kv_heads=4, ffn_dim=64,
        max_seq_len=128, dtype="float32",
    )
    llm = LlamaForCausalLM(cfg=lcfg)
    llm_params = llm.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 32)), jnp.ones((1, 4), jnp.int32)
    )

    tokenizer = build_tokenizer()
    answers = answer_questions(
        model, sl_params, llm, llm_params, tokenizer,
        jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 255,
                    jnp.float32),
        ["what is in the image?"],
        max_new_tokens=4, max_len=64,
    )
    assert len(answers) == 1
    assert isinstance(answers[0], str)
