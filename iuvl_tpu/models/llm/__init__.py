from .llama import LlamaConfig, LlamaForCausalLM, llama_param_shardings  # noqa: F401
from .multimodal import splice_image_features, causal_lm_loss  # noqa: F401
