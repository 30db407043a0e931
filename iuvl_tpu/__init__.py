"""iuvl_tpu — TPU-native interactable unified vision-language framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ByungKwanLee/Interactable-Unified-Vision-Language: a SAM image encoder +
prompt-conditioned mask decoder, an X-Decoder-style unified
segmentation/grounding/captioning/retrieval head with a CLIP-style text
encoder, and a LLaVA-style LLM stage — designed TPU-first (static shapes,
NHWC layouts, bf16 matmuls on the MXU, pjit/Mesh sharding, Pallas kernels
for the hot attention ops).

Reference layer map: /root/reference (see SURVEY.md). This package is NOT a
port — architecture parity is documented per-module via ``Reference:``
docstring citations.
"""

__version__ = "0.1.0"
