"""vita_tpu — a TPU-native omni-multimodal LLM framework.

From-scratch JAX/XLA/Pallas re-design with the capabilities of
VITA-MLLM/VITA: Mixtral-8x7B MoE backbone, InternViT vision tower, Whale
streaming audio encoder, LLaVA-style embedding fusion, state-token
interaction (<1>/<2>/<3>), and duplex (generate/monitor) serving.

One model stack shared by train and serve; one 4-axis device mesh
(data, fsdp, expert, model) for all parallelism.
"""

__version__ = "0.1.0"
