"""llm_qat_tpu — TPU-native Quantization-Aware Training framework for GPT-2.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of the
reference repo `Laurence-Wu/LLM-QAT-on-gpt2` (see SURVEY.md):

- switchable-precision (SP) QAT with per-bit LoRA adapters and per-precision
  LayerNorm banks (reference: part1_switchable_precision/)
- cyclic precision training (CPT) with shared LoRA, multi-bit quantizers and
  gradient quantization (reference: part2_cyclic_precision_training/)
- evaluation harness: sliding-window perplexity, zero-shot suite, SQuAD EM/F1
  (reference: part3_eval_sp/, part3_eval_cpt/, part5_squad/)
- random precision inference as adversarial defense
  (reference: part4_randomSwitching/)

Unlike the single-GPU PyTorch reference, precision here is a *traced index*
into stacked HBM-resident parameter banks (scales, LoRA A/B, LayerNorm
gamma/beta), so switching bit-widths never triggers recompilation; the hot
quantized matmul path has fused Pallas kernels; decode uses a KV cache inside
`lax.scan`; and everything shards over a `jax.sharding.Mesh` via pjit.
"""

__version__ = "0.1.0"
