"""structure_knowledge_distillation_tpu — TPU-native structured knowledge distillation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
irfanICMLL/structure_knowledge_distillation (CVPR'19: "Structured Knowledge
Distillation for Dense Prediction"): a small PSPNet student is distilled from a
large frozen PSPNet teacher on dense-prediction tasks using three structured
signals — pixel-wise KL (Pi), pairwise feature-affinity (Pa), and a holistic
conditional-GAN loss (Ho).

Design stance (TPU-first, not a port):
  * NHWC layout, bfloat16-capable compute, f32 statistics/accumulation.
  * Resizes and adaptive pools are expressed as small dense matmuls (MXU).
  * Cross-replica synchronized batch-norm is a `lax.pmean` (or free under pjit
    global-batch sharding), replacing the reference's CUDA + queue protocol
    (reference: libs/functions.py, libs/src/bn.cu).
  * The whole KD train step (teacher fwd, 4-term G loss, D step with WGAN-GP
    double-grad) compiles to ONE XLA program.
"""

__version__ = "0.1.0"
