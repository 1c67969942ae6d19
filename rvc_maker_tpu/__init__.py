"""rvc_maker_tpu — a TPU-native Retrieval-based Voice Conversion framework.

A ground-up JAX/XLA/Pallas implementation of the capabilities of the
RVC-MAKER reference toolkit (VITS-style voice-conversion GANs with
ContentVec/HuBERT features, F0 guidance and an NSF-HiFiGAN decoder,
plus the surrounding train/convert/preprocess/extract/index pipelines).

Design stance (see SURVEY.md §7):
  * functional modules: parameters are pytrees, forward passes are pure
    jittable functions — no stateful nn.Module objects on the compute path
  * activations are laid out (batch, time, channels) so the channel axis
    lands on the TPU lane dimension
  * static shapes everywhere: length bucketing + explicit masks
  * precision ladder: fp32 "parity" mode (allclose vs the torch reference)
    and bf16 fast mode
  * scaling via jax.sharding.Mesh + explicit shardings, not process forking
"""

__version__ = "0.1.0"
