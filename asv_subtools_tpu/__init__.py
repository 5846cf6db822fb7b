"""asv_subtools_tpu — a TPU-native speaker/language recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ASV-Subtools (Snowdar/asv-subtools): Kaldi-compatible feature extraction,
x-vector model zoo (TDNN/ECAPA/ResNet/Conformer...), margin-softmax training
over device meshes, chunked embedding extraction, and the full statistical
back-end (LDA/PLDA/score normalization/metrics) as batched XLA ops.
"""

__version__ = "0.1.0"
