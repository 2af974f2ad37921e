"""multimodal_supernovae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multimodal self-supervised learning on supernovae.

A from-scratch rebuild of the capabilities of ThomasHelfer/multimodal-supernovae
(CLIP/SigLIP alignment of light curves, spectra, host-galaxy images and meta
data; supervised redshift regression and SN-type classification; masked
light-curve pretraining; probe-based evaluation) designed TPU-first:

- fixed-shape, HBM-resident batches produced by a one-time ingest/cache layer
  (with a native C++ CSV ingest path) instead of per-batch Python dataloaders;
- all augmentation (noise-from-error, 90-degree image rotation, contiguous
  span masking) as jitted XLA transforms keyed by explicit PRNG;
- flax.linen encoders with a single jitted train step;
- data parallelism over a ``jax.sharding.Mesh`` with contrastive negatives
  all-gathered across chips over ICI, and optional tensor parallelism for the
  feed-forward/projection matmuls;
- optax (RAdam) optimisation, orbax checkpoints with the reference's
  config/split-manifest sidecar contract.

Subpackages:
  config      YAML sweep-format config loading + grid expansion
  data        ingest, transforms, caching, folds, batching, on-device augment
  models      transformer/ConvMixer/MLP encoders, CLIP model, masked pretrainer
  ops         losses, metrics, attention (XLA + Pallas) kernels
  parallel    mesh construction, shardings, collective CLIP loss
  training    train state, optimizers, trainer loop, checkpointing
  evaluation  embedding export, retrieval AUC, linear/KNN probes, reports
  utils       seeding, io, profiling, logging
"""

__version__ = "0.1.0"
