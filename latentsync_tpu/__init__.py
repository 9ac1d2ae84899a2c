"""latentsync_tpu — a TPU-native (JAX/XLA/Pallas) lip-sync framework.

Re-implements the full capability surface of the LatentSync v1.5 stack
(audio-conditioned latent-diffusion lip sync + SyncNet supervision +
serving/eval/preprocess tooling) as an idiomatic JAX framework:

- compute path: jitted XLA graphs, Pallas kernels for hot ops,
  channels-last layouts, bf16 on the MXU
- parallelism: jax.sharding.Mesh + pjit/shard_map (data/model axes)
- runtime: host-side media pipeline (ffmpeg), Orbax checkpoints,
  torch-checkpoint weight converters

Reference behavior citations use `ref:` prefixes and point into the
upstream repo snapshot (e.g. ``ref:latentsync/pipelines/lipsync_pipeline.py:361``).
"""

__version__ = "0.1.0"
