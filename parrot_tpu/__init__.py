"""parrot-tpu: a TPU-native speech-synthesis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of sotelo/parrot
(the Char2Wav codebase): attention-based seq2seq models mapping
character/phoneme sequences to WORLD vocoder frames, with

- a frame-level LSTM decoder with Graves-style GMM window attention
  (reference: model.py in sotelo/parrot — mount empty at build time,
  reconstructed per SURVEY.md §0/§3.3),
- mixture-density (GMM) and MSE output heads with biased sampling,
- a device-prefetching HDF5 data pipeline with on-device normalization,
- teacher-forced truncated-BPTT training with data-parallel allreduce
  over a `jax.sharding.Mesh`,
- a batched, length-bucketed autoregressive sampler, optionally running
  as a fused Pallas decode kernel,
- a C++ WORLD vocoder (analysis + synthesis) with a jittable JAX
  synthesis reference path.
"""

__version__ = "0.1.0"

from parrot_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    SampleConfig,
    TrainConfig,
    ParrotConfig,
)
