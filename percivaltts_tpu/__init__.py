"""percivaltts_tpu — a TPU-native TTS acoustic-model training framework.

A clean-room, JAX/XLA/Pallas/pjit rebuild of the capabilities of the public
``gillesdegottex/percivaltts`` framework (Keras/TensorFlow era): the HTS
full-context-label → frame-feature data path, PML-style vocoder feature
extraction and synthesis, an FC/CNN/BLSTM generator zoo, a convolutional
critic, and LSE / WGAN-GP trainers — redesigned TPU-first:

* static-shape, bucketed, masked batches under ``jax.jit``
* one fused WGAN-GP step (``lax.fori_loop`` over n_critic critic updates,
  gradient penalty via ``jax.grad`` through the critic, generator update)
* data parallelism via ``jax.sharding.Mesh`` + sharding annotations; XLA
  emits the psum/all-reduce collectives over ICI
* Pallas kernels for the DSP hot loops (framing / overlap-add)

Reference parity map lives in SURVEY.md §2; each module docstring cites the
reference component it re-implements (file-level citations only — the
reference mount was empty during the survey, see SURVEY.md §0).
"""

__version__ = "0.1.0"

from percivaltts_tpu.config import (  # noqa: F401
    Configuration,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderConfig,
)


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax/flax at package import)
    if name == "Trainer":
        from percivaltts_tpu.training import Trainer

        return Trainer
    if name == "Dataset":
        from percivaltts_tpu.data.dataset import Dataset

        return Dataset
    if name == "get_vocoder":
        from percivaltts_tpu.vocoders import get_vocoder

        return get_vocoder
    if name == "compose":
        from percivaltts_tpu.data.compose import compose

        return compose
    if name == "generate":
        from percivaltts_tpu.eval.generate import generate

        return generate
    raise AttributeError(f"module 'percivaltts_tpu' has no attribute {name!r}")
