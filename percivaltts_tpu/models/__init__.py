from percivaltts_tpu.models.generators import (  # noqa: F401
    BLSTMGenerator,
    CNNGenerator,
    FCGenerator,
    build_generator,
)
from percivaltts_tpu.models.critic import Critic  # noqa: F401
from percivaltts_tpu.models.base import (  # noqa: F401
    count_params,
    predict_batch,
    predict_utterance,
)
