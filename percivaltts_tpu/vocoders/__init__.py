from percivaltts_tpu.vocoders.base import Vocoder, get_vocoder  # noqa: F401
from percivaltts_tpu.vocoders.pml import PMLVocoder  # noqa: F401
from percivaltts_tpu.vocoders.world import WorldVocoder  # noqa: F401
from percivaltts_tpu.vocoders.melspec import MelSpecVocoder  # noqa: F401
