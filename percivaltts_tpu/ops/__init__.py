from percivaltts_tpu.ops.stft import (  # noqa: F401
    frame_signal,
    hann_window,
    istft,
    overlap_add,
    stft,
)
from percivaltts_tpu.ops.warp import mel_weights, unwarp_matrix, warp_matrix  # noqa: F401
from percivaltts_tpu.ops.f0 import estimate_f0  # noqa: F401
from percivaltts_tpu.ops.envelope import spectral_envelope  # noqa: F401
