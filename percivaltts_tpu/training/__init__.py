from percivaltts_tpu.training.losses import masked_mse, masked_rmse  # noqa: F401
from percivaltts_tpu.training.state import GANState, make_gan_state  # noqa: F401
from percivaltts_tpu.training.lse import lse_step  # noqa: F401
from percivaltts_tpu.training.wgan import wgan_step  # noqa: F401
from percivaltts_tpu.training.loop import Trainer  # noqa: F401
