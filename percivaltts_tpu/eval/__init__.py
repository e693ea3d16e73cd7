from percivaltts_tpu.eval.measures import (  # noqa: F401
    f0_rmse,
    f0_rmse_cents,
    log_spec_to_cepstra,
    mcd,
    vuv_error,
)
