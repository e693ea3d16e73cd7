from percivaltts_tpu.utils.logging import MetricsLogger, print_log  # noqa: F401
from percivaltts_tpu.utils.fileio import (  # noqa: F401
    load_binary_file,
    save_binary_file,
)
