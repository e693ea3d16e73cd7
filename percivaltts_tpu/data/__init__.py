from percivaltts_tpu.data.hts_labels import (  # noqa: F401
    LabelEntry,
    QuestionSet,
    binarize_labels,
    parse_label_file,
)
from percivaltts_tpu.data.normalize import (  # noqa: F401
    NormStats,
    compute_meanstd,
    compute_minmax,
)
from percivaltts_tpu.data.dataset import Dataset, split_fileids  # noqa: F401
