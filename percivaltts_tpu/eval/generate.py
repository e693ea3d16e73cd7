"""Generation stage: predict → denormalize → synthesize → objective measures.

Reference parity: percivaltts's generation/eval stage (``run.py`` +
``vocoders.py`` objective measures; SURVEY.md §3.4): for each test utterance,
run the generator on the label features, denormalize with the corpus stats,
write predicted feature files and synthesized wavs, and report MCD, F0 RMSE,
and VUV error against the reference features.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from percivaltts_tpu.config import Configuration
from percivaltts_tpu.data.dataset import Dataset
from percivaltts_tpu.data.normalize import NormStats
from percivaltts_tpu.eval.measures import f0_rmse, mcd, vuv_error
from percivaltts_tpu.models.base import predict_utterance
from percivaltts_tpu.training.state import GANState
from percivaltts_tpu.utils.fileio import save_binary_file
from percivaltts_tpu.utils.logging import print_log
from percivaltts_tpu.vocoders import get_vocoder


def generate(
    cfg: Configuration,
    state: GANState,
    dataset: Dataset,
    out_stats: NormStats,
    outdir: Optional[str] = None,
    synthesize: bool = True,
    save_features: bool = False,
) -> Dict[str, float]:
    """Run generation over ``dataset`` (normalized features) and return the
    aggregated objective measures."""
    voc = get_vocoder(cfg.vocoder)
    outdir = outdir or os.path.join(cfg.workdir, "generated")
    os.makedirs(outdir, exist_ok=True)

    mcds, f0rs, vuvs = [], [], []
    for i, uid in enumerate(dataset.ids):
        lab = dataset.labs[i]
        pred_n = predict_utterance(state.gen.apply_fn, state.gen.params, lab)
        pred = out_stats.denormalize(pred_n).astype(np.float32)
        ref = out_stats.denormalize(dataset.cmps[i]).astype(np.float32)

        n = min(pred.shape[0], ref.shape[0])
        mcds.append(float(mcd(voc.cepstra(pred[:n]), voc.cepstra(ref[:n]))))
        try:
            f0p, vp = voc.f0_vuv(pred[:n])
            f0r, vr = voc.f0_vuv(ref[:n])
            f0rs.append(float(f0_rmse(f0p, f0r, vp, vr)))
            vuvs.append(float(vuv_error(vp, vr)))
        except NotImplementedError:
            pass

        if save_features:
            save_binary_file(os.path.join(outdir, uid + ".cmp"), pred)
        if synthesize:
            from percivaltts_tpu.data.compose import save_wav

            wav = voc.synthesize(pred)
            save_wav(os.path.join(outdir, uid + ".wav"), cfg.vocoder.fs, wav)

    measures: Dict[str, float] = {"mcd_db": float(np.mean(mcds))}
    if f0rs:
        measures["f0_rmse_hz"] = float(np.mean(f0rs))
        measures["vuv_error_pct"] = float(np.mean(vuvs))
    print_log(
        "objective measures: "
        + ", ".join(f"{k}={v:.3f}" for k, v in measures.items())
    )
    return measures
