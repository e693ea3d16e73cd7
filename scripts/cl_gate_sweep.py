"""Re-sweep the closed-loop boundary damping profile.

The damping profile (AnalysisParams.cl_near_alpha / cl_near_clamp /
cl_boundary_radius) was tuned before the session-2 fixes (f0 sub-period
trough rescue, analysis-consistent feature padding, cl_full_alpha=1.1)
reshaped the boundary error, so the damping optimum may have moved. This
runs ONE configuration per process (the AnalysisParams is a static jit
argument of the closed-loop core — one trace per configuration) and
prints a single summary line; drive a sweep with a shell loop:

  for na in 0.35 0.5 0.65 0.8; do
    PYTHONPATH=.:$PYTHONPATH CL_NA=$na python scripts/cl_gate_sweep.py 8 1234
  done

Env knobs: CL_NA (near alpha), CL_NC (near clamp), CL_BR (boundary
radius), CL_FA (full/interior alpha), CL_FZ (it-2 freeze fraction),
CL_NA_HI (near alpha above the voicing-read bands), CL_NM_A (nm
pre-compensation gain).
"""

import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import AnalysisParams, VocoderConfig  # noqa: E402
from percivaltts_tpu.data.compose import load_wav  # noqa: E402
from percivaltts_tpu.data.demo import generate_demo_corpus  # noqa: E402
from percivaltts_tpu.eval.measures import per_frame_mcd_np  # noqa: E402
from percivaltts_tpu.vocoders import get_vocoder  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from boundary_diag import boundary_distance  # noqa: E402

_D = AnalysisParams()
AP = AnalysisParams(
    cl_near_alpha=float(os.environ.get("CL_NA", _D.cl_near_alpha)),
    cl_near_clamp=float(os.environ.get("CL_NC", _D.cl_near_clamp)),
    cl_boundary_radius=int(os.environ.get("CL_BR", _D.cl_boundary_radius)),
    cl_full_alpha=float(os.environ.get("CL_FA", _D.cl_full_alpha)),
    cl_it2_freeze_frac=float(os.environ.get("CL_FZ", _D.cl_it2_freeze_frac)),
    cl_near_alpha_hi=float(os.environ.get("CL_NA_HI", _D.cl_near_alpha_hi)),
    cl_nm_alpha=float(os.environ.get("CL_NM_A", _D.cl_nm_alpha)),
)


def main(n_utts: int = 8, seed: int = 1234):
    cfg = VocoderConfig(
        kind="pml",
        fs=16000,
        spec_size=65,
        nm_size=33,
        closed_loop=int(os.environ.get("CL_ITERS", "1")),
        analysis=AP,
    )
    voc = get_vocoder(cfg)
    root = os.environ.get("BDIAG_ROOT", f"/tmp/bdiag_{n_utts}_{seed}")
    if os.path.isdir(os.path.join(root, "wav")):
        with open(os.path.join(root, "fileids.scp")) as f:
            ids = [l.strip() for l in f if l.strip()]
    else:
        ids = generate_demo_corpus(root, num_utterances=n_utts, fs=cfg.fs, seed=seed)

    pf_all, d_all, flip_all = [], [], []
    for uid in ids[:n_utts]:
        _, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
        f1 = voc.analyze(wav)
        y = voc.synthesize(f1, seed=0)
        f2 = voc.analyze(y)
        n = min(len(f1), len(f2))
        pf_all.append(per_frame_mcd_np(voc.cepstra(f1[:n]), voc.cepstra(f2[:n])))
        _, v1 = voc.f0_vuv(f1[:n])
        _, v2 = voc.f0_vuv(f2[:n])
        d_all.append(boundary_distance(v1))
        flip_all.append(v1 != v2)

    pf = np.concatenate(pf_all)
    d = np.concatenate(d_all)
    flip = np.concatenate(flip_all)
    ok = ~flip
    near = ok & (d <= 3)
    far = ok & (d >= 10)
    print(
        f"NA={AP.cl_near_alpha}/{AP.cl_near_alpha_hi} NC={AP.cl_near_clamp} "
        f"BR={AP.cl_boundary_radius} FA={AP.cl_full_alpha} "
        f"FZ={AP.cl_it2_freeze_frac} NMA={AP.cl_nm_alpha} it={cfg.closed_loop} | "
        f"mean={pf.mean():.3f} med={np.median(pf):.3f} "
        f"near03={pf[near].mean():.2f} far={pf[far].mean():.3f} "
        f"flips={flip.mean() * 100:.2f}% (n={len(pf)})"
    )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
