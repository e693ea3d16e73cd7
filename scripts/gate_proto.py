"""Offline prototype of the harmonic-gate position estimator.

Loads demo utterances, computes feats1, and for each voicing edge prints
the true attack/release position (from the waveform's low-band RMS ramp)
against candidate estimators reading only feats1 — the quantity the
synthesis core can use. Run: PYTHONPATH=.:$PYTHONPATH python scripts/gate_proto.py
"""

import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.data.compose import load_wav
from percivaltts_tpu.data.demo import generate_demo_corpus
from percivaltts_tpu.vocoders import get_vocoder

CFG = VocoderConfig(kind="pml", fs=16000, spec_size=65, nm_size=33)
HOP = CFG.shift_samples

# ---- window power CDF of the Hann(3·T0) analysis window ------------------- #
_XS = np.linspace(-0.5, 0.5, 513)
_WGT = (0.5 + 0.5 * np.cos(2 * np.pi * _XS)) ** 2
_CDF = np.cumsum(_WGT)
_CDF /= _CDF[-1]


def inv_cdf(q):
    return np.interp(q, _CDF, _XS)


def lowband(x):
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1.0 / CFG.fs)
    X[f > 1500.0] = 0.0
    return np.fft.irfft(X, n=len(x))


def true_pos(wav_lb, e, rising, span=5):
    """Half-power crossing of the smoothed low-band energy around edge e."""
    q = HOP // 4
    ts = np.arange((e - span) * HOP, (e + span) * HOP, q)
    rms = np.array([np.sqrt(np.mean(wav_lb[a : a + q] ** 2) + 1e-18) for a in ts])
    p = rms**2
    lo = np.percentile(p, 10)
    hi = np.percentile(p, 90)
    mid = np.sqrt(lo * hi)  # geometric mid in power
    above = p > mid
    # first crossing in the expected direction nearest the edge center
    idx = None
    for i in range(len(p) - 1):
        if rising and not above[i] and above[i + 1]:
            idx = i
        if not rising and above[i] and not above[i + 1]:
            idx = i
    if idx is None:
        return None
    return ts[idx] / HOP + 0.5 * q / HOP


def estimators(E, Ev, f0, t, kappa):
    """Implied edge position from frame t's w-fraction via the window CDF."""
    w = np.clip(np.exp(2.0 * (E[t] - Ev)), 1e-6, 1.0 - 1e-6)
    L = kappa * 3.0 * CFG.fs / f0[t] / HOP  # full window length in frames
    a = inv_cdf(1.0 - w)  # attack offset from window center, in units of L
    return t + a * L


def main(n_utts=4):
    voc = get_vocoder(CFG)
    root = os.environ.get("BDIAG_ROOT", "/tmp/bdiag_12_1234")
    if not os.path.isdir(os.path.join(root, "wav")):
        generate_demo_corpus(root, num_utterances=12, fs=CFG.fs, seed=1234)
    with open(os.path.join(root, "fileids.scp")) as f:
        ids = [l.strip() for l in f if l.strip()][:n_utts]

    errs = {}
    for uid in ids:
        _, wav = load_wav(os.path.join(root, "wav", uid + ".wav"))
        f1 = voc.analyze(wav)
        f0a, va = voc.f0_vuv(f1)
        sp = voc.stream(f1, "spec")
        E = sp[:, :24].mean(axis=-1)  # warped low bands ~<1500 Hz
        wav_lb = lowband(wav)
        edges = np.flatnonzero(np.diff(va.astype(np.int8)) != 0)
        for e in edges:
            rising = va[e] < 0.5
            tp = true_pos(wav_lb, e, rising)
            if tp is None:
                continue
            # voiced-interior plateau: 4+ frames inside the voiced side
            vt = e + 4 if rising else e - 4
            lo, hi = (e + 3, e + 9) if rising else (e - 9, e - 2)
            seg = E[max(lo, 0) : hi]
            if len(seg) == 0:
                continue
            Ev = np.median(seg)
            # candidate A: linear-w crossing between the two frames around 0.5
            w = np.clip(np.exp(2.0 * (E - Ev)), 0, 1)
            cross = None
            rng = range(e - 3, e + 4)
            for tt in rng:
                if 0 <= tt < len(w) - 1:
                    w0, w1_ = (w[tt], w[tt + 1]) if rising else (w[tt + 1], w[tt])
                    if w0 < 0.5 <= w1_:
                        frac = (0.5 - w0) / max(w1_ - w0, 1e-9)
                        cross = tt + frac if rising else tt + 1 - frac
            # candidate B: CDF-inverted implied position, weighted average
            ps, wts = [], []
            for tt in rng:
                if 0 <= tt < len(w) and 0.03 < w[tt] < 0.97:
                    for kap, key in ((1.0, "B1.0"), (1.15, "B1.15"), (1.3, "B1.3")):
                        p = estimators(E, Ev, f0a, tt, kap)
                        wgt = 1.0 - abs(2.0 * w[tt] - 1.0)
                        ps.append((key, p, wgt))
            out = {"A": cross}
            for key in ("B1.0", "B1.15", "B1.3"):
                sel = [(p, g) for k2, p, g in ps if k2 == key]
                if sel:
                    pp = np.array([p for p, _ in sel])
                    gg = np.array([g for _, g in sel])
                    out[key] = float((pp * gg).sum() / gg.sum())
            kind = "U->V" if rising else "V->U"
            line = f"{uid} {kind} e={e} true={tp:7.2f}"
            for k2, v in out.items():
                if v is not None:
                    line += f"  {k2}={v - tp:+5.2f}"
                    errs.setdefault(k2, []).append(v - tp)
            print(line)
    print("\nsummary (est - true, frames):")
    for k2, v in errs.items():
        v = np.array(v)
        print(
            f"  {k2}: n={len(v)} mean={v.mean():+5.2f} med={np.median(v):+5.2f} "
            f"mad={np.mean(np.abs(v - np.median(v))):.2f}"
        )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
