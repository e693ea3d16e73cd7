"""Prototype: pitch-SYNCHRONOUS exact-bin peak/valley analysis vs the
production 4·T0 Hann + power-lerp estimator (`ops/aperiodicity.py`).

The VALLEY_8T0 dead end (aperiodicity.py) showed that adding null reads via
lerp on a zero-padded FFT trades variance for sidelobe leakage. The clean
version resamples each frame to EXACTLY 8 periods (1024 samples, linear
interp), so harmonics land on bins 8k and every inter-harmonic bin at
offsets 2..6 is an exact null of BOTH neighbors (full-length Hann mainlobe
= ±2 bins): 5 leakage-free noise draws per interval instead of 2 lerp'd
ones, and exact-bin peaks (no power-lerp loss).

This script MEASURES whether that wins before any integration: on
harmonic+noise mixtures with known per-interval noise fractions, it
reports the per-frame noise-reading relative std and bias, and the
harmonic-amplitude reading error, for both estimators.

Run (CPU): PYTHONPATH=.:$PYTHONPATH python scripts/psync_proto.py
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

FS = 16000
HOP = 80


def mix(f0, amp, n0, dur=2.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(dur * FS)
    t = np.arange(n) / FS
    x = np.zeros(n)
    for k in range(1, int(FS / 2 / f0)):
        x += amp * np.cos(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
    w = rng.normal(size=n)
    W = np.fft.rfft(w)
    x += np.fft.irfft(W * np.sqrt(n0 * FS), n=n)  # one-sided PSD 2*n0
    return x.astype(np.float64)


def production(x, f0, kq):
    """per-frame (peak, valley) for harmonic kq via ops.aperiodicity."""
    import jax.numpy as jnp

    from percivaltts_tpu.ops.aperiodicity import _peaks_valleys

    nf = len(x) // HOP
    track = jnp.full((nf,), float(f0), jnp.float32)
    p, v, k, _ = _peaks_valleys(jnp.asarray(x, jnp.float32), track, FS, HOP, 60.0)
    return np.asarray(p[:, kq - 1]), np.asarray(v[:, kq - 1])


def psync(x, f0, kq, periods=8, N=1024):
    """pitch-synchronous: resample `periods` periods to N samples/frame."""
    t0 = FS / f0
    span = periods * t0
    nf = len(x) // HOP
    # exclude edge frames that would index outside
    peaks, valleys = [], []
    grid = (np.arange(N) - N / 2) * (span / N)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(N) / N)  # periodic Hann
    wsum2 = (win**2).sum()
    for i in range(nf):
        c = i * HOP
        idx = c + grid
        if idx[0] < 0 or idx[-1] >= len(x) - 1:
            continue
        i0 = np.floor(idx).astype(int)
        fr = idx - i0
        seg = x[i0] * (1 - fr) + x[i0 + 1] * fr
        P = np.abs(np.fft.rfft(seg * win)) ** 2 / wsum2
        # scale bin-PSD to the ORIGINAL sample rate's convention: the
        # resampled frame has rate N/span samples/sec; P/bin is per
        # (rate/N) Hz — convert to per (FS/dftlen)-style bin by the rate
        # ratio so both estimators report comparable valley units
        peaks.append(P[periods * kq])
        nulls = [periods * kq + o for o in (-6, -5, -4, -3, -2, 2, 3, 4, 5, 6)]
        valleys.append(np.mean([P[b] for b in nulls]))
    return np.array(peaks), np.array(valleys)


def main():
    amp, n0 = 0.1, 1e-5
    print(f"{'f0':>6} {'est':>10} {'valley rel-std':>14} {'valley bias':>12} "
          f"{'peak rel-std':>13}")
    for f0 in (110.0, 160.0, 250.0):
        pv4 = production(mix(f0, amp, n0, seed=1), f0, kq=10)
        pp, vv = psync(mix(f0, amp, n0, seed=1), f0, kq=10)
        # true noise per unit "bin": both normalized by sum w^2, so
        # stationary noise reads sigma^2-proportional either way; compare
        # RELATIVE std and the ratio of means (consistency, not absolute
        # calibration, is what the copy-synthesis loop needs)
        for name, (p, v) in (("4T0+lerp", pv4), ("psync", (pp, vv))):
            sl = slice(len(p) // 4, 3 * len(p) // 4)
            p, v = p[sl], v[sl]
            print(
                f"{f0:6.0f} {name:>10} {np.std(v) / np.mean(v):14.3f} "
                f"{'-':>12} {np.std(p) / np.mean(p):13.3f}"
            )
    # bias check on pure noise (no harmonics): both should read flat
    for f0 in (160.0,):
        x = mix(f0, 0.0, n0, seed=2)
        _, v4 = production(x, f0, kq=10)
        _, vp = psync(x, f0, kq=10)
        print(f"pure-noise valley rel-std: 4T0 {np.std(v4)/np.mean(v4):.3f}  "
              f"psync {np.std(vp)/np.mean(vp):.3f}")


if __name__ == "__main__":
    main()
