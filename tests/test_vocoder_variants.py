import os

import numpy as np
import pytest

from percivaltts_tpu.config import VocoderConfig
from percivaltts_tpu.eval import mcd
from percivaltts_tpu.vocoders import get_vocoder

FS = 16000


def _voiced_signal(f0=140.0, dur=0.5, fs=FS, seed=0):
    t = np.arange(int(dur * fs)) / fs
    x = np.zeros_like(t)
    rng = np.random.default_rng(seed)
    for k in range(1, int(fs / 2 / f0)):
        fk = k * f0
        x += 1.0 / (1.0 + (fk / 800.0) ** 2) * np.sin(
            2 * np.pi * fk * t + rng.uniform(0, 2 * np.pi)
        )
    x += 0.01 * rng.normal(size=len(t))
    return (x / np.abs(x).max() * 0.7).astype(np.float32)


def test_world_schema_and_roundtrip():
    cfg = VocoderConfig(kind="world", fs=FS, spec_size=65, nm_size=17)
    voc = get_vocoder(cfg)
    x = _voiced_signal()
    feats = voc.analyze(x)
    assert feats.shape[1] == cfg.feature_size == 1 + 1 + 65 + 17
    f0, vuv = voc.f0_vuv(feats)
    n = len(f0)
    core = slice(n // 4, 3 * n // 4)
    assert vuv[core].mean() > 0.8
    assert abs(np.median(f0[core]) - 140.0) / 140.0 < 0.03
    y = voc.synthesize(feats)
    assert y.shape == (feats.shape[0] * cfg.shift_samples,)
    assert np.isfinite(y).all()
    # voicing stream gates harmonics: silence frames stay quiet
    feats_uv = feats.copy()
    feats_uv[:, 1] = 0.0  # force unvoiced
    y_uv = voc.synthesize(feats_uv)
    # unvoiced synthesis has no strong harmonic periodicity: spectral flatness up
    assert np.isfinite(y_uv).all()


def test_melspec_analysis_and_griffin_lim():
    cfg = VocoderConfig(kind="melspec", fs=FS, mel_size=48)
    voc = get_vocoder(cfg)
    x = _voiced_signal()
    feats = voc.analyze(x)
    assert feats.shape[1] == 48
    assert np.isfinite(feats).all()
    y = voc.synthesize(feats)
    assert y.shape == (feats.shape[0] * cfg.shift_samples,)
    assert np.isfinite(y).all()
    # Griffin-Lim copy-synthesis: re-analyzed mels close to originals (MCD)
    feats2 = voc.analyze(y)
    n = min(len(feats), len(feats2))
    core = slice(n // 4, 3 * n // 4)
    c1 = voc.cepstra(feats[:n])[core]
    c2 = voc.cepstra(feats2[:n])[core]
    d = float(mcd(c1, c2))
    assert d < 4.5, d  # fast-GL copy-synthesis floor ≈ 3.9 at 5 ms hop
    with pytest.raises(NotImplementedError):
        voc.f0_vuv(feats)


@pytest.mark.slow
def test_melspec_synthesize_batch_matches_single():
    from percivaltts_tpu.config import VocoderConfig
    from percivaltts_tpu.vocoders import get_vocoder

    voc = get_vocoder(VocoderConfig(kind="melspec", mel_size=20, fs=16000))
    rng = np.random.default_rng(3)
    feats = [rng.normal(-6.0, 1.0, size=(n, 20)).astype(np.float32) for n in (40, 90, 130)]
    singles = [voc.synthesize(f) for f in feats]
    batched = voc.synthesize_batch(feats, chunk=2)
    assert len(batched) == len(singles)
    for a, b in zip(batched, singles):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)


@pytest.mark.slow
def test_world_batched_paths_match_single():
    from percivaltts_tpu.config import VocoderConfig
    from percivaltts_tpu.vocoders import get_vocoder

    voc = get_vocoder(VocoderConfig(kind="world", spec_size=17, nm_size=9, fs=16000))
    rng = np.random.default_rng(5)
    t = np.arange(9000) / 16000.0
    wavs = [
        (0.4 * np.sin(2 * np.pi * 150 * t[:n]) + 0.02 * rng.normal(size=n)).astype(np.float32)
        for n in (6000, 9000)
    ]
    singles = [voc.analyze(w) for w in wavs]
    batched = voc.analyze_batch(wavs)
    for a, b in zip(batched, singles):
        np.testing.assert_allclose(a, b, atol=2e-3)
    syn_single = [voc.synthesize(f, seed=2) for f in singles]
    syn_batched = voc.synthesize_batch(singles, seed=2, chunk=2)
    for a, b in zip(syn_batched, syn_single):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)


# ---- per-band aperiodicity oracle (VERDICT round-2 item 5) ----------------
#
# D4C-class behavior check for the shared peak/valley estimator
# (ops.aperiodicity.harmonic_noise_mask, used as WORLD's bap and PML's nm):
# synthetic harmonic+noise mixtures with KNOWN per-band noise fractions.
# Semantics under test: nm(band) = noise power per f0-interval around the
# band center / total power in that interval.

HOP = 80


def _harmonic_noise_mix(f0, amp, psd_fn, dur=1.5, fs=FS, seed=0):
    """All harmonics at amplitude ``amp`` + Gaussian noise with ONE-SIDED
    PSD ``2*psd_fn(f)`` (the rfft-filter synthesis doubles the requested
    density: measured var == 2*N0*fs/2 for a flat request N0 — keep the
    factor explicit so the oracle's ground truth is correct)."""
    rng = np.random.default_rng(seed)
    n = int(dur * fs)
    t = np.arange(n) / fs
    x = np.zeros(n)
    for k in range(1, int(fs / 2 / f0)):
        x += amp * np.cos(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
    w = rng.normal(size=n)
    W = np.fft.rfft(w)
    fr = np.fft.rfftfreq(n, 1 / fs)
    x += np.fft.irfft(W * np.sqrt(np.maximum(psd_fn(fr), 0.0) * fs), n=n)
    return x.astype(np.float32)


def _estimate_nm(x, f0, num_bands=33):
    import jax.numpy as jnp

    from percivaltts_tpu.ops.aperiodicity import harmonic_noise_mask

    nf = len(x) // HOP
    track = jnp.full((nf,), float(f0), jnp.float32)
    nm = np.asarray(harmonic_noise_mask(jnp.asarray(x), track, FS, HOP, num_bands, 60.0))
    return nm[nf // 4 : 3 * nf // 4].mean(axis=0)  # steady-state interior


def _true_frac(N0, f0, amp):
    # one-sided PSD is 2*N0 (see _harmonic_noise_mix); noise per f0-interval
    # = 2*N0*f0; harmonic power = amp^2/2
    return 2.0 * N0 * f0 / (2.0 * N0 * f0 + amp**2 / 2.0)


@pytest.mark.slow
def test_aperiodicity_uniform_mixtures_match_known_fractions():
    """White noise + constant-amplitude harmonics: every interior band must
    read the analytic noise fraction. The estimator is analytically unbiased
    (valley reads the true bin-PSD to <1%: measured 0.1592 vs 0.16, and
    finer FFT padding does not move it), but the per-frame ratio
    v/(v+rho*h) is CONVEX in the fluctuating harmonic term h, so averaging
    frames carries a Jensen bias of up to ~+0.05 at mid fractions — the
    documented deviation from D4C-class accuracy. Gate: |err| < 0.10 at
    every interior band across f0 in {100, 250}, fractions 0.04..0.5."""
    from percivaltts_tpu.ops.warp import _band_centers_hz

    centers = np.asarray(_band_centers_hz(33, FS))
    for f0 in (100.0, 250.0):
        for N0 in (1e-6, 1e-5):
            x = _harmonic_noise_mix(f0, 0.1, lambda f: np.full_like(f, N0), seed=3)
            nm = _estimate_nm(x, f0)
            true = _true_frac(N0, f0, 0.1)
            sel = (centers > f0) & (centers < FS / 2 - 2 * f0)
            err = np.abs(nm[sel] - true)
            assert err.max() < 0.10, (f0, N0, true, nm[sel])


@pytest.mark.slow
def test_aperiodicity_localizes_concentrated_noise():
    """Noise confined to 2-3 kHz must read high ONLY there: bands well
    outside stay < 0.02 while inside bands read the analytic fraction."""
    from percivaltts_tpu.ops.warp import _band_centers_hz

    f0, N0 = 150.0, 2e-5
    x = _harmonic_noise_mix(
        f0, 0.1, lambda f: np.where((f > 2000) & (f < 3000), N0, 0.0), seed=5
    )
    nm = _estimate_nm(x, f0)
    centers = np.asarray(_band_centers_hz(33, FS))
    true_in = _true_frac(N0, f0, 0.1)
    inside = (centers >= 2200) & (centers <= 2800)
    below = (centers >= 300) & (centers <= 1700)
    above = (centers >= 3400) & (centers <= 7000)
    assert abs(nm[inside].mean() - true_in) < 0.1, (nm[inside].mean(), true_in)
    assert nm[below].max() < 0.02, nm[below].max()
    assert nm[above].max() < 0.02, nm[above].max()


def test_aperiodicity_narrow_feature_resolution_limit():
    """A noise feature ~1.2*f0 wide (500-800 Hz at f0=250) on a 65-band
    warped axis, where low bands are narrower than f0. The estimator
    resolves it to the correct harmonic intervals but smears by ~one
    harmonic on each side — the documented deviation from D4C's fixed
    coarse bands (which would average it into a 3 kHz-wide value instead).
    Inside reads high; two harmonics away reads ~0."""
    from percivaltts_tpu.ops.warp import _band_centers_hz

    f0 = 250.0
    x = _harmonic_noise_mix(
        f0, 0.1, lambda f: np.where((f > 500) & (f < 800), 4e-5, 0.0), seed=7
    )
    nm = _estimate_nm(x, f0, num_bands=65)
    centers = np.asarray(_band_centers_hz(65, FS))
    core = (centers >= 550) & (centers <= 750)
    far = ((centers > 0) & (centers <= 250)) | ((centers >= 1250) & (centers <= 2500))
    assert nm[core].mean() > 0.4, nm[core]
    assert nm[far].max() < 0.03, nm[far].max()
    # smear is bounded to one harmonic interval: beyond f0 away it has decayed
    edge = (centers >= 1050) & (centers <= 1200)
    assert nm[edge].max() < 0.1, nm[edge]


@pytest.mark.slow
def test_world_closed_loop_beats_open_loop(tmp_path):
    """WORLD's closed-loop rendering (world_closed_loop_core — same
    operator-bias cancellation as PML's) must improve copy-synthesis.
    Measured on the demo corpus: 12.1/7.9 → 9.2/4.0 dB mean/median."""
    import dataclasses

    from percivaltts_tpu.config import VocoderConfig
    from percivaltts_tpu.data.compose import load_wav
    from percivaltts_tpu.data.demo import generate_demo_corpus
    from percivaltts_tpu.eval.measures import per_frame_mcd_np
    from percivaltts_tpu.vocoders import get_vocoder

    cfg = VocoderConfig(kind="world", fs=FS, spec_size=65, nm_size=17)
    ids = generate_demo_corpus(str(tmp_path), num_utterances=2, fs=FS, seed=77)

    def run(voc):
        pfs = []
        for uid in ids:
            _, wav = load_wav(os.path.join(str(tmp_path), "wav", uid + ".wav"))
            f1 = voc.analyze(wav)
            y = voc.synthesize(f1, seed=0)
            f2 = voc.analyze(y)
            n = min(len(f1), len(f2))
            pfs.append(per_frame_mcd_np(voc.cepstra(f1[:n]), voc.cepstra(f2[:n])))
        return np.concatenate(pfs)

    pf_c = run(get_vocoder(cfg))
    pf_o = run(get_vocoder(dataclasses.replace(cfg, closed_loop=0)))
    assert pf_c.mean() < pf_o.mean() - 0.5, (pf_c.mean(), pf_o.mean())
    assert np.median(pf_c) < np.median(pf_o) - 0.5
    # absolute fidelity gate at measured+15% (this 2-utt corpus measures
    # 3.70 mean / 2.39 median under the round-4 d4c_gd bap default —
    # peak_valley measured 3.93/2.61; 12-utt diag under d4c: 4.17/2.45)
    assert pf_c.mean() < 4.26, pf_c.mean()
    assert np.median(pf_c) < 2.75, np.median(pf_c)


@pytest.mark.slow
def test_psync_reader_conventions():
    """The pitch-synchronous exact-bin reader (AnalysisParams.psync
    alternative — measured better per-reading but worse in the closed loop,
    see the module comment) must keep the production conventions it
    advertises: a pure harmonic of amplitude a reads back a² through the
    4·T0 peak formula, and white noise of per-sample variance σ² reads
    valley ≈ σ², across f0."""
    import jax.numpy as jnp

    from percivaltts_tpu.ops import aperiodicity as ap

    rng = np.random.default_rng(0)
    t = np.arange(FS * 2) / FS
    for f0 in (110.0, 250.0):
        nf = int(len(t) // HOP)
        track = jnp.full((nf,), f0, jnp.float32)
        # pure tone at harmonic 10
        sig = (0.3 * np.cos(2 * np.pi * 10 * f0 * t + 1.1)).astype(np.float32)
        p, v = ap._psync_peaks_valleys(
            jnp.asarray(sig), jnp.clip(track, 60.0, FS / 8), FS, HOP, nf, 30
        )
        a2 = np.asarray(p - v)[6:-6, 9] * ap.ENV_PK * f0 / FS
        np.testing.assert_allclose(a2.mean(), 0.09, rtol=0.03)
        # white noise, sigma^2 = 1
        noise = rng.normal(size=len(t)).astype(np.float32)
        _, vn = ap._psync_peaks_valleys(
            jnp.asarray(noise), jnp.clip(track, 60.0, FS / 8), FS, HOP, nf, 30
        )
        kmax = int(FS / 2 / f0) - 2
        mean = float(np.asarray(vn)[6:-6, 1:kmax].mean())
        assert 0.9 < mean < 1.12, (f0, mean)


@pytest.mark.slow
def test_ps_reflect_conventions():
    """Boundary-side reflection (AnalysisParams.ps_reflect — measured a
    wash on tuned seeds and a slight held-out regression, kept False; see
    the ops.aperiodicity comment) pins its contract: a no-op when the vuv
    track has no flips, and with a flip it perturbs ONLY frames whose
    4-period span reaches the transition, leaving far frames bit-identical.
    Enabling it without a vuv track raises (partial application would be
    silent otherwise)."""
    import jax.numpy as jnp
    import pytest

    from percivaltts_tpu.config import AnalysisParams
    from percivaltts_tpu.ops import aperiodicity as ap

    refl = AnalysisParams(ps_reflect=True)

    rng = np.random.default_rng(1)
    f0 = 140.0
    t = np.arange(FS, dtype=np.float32) / FS
    sig = (
        0.3 * np.cos(2 * np.pi * f0 * t)
        + 0.1 * np.cos(2 * np.pi * 3 * f0 * t + 0.7)
        + 0.05 * rng.normal(size=len(t)).astype(np.float32)
    ).astype(np.float32)
    nf = len(t) // HOP
    track = jnp.full((nf,), f0, jnp.float32)
    # constant vuv: no flips -> exact no-op vs the unreflected reader
    p_ref, v_ref = ap._psync_peaks_valleys(
        jnp.asarray(sig), track, FS, HOP, nf, 20, vuv=jnp.ones((nf,)), ap=refl
    )
    p0, v0 = ap._psync_peaks_valleys(
        jnp.asarray(sig), track, FS, HOP, nf, 20
    )
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p0))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v0))
    # one flip mid-signal: frames >4 periods away are untouched, the
    # perturbed frames stay finite
    vuv = jnp.asarray(np.r_[np.ones(nf // 2), np.zeros(nf - nf // 2)])
    p1, v1 = ap._psync_peaks_valleys(
        jnp.asarray(sig), track, FS, HOP, nf, 20, vuv=vuv, ap=refl
    )
    span_frames = int(np.ceil(refl.ps_periods * FS / f0 / 2 / HOP)) + 1
    far = np.r_[
        np.arange(0, nf // 2 - span_frames),
        np.arange(nf // 2 + span_frames, nf),
    ]
    np.testing.assert_array_equal(np.asarray(p1)[far], np.asarray(p0)[far])
    np.testing.assert_array_equal(np.asarray(v1)[far], np.asarray(v0)[far])
    assert np.isfinite(np.asarray(p1)).all()
    assert np.isfinite(np.asarray(v1)).all()
    near = np.arange(max(nf // 2 - 2, 0), min(nf // 2 + 2, nf))
    assert not np.array_equal(np.asarray(p1)[near], np.asarray(p0)[near])
    # ps_reflect without vuv must raise, not silently skip the reflection
    with pytest.raises(ValueError, match="ps_reflect"):
        ap._psync_peaks_valleys(
            jnp.asarray(sig), track, FS, HOP, nf, 20, ap=refl
        )


def test_world_clean_vuv_borderline_track():
    """clean_vuv (VERDICT round-3 item 3): WORLD's predicted-voicing
    cleanup. Contract: (a) EXACT no-op on binary analysis tracks — the
    copy-synthesis path must be untouched; (b) a soft prediction dithering
    around the 0.5 threshold stops flipping; (c) genuine transitions
    survive with at most ~a frame of displacement; (d) no LATCHING — an
    all-uncertain prediction keeps its thresholded voiced fraction instead
    of collapsing to one class (the hysteresis failure mode, measured on
    the 1-epoch e2e run); (e) batched (B, T) form matches per-row."""
    from percivaltts_tpu.vocoders.world import clean_vuv

    rng = np.random.default_rng(5)
    # (a) binary analysis track, incl. a 1-frame voicing island — bit-exact
    b = (rng.random(300) > 0.5).astype(np.float32)
    b[100:120] = 1.0
    b[150] = 1.0
    b[151:160] = 0.0
    np.testing.assert_array_equal(clean_vuv(b), b)

    # (b) borderline dither: 0.45/0.55 alternation must not flip at all
    d = np.where(np.arange(200) % 2 == 0, 0.45, 0.55).astype(np.float32)
    cleaned = clean_vuv(d)
    assert np.all(cleaned == cleaned[0]), "dither around 0.5 still flips"

    # (c) a genuine soft transition: unvoiced ~0.1, voiced ~0.9, one ramp
    v = np.concatenate(
        [
            np.full(80, 0.1),
            np.linspace(0.1, 0.9, 5),
            np.full(80, 0.9),
        ]
    ).astype(np.float32) + rng.normal(0, 0.02, 165).astype(np.float32)
    cv = clean_vuv(v)
    assert np.all(cv[:78] == 0.0)
    assert np.all(cv[88:] == 1.0)
    assert np.all(np.diff(cv) >= 0)  # exactly one clean up-transition

    # noisy borderline prediction: raw thresholding flips constantly,
    # cleaned flips ~once per true transition region
    noisy = np.where(np.arange(400) < 200, 0.42, 0.58).astype(
        np.float32
    ) + rng.normal(0, 0.06, 400).astype(np.float32)
    raw_flips = int(np.sum(np.diff(noisy > 0.5) != 0))
    cl_flips = int(np.sum(np.diff(clean_vuv(noisy)) != 0))
    assert raw_flips > 20  # the failure mode exists in the fixture
    assert cl_flips <= 5, (raw_flips, cl_flips)

    # (d) no latching: slow sinusoid entirely inside (0.4, 0.6) — the
    # voiced fraction must stay near the thresholded one, not collapse
    t = np.arange(600)
    soft = (0.5 + 0.08 * np.sin(2 * np.pi * t / 120)).astype(np.float32)
    cs = clean_vuv(soft)
    frac = float(cs.mean())
    assert 0.3 < frac < 0.7, frac

    # (e) batched form
    stack = np.stack([b, np.pad(d, (0, 100), constant_values=0.0)])
    np.testing.assert_array_equal(clean_vuv(stack)[0], clean_vuv(b))


@pytest.mark.slow
def test_ps_shift_conventions():
    """Window-shift reader (AnalysisParams.ps_shift — round-4 probe of the
    pitch-event-aligned estimator class; measured a regression on all
    seeds via the flip channel and kept OFF, see BASELINE.md) pins its
    contract: exact no-op when the vuv track has no flips; with a flip it
    perturbs ONLY frames whose window reaches the transition, far frames
    bit-identical; near-boundary voiced frames of a STATIONARY harmonic
    read ~the same peaks as the centered window (the slide is magnitude-
    transparent on periodic content — unlike the fold, which broke phase);
    enabling without vuv raises."""
    import jax.numpy as jnp
    import pytest

    from percivaltts_tpu.config import AnalysisParams
    from percivaltts_tpu.ops import aperiodicity as ap

    rng = np.random.default_rng(2)
    f0 = 140.0
    t = np.arange(FS, dtype=np.float32) / FS
    sig = sum(
        0.4 / k * np.sin(2 * np.pi * k * f0 * t + 0.3 * k) for k in (1, 2, 3, 4, 5)
    ).astype(np.float32) + 0.01 * rng.normal(size=FS).astype(np.float32)
    nf = len(t) // HOP
    track = jnp.full((nf,), f0, jnp.float32)

    for shift in (
        AnalysisParams(ps_shift=True),
        AnalysisParams(ps_shift=True, ps_shift_snap=True),
    ):
        p0, v0 = ap._psync_peaks_valleys(jnp.asarray(sig), track, FS, HOP, nf, 20)
        p1, v1 = ap._psync_peaks_valleys(
            jnp.asarray(sig), track, FS, HOP, nf, 20,
            vuv=jnp.ones((nf,)), ap=shift,
        )
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))

        vuv = jnp.asarray(np.r_[np.ones(nf // 2), np.zeros(nf - nf // 2)])
        p2, v2 = ap._psync_peaks_valleys(
            jnp.asarray(sig), track, FS, HOP, nf, 20, vuv=vuv, ap=shift
        )
        span_frames = int(np.ceil(shift.ps_periods * FS / f0 / 2 / HOP)) + 2
        far = np.r_[
            np.arange(0, nf // 2 - span_frames),
            np.arange(nf // 2 + span_frames, nf),
        ]
        np.testing.assert_array_equal(np.asarray(p2)[far], np.asarray(p0)[far])
        np.testing.assert_array_equal(np.asarray(v2)[far], np.asarray(v0)[far])
        assert np.isfinite(np.asarray(p2)).all() and np.isfinite(np.asarray(v2)).all()
        near = np.arange(max(nf // 2 - 2, 0), min(nf // 2 + 2, nf))
        assert not np.array_equal(np.asarray(p2)[near], np.asarray(p0)[near])
        # magnitude transparency on stationary content: shifted voiced-side
        # peaks within 5% (log) of the centered reading
        nearv = np.arange(nf // 2 - 4, nf // 2)
        dev = np.abs(
            np.log(np.asarray(p2)[nearv, :5]) - np.log(np.asarray(p0)[nearv, :5])
        )
        assert dev.max() < 0.05, dev.max()

    with pytest.raises(ValueError, match="ps_reflect/ps_shift"):
        ap._psync_peaks_valleys(
            jnp.asarray(sig), track, FS, HOP, nf, 20,
            ap=AnalysisParams(ps_shift=True),
        )

    # nm-only decoupling: harmonic_envelope ignores the shift while
    # harmonic_noise_mask applies it
    nm_only = AnalysisParams(ps_shift=True, ps_shift_nm_only=True)
    vuv = jnp.asarray(np.r_[np.ones(nf // 2), np.zeros(nf - nf // 2)])
    e_base = ap.harmonic_envelope(
        jnp.asarray(sig), track, FS, HOP, 512, 60.0, vuv=vuv
    )
    e_nm = ap.harmonic_envelope(
        jnp.asarray(sig), track, FS, HOP, 512, 60.0, vuv=vuv, ap=nm_only
    )
    np.testing.assert_array_equal(np.asarray(e_base), np.asarray(e_nm))
    m_base = ap.harmonic_noise_mask(
        jnp.asarray(sig), track, FS, HOP, 17, 60.0, vuv=vuv
    )
    m_nm = ap.harmonic_noise_mask(
        jnp.asarray(sig), track, FS, HOP, 17, 60.0, vuv=vuv, ap=nm_only
    )
    assert not np.array_equal(np.asarray(m_base), np.asarray(m_nm))


# --- D4C-family group-delay band aperiodicity (AnalysisParams.bap_method) ---
#
# Oracle tests on known harmonic+noise mixtures for the second, independent
# estimator family (ops/aperiodicity.py::group_delay_aperiodicity — the
# algorithm family of pyworld's D4C, which the reference's VocoderWORLD
# uses for its bap stream [mount empty]). The two families cross-check:
# peak/valley reads per-bin power ratios, group-delay reads the phase
# statistics, so a bug in one cannot hide in the other.


def _estimate_gd(x, f0, num_bands=33):
    import jax.numpy as jnp

    from percivaltts_tpu.ops.aperiodicity import group_delay_aperiodicity

    nf = len(x) // HOP
    track = jnp.full((nf,), float(f0), jnp.float32)
    vuv = jnp.ones((nf,), jnp.float32)
    b = np.asarray(
        group_delay_aperiodicity(jnp.asarray(x), track, FS, HOP, num_bands, 60.0, vuv=vuv)
    )
    return b[nf // 4 : 3 * nf // 4].mean(axis=0)  # steady-state interior


def test_gd_aperiodicity_pure_harmonic_floor():
    """A clean harmonic signal must read ~0 in every band: the group delay
    at energy-bearing bins is the window's constant centroid, so its
    energy-weighted variance sits at the measured GD_FLOOR. Measured
    0.0014/0.0061 at f0 100/250; gated 0.02."""
    for f0 in (100.0, 250.0):
        x = _harmonic_noise_mix(f0, 0.1, lambda f: np.zeros_like(f), seed=1)
        b = _estimate_gd(x, f0)
        assert b.max() < 0.02, (f0, b.max())


@pytest.mark.slow
def test_gd_aperiodicity_uniform_mixtures_match_known_fractions():
    """White noise + constant-amplitude harmonics: interior bands must read
    the analytic noise fraction through the inverted mixture law
    (1-(1-r')^(1/GD_MIX_EXP)). Measured max errors 0.007-0.071 for true
    fractions 0.04-0.67 (gated 0.10); the saturated regime compresses —
    true 0.833 reads -0.18 low (gated 0.25) — the same coarse-at-high-
    aperiodicity behavior as D4C itself (the harmonic phase reference
    drowns, so the statistic loses contrast near 1)."""
    from percivaltts_tpu.ops.warp import _band_centers_hz

    centers = np.asarray(_band_centers_hz(33, FS))
    for f0 in (100.0, 250.0):
        for N0, tol in ((1e-6, 0.10), (1e-5, 0.10), (5e-5, 0.25)):
            x = _harmonic_noise_mix(f0, 0.1, lambda f: np.full_like(f, N0), seed=3)
            b = _estimate_gd(x, f0)
            true = _true_frac(N0, f0, 0.1)
            # interior: above the lowest coarse band's edge effects, below
            # the top band
            sel = (centers > f0 + 500) & (centers < FS / 2 - 2 * f0)
            err = np.abs(b[sel] - true)
            assert err.max() < tol, (f0, N0, true, b[sel])


@pytest.mark.slow
def test_gd_aperiodicity_coarse_band_localization():
    """Noise confined to 2-3 kHz: the statistic needs many bins to converge,
    so it reports COARSE (GD_BAND_HZ-wide) bands by design — the noise
    feature dilutes into its 2 kHz host band (reads ~0.28 for a half-band
    feature whose band-averaged true fraction is ~0.38) instead of
    resolving to harmonic intervals like the peak/valley reader
    (test_aperiodicity_localizes_concentrated_noise). Bands away from the
    feature must still read ~0."""
    from percivaltts_tpu.ops.warp import _band_centers_hz

    f0, N0 = 150.0, 2e-5
    x = _harmonic_noise_mix(
        f0, 0.1, lambda f: np.where((f > 2000) & (f < 3000), N0, 0.0), seed=5
    )
    b = _estimate_gd(x, f0)
    centers = np.asarray(_band_centers_hz(33, FS))
    inside = (centers >= 2200) & (centers <= 2800)
    below = (centers >= 200) & (centers <= 1000)
    above = (centers >= 5500) & (centers <= 7500)
    assert b[inside].mean() > 0.20, b[inside].mean()
    assert b[below].max() < 0.05, b[below].max()
    assert b[above].max() < 0.05, b[above].max()
    assert b[inside].mean() > 4 * max(b[below].max(), b[above].max())


def test_world_bap_method_d4c_gd():
    """AnalysisParams.bap_method='d4c_gd' swaps WORLD's bap stream to the
    group-delay estimator: schema unchanged, finite, unvoiced frames read
    1.0, the stream genuinely differs from the peak/valley default, and an
    unknown method name raises."""
    import dataclasses

    from percivaltts_tpu.config import AnalysisParams, VocoderConfig

    x = _voiced_signal()
    base = VocoderConfig(kind="world", fs=FS, spec_size=65, nm_size=17)
    # both arms explicit (the DEFAULT is d4c_gd since the round-4 flip)
    cfg_pv = dataclasses.replace(
        base, analysis=dataclasses.replace(base.analysis, bap_method="peak_valley")
    )
    cfg_gd = dataclasses.replace(
        base, analysis=dataclasses.replace(base.analysis, bap_method="d4c_gd")
    )
    f_pv = get_vocoder(cfg_pv).analyze(x)
    f_gd = get_vocoder(cfg_gd).analyze(x)
    assert f_gd.shape == f_pv.shape
    assert np.isfinite(f_gd).all()
    sl = slice(2 + 65, 2 + 65 + 17)  # bap stream
    vuv = f_gd[:, 1] > 0.5
    assert np.allclose(f_gd[~vuv, sl], 1.0)
    assert not np.allclose(f_gd[vuv, sl], f_pv[vuv, sl])
    # non-bap streams are untouched by the bap_method switch
    np.testing.assert_allclose(f_gd[:, : 2 + 65], f_pv[:, : 2 + 65], atol=1e-6)

    cfg_bad = dataclasses.replace(
        cfg_pv, analysis=dataclasses.replace(cfg_pv.analysis, bap_method="nope")
    )
    with pytest.raises(ValueError, match="bap_method"):
        get_vocoder(cfg_bad).analyze(x)


def test_world_vuv_rule_bap():
    """VocoderConfig.vuv_rule="bap" (VERDICT round-3 item 3, the
    nm-derived voicing option mirroring PML's rule): on a SOFT predicted
    track whose vuv stream crosses 0.5 early (the measured offset-early
    hedging), the bap rule places the voicing boundary where the bap
    stream says; binary analysis tracks pass through bit-exactly under
    either rule; an unknown rule raises."""
    import dataclasses

    from percivaltts_tpu.config import VocoderConfig
    from percivaltts_tpu.vocoders import get_vocoder

    S, NM = 9, 5
    cfg = VocoderConfig(kind="world", fs=FS, spec_size=S, nm_size=NM)
    cfg_bap = dataclasses.replace(cfg, vuv_rule="bap")
    voc_stream, voc_bap = get_vocoder(cfg), get_vocoder(cfg_bap)

    # synthetic predicted features, 100 frames: truly voiced 20..60, with
    # the soft vuv stream releasing 4 frames EARLY (0.5 crossing at 56)
    # while the low bap bands carry the true release (cross 0.75 at 60)
    T = 100
    feats = np.zeros((T, 2 + S + NM), np.float32)
    feats[:, 0] = np.log(140.0)
    feats[:, 1] = 0.1
    feats[20:56, 1] = 0.9
    feats[56:60, 1] = 0.35  # the hedged early release
    feats[:, 2 : 2 + S] = -8.0
    feats[:, 2 + S :] = 0.95  # noise everywhere...
    feats[20:60, 2 + S : 2 + S + 3] = 0.2  # ...except low bands while voiced

    _, v_stream = voc_stream.f0_vuv(feats)
    _, v_bap = voc_bap.f0_vuv(feats)
    # stream rule ends voicing at the early 0.5 crossing; bap at the truth
    assert np.flatnonzero(v_stream > 0.5).max() == 55
    assert np.flatnonzero(v_bap > 0.5).max() == 59
    assert np.flatnonzero(v_bap > 0.5).min() == 20  # onset unchanged

    # binary analysis track: both rules return the explicit stream exactly
    fb = feats.copy()
    fb[:, 1] = (fb[:, 1] > 0.5).astype(np.float32)
    for voc in (voc_stream, voc_bap):
        _, v = voc.f0_vuv(fb)
        np.testing.assert_array_equal(v, fb[:, 1])

    # batched (B, T, F) gating: a binary row and a soft row in one call
    both = np.stack([fb, feats])
    _, vb = voc_bap.f0_vuv(both)
    np.testing.assert_array_equal(vb[0], fb[:, 1])
    assert np.flatnonzero(vb[1] > 0.5).max() == 59

    cfg_bad = dataclasses.replace(cfg, vuv_rule="nope")
    with pytest.raises(ValueError, match="vuv_rule"):
        get_vocoder(cfg_bad).f0_vuv(feats)
