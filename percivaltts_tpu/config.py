"""Configuration tree for experiments.

Reference parity: percivaltts's ``configuration`` object populated by
``percivaltts/run.py`` (SURVEY.md §2 "Core utils + config", §5 "Config/flag
system"). The reference uses an edit-the-python-file config plus a
``clone.sh`` code-snapshot workflow; here the equivalent reproducibility
property is a frozen dataclass tree that serializes itself to JSON into the
experiment work dir (``Configuration.dump``), plus a small CLI
(``percivaltts_tpu.cli``) with compose / train / generate subcommands.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class AnalysisParams:
    """Feature-DEFINING DSP estimator and rendering conventions of the
    PML/WORLD analysis–synthesis chain.

    Every field here changes what the analyzer writes into the features (or
    how the renderer inverts them), so this tree is part of the experiment's
    reproducibility record — the property the reference covers by snapshotting
    its whole code tree (``percivaltts/clone.sh``, SURVEY.md §5 "Config/flag
    system" — file-level cite, mount empty):

    * ``compose()`` keys its feature cache on it (flipping any knob
      invalidates cached features instead of silently serving stale ones),
    * ``Configuration.dump`` round-trips it into the workdir ``config.json``,
    * serving-export artifacts record the analysis convention that produced
      their training features,
    * diagnostic scripts (``scripts/boundary_diag.py`` …) construct instances
      instead of mutating module globals.

    Defaults are the measured round-3 plateau; each default's sweep
    provenance is recorded in BASELINE.md (the measurement ledger) and in
    the inline comments at the point of use (ops/aperiodicity.py,
    vocoders/pml.py). Calibration constants that are pinned by oracle tests
    rather than swept (NM_RHO, ENV_PK, CAL, NOISE_CAL, PS_NOISE_CAL) stay
    module-level — they are physics, not conventions.
    """

    # --- peak/valley reader (ops/aperiodicity.py) ---
    # pitch-synchronous exact-bin reader (True) vs the 4·T0 lerp reader
    psync: bool = True
    # periods per resampled analysis frame; 4 = support-matched to the
    # production 4·T0 window (5/6/8 measured worse — see aperiodicity.py)
    ps_periods: int = 4
    # boundary-side reflection of read positions (measured a wash on the
    # tuned seed, slight held-out regression — kept off; requires vuv)
    ps_reflect: bool = False
    # boundary-side window SHIFT (the pulse-aligned sub-frame estimator
    # class the PS_REFLECT post-mortem called for): windows that would
    # cross the nearest voicing transition slide — as a whole, no fold —
    # back inside the frame's own voicing region, so dist-0 frames read
    # contiguous same-side content with no phase discontinuity; requires
    # vuv (see ops/aperiodicity.py)
    ps_shift: bool = False
    # with ps_shift: snap the slide to whole pitch periods (window start
    # anchored at pitch-event-aligned positions); costs up to +T0 of
    # temporal displacement per frame
    ps_shift_snap: bool = False
    # with ps_shift: shift ONLY the noise-mask reading, leaving the
    # harmonic-envelope reading frame-centered — decouples the voicing
    # consistency the shift buys from the edge amplitude RAMP the rendered
    # gate needs for sub-frame edge placement (the full shift flattens
    # that ramp and moves rendered edges ~1 frame outward — see
    # ops/aperiodicity.py's measured history)
    ps_shift_nm_only: bool = False
    # valley-track smoothing radius for the noise-mask estimator (frames);
    # radius 3 measured worse (analysis-pair desynchronization, pml.py)
    nm_valley_smooth: int = 0
    # band-aperiodicity estimator for the WORLD vocoder's bap stream:
    # "d4c_gd" (default — the D4C algorithm family the reference's
    # VocoderWORLD uses via pyworld: energy-weighted group-delay variance
    # per coarse band, ops/aperiodicity.py::group_delay_aperiodicity) or
    # "peak_valley" (the shared exact-bin reader). Default flipped to
    # d4c_gd in round 4 on a 4-corpus copy-synthesis A/B: mean incl.
    # flips 4.42/4.57/4.27/6.15 → 4.17/4.27/4.03/6.00 (seeds 1234/777/
    # held-out 42/hard — wins everywhere), flips 25/18/22/42 →
    # 23/21/22/47 (net +6 per ~10k frames, all boundary dist 0-1);
    # end-to-end training quality confirmed by the round-4 WORLD soak
    # under the new default (BASELINE.md)
    bap_method: str = "d4c_gd"
    # noise-mask estimator for the PML vocoder's nm STREAM: "d4c_gd"
    # (default — the group-delay statistic) or "peak_valley" (the
    # harmonic-interval exact-bin reader). Default flipped round 4: the
    # 4-corpus same-session copy-synthesis A/B improves BOTH mean and
    # flips on every corpus incl. held-out (4.39/4.56/4.27/6.09 →
    # 4.17/4.27/4.03/6.00; flips 40/37/39/61 → 23/20/22/47) — the first
    # estimator change to beat the round-3 plateau, and a direct
    # confirmation of the recorded consistency-over-accuracy principle:
    # the smoother statistic reads more repeatably across the closed
    # loop's two analyses, and PML's nm also carries its voicing
    # decision, so flips drop with it. The spec noise-smoothing gate
    # always uses the peak/valley reading either way (a rendering detail,
    # not feature schema).
    nm_method: str = "d4c_gd"
    # coarse-band width (Hz) of the group-delay statistic (d4c_gd). D4C
    # uses 3 kHz bands at fs≥16k; 2000 is the oracle-calibrated default
    # (≥60 bins/band at PS_N=2048). In AnalysisParams (not a module
    # global) so sweeps re-trace and the config records the convention.
    gd_band_hz: float = 2000.0
    # which aperiodicity reading drives the spec stream's noise-band
    # smoothing gate (vocoders/pml.py): "peak_valley" (default) or "d4c"
    # (the group-delay reading; requires nm_method="d4c_gd"). A gate that
    # differs between the closed loop's two analyses adds
    # (x − smoothed)·Δgate of error, so a more repeatable gate source
    # could cut that term — probe knob, swept via boundary_diag.
    gate_nm_source: str = "peak_valley"

    # --- rendered attack/release gate (vocoders/pml.py synthesis) ---
    # window-power-fraction at which the rendered attack/release switches on
    gate_theta: float = 0.56
    # minimum voiced-to-unvoiced low-band gap (nats) for w-based placement
    gate_min_gap: float = 1.5
    # frames within this distance of a voicing edge use w-based placement
    gate_edge_radius: int = 6
    # voiced-run edge frames backfilled from the nearest interior frame
    edge_backfill: int = 2

    # --- closed-loop correction profile (vocoders/pml.py) ---
    cl_boundary_radius: int = 4
    cl_clamp: float = 1.5
    cl_near_alpha: float = 0.5
    cl_near_alpha_hi: float = 0.5
    cl_near_clamp: float = 1.2
    cl_full_alpha: float = 1.1
    cl_it2_freeze_frac: float = 0.33
    cl_nm_alpha: float = 0.0
    cl_nm_clamp: float = 0.3

    # --- THE voicing rule (see vocoders/pml.py) ---
    # a frame is voiced iff mean(lowest vuv_low_frac of nm bands) < threshold;
    # shared by analysis, the closed loop, the rendered gate and f0_vuv —
    # change here only or they desynchronize and boundary flips return
    vuv_low_frac: float = 0.25
    vuv_threshold: float = 0.75


@dataclass(frozen=True)
class VocoderConfig:
    """Vocoder feature schema (reference: percivaltts/vocoders.py).

    The demo PML schema in the reference is f0 (1) + frequency-warped log
    spectral envelope (``spec_size``) + frequency-warped noise mask
    (``nm_size``) at 16 kHz.
    """

    kind: str = "pml"  # "pml" | "world" | "melspec"
    fs: int = 16000
    shift_ms: float = 5.0  # frame shift
    frame_ms: float = 25.0  # analysis window length (multiple of shift)
    dftlen: int = 1024  # analysis FFT length
    spec_size: int = 65  # warped log-spectral-envelope dim
    nm_size: int = 33  # warped noise-mask / aperiodicity dim
    f0_min: float = 60.0
    f0_max: float = 400.0
    # spectral-envelope estimator: "harmonic" (phase-insensitive peak/valley
    # harmonic envelope on voiced frames + 500 Hz CheapTrick on unvoiced —
    # the copy-synthesis-accurate default), "cheaptrick" (published
    # CheapTrick algorithm everywhere, f0-adaptive, amplitude convention),
    # or "te" (true-envelope over a fixed window, STFT-magnitude
    # convention — the round-1 estimator, kept for regression comparison)
    envelope: str = "harmonic"
    # radius (frames) of triangular time-smoothing of the power spectrum
    # before envelope estimation; cuts estimator variance on noise regions
    env_time_smooth: int = 1
    # closed-loop synthesis iterations (PML amp path): render, re-analyze,
    # subtract the spec-stream roundtrip error, render again. The
    # analyze∘synthesize operator carries a repeating per-frame/band bias
    # (scripts/double_roundtrip.py: error autocorrelation +0.67, slope 0.5
    # across consecutive roundtrips), so one pre-compensation pass cancels
    # it: steady-state copy-synthesis 5.6 → 3.2 dB MCD measured. Iterations
    # beyond the first correct interior frames only, under a tighter clamp
    # and with the voicing-deciding low bands frozen (analysis.cl_it2_freeze_frac)
    # — 12-utt diag, seeds 1234/777: mean 4.49/4.85 → 4.39/4.74, steady
    # 2.93→2.76, flips 1.37→1.37% / 1.49→1.53%. 0 = open loop (one render,
    # (iters+2)× cheaper)
    closed_loop: int = 2
    # mel-spectrogram variant (BASELINE config 4)
    mel_size: int = 80
    # WORLD voicing decision on PREDICTED (soft) feature tracks:
    # "stream" (default, reference-faithful: threshold the explicit vuv
    # stream at 0.5 + clean_vuv) or "bap" (voiced where the mean of the
    # lowest ``vuv_bap_bands`` bap bands < ``vuv_bap_threshold`` — the
    # nm-derived rule mirroring PML's, whose end-to-end VUV error is 2–3×
    # lower; the soft vuv stream's regression hedges through voicing
    # releases and its 0.5 crossing lands ~4 frames early, while the bap
    # stream carries the release tail: matched soak 4.30% → 2.02% test VUV
    # at zero onset/offset bias, scripts/vuv_boundary_calib.py). Binary
    # (analysis) tracks always use the explicit stream bit-exactly, so
    # copy-synthesis and the closed loop are untouched by construction.
    # Band/threshold defaults are calibrated (valid-split sweep, bands ∈
    # {1..6} × θ ∈ [0.2,0.9]) for the DEFAULT d4c_gd bap stream: 4 bands
    # < 0.60 → matched-soak test VUV 1.07% (beats PML's 1.8%), offset
    # bias +0.24 frames. For bap_method="peak_valley" the measured-best
    # rule is 2 bands < 0.75 (test 1.99%).
    vuv_rule: str = "stream"
    vuv_bap_bands: int = 4
    vuv_bap_threshold: float = 0.60
    # PML prediction-path voicing rule override (None = the analysis rule,
    # AnalysisParams.vuv_low_frac/vuv_threshold — reference-faithful).
    # The analysis rule was calibrated on ANALYSIS nm tracks; the model's
    # PREDICTED d4c_gd nm stream sits lower through voicing releases, so
    # the 0.25/0.75 rule over-voices release tails: on the matched round-4
    # soak the valid-chosen rule (lowest 65% of nm bands < 0.60; the error
    # surface is flat in the band count, threshold dominates) reads test
    # VUV 2.69% → 0.95% on the same checkpoint (valid 2.72% → 0.85%;
    # /tmp/soak_pml_d4c sweep, scripts/pml_vuv_calib.py). Decision-path
    # only: analysis, copy-synthesis and the in-jit synthesis gates are
    # untouched (f0_vuv_pred vs f0_vuv), so these knobs correctly do NOT
    # invalidate the feature cache. Production preset sets them for PML.
    vuv_pred_low_frac: Optional[float] = None
    vuv_pred_threshold: Optional[float] = None
    # feature-defining DSP estimator/rendering conventions (see
    # AnalysisParams) — part of the feature cache key and the workdir dump
    analysis: AnalysisParams = field(default_factory=AnalysisParams)

    @property
    def shift_samples(self) -> int:
        return int(round(self.fs * self.shift_ms / 1000.0))

    @property
    def frame_samples(self) -> int:
        return int(round(self.fs * self.frame_ms / 1000.0))

    @property
    def feature_size(self) -> int:
        """Total per-frame output ("cmp") dimension for this vocoder."""
        if self.kind == "pml":
            return 1 + self.spec_size + self.nm_size
        if self.kind == "world":
            return 1 + 1 + self.spec_size + self.nm_size  # f0, vuv, spec, bap
        if self.kind == "melspec":
            return self.mel_size
        raise ValueError(f"unknown vocoder kind: {self.kind}")

    @property
    def streams(self) -> Dict[str, Tuple[int, int]]:
        """Name → (start, end) slices of the composed feature vector."""
        if self.kind == "pml":
            return {
                "f0": (0, 1),
                "spec": (1, 1 + self.spec_size),
                "nm": (1 + self.spec_size, 1 + self.spec_size + self.nm_size),
            }
        if self.kind == "world":
            s = self.spec_size
            return {
                "f0": (0, 1),
                "vuv": (1, 2),
                "spec": (2, 2 + s),
                "bap": (2 + s, 2 + s + self.nm_size),
            }
        if self.kind == "melspec":
            return {"mel": (0, self.mel_size)}
        raise ValueError(f"unknown vocoder kind: {self.kind}")


@dataclass(frozen=True)
class DataConfig:
    """Corpus layout + batching (reference: percivaltts/data.py, compose.py)."""

    corpus_dir: str = ""
    fileids: str = ""  # path to file-id list (one utterance id per line)
    label_dir: str = "label_state_align"
    wav_dir: str = "wav"
    question_file: str = ""
    # train/valid/test split by position in the file-id list, as in the
    # reference's list-slicing convention.
    num_valid: int = 5
    num_test: int = 5
    # Batching: static-shape buckets (frames per sequence). Sequences are
    # bucketed to the smallest bound >= their length and padded; masks are
    # threaded through every loss/metric. This replaces the reference's
    # pad-to-batch-max dynamic shapes, which would force XLA recompilation.
    batch_size: int = 32
    # utterances longer than the largest bound are randomly cropped to it
    bucket_bounds: Tuple[int, ...] = (256, 512, 768, 1024)
    # expected composed label dimension (questions + frame features).
    # Purely declarative for synthetic/bench state construction; when > 0,
    # compose() warns if the actual composed dimension differs.
    label_dim: int = 425
    shuffle_seed: int = 42


@dataclass(frozen=True)
class ModelConfig:
    """Generator/critic zoo (reference: models_basic.py / models_cnn.py /
    critic per SURVEY.md §2)."""

    generator: str = "cnn"  # "fc" | "blstm" | "bgru" | "cnn" | "cnn_blstm"
    hidden_size: int = 256
    num_layers: int = 3
    # Generator regularization (the Keras-era reference's model builders
    # carry dropout/normalization options — models_basic.py / models_cnn.py,
    # file-level cite, mount empty). dropout_rate > 0 enables nn.Dropout in
    # training mode only (eval/generation/export stay deterministic; the
    # fused train steps thread a per-step fold of the state RNG).
    dropout_rate: float = 0.0
    # "layer" inserts stateless LayerNorm after the dense trunk layers —
    # the TPU-idiomatic stand-in for Keras BatchNorm: running batch
    # statistics are mutable collections that don't fit the pure
    # state→state fused-step design, and per-device batch stats would
    # diverge under data parallelism; LayerNorm regularizes activations
    # with none of that state. "none" (default) = reference-faithful bare
    # stacks.
    gen_norm: str = "none"
    # CNN generator
    # conv_style "time1d": MXU-aligned 1-D convs over time at `hidden_size`
    # channels with full-frequency mixing through dense projections (TPU
    # fast path). "2d": the reference-faithful frames×frequency image convs
    # at `cnn_channels` — same inductive bias as percivaltts's models_cnn,
    # ~6× slower on TPU (32-channel 5×5 convs use a quarter of the MXU
    # lanes and force layout transposes).
    conv_style: str = "time1d"
    cnn_channels: int = 32
    cnn_kernel_freq: int = 5
    cnn_kernel_time: int = 5
    cnn_blocks: int = 4
    # BLSTM generator
    blstm_size: int = 256
    blstm_layers: int = 2
    # critic
    critic_channels: int = 32
    critic_blocks: int = 4
    critic_hidden: int = 256
    # conv tap count (time taps for conv_style "time1d", both axes for
    # "2d"); exposed for the wider-shallower iso-param probes of the
    # bandwidth-bound critic forward (scripts/critic_arch_probe.py)
    critic_kernel: int = 5
    # per WGAN-GP practice the critic never uses batch norm. "none"
    # (default) matches the reference's likely plain-conv critic AND is
    # measured 7% faster on the fused headline step (21.88 → 20.34 ms —
    # the layer norms are HBM-bound elementwise passes,
    # scripts/critic_norm_probe.py); production soaks on the friendly and
    # hard corpora are stable at equal-or-better measures without it
    # (BASELINE.md round-3 session 7). "layer" remains available.
    critic_norm: str = "none"
    # numerics: bf16 compute with f32 master weights/optimizer state
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"


@dataclass(frozen=True)
class TrainConfig:
    """Trainer hyperparameters (reference: optimizertts.py /
    optimizertts_wgan.py per SURVEY.md §2)."""

    trainer: str = "wgan"  # "lse" | "wgan"
    epochs: int = 100
    steps_per_epoch: int = 0  # 0 = one pass over train set
    lr_gen: float = 1e-4
    lr_critic: float = 1e-4
    adam_b1: float = 0.5  # WGAN-GP betas
    adam_b2: float = 0.9
    # WGAN-GP
    n_critic: int = 5
    gp_lambda: float = 10.0
    # lazy gradient penalty: apply the GP double-backprop only on every
    # K-th critic update of the unrolled inner loop (StyleGAN2-style lazy
    # regularization, Karras et al. 2020 §lazy-reg, transplanted to
    # WGAN-GP). λ is scaled by K on the iterations that do apply it, so
    # the time-averaged regularization pressure matches gp_every=1.
    # Because the critic loop is unrolled with STATIC iteration indices,
    # skipped iterations elide the whole double-backprop subgraph at trace
    # time — a structural knockout, not a 0·x multiply XLA must keep
    # (BASELINE.md "gp_lambda=0 is NOT a GP knockout"). 1 = the reference's
    # every-step GP (default, reference-faithful).
    # MEASURED REJECTION (round 4, keep at 1 for quality): K=2/5 buys
    # +12/+27% step time but regresses test MCD 7.7 → 8.13/9.06 with
    # GV/ms_hi overshoot — the WGAN-GP penalty is a per-update Lipschitz
    # constraint, not time-averaged pressure (BASELINE.md "Lazy gradient
    # penalty" row; scripts/lazy_gp_probe.py). The knob stays as the
    # measured record and for structural-knockout experiments.
    gp_every: int = 1
    # fuse D(real)+D(fake) into ONE 2B-batch critic pass per critic update
    # (numerically identical scores; the concat doubles the conv/GEMM batch
    # at the cost of materializing concatenated real/fake/lab/mask copies).
    # Round-2 A/B REJECTED it under the then-current critic (4.61 vs
    # 4.71–4.72 M frames/s: at B=32 the GEMMs already fill the MXU, so the
    # concat HBM traffic cost more than the doubled batch saved); round 5
    # re-measured it under the pool-before-dense + critic_norm="none" stack
    # the revert predates — still a loss (19.36 → 19.88 ms/step, −2.6%;
    # scripts/fused2b_probe.py), the concat copies again outweigh the
    # batching win now that the small-op fraction is even lower. Kept as
    # the measured-rejection record.
    critic_fused_pass: bool = False
    lse_weight: float = 0.25  # LSE mixing weight in the generator loss
    # Transition-weighted LSE (round-5 probe of the budget's near-boundary
    # term, BASELINE.md "Prediction-path error budget"): the LSE term's
    # per-frame weight follows the TARGET's local spectral flux (max-pooled
    # ±boundary_radius frames, normalized to mean 1 so the loss scale and
    # the LSE/adversarial mixing ratio are unchanged;
    # training/losses.py::transition_weights). 0 = off (reference-faithful
    # plain masked MSE). Applies to both trainers' LSE terms.
    boundary_weight: float = 0.0
    boundary_radius: int = 3
    # exponential moving average of the GENERATOR weights (0 = off).
    # Standard production-GAN practice (absent in the reference): after
    # each generator update, ema ← d·ema + (1−d)·params, carried in the
    # training state/checkpoints; when enabled, generation, objective-
    # measure validation and serving export all read the EMA weights
    # (training/state.py eval_params). NOTE: enabling/disabling changes
    # the checkpoint pytree — old checkpoints restore only under the
    # setting they were written with.
    ema_decay: float = 0.0
    # optional per-stream LSE weights by vocoder stream name, e.g.
    # {"f0": 10.0, "spec": 1.0, "nm": 1.0} — the reference balances its
    # feature streams in the regression loss; empty = uniform
    stream_weights: Tuple[Tuple[str, float], ...] = ()
    # objective-measure validation: every K epochs run the objective
    # measures (MCD / F0 RMSE / VUV error) over the validation split via the
    # generation path (reference: optimizertts_wgan.py validates with the
    # objective measures, not only the regression loss). 0 = off. Requires
    # the trainer to be given the output-normalization stats.
    measures_every: int = 0
    # metric driving best-checkpoint selection and early stopping:
    # "valid" = frame-weighted masked validation MSE; "mcd" = the MCD from
    # the objective-measure validation (requires measures_every > 0);
    # "mcd_gv" = MCD + best_gv_weight·|ln GV-ratio| (same requirement) —
    # for WGAN arms, where a pure-MCD rule anti-selects the objective: a
    # mean-seeking metric picks the critic's most over-smoothed checkpoint
    # (VERDICT round-3 weak #6), so the composite penalizes dispersion
    # departing from natural in either direction
    best_metric: str = "valid"
    # |ln GV| weight of the "mcd_gv" composite, in dB per nat: 10 charges a
    # full LSE-style GV collapse (ratio 0.65 → |ln| 0.43) ~4.3 dB — the
    # order of the MCD spread between checkpoints — while a healthy
    # 0.9–1.15 band costs < 1.4 dB
    best_gv_weight: float = 10.0
    # early stopping
    patience: int = 20
    # checkpointing
    checkpoint_every: int = 1  # epochs
    keep_checkpoints: int = 3
    # parallelism: data-axis size 0 = all local devices
    data_parallel: int = 0
    # dtype for host→device batch transfer. "bfloat16" halves the bytes over
    # the host link — models compute in bf16 anyway, so inputs lose nothing;
    # targets gain ≤0.4% rounding noise on normalized features. "float32"
    # matches the reference exactly.
    transfer_dtype: str = "float32"
    # keep the whole (padded) training corpus resident in HBM and gather
    # batches on device — eliminates per-step host→device feature transfer
    # (measured ~99% of wall time on the tunneled v5e). Costs
    # N·bound·(label_dim+feat_dim+1)·4 bytes of HBM (halve via
    # transfer_dtype=bfloat16); utterances pad to max(bucket_bounds).
    device_corpus: bool = False
    # with device_corpus on a mesh: partition the corpus over the data axis
    # instead of replicating it (capacity scales with device count); each
    # device samples from its local shard via a shard_map gather
    shard_corpus: bool = False
    # capture a jax.profiler trace (workdir/traces, TensorBoard/Perfetto
    # readable) around this many steady-state steps of the first
    # post-compile epoch; 0 = off. Per-step wall-clock timing flows into
    # metrics.jsonl either way.
    profile_steps: int = 0
    seed: int = 123
    debug_nans: bool = False


@dataclass(frozen=True)
class Configuration:
    """Root experiment configuration (reference: run.py's ``configuration``)."""

    workdir: str = "exp/default"
    data: DataConfig = field(default_factory=DataConfig)
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    # ---- serialization (replaces the reference's clone.sh snapshotting) ----

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def dump(self, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.workdir, "config.json")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)
        return path

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Configuration":
        def _sub(klass, key):
            sub = dict(d.get(key, {}))
            if key == "data" and "bucket_bounds" in sub:
                sub["bucket_bounds"] = tuple(sub["bucket_bounds"])
            if key == "vocoder" and isinstance(sub.get("analysis"), dict):
                ap = dict(sub["analysis"])
                ap_known = {f.name for f in dataclasses.fields(AnalysisParams)}
                ap_unknown = set(ap) - ap_known
                if ap_unknown:
                    import warnings

                    warnings.warn(
                        "config section 'vocoder.analysis': ignoring unknown "
                        f"fields {sorted(ap_unknown)}"
                    )
                    ap = {k: v for k, v in ap.items() if k in ap_known}
                sub["analysis"] = AnalysisParams(**ap)
            if key == "train" and "stream_weights" in sub:
                sub["stream_weights"] = tuple(
                    (str(n), float(w)) for n, w in sub["stream_weights"]
                )
            # forward/backward compatibility: configs written by other
            # versions may carry fields this version doesn't know — ignore
            # them (with a note) instead of refusing to load
            known = {f.name for f in dataclasses.fields(klass)}
            unknown = set(sub) - known
            if unknown:
                import warnings

                warnings.warn(
                    f"config section {key!r}: ignoring unknown fields {sorted(unknown)}"
                )
                sub = {k: v for k, v in sub.items() if k in known}
            return klass(**sub)

        return cls(
            workdir=d.get("workdir", "exp/default"),
            data=_sub(DataConfig, "data"),
            vocoder=_sub(VocoderConfig, "vocoder"),
            model=_sub(ModelConfig, "model"),
            train=_sub(TrainConfig, "train"),
        )

    @classmethod
    def load(cls, path: str) -> "Configuration":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def replace(self, **kw) -> "Configuration":
        return dataclasses.replace(self, **kw)
