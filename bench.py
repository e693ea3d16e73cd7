#!/usr/bin/env python
"""Headline benchmark: WGAN-GP training throughput, frames/sec/chip.

Default (no args) runs BASELINE.md config 3 — the full Percival default:
CNN+BLSTM generator, convolutional critic, WGAN-GP with LSE mixing, PML
feature dims (label 425, cmp 99 = 1 lf0 + 65 spec + 33 nm, 5 ms frames) —
as the single fused jitted step on one chip, and prints ONE JSON line.

``--config N`` (1–4) benches the other BASELINE configs:
  1 FC generator, pure LSE (no critic)
  2 CNN generator + conv critic, WGAN-GP
  3 CNN+BLSTM generator, WGAN-GP with LSE mixing (default/headline)
  4 mel-spectrogram target variant (mel-80 features)
(config 5, data-parallel over a pod slice, is validated by
``__graft_entry__.dryrun_multichip`` — a single chip can't measure it).

Throughput definition: one outer step consumes ``n_critic`` critic batches +
1 generator batch (LSE: 1 batch); frames/sec = B·T·batches_per_step / median
step time / chips.

``vs_baseline``: the reference (Keras percivaltts) publishes no numbers and
its mount was empty (BASELINE.md); the recorded baseline is the same fused
step implemented in torch eager f32 on the host CPU — the reference's
hardware class and execution style — measured once by
``scripts/cpu_reference_bench.py`` (see BASELINE.md).

Timing note: on the tunneled TPU runtime ``block_until_ready`` returns long
before dispatched work has executed; the only honest sync is a device→host
readback of the final state, done once per timed chunk.
"""

import argparse
import json
import time

import numpy as np

# torch eager f32, same layer sizes, 1-core host CPU, measured at the SAME
# shape as this bench (B=32, T=512, n_critic=5; 235 s/step, 2026-08-16).
# The earlier B=8/T=128 extrapolation read 838.5 — "scale-invariant to
# first order" was off 2× at the 16× shape gap; this anchor removes it.
CPU_BASELINE_FRAMES_PER_SEC = 418.4

L, B, T, NC = 425, 32, 512, 5

# peak dense-matmul throughput per chip (bf16, FLOP/s) by device kind —
# the denominator for MFU. The models compute in bf16 on the MXU
# (ModelConfig.compute_dtype), so bf16 peak is the honest ceiling.
_PEAK_FLOPS = (
    ("v6", 918e12),  # Trillium
    ("v5p", 459e12),
    ("v5", 197e12),  # v5e / "v5 lite"
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower().replace(" ", "")
    for tag, peak in _PEAK_FLOPS:
        if tag in kind:
            return peak
    return None


def _flops_per_step(step, *args) -> float | None:
    """Analytic FLOPs of one compiled step from XLA's HLO cost analysis."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _cfg(config: int):
    from percivaltts_tpu.config import (
        Configuration,
        DataConfig,
        ModelConfig,
        TrainConfig,
        VocoderConfig,
    )

    vocoder = VocoderConfig(spec_size=65, nm_size=33)
    generator, trainer = "cnn_blstm", "wgan"
    if config == 1:
        generator, trainer = "fc", "lse"
    elif config == 2:
        generator = "cnn"
    elif config == 4:
        vocoder = VocoderConfig(kind="melspec", mel_size=80)
        generator = "cnn"
    return Configuration(
        data=DataConfig(batch_size=B, bucket_bounds=(T,), label_dim=L),
        vocoder=vocoder,
        model=ModelConfig(generator=generator),
        train=TrainConfig(trainer=trainer, n_critic=NC),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3, choices=(1, 2, 3, 4))
    args = ap.parse_args()

    import jax

    from percivaltts_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from percivaltts_tpu.training.lse import lse_step
    from percivaltts_tpu.training.state import make_gan_state
    from percivaltts_tpu.training.wgan import make_wgan_step

    cfg = _cfg(args.config)
    F = cfg.vocoder.feature_size
    n_chips = 1  # single-chip bench; DP validated via dryrun_multichip
    is_wgan = cfg.train.trainer == "wgan"
    batches_per_step = NC + 1 if is_wgan else 1

    state = make_gan_state(cfg, L)
    rng = np.random.default_rng(0)

    def batch(lead=()):
        return {
            "lab": jax.numpy.asarray(rng.normal(size=lead + (B, T, L)).astype(np.float32)),
            "cmp": jax.numpy.asarray(rng.normal(size=lead + (B, T, F)).astype(np.float32)),
            "mask": jax.numpy.asarray(np.ones(lead + (B, T), np.float32)),
            "lengths": jax.numpy.asarray(np.full(lead + (B,), T, np.int32)),
        }

    if is_wgan:
        step_args = (batch((NC,)), batch())
        step = jax.jit(make_wgan_step(cfg.train), donate_argnums=(0,))
    else:
        step_args = (batch(),)
        step = jax.jit(lse_step, donate_argnums=(0,))

    def hard_sync(s):
        return float(jax.tree.leaves(s.gen.params)[0].sum())

    state, m = step(state, *step_args)
    hard_sync(state)
    for _ in range(3):
        state, m = step(state, *step_args)
    hard_sync(state)

    chunk_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        # 40 steps per sync: the hard-sync readback costs one ~25 ms tunnel
        # round-trip, which at the old 10-step chunks inflated every step by
        # ~2.5 ms (device-profile step time 18.3 ms vs 24.4 ms measured).
        # Amortizing over 40 leaves <1 ms of RTT per step.
        n = 40
        for _ in range(n):
            state, m = step(state, *step_args)
        hard_sync(state)
        chunk_times.append((time.perf_counter() - t0) / n)
    dt = float(np.median(chunk_times))

    frames_per_sec = B * T * batches_per_step / dt / n_chips
    out = {
        "metric": "wgan_gp_train_throughput"
        if args.config == 3
        else f"train_throughput_config{args.config}",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
    }
    if args.config == 3:
        # the CPU anchor was measured for THIS config/shape only; a ratio
        # for the other configs would compare incomparable workloads
        out["vs_baseline"] = round(frames_per_sec / CPU_BASELINE_FRAMES_PER_SEC, 2)
    flops = _flops_per_step(step, state, *step_args)
    peak = _peak_flops(jax.devices()[0])
    if flops is not None:
        out["flops_per_step"] = round(flops)
        if peak is not None:
            out["mfu_pct"] = round(100.0 * flops / dt / peak, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    # the tunneled TPU backend occasionally throws a transient
    # FailedPrecondition/Unavailable right after another process was killed —
    # retry once for those; anything else is a real failure and raises
    # immediately
    try:
        main()
    except Exception as e:  # pragma: no cover - depends on backend state
        import sys
        import time as _t

        # specific tokens only: a bare "internal"/"deadline" substring also
        # matches deterministic failures (e.g. "InternalError: Mosaic
        # lowering failed") and would waste a 30 s sleep + full rerun on a
        # reproducible bug
        transient = (
            "failedprecondition",
            "unavailable",
            "deadline_exceeded",
            "deadline exceeded",
            "socket closed",
        )
        if not any(t in (type(e).__name__ + str(e)).lower() for t in transient):
            raise
        print(f"bench attempt 1 failed ({type(e).__name__}); retrying in 30 s", file=sys.stderr)
        _t.sleep(30)
        main()  # a second failure propagates
