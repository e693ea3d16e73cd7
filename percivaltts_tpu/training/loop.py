"""Training loop: epochs, validation, early stopping, checkpointing.

Reference parity: the epoch loops of ``percivaltts/optimizertts.py`` and
``optimizertts_wgan.py`` (SURVEY.md §2, §3.2–3.3) — shuffled batches each
epoch, per-epoch validation cost, early stopping on best validation with
patience, save-best checkpointing, resume ("cont").

TPU-first notes:
* The WGAN outer step consumes ``n_critic + 1`` same-shape batches (one per
  critic update + one for the generator), stacked host-side and fed to the
  single fused jit region — the device never waits on Python between critic
  updates.
* Under a mesh, batches are sharded over the ``data`` axis and state is
  replicated; the same jitted step runs 1-device or N-device unchanged.
* Bucketed static shapes mean at most ``len(bucket_bounds)`` compilations
  per step function for the whole run.
"""

from __future__ import annotations

import math
import os
import time
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from percivaltts_tpu.config import Configuration
from percivaltts_tpu.data.dataset import Dataset
from percivaltts_tpu.parallel.distributed import (
    global_batch,
    global_scalar,
    global_stacked_batch,
    replicate_state_global,
)
from percivaltts_tpu.training.checkpoints import CheckpointManager
from percivaltts_tpu.training.lse import lse_step
from percivaltts_tpu.training.state import GANState, make_gan_state
from percivaltts_tpu.training.wgan import make_wgan_step
from percivaltts_tpu.utils.logging import MetricsLogger, print_log
from percivaltts_tpu.utils.profiling import StepTimer, trace


def _group_wgan_batches(
    batches: Iterator[Dict[str, np.ndarray]],
    group: int,
    buffers: Dict[int, List[Dict[str, np.ndarray]]],
) -> Iterator[Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]]:
    """Group same-shape batches into (stacked critic batches, gen batch).

    ``buffers`` persists across epochs (the trainer owns it): a partial
    group at epoch end simply waits for the next epoch's batches of the
    same bucket bound, so every batch in a group is distinct and the
    objective is unchanged on small corpora. (The previous behavior —
    cycling leftovers to complete a final group — fed the critic
    duplicated batches within one outer step on the demo/e2e regime.)
    A run whose corpus never fills a whole group performs zero WGAN
    steps; callers warn on zero-step epochs.
    """
    for b in batches:
        bound = b["lab"].shape[1]
        buf = buffers.setdefault(bound, [])
        buf.append(b)
        if len(buf) == group:
            critic = {
                k: np.stack([x[k] for x in buf[:-1]]) for k in buf[0]
            }
            yield critic, buf[-1]
            buffers[bound] = []


class _EpochProfiler:
    """Per-epoch step instrumentation: a ``jax.profiler`` trace around the
    first ``TrainConfig.profile_steps`` steps of the profiling epoch (the
    first post-compile one), plus per-step dispatch timing that flows into
    the epoch's metrics record (SURVEY.md §5 "Tracing/profiling")."""

    def __init__(self, workdir: str, profile_steps: int, active: bool):
        self.timer = StepTimer()
        self.remaining = profile_steps if (active and profile_steps > 0) else 0
        self._ctx = None
        if self.remaining:
            self._ctx = trace(workdir)
            self._ctx.__enter__()

    def step(self, fn, *args):
        self.timer.start()
        out = fn(*args)
        self.timer.stop()
        if self.remaining:
            self.remaining -= 1
            if self.remaining == 0:
                # traced steps must have executed before the trace closes
                jax.block_until_ready(out)
                self._close()
        return out

    def _close(self):
        if self._ctx is not None:
            self._ctx.__exit__(None, None, None)
            self._ctx = None

    def summary(self) -> Dict[str, float]:
        self._close()
        t = self.timer
        return {"step_mean_s": t.mean, "step_max_s": t.max}


class Trainer:
    """End-to-end trainer for both the LSE and WGAN-GP objectives."""

    def __init__(
        self,
        cfg: Configuration,
        train_ds: Dataset,
        valid_ds: Optional[Dataset] = None,
        mesh=None,
        workdir: Optional[str] = None,
        in_stats=None,
        out_stats=None,
        measures_stats=None,
    ):
        """``in_stats``/``out_stats``: pass NormStats (with *raw* datasets)
        to normalize on device inside the jitted step instead of host-side
        (training/ondevice.py).

        ``measures_stats``: output-stream NormStats of a *normalized*
        pipeline, enabling objective-measure validation
        (``TrainConfig.measures_every``) and MCD-driven best-checkpoint
        selection (``TrainConfig.best_metric="mcd"``) — the reference's
        WGAN trainer validates with the objective measures."""
        self.cfg = cfg
        self.train_ds = train_ds
        self.valid_ds = valid_ds
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["data"]
            if cfg.data.batch_size % dp != 0:
                raise ValueError(
                    f"batch_size {cfg.data.batch_size} must be divisible by "
                    f"the mesh data axis ({dp} devices) for data parallelism"
                )
        self.workdir = workdir or cfg.workdir
        os.makedirs(self.workdir, exist_ok=True)
        if jax.process_index() == 0:
            cfg.dump(os.path.join(self.workdir, "config.json"))
        # multi-host: only process 0 writes metrics (all processes still
        # compute them — the records are identical by construction)
        self.metrics = MetricsLogger(
            os.path.join(self.workdir, "metrics.jsonl"),
            enabled=jax.process_index() == 0,
        )
        from percivaltts_tpu.utils.profiling import system_info

        self.metrics.log("system", **system_info())
        # sanity scale for the losses (reference: data.py's zero-predictor
        # RMSE): a trained model must beat this by a wide margin
        from percivaltts_tpu.data.dataset import cost_0pred_rmse

        zero_rmse = cost_0pred_rmse(train_ds.cmps)
        self.metrics.log("sanity", cost_0pred_rmse=zero_rmse)
        print_log(f"zero-predictor RMSE over targets: {zero_rmse:.5f}")
        self.ckpt = CheckpointManager(
            os.path.join(self.workdir, "checkpoints"), keep=cfg.train.keep_checkpoints
        )

        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)

        # with a mesh, the recurrent Pallas kernels shard_map over its data
        # axis (fully-partitioned multi-chip DP instead of SPMD gathering
        # around the custom call)
        self.state: GANState = make_gan_state(cfg, train_ds.label_dim, mesh=mesh)
        if mesh is not None:
            # process-aware: replicates across all hosts' devices when the
            # mesh is global (multi-host training); plain device_put
            # otherwise
            self.state = replicate_state_global(self.state, mesh)

        def _maybe_norm(fn):
            if in_stats is None:
                return fn
            from percivaltts_tpu.training.ondevice import make_normalizing_step

            return make_normalizing_step(fn, in_stats, out_stats)

        from percivaltts_tpu.training.losses import stream_weight_vector

        dim_w = stream_weight_vector(
            cfg.vocoder.streams, cfg.train.stream_weights, cfg.vocoder.feature_size
        )
        self.dcorpus = None
        if cfg.train.device_corpus:
            from percivaltts_tpu.data.device_corpus import DeviceCorpus

            self.dcorpus = DeviceCorpus(
                train_ds,
                bound=max(cfg.data.bucket_bounds),
                dtype=(
                    "bfloat16"
                    if cfg.train.transfer_dtype == "bfloat16"
                    else "float32"
                ),
                mesh=mesh,
                shard_corpus=cfg.train.shard_corpus,
            )

        if cfg.train.trainer == "wgan":
            base = _maybe_norm(make_wgan_step(cfg.train, dim_w))
            if self.dcorpus is not None:
                from percivaltts_tpu.data.device_corpus import make_device_wgan_step

                self._wgan_step = jax.jit(
                    make_device_wgan_step(
                        base,
                        cfg.train.n_critic,
                        sharded_mesh=mesh if cfg.train.shard_corpus else None,
                    ),
                    donate_argnums=(0,),
                )
            else:
                self._wgan_step = jax.jit(base, donate_argnums=(0,))
        else:
            import functools

            base = _maybe_norm(
                functools.partial(
                    lse_step,
                    dim_weights=dim_w,
                    ema_decay=cfg.train.ema_decay,
                    boundary_weight=cfg.train.boundary_weight,
                    boundary_radius=cfg.train.boundary_radius,
                )
            )
            if self.dcorpus is not None:
                from percivaltts_tpu.data.device_corpus import make_device_lse_step

                self._lse_step = jax.jit(
                    make_device_lse_step(
                        base, sharded_mesh=mesh if cfg.train.shard_corpus else None
                    ),
                    donate_argnums=(0,),
                )
            else:
                self._lse_step = jax.jit(base, donate_argnums=(0,))
        from percivaltts_tpu.training.lse import lse_eval_sums

        self._eval_step = jax.jit(_maybe_norm(lse_eval_sums))

        self.measures_stats = measures_stats
        if cfg.train.best_metric in ("mcd", "mcd_gv") and (
            cfg.train.measures_every <= 0 or measures_stats is None
        ):
            raise ValueError(
                f"best_metric={cfg.train.best_metric!r} needs "
                "measures_every > 0 and measures_stats"
            )

        self.best_valid = float("inf")
        self.best_epoch = -1
        self._stale_evals = 0  # metric evaluations since the last improvement
        # the epoch to profile; set per train() call relative to the first
        # epoch THIS process runs (which pays the compile) — a fixed value
        # would never fire on resumed runs
        self._profile_epoch = -1
        # partial WGAN groups carried across epochs (see _group_wgan_batches)
        self._wgan_buffers: Dict[int, List[Dict[str, np.ndarray]]] = {}

    # ------------------------------------------------------------------ #

    def resume(self) -> bool:
        """Reload the latest checkpoint if one exists (the reference's
        ``cont`` flag). Returns True when resumed."""
        step = self.ckpt.latest_step()
        if step is None:
            return False
        def _abstract(x):
            a = jax.numpy.asarray(x)
            return jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=getattr(x, "sharding", None)
            )

        abstract = jax.tree.map(_abstract, self.state)
        self.state = self.ckpt.restore(abstract, step)
        # re-seed best-metric tracking from the retained checkpoints so the
        # first resumed epoch isn't treated as an improvement and the
        # early-stopping patience window continues instead of restarting
        best = self.ckpt.best_score()
        if best is not None:
            self.best_epoch, self.best_valid = best
        print_log(
            f"resumed from checkpoint at epoch {step}"
            + (f" (best {self.best_valid:.5f} @ {self.best_epoch})" if best else "")
        )
        return True

    def _put(self, batch):
        batch = self._cast(batch)
        if self.mesh is not None:
            # under multi-host every process iterates the same deterministic
            # global batch sequence and this ships only its local rows
            return global_batch(batch, self.mesh)
        return batch

    def _cast(self, batch):
        """Cast float streams to the transfer dtype (TrainConfig.transfer_dtype)
        before shipping host→device — bf16 halves link bytes; the models
        compute in bf16 regardless."""
        if self.cfg.train.transfer_dtype == "float32":
            return batch
        import ml_dtypes

        dt = {"bfloat16": ml_dtypes.bfloat16, "float16": np.float16}[
            self.cfg.train.transfer_dtype
        ]
        out = dict(batch)
        # mask stays f32: its sums are loss denominators and bf16 reduction
        # over thousands of frames is not exact
        for k in ("lab", "cmp"):
            if k in out:
                out[k] = np.asarray(out[k]).astype(dt)
        return out

    def _train_epoch(self, epoch: int) -> Dict[str, float]:
        t0 = time.time()
        d = self.cfg.data
        if self.dcorpus is not None:
            return self._train_epoch_device(epoch, t0)
        batches = self.train_ds.batches(
            d.batch_size, d.bucket_bounds, shuffle=True, seed=d.shuffle_seed, epoch=epoch
        )
        from percivaltts_tpu.utils.prefetch import prefetch

        agg: Dict[str, float] = {}
        nsteps = 0
        frames = 0.0
        prof = _EpochProfiler(
            self.workdir,
            self.cfg.train.profile_steps,
            active=epoch == self._profile_epoch,
        )
        if self.cfg.train.trainer == "wgan":
            group = self.cfg.train.n_critic + 1

            def prepared():
                # batch assembly + cast + device_put run in the prefetch
                # thread, overlapping device execution
                for critic_b, gen_b in _group_wgan_batches(
                    batches, group, self._wgan_buffers
                ):
                    cb = self._cast(critic_b)
                    if self.mesh is not None:
                        cb = global_stacked_batch(cb, self.mesh)
                    nf = float(critic_b["mask"].sum() + gen_b["mask"].sum())
                    yield cb, self._put(gen_b), nf

            metrics_log = []
            for cb, gb, nf in prefetch(prepared()):
                self.state, m = prof.step(self._wgan_step, self.state, cb, gb)
                nsteps += 1
                frames += nf
                metrics_log.append(m)
        else:

            def prepared():
                for b in batches:
                    yield self._put(b), float(b["mask"].sum())

            metrics_log = []
            for gb, nf in prefetch(prepared()):
                self.state, m = prof.step(self._lse_step, self.state, gb)
                nsteps += 1
                frames += nf
                metrics_log.append(m)
        # one batched readback (per-scalar float() costs a tunnel RTT each);
        # blocks until the dispatched chain finishes, so dt is honest
        for m in jax.device_get(metrics_log):
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        dt = time.time() - t0
        if nsteps == 0 and self.cfg.train.trainer == "wgan":
            print_log(
                "WGAN epoch performed 0 steps: the corpus yields fewer than "
                f"n_critic+1={self.cfg.train.n_critic + 1} same-bucket batches "
                "per epoch; partial groups carry over to the next epoch "
                "(lower batch_size or bucket_bounds to fill groups faster)"
            )
        out = {k: v / max(nsteps, 1) for k, v in agg.items()}
        out.update(steps=nsteps, sec=dt, frames_per_sec=frames / max(dt, 1e-9))
        out.update(prof.summary())
        return out

    def _train_epoch_device(self, epoch: int, t0: float) -> Dict[str, float]:
        """Epoch over the HBM-resident corpus: only int32 indices cross the
        host link per step."""
        d = self.cfg.data
        group = (
            self.cfg.train.n_critic + 1
            if self.cfg.train.trainer == "wgan"
            else 1
        )
        step_fn = (
            self._wgan_step if self.cfg.train.trainer == "wgan" else self._lse_step
        )
        # metrics stay on device until epoch end — a float() per step costs a
        # ~30 ms tunnel round-trip and would dominate the 29 ms step
        prof = _EpochProfiler(
            self.workdir,
            self.cfg.train.profile_steps,
            active=epoch == self._profile_epoch,
        )
        metrics_log = []
        nsteps = 0
        for idx in self.dcorpus.epoch_indices(
            d.batch_size,
            group,
            epoch,
            seed=d.shuffle_seed,
            num_steps=self.cfg.train.steps_per_epoch,
        ):
            self.state, m = prof.step(
                step_fn, self.state, self.dcorpus.data, self.dcorpus.shard_indices(idx)
            )
            metrics_log.append(m)
            nsteps += 1
        # ONE device_get for all step metrics (each scalar readback is a
        # separate ~20 ms tunnel round-trip); it also blocks until the whole
        # dispatched chain has executed, so dt is honest
        metrics_host = jax.device_get(metrics_log)
        agg: Dict[str, float] = {}
        for m in metrics_host:
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        dt = time.time() - t0
        frames = nsteps * group * d.batch_size * self.dcorpus.bound
        out = {k: v / max(nsteps, 1) for k, v in agg.items()}
        out.update(steps=nsteps, sec=dt, frames_per_sec=frames / max(dt, 1e-9))
        out.update(prof.summary())
        return out

    def _validate(self) -> float:
        """Frame-weighted masked validation MSE: per-batch (error sum, frame
        count) pairs accumulate across batches, so short final batches and
        zero-masked pad rows carry exactly their frame weight (round-1
        averaged per-batch means, which biased small-corpus validation)."""
        if self.valid_ds is None or len(self.valid_ds) == 0:
            return float("nan")
        d = self.cfg.data
        err, frames = 0.0, 0.0
        for b in self.valid_ds.batches(
            d.batch_size, d.bucket_bounds, shuffle=False, drop_remainder=False
        ):
            e, f = self._eval_step(self.state, self._put(b))
            err += float(e)
            frames += float(f)
        return err / max(frames, 1.0)

    def _validate_measures(self, epoch: int) -> Optional[Dict[str, float]]:
        """Objective measures (MCD / F0 RMSE / VUV) over the valid split via
        the generation path, every ``measures_every`` epochs."""
        cfg = self.cfg.train
        if (
            cfg.measures_every <= 0
            or self.measures_stats is None
            or self.valid_ds is None
            or len(self.valid_ds) == 0
            or (epoch + 1) % cfg.measures_every != 0
        ):
            return None
        from percivaltts_tpu.eval.generate import generate

        obj = generate(
            self.cfg,
            self.state,
            self.valid_ds,
            self.measures_stats,
            outdir=os.path.join(self.workdir, "valid_gen"),
            synthesize=False,
        )
        self.metrics.log("objective", epoch=epoch, **obj)
        return obj

    def train(self, epochs: Optional[int] = None) -> Dict[str, list]:
        cfg = self.cfg.train
        epochs = cfg.epochs if epochs is None else epochs
        start_epoch = int(self.state.epoch)
        # profile the first post-compile epoch of THIS process; with a
        # single epoch to run, profile it (trace includes the compile)
        self._profile_epoch = (
            start_epoch + 1 if epochs - start_epoch > 1 else start_epoch
        )
        history: Dict[str, list] = {"train": [], "valid": []}
        last_saved = start_epoch - 1
        epoch = start_epoch - 1
        for epoch in range(start_epoch, epochs):
            tr = self._train_epoch(epoch)
            va = self._validate()
            obj = self._validate_measures(epoch)
            self.state = self.state.replace(
                # process-aware: a host-local scalar leaf would break the
                # multi-host Orbax save (see global_scalar)
                epoch=global_scalar(epoch + 1, self.mesh)
            )
            self.metrics.log("epoch", epoch=epoch, valid=va, **tr)
            history["train"].append(tr)
            history["valid"].append(va)
            print_log(
                f"epoch {epoch}: loss={tr.get('loss', float('nan')):.5f} "
                f"valid={va:.5f} ({tr['frames_per_sec']:.0f} frames/s)"
            )

            # best-model score: the configured metric (reference's WGAN
            # trainer selects on the objective measures, not the LSE loss)
            if cfg.best_metric == "mcd":
                score = obj["mcd_db"] if obj is not None else float("nan")
            elif cfg.best_metric == "mcd_gv":
                # GV-aware composite (see TrainConfig.best_gv_weight): a
                # pure-MCD rule anti-selects the WGAN arm
                score = (
                    obj["mcd_db"]
                    + cfg.best_gv_weight * abs(math.log(max(obj["gv_ratio"], 1e-6)))
                    if obj is not None
                    else float("nan")
                )
            else:
                score = va
            improved = score < self.best_valid if score == score else False
            if improved:
                self.best_valid = score
                self.best_epoch = epoch
                self._stale_evals = 0
            elif score == score:
                # patience counts EVALUATIONS of the configured metric, not
                # epochs: with best_metric='mcd' the score only exists every
                # measures_every epochs, and epoch-counted patience could
                # stop before a second measurement ever happened
                self._stale_evals += 1
            if (epoch + 1) % cfg.checkpoint_every == 0 or improved:
                m = {"valid": float(va)} if va == va else {}
                if obj is not None:
                    m.update(obj)
                if score == score:
                    m["score"] = float(score)
                self.ckpt.save(epoch, self.state, metrics=m or None)
                last_saved = epoch
            if self.best_epoch >= 0 and self._stale_evals >= cfg.patience:
                print_log(
                    f"early stopping at epoch {epoch} "
                    f"(best {self.best_valid:.5f} @ {self.best_epoch})"
                )
                break
        # a run must always end restorable: short runs (epochs <
        # checkpoint_every) otherwise save nothing and `generate` fails
        if epoch >= start_epoch and last_saved < epoch:
            self.ckpt.save(epoch, self.state, metrics=None)
        return history

    def close(self):
        self.metrics.close()
        self.ckpt.close()
