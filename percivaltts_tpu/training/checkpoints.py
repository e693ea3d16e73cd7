"""Checkpoint / resume.

Reference parity: percivaltts writes Keras ``.h5`` weights on validation
improvement and its ``cont`` flag reloads them to continue training
(``optimizertts*.py``; SURVEY.md §5 "Checkpoint/resume"); the normalization
stats ``.dat`` files written by compose.py are part of the checkpoint in
practice. Rebuilt on Orbax: one checkpoint holds generator+critic params,
both Adam states, the RNG key, and epoch/step counters; the normalization
stats (`.npz`) and config (`.json`) are stored alongside in the workdir so
generation is self-contained.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from percivaltts_tpu.training.state import GANState


class CheckpointManager:
    """Thin wrapper around an Orbax CheckpointManager for GANState pytrees."""

    def __init__(self, directory: str, keep: int = 3):
        # Orbax (0.11.x) exports no public preservation-policy module yet —
        # this private path is the only way to express LatestN∪BestN. Try
        # the public name first so an upgrade that promotes it keeps working.
        try:
            from orbax.checkpoint import preservation_policy as pp  # type: ignore
        except ImportError:
            from orbax.checkpoint._src.checkpoint_managers import (
                preservation_policy as pp,
            )

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Retention = LatestN ∪ BestN: Orbax's plain best_fn+max_to_keep
        # keeps ONLY the best-scored checkpoints — once the metric plateaus,
        # every newer save is culled immediately and resume() silently loses
        # recent epochs. "score" is the trainer's configured best metric
        # (TrainConfig.best_metric — MCD or validation MSE); saves without a
        # score (non-measure epochs when the metric is MCD with
        # measures_every > 1) rank last rather than falling back to another
        # metric (validation MSE ~0.x vs MCD in dB are incomparable).
        self._best_fn = lambda m: (m or {}).get("score", float("inf"))
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                create=True,
                enable_async_checkpointing=False,
                best_fn=self._best_fn,
                best_mode="min",
                preservation_policy=pp.AnyPreservationPolicy(
                    [
                        pp.LatestN(keep),
                        pp.BestN(
                            get_metric_fn=self._best_fn,
                            reverse=True,  # min is best
                            n=keep,
                            keep_checkpoints_without_metrics=False,
                        ),
                    ]
                ),
            ),
        )

    def save(
        self,
        step: int,
        state: GANState,
        metrics: Optional[dict] = None,
        wait: bool = True,
    ) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        """Step with the best recorded validation metric (falls back to
        latest when no metrics were recorded)."""
        step = self._mgr.best_step()
        return step if step is not None else self._mgr.latest_step()

    def best_score(self):
        """(step, score) of the best retained checkpoint, or None — lets a
        resumed Trainer re-seed its best-metric/early-stopping tracking
        instead of resetting it (which would re-checkpoint the first
        post-resume epoch as 'best' and restart the patience window)."""
        step = self._mgr.best_step()
        if step is None:
            return None
        m = self._mgr.metrics(step)
        if not m or "score" not in m:
            return None
        return step, float(m["score"])

    def restore(
        self,
        abstract_state: GANState,
        step: Optional[int] = None,
        best: bool = False,
    ) -> GANState:
        """Restore into the structure of ``abstract_state`` (a freshly built
        GANState with the same config — the reference's rebuild-model +
        load-weights resume). ``best=True`` picks the best-validation step."""
        if step is None:
            step = self.best_step() if best else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {self.directory}")
        # Cross-topology restore (e.g. TPU-trained checkpoint opened in a
        # CPU-only analysis process): ``jax.eval_shape`` leaves carry no
        # sharding, so Orbax falls back to the sharding FILE — which names
        # devices that do not exist here and fails with "sharding ... Got
        # None". Attaching a concrete default-device sharding to the
        # abstract leaves restores anywhere; leaves that already carry a
        # sharding (real state, mesh-sharded resume) are left untouched.
        import jax

        dev_sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def _with_sharding(leaf):
            if isinstance(leaf, jax.ShapeDtypeStruct) and leaf.sharding is None:
                return jax.ShapeDtypeStruct(
                    leaf.shape, leaf.dtype, sharding=dev_sharding
                )
            return leaf

        abstract_state = jax.tree.map(_with_sharding, abstract_state)
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state)
            )
        except ValueError as e:
            # Reconcile the OPTIONAL EMA branch (GANState.ema) with what the
            # checkpoint actually holds — the template is built from the
            # caller's config, which may disagree with the config the run
            # trained under (e.g. trained with `--preset production`
            # [ema_decay=0.995] and generated from the raw config, or a
            # resume that turns EMA on over a pre-EMA checkpoint). Orbax
            # surfaces that as a structure mismatch naming 'ema'.
            if "ema" not in str(e):
                raise
            if abstract_state.ema is None:
                # Checkpoint carries an EMA copy the template lacks: restore
                # it into a gen-params-shaped slot (EMA leaves are f32
                # masters regardless of param_dtype — see make_gan_state),
                # so eval_params() serves the EMA weights the run actually
                # validated/selected on.
                tmpl = abstract_state.replace(
                    ema=jax.tree.map(
                        lambda s: jax.ShapeDtypeStruct(
                            s.shape, "float32", sharding=s.sharding
                        ),
                        abstract_state.gen.params,
                    )
                )
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(tmpl)
                )
            # Template expects an EMA copy but the checkpoint predates it
            # (resume with ema_decay>0 over a non-EMA run): restore without
            # it and seed the EMA from the restored live params, exactly as
            # a fresh make_gan_state would from its init.
            restored = self._mgr.restore(
                step,
                args=ocp.args.StandardRestore(abstract_state.replace(ema=None)),
            )
            import jax.numpy as jnp

            return restored.replace(
                ema=jax.tree.map(
                    lambda p: jnp.asarray(p, jnp.float32), restored.gen.params
                )
            )

    def close(self) -> None:
        self._mgr.close()
