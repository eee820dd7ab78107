"""Training driver: epochs, metrics, validation, checkpoints, averaging.

Rebuild of the reference training loop (ref zipvoice/bin/train_zipvoice.py:
498-725, 870-1120) minus torch-isms that TPU doesn't need (GradScaler,
find_unused_parameters, set_batch_count module walking).  The ScheduledFloat
machinery is replaced by explicit schedule evaluation on the host feeding
scalar inputs (see train/schedules.py when training-time regularizers are
enabled).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Dict

import jax
import numpy as np

from zipvoice_tpu.train import checkpoint as ckpt
from zipvoice_tpu.train.scaled_adam import ScaledAdam
from zipvoice_tpu.train.step import TrainConfig, make_eval_step, make_train_step


class MetricsTracker:
    """Exp-decayed running loss (ref utils/common.py:51-140 +
    train_zipvoice.py:620: tot = tot*(1-1/200) + cur)."""

    def __init__(self, decay: float = 1.0 / 200):
        self.decay = decay
        self.tot: Dict[str, float] = {}

    def update(self, metrics: Dict[str, float]) -> Dict[str, float]:
        for k, v in metrics.items():
            v = float(v)
            if k in self.tot:
                self.tot[k] = self.tot[k] * (1 - self.decay) + v * self.decay
            else:
                self.tot[k] = v
        return dict(self.tot)


@dataclasses.dataclass
class TrainerOptions:
    exp_dir: str = "exp"
    num_epochs: int = 11
    start_epoch: int = 1
    save_every_n: int = 5000
    keep_last_k: int = 30
    average_period: int = 200
    valid_interval: int = 10000
    log_interval: int = 50
    seed: int = 42
    # epoch schedule key: "epoch" or "hour" (ref --lr-hours,
    # train_zipvoice.py:626-632: epoch := seen_hours / lr_hours * lr_epochs)
    lr_hours: float = 0.0
    # batch-count normalization for the regularizer schedules
    # (ref common.py:304-312): count = step * max_duration*world / ref_duration
    max_duration: float = 200.0
    ref_duration: float = 600.0
    # finetuning offsets the schedule count so regularizers start relaxed
    # (ref train_zipvoice.py:564-565)
    batch_count_offset: float = 0.0
    # numerical watchdogs (ref --inf-check, train_zipvoice.py:233-238)
    inf_check: bool = False
    # feature frames per second, used to convert features_lens into seen
    # hours for the --lr-hours Eden key; MUST follow the feature config
    # (24kHz/256-hop default; other configs would silently mis-key the LR
    # schedule if this stayed hardcoded)
    frame_rate: float = 93.75


class Trainer:
    def __init__(
        self,
        model_cfg,
        params,
        opt: ScaledAdam,
        train_cfg: TrainConfig,
        options: TrainerOptions,
        mesh=None,
    ):
        self.model_cfg = model_cfg
        self.opt = opt
        self.train_cfg = train_cfg
        self.opts = options
        self.mesh = mesh

        self.params = params
        self.opt_state = opt.init(params)
        self.model_avg = ckpt.init_averaged_model(params)
        self.batch_idx_train = 0
        self.seen_seconds = 0.0
        self.epoch = options.start_epoch
        self.best_train_loss = float("inf")
        self.best_valid_loss = float("inf")

        self.step_fn = make_train_step(model_cfg, opt, train_cfg, mesh=mesh)
        self.eval_fn = make_eval_step(model_cfg, train_cfg, mesh=mesh)
        # variants with per-batch objectives (stereo alternation) swap this:
        self.active_step_fn = None
        self.tracker = MetricsTracker()
        if train_cfg.use_regularizers:
            from zipvoice_tpu.train.schedules import zipvoice_schedules

            self._sched_fn = lambda count: zipvoice_schedules(count, model_cfg)
        else:
            self._sched_fn = None

        if mesh is not None:
            from zipvoice_tpu.parallel.mesh import replicate

            self.params = replicate(mesh, self.params)
            self.opt_state = replicate(mesh, self.opt_state)

        Path(options.exp_dir).mkdir(parents=True, exist_ok=True)
        self._log_path = Path(options.exp_dir) / "train_log.jsonl"
        self._tb = None  # lazily-created TBWriter (first _log call)
        self._leaf_names = None  # lazily-built param names (grad diag)

    # ---------------------------------------------------------------- utils

    def _epoch_value(self) -> float:
        """The 'epoch' fed to Eden: real epochs, or hours-of-speech re-keyed
        (ref train_zipvoice.py:626-632: Eden's epoch knee becomes lr_hours).

        eden_lr's epoch term is ((e^2+E^2)/E^2)^-0.25 with E=lr_epochs, so
        feeding hours/lr_hours * lr_epochs makes it exactly
        ((h^2+H^2)/H^2)^-0.25 with H=lr_hours — the reference's
        Eden(lr_batches, lr_hours).step_epoch(hours).  (Without the
        lr_epochs factor the decay was ~lr_epochs times too slow.)"""
        if self.opts.lr_hours > 0:
            hours = self.seen_seconds / 3600.0
            return hours / self.opts.lr_hours * self.train_cfg.lr_epochs
        return float(self.epoch - 1)

    def _shard(self, batch):
        if self.mesh is None:
            return batch
        from zipvoice_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def _log(self, record: Dict):
        record = {k: (float(v) if hasattr(v, "item") else v)
                  for k, v in record.items()}
        with open(self._log_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        # mirror scalars into TensorBoard event files (ref
        # train_zipvoice.py:712-725; writer is pure-python, utils/tb_writer)
        if self._tb is None:
            from zipvoice_tpu.utils.tb_writer import TBWriter

            self._tb = TBWriter(Path(self.opts.exp_dir) / "tensorboard")
        step = int(record.get("step", self.batch_idx_train))
        scalars = {
            f"train/{k}": v for k, v in record.items()
            if k not in ("step", "epoch") and isinstance(v, float)
        }
        if scalars:
            self._tb.add_scalars(step, scalars)

    # ---------------------------------------------------------------- steps

    def train_step(self, batch) -> Dict[str, float]:
        self.batch_idx_train += 1
        rng = jax.random.fold_in(
            jax.random.PRNGKey(self.opts.seed), self.batch_idx_train
        )
        frames = float(np.sum(batch["features_lens"]))
        # hours are GLOBAL: each host sees its equal-size local shard (the
        # sampler equalizes per-host batch counts), ref counts
        # max_duration * world_size
        self.seen_seconds += (
            frames * jax.process_count() / self.opts.frame_rate
        )
        batch = self._shard(batch)
        if self._sched_fn is not None:
            from zipvoice_tpu.train.schedules import adjusted_batch_count

            count = self.opts.batch_count_offset + adjusted_batch_count(
                self.batch_idx_train, self.opts.max_duration,
                jax.process_count(), self.opts.ref_duration,
            )
            schedules = self._sched_fn(count)
        else:
            schedules = None
        step_fn = self.active_step_fn or self.step_fn
        self.params, self.opt_state, metrics = step_fn(
            self.params, self.opt_state, batch, rng,
            np.int32(self.batch_idx_train), np.float32(self._epoch_value()),
            schedules,
        )
        if self.batch_idx_train % self.opts.average_period == 0:
            self.model_avg = ckpt.update_averaged_model(
                self.model_avg, self.params, self.batch_idx_train,
                self.opts.average_period,
            )
        return metrics

    def validate(self, valid_batches) -> float:
        losses = []
        for i, batch in enumerate(valid_batches):
            rng = jax.random.fold_in(jax.random.PRNGKey(0), i)
            losses.append(float(self.eval_fn(self.params, self._shard(batch), rng)))
        loss = float(np.mean(losses)) if losses else float("nan")
        self.best_valid_loss = min(self.best_valid_loss, loss)
        return loss

    # ------------------------------------------------------------- chkpts

    def _info(self, sampler_state=None) -> Dict:
        return {
            "batch_idx_train": self.batch_idx_train,
            "average_period": self.opts.average_period,
            "epoch": self.epoch,
            "seen_seconds": self.seen_seconds,
            "best_train_loss": self.best_train_loss,
            "best_valid_loss": self.best_valid_loss,
        }

    def save(self, filename: str, sampler_state=None, with_opt: bool = True):
        if jax.process_index() != 0:
            return
        ckpt.save_checkpoint(
            filename, self.params, model_avg=self.model_avg,
            opt_state=self.opt_state if with_opt else None,
            sampler_state=sampler_state, info=self._info(),
        )

    def save_periodic(self, sampler_state=None):
        if self.batch_idx_train % self.opts.save_every_n == 0:
            out = Path(self.opts.exp_dir)
            self.save(str(out / f"checkpoint-{self.batch_idx_train}.pt"),
                      sampler_state)
            if jax.process_index() == 0:
                ckpt.remove_checkpoints(str(out), self.opts.keep_last_k)

    def resume(self, filename: str):
        state = ckpt.load_checkpoint(filename)
        self.params = jax.tree.map(
            lambda a, b: np.asarray(b, np.asarray(a).dtype), self.params,
            state["params"],
        )
        if state["model_avg"] is not None:
            self.model_avg = ckpt.init_averaged_model(state["model_avg"])
        if state["opt_state"] is not None:
            self.opt_state = jax.tree.map(
                lambda a, b: np.asarray(b, np.asarray(a).dtype),
                self.opt_state, state["opt_state"],
            )
        info = state["info"]
        self.batch_idx_train = info.get("batch_idx_train", 0)
        self.seen_seconds = info.get("seen_seconds", 0.0)
        self.epoch = info.get("epoch", 1)
        self.best_train_loss = info.get("best_train_loss", float("inf"))
        self.best_valid_loss = info.get("best_valid_loss", float("inf"))
        if self.mesh is not None:
            from zipvoice_tpu.parallel.mesh import replicate

            self.params = replicate(self.mesh, self.params)
            self.opt_state = replicate(self.mesh, self.opt_state)
        return state["sampler"]

    # ---------------------------------------------------------------- loop

    def train_epoch(self, train_batches, valid_batches=None,
                    sampler_state_fn=None):
        for batch in train_batches:
            self.step_and_log(batch, valid_batches, sampler_state_fn)
        return self.tracker.tot

    def step_and_log(self, batch, valid_batches=None, sampler_state_fn=None):
        try:
            metrics = self.train_step(batch)
        except Exception:
            # save the failing state for post-mortem before re-raising
            # (ref train_zipvoice.py:548-559, 636-639 save_bad_model).
            # params/opt_state were DONATED into the failing step, so those
            # buffers may already be invalid; the running average (updated
            # outside the step) survives and is the recoverable snapshot.
            bad = Path(self.opts.exp_dir) / "bad-model.pt"
            try:
                self.save(str(bad))
                logging.warning("step failed; saved %s", bad)
            except Exception:  # noqa: BLE001
                try:
                    if jax.process_index() == 0:
                        ckpt.save_checkpoint(
                            str(bad), self.model_avg,
                            info=self._info(),
                        )
                        logging.warning(
                            "step failed; params were donated into the "
                            "failing step — saved the running AVERAGE to %s",
                            bad,
                        )
                except Exception:  # noqa: BLE001
                    logging.warning("step failed; could not save bad-model")
            raise
        # Only read traced metrics at the same cadence as logging (or under
        # opt-in inf_check, which already syncs every step): a per-step
        # float() would block async dispatch and stall the pipeline by one
        # host round-trip per step.
        if self.opts.inf_check or (
            self.batch_idx_train % self.opts.log_interval == 0
        ):
            clip = metrics.get("grad_clip")
            if clip is not None and float(clip) < 0.1:
                # extreme clipping: name the tensor dominating the gradient
                # norm (ref optim.py:615-631 warns + :633-748 prints the
                # dominant parameter at scale < 0.1)
                from zipvoice_tpu.train.scaled_adam import leaf_names

                if self._leaf_names is None:
                    self._leaf_names = leaf_names(self.params)
                idx = int(metrics["grad_dominant_idx"])
                name = (
                    self._leaf_names[idx]
                    if idx < len(self._leaf_names) else f"leaf{idx}"
                )
                logging.warning(
                    "step %d: grad clipped to %.3f of its norm; dominant "
                    "parameter %s (%.1f%% of rms-scaled grad^2)",
                    self.batch_idx_train, float(clip), name,
                    100.0 * float(metrics["grad_dominant_frac"]),
                )
        if self.opts.inf_check and not np.isfinite(float(metrics["loss"])):
            from zipvoice_tpu.utils.hooks import find_nonfinite

            bad_params = find_nonfinite(jax.tree.map(np.asarray, self.params))
            logging.warning(
                "inf-check: non-finite loss at step %d; bad params: %s",
                self.batch_idx_train, bad_params[:10],
            )
        if self.batch_idx_train % self.opts.log_interval == 0:
            running = self.tracker.update(
                {"loss": float(metrics["loss"]), "lr": float(metrics["lr"])}
            )
            self.best_train_loss = min(self.best_train_loss, running["loss"])
            rec = {"step": self.batch_idx_train, "epoch": self.epoch, **running}
            logging.info("train %s", rec)
            self._log(rec)
        if (
            valid_batches is not None
            and self.batch_idx_train % self.opts.valid_interval == 0
        ):
            vl = self.validate(valid_batches)
            logging.info("valid step=%d loss=%.4f", self.batch_idx_train, vl)
            self._log({"step": self.batch_idx_train, "valid_loss": vl})
        self.save_periodic(
            sampler_state_fn() if sampler_state_fn is not None else None
        )
        return metrics
