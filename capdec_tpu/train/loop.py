"""The training loop: epochs, checkpoint cadence, metrics — reference
semantics (train.py:317-392) on a jitted, mesh-sharded step.

Artifact contract kept from the reference:
  * `{prefix}_latest.pt` every 10,000 steps (train.py:359-363)
  * `{prefix}-{epoch:03d}.pt` when `epoch % save_every == 0` or last epoch
  * `loss_per_epoch.json` with {"train": [...], "val": [...]}
  * validation pass runs WITHOUT noise (train.py:372-389)

TPU-first additions: a single compiled step with donated state, batches
device_put with dp sharding ahead of dispatch, per-step structured metrics
(loss, lr, tokens/sec) to JSONL.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import dataset as data_lib
from ..models import caption_model
from ..parallel import mesh as mesh_lib
from ..utils import checkpoint as ckpt_lib
from ..utils import meter as meter_lib
from . import optim as optim_lib
from . import step as step_lib


@dataclasses.dataclass
class TrainLoopConfig:
    epochs: int = 10
    batch_size: int = 34
    lr: float = 2e-5
    warmup_steps: int = 5000
    save_every: int = 1
    out_dir: str = "./checkpoints"
    prefix: str = "coco_prefix"
    latest_every_steps: int = 10000
    seed: int = 0
    log_every: int = 100


def train(model_cfg: caption_model.CaptionModelConfig,
          loop_cfg: TrainLoopConfig,
          ds: data_lib.CaptionDataset,
          noise_cfg: step_lib.NoiseConfig,
          val_ds: Optional[data_lib.CaptionDataset] = None,
          params: Optional[Any] = None,
          mesh: Optional[Any] = None) -> Dict[str, Any]:
    """Run training; returns {"params", "loss_per_epoch"}."""
    os.makedirs(loop_cfg.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(loop_cfg.seed)
    if params is None:
        key, k_init = jax.random.split(key)
        params = caption_model.init_params(k_init, model_cfg)

    steps = data_lib.steps_per_epoch(ds, loop_cfg.batch_size)
    total_steps = loop_cfg.epochs * steps
    mask = caption_model.trainable_mask(params, model_cfg)
    tx = optim_lib.make_optimizer(loop_cfg.lr, loop_cfg.warmup_steps,
                                  total_steps, trainable_mask=mask)

    if mesh is not None:
        specs = mesh_lib.caption_model_param_specs(params)
        params = mesh_lib.shard_params(params, mesh, specs)
        batch_shard = mesh_lib.batch_sharding(mesh)
    else:
        batch_shard = None

    state = step_lib.init_train_state(params, tx)
    train_step = step_lib.make_train_step(model_cfg, tx, noise_cfg)
    eval_step = step_lib.make_eval_step(model_cfg)

    metrics = meter_lib.MetricsLogger(
        os.path.join(loop_cfg.out_dir, "metrics.jsonl"), print_every=1)
    meter = meter_lib.ThroughputMeter()

    loss_train, loss_val = [], []
    global_step = 0
    base_key = key  # per-step noise keys are folded in inside the jitted step
    for epoch in range(loop_cfg.epochs):
        print(f">>> Training epoch {epoch} / {loop_cfg.epochs}", flush=True)
        # Keep step dispatch free of host syncs: losses stay on device and
        # are only pulled at logging points / epoch end.
        pending_losses = []
        nb = 0
        for batch in data_lib.iterate_batches(ds, loop_cfg.batch_size,
                                              seed=loop_cfg.seed, epoch=epoch):
            if batch_shard is not None:
                batch = {k: jax.device_put(v, batch_shard)
                         for k, v in batch.items()}
            state, loss = train_step(state, batch, base_key)
            pending_losses.append(loss)
            global_step += 1
            nb += 1
            ntok = int(batch["tokens"].shape[0] * batch["tokens"].shape[1])
            meter.update(int(batch["tokens"].shape[0]), ntok)
            if global_step % loop_cfg.log_every == 0:
                metrics.log(step=global_step, epoch=epoch,
                            loss=float(pending_losses[-1]),
                            lr=optim_lib.linear_warmup_lr_py(
                                loop_cfg.lr, loop_cfg.warmup_steps,
                                total_steps, global_step),
                            **meter.rates())
            if global_step % loop_cfg.latest_every_steps == 0:
                ckpt_lib.save_caption_checkpoint(
                    state["params"], model_cfg,
                    ckpt_lib.latest_checkpoint_path(loop_cfg.out_dir,
                                                    loop_cfg.prefix))
        acc = float(jnp.sum(jnp.stack(pending_losses))) if pending_losses else 0.0
        loss_train.append(acc / max(1, nb))
        print("loss_per_epoch_train: ", loss_train, flush=True)

        if epoch % loop_cfg.save_every == 0 or epoch == loop_cfg.epochs - 1:
            ckpt_lib.save_caption_checkpoint(
                state["params"], model_cfg,
                ckpt_lib.epoch_checkpoint_path(loop_cfg.out_dir,
                                               loop_cfg.prefix, epoch))

        if val_ds is not None:
            vacc, vn = 0.0, 0
            for batch in data_lib.iterate_batches(val_ds, loop_cfg.batch_size,
                                                  seed=loop_cfg.seed,
                                                  epoch=epoch):
                if batch_shard is not None:
                    batch = {k: jax.device_put(v, batch_shard)
                             for k, v in batch.items()}
                vacc += float(eval_step(state["params"], batch))
                vn += 1
            loss_val.append(vacc / max(1, vn))
            print("loss_per_epoch_val: ", loss_val, flush=True)

        with open(os.path.join(loop_cfg.out_dir, "loss_per_epoch.json"), "w") as f:
            json.dump({"train": loss_train, "val": loss_val}, f)

    metrics.close()
    return {"params": state["params"], "loss_per_epoch":
            {"train": loss_train, "val": loss_val}}
