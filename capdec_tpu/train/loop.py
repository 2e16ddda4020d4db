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
from . import resume as resume_lib
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
    # Exact resume (improvement over the reference, whose
    # `--pretrain_weights` restarts the LR schedule — train.py:456-457):
    # a full Orbax train state (params + AdamW moments + step) is saved at
    # the `_latest` cadence and at each epoch end; `resume=True` restores
    # the newest one from out_dir and continues the run bit-exactly (data
    # order and per-step noise keys are derived from seed/epoch/step).
    resume: bool = False
    save_state: bool = True
    # Stop after this many global steps (None = run all epochs). The full
    # train state is saved on the way out, so a bounded run + `resume=True`
    # is equivalent to one uninterrupted run.
    max_steps: Optional[int] = None
    # Run K optimizer steps per compiled dispatch (lax.scan over stacked
    # batches) — bit-identical to K single steps, amortizes per-dispatch
    # runtime overhead, which dominates single-step wall time at this
    # model size. Checkpoint/log cadences trigger on crossing their
    # boundaries (may run up to K-1 steps late); max_steps may overshoot
    # by up to K-1.
    steps_per_dispatch: int = 1


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
    K = max(1, loop_cfg.steps_per_dispatch)
    multi_step = (step_lib.make_train_multi_step(model_cfg, tx, noise_cfg)
                  if K > 1 else None)

    # Per-step losses of the in-flight epoch are checkpointed alongside the
    # train state ("loss sidecar") so a resumed epoch's loss_per_epoch
    # entry is BIT-identical to the uninterrupted run: the epoch-end mean
    # reduces the same f32 per-step loss vector either way.
    sidecar_path = os.path.join(loop_cfg.out_dir, "epoch_losses_latest.npz")

    def save_sidecar(epoch, pending):
        vals = (np.concatenate([np.asarray(p) for p in pending])
                if pending else np.zeros((0,), np.float32))
        tmp = sidecar_path + ".tmp.npz"
        np.savez(tmp, epoch=epoch, losses=vals.astype(np.float32))
        os.replace(tmp, sidecar_path)

    loss_train, loss_val = [], []
    start_step = 0
    resume_losses = None
    if loop_cfg.resume:
        state_path = resume_lib.latest_state_path(loop_cfg.out_dir)
        if state_path is not None:
            # Capture the freshly-initialized state's placements (sharded
            # under a mesh), restore host arrays, and re-place every leaf.
            shardings = jax.tree.map(lambda x: x.sharding, state)
            state = resume_lib.restore_train_state(state_path, state)
            state = jax.tree.map(jax.device_put, state, shardings)
            start_step = int(state["step"])
            loss_json = os.path.join(loop_cfg.out_dir, "loss_per_epoch.json")
            if os.path.exists(loss_json):
                with open(loss_json) as f:
                    hist = json.load(f)
                loss_train = hist.get("train", [])[:start_step // steps]
                loss_val = hist.get("val", [])[:start_step // steps]
            if os.path.exists(sidecar_path):
                sc = np.load(sidecar_path)
                if (int(sc["epoch"]) == start_step // steps
                        and len(sc["losses"]) == start_step % steps):
                    resume_losses = np.asarray(sc["losses"], np.float32)
            print(f">>> Resuming from {state_path} at step {start_step}",
                  flush=True)

    metrics = meter_lib.MetricsLogger(
        os.path.join(loop_cfg.out_dir, "metrics.jsonl"), print_every=1)
    meter = meter_lib.ThroughputMeter()

    global_step = start_step
    base_key = key  # per-step noise keys are folded in inside the jitted step
    for epoch in range(start_step // steps, loop_cfg.epochs):
        print(f">>> Training epoch {epoch} / {loop_cfg.epochs}", flush=True)
        # Keep step dispatch free of host syncs: losses stay on device and
        # are only pulled at logging points / epoch end.
        pending_losses = []
        nb = 0
        # When resuming mid-epoch, replay the epoch's deterministic batch
        # order (seeded by seed+epoch) and skip the already-trained ones.
        skip = max(0, start_step - epoch * steps)
        if skip and resume_losses is not None:
            # pre-kill per-step losses from the sidecar: the epoch mean
            # covers ALL of the epoch's batches, exactly as uninterrupted
            pending_losses.append(jnp.asarray(resume_losses))
            nb = skip
            resume_losses = None
        stop_now = False

        def run_dispatch(batches):
            """One compiled dispatch over 1..K batches; returns stop flag."""
            nonlocal state, global_step, nb, stop_now
            k = len(batches)
            if k == 1:
                batch = batches[0]
                if batch_shard is not None:
                    batch = {key_: jax.device_put(v, batch_shard)
                             for key_, v in batch.items()}
                state, loss = train_step(state, batch, base_key)
                pending_losses.append(jnp.reshape(loss, (1,)))
            else:
                stacked = {key_: np.stack([np.asarray(b[key_])
                                           for b in batches])
                           for key_ in batches[0]}
                if batch_shard is not None:
                    sb = mesh_lib.stacked_batch_sharding(mesh)
                    stacked = {key_: jax.device_put(v, sb)
                               for key_, v in stacked.items()}
                state, losses = multi_step(state, stacked, base_key)
                pending_losses.append(losses)
            global_step += k
            nb += k
            bs0 = batches[0]["tokens"].shape
            meter.update(int(bs0[0]) * k, int(bs0[0] * bs0[1]) * k)
            if global_step % loop_cfg.log_every < k:
                metrics.log(step=global_step, epoch=epoch,
                            loss=float(pending_losses[-1][-1]),
                            lr=optim_lib.linear_warmup_lr_py(
                                loop_cfg.lr, loop_cfg.warmup_steps,
                                total_steps, global_step),
                            **meter.rates())
            if global_step % loop_cfg.latest_every_steps < k:
                ckpt_lib.save_caption_checkpoint(
                    state["params"], model_cfg,
                    ckpt_lib.latest_checkpoint_path(loop_cfg.out_dir,
                                                    loop_cfg.prefix))
                if loop_cfg.save_state:
                    # Full train state next to the weights-only `.pt`: a
                    # mid-epoch crash no longer loses the AdamW moments and
                    # step counter (the reference deficiency, train.py:359).
                    resume_lib.save_train_state(state, loop_cfg.out_dir)
                    save_sidecar(epoch, pending_losses)
            if loop_cfg.max_steps and global_step >= loop_cfg.max_steps:
                stop_now = True

        buf = []
        for bi, batch in enumerate(
                data_lib.iterate_batches(ds, loop_cfg.batch_size,
                                         seed=loop_cfg.seed, epoch=epoch)):
            if bi < skip:
                continue
            buf.append(batch)
            if len(buf) == K:
                run_dispatch(buf)
                buf = []
                if stop_now:
                    break
        if not stop_now:
            for batch in buf:  # epoch leftover (< K): single steps
                run_dispatch([batch])
                if stop_now:
                    break
        if stop_now:
            if loop_cfg.save_state:
                resume_lib.save_train_state(state, loop_cfg.out_dir)
                save_sidecar(epoch, pending_losses)
            metrics.close()
            print(f">>> Stopped at max_steps={global_step}", flush=True)
            return {"params": state["params"], "loss_per_epoch":
                    {"train": loss_train, "val": loss_val}}
        acc = (float(jnp.sum(jnp.concatenate(pending_losses)))
               if pending_losses else 0.0)
        loss_train.append(acc / max(1, nb))
        print("loss_per_epoch_train: ", loss_train, flush=True)

        if epoch % loop_cfg.save_every == 0 or epoch == loop_cfg.epochs - 1:
            ckpt_lib.save_caption_checkpoint(
                state["params"], model_cfg,
                ckpt_lib.epoch_checkpoint_path(loop_cfg.out_dir,
                                               loop_cfg.prefix, epoch))
        if loop_cfg.save_state:
            resume_lib.save_train_state(state, loop_cfg.out_dir)
            save_sidecar(epoch + 1, [])  # next epoch starts fresh

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
