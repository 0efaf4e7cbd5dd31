"""Epoch driver: train/eval/test passes, best-MAE model selection, Orbax.

Mirrors the reference driver's behavior (main_frame_val_text_missing.py:333-396):
per epoch — train pass, eval pass, LR step (baked into the optax schedule),
test pass, ``eval_mosei_metric`` for full and missing views, best-MAE
tracking per view, checkpoint of the best. Differences: metrics accumulate
on device during training; checkpoints are Orbax (with the torch->jax
converter as the import path for reference checkpoints).
"""

from __future__ import annotations

import os
import signal
import time
from typing import Dict, Optional

import jax
import numpy as np

from sdumc_tpu.core.config import ExperimentConfig
from sdumc_tpu.core.metrics import eval_mosei_metric
from sdumc_tpu.data.pipeline import BatchIterator, MoseiDataset
from sdumc_tpu.train.schedule import make_lr_schedule
from sdumc_tpu.train.state import create_train_state
from sdumc_tpu.train.step import batch_to_device_dict, make_eval_step, make_train_step


def _pad_partial(batch, bs):
    """Repeat-pad a partial eval batch to the static batch size (rows are
    independent in eval; preds are sliced back on host)."""
    n = batch.size
    if n == bs:
        return batch, n
    import dataclasses

    reps = [min(n - 1, i) for i in range(n, bs)]

    def pad(arr):
        return np.concatenate([arr, arr[reps]], axis=0) if len(reps) else arr

    padded = dataclasses.replace(
        batch,
        audio=pad(batch.audio), text=pad(batch.text), video=pad(batch.video),
        feat4=pad(batch.feat4), emos=pad(batch.emos), vals=pad(batch.vals),
        lengths=np.concatenate([batch.lengths, batch.lengths[:, reps]], axis=1)
        if len(reps) else batch.lengths,
        names=batch.names + [batch.names[-1]] * len(reps),
    )
    return padded, n


def run_eval(eval_step, params, dataset: MoseiDataset, cfg: ExperimentConfig,
             mesh=None, shard=(0, 1), multihost=False):
    """Full eval pass -> dict with preds/labels/metrics for both views.

    Multi-host: each process evaluates only its BatchIterator shard (eval
    batches stay host-local — replicated params, no cross-host collective
    needed for a forward), then predictions/labels are all-gathered so every
    process computes identical metrics."""
    it = BatchIterator(
        dataset,
        cfg.data.batch_size,
        shuffle=False,
        buckets=cfg.data.length_buckets,
        shard_index=shard[0],
        shard_count=shard[1],
    )
    preds_full, preds_missing, labels, names = [], [], [], []
    for batch in it:
        padded, n = _pad_partial(batch, cfg.data.batch_size)
        d = batch_to_device_dict(padded, mesh if not multihost else None,
                                 feature_dtype=cfg.data.feature_dtype)
        v0, v1 = eval_step(params, d)
        preds_full.append(np.asarray(v0)[:n])
        preds_missing.append(np.asarray(v1)[:n])
        labels.append(batch.vals)
        names.extend(batch.names)
    preds_full = np.concatenate(preds_full) if preds_full else np.zeros((0,))
    preds_missing = (
        np.concatenate(preds_missing) if preds_missing else np.zeros((0,)))
    labels = np.concatenate(labels) if labels else np.zeros((0,))
    if multihost and shard[1] > 1:
        from jax.experimental import multihost_utils

        # shards can be ragged (dataset % process_count != 0): pad every
        # process to the same cap and carry the true count through the gather
        cap = (len(dataset) + shard[1] - 1) // shard[1]
        n_local = len(labels)

        def pad_to(a):
            return np.pad(a.astype(np.float32), (0, cap - len(a)))

        gathered = multihost_utils.process_allgather(
            {"pf": pad_to(preds_full), "pm": pad_to(preds_missing),
             "lb": pad_to(labels), "n": np.int32(n_local)},
            tiled=False,
        )
        counts = np.asarray(gathered["n"]).reshape(-1)
        preds_full = np.concatenate(
            [np.asarray(gathered["pf"])[p][: counts[p]] for p in range(shard[1])])
        preds_missing = np.concatenate(
            [np.asarray(gathered["pm"])[p][: counts[p]] for p in range(shard[1])])
        labels = np.concatenate(
            [np.asarray(gathered["lb"])[p][: counts[p]] for p in range(shard[1])])
        names = None  # local names no longer align with gathered rows
    return {
        "val_preds_full": preds_full,
        "val_preds_missing": preds_missing,
        "val_labels": labels,
        "names": names,
        "val_mse_full": float(np.mean((preds_full - labels) ** 2)),
        "val_mse_missing": float(np.mean((preds_missing - labels) ** 2)),
        "metric_full": eval_mosei_metric(preds_full, labels, names),
        "metric_missing": eval_mosei_metric(preds_missing, labels, names),
    }


class PreemptionGuard:
    """SIGTERM watcher for preemptible/spot TPU VMs: the epoch loop polls
    ``fired`` once per step; on a signal it saves a resumable 'latest'
    checkpoint and returns cleanly inside the grace window — the
    interrupted epoch is redone on resume. (The reference has no failure
    handling at all, SURVEY §5; a preemption loses the run.) The previous
    handler is chained; installation is skipped off the main thread."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self.fired = False
        for sig in signals:
            try:
                prev = signal.getsignal(sig)

                def handler(signum, frame, _prev=prev):
                    self.fired = True
                    if callable(_prev):
                        _prev(signum, frame)

                signal.signal(sig, handler)
            except ValueError:  # not the main thread
                pass


def train(
    cfg: ExperimentConfig,
    model,
    params,
    train_ds: MoseiDataset,
    eval_ds: MoseiDataset,
    test_ds: MoseiDataset,
    mesh=None,
    log=print,
    resume_from: Optional[str] = None,
    shard=(0, 1),
    multihost: bool = False,
    preemption_guard=None,
) -> Dict:
    """``shard=(process_index, process_count)`` + ``multihost=True`` turns
    the same loop into multi-host DP: each host reads its BatchIterator
    shard, global arrays are assembled via
    jax.make_array_from_process_local_data, and the jitted step's grads /
    metric sums are global (parallel/multihost.py)."""
    if multihost:
        from sdumc_tpu.parallel.multihost import (host_local_batch_to_global,
                                                  warmup_collectives)

        warmup_collectives(mesh)
    guard = preemption_guard if preemption_guard is not None else PreemptionGuard()
    steps_per_epoch = max(len(train_ds) // cfg.data.batch_size, 1)
    lr_sched = make_lr_schedule(
        cfg.train.lr, steps_per_epoch, cfg.train.warmup_epochs,
        cfg.train.decay_gamma, cfg.train.decay_stepsize,
    )
    state = create_train_state(model, params, lr_sched, cfg.train.l2)
    train_step = make_train_step(model, cfg.loss)
    eval_step = make_eval_step(model)
    rng = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)

    best_full = {"mae": float("inf")}
    best_missing = {"mae": float("inf")}
    history = []
    start_epoch = 0

    # --- fault-tolerant resume (the reference has none, SURVEY §5): restore
    # full optimizer state + bests from the per-epoch "latest" checkpoint.
    if resume_from:
        blob = load_checkpoint_full(resume_from, state)
        state = blob["state"]
        start_epoch = int(blob["epoch"]) + 1
        best_full = blob.get("best_full", best_full)
        best_missing = blob.get("best_missing", best_missing)
        log(f"resumed from {resume_from} at epoch {start_epoch}")

    # multihost: every host contributes bs/process_count rows per global step.
    # Hosts must agree on the GLOBAL array shapes each step, so per-batch
    # bucket choice (content-dependent, host-local) is disabled: every batch
    # pads to the largest bucket. t_max masking keeps the numerics identical;
    # only pad compute is wasted (single-host keeps full bucketing).
    local_bs = cfg.data.batch_size // shard[1] if multihost else cfg.data.batch_size
    train_buckets = (
        (max(cfg.data.length_buckets),) if multihost else cfg.data.length_buckets
    )
    for epoch in range(start_epoch, cfg.train.epochs):
        # epoch-boundary snapshot (host RAM): what a preemption mid-epoch
        # saves, so resume replays the epoch exactly as if uninterrupted
        boundary = {"params": jax.device_get(state.params),
                    "opt_state": jax.device_get(state.opt_state),
                    "step": int(state.step)}
        t0 = time.time()
        it = BatchIterator(
            train_ds, local_bs,
            shuffle=True, seed=cfg.data.shuffle_seed, epoch=epoch,
            buckets=train_buckets, drop_remainder=True,
            shard_index=shard[0], shard_count=shard[1],
        )
        if multihost:
            # every host MUST take the same number of steps (collectives
            # deadlock otherwise); the bound is computable without
            # communication from the minimum shard size
            import itertools

            n_steps = (len(train_ds) // shard[1]) // local_bs
            it = itertools.islice(iter(it), n_steps)
        # Metrics accumulate as device scalars — no per-step host sync (the
        # reference's .cpu().numpy() per batch, main:156-158, and round-1's
        # float() per step both blocked the dispatch pipeline). One fetch
        # per epoch.
        acc = None
        n_clips = 0
        for batch in it:
            if multihost:
                d = batch_to_device_dict(batch, None, feature_dtype=cfg.data.feature_dtype)
                t_max = d.pop("t_max")
                d = host_local_batch_to_global(mesh, d)
                d["t_max"] = t_max
            else:
                d = batch_to_device_dict(batch, mesh, feature_dtype=cfg.data.feature_dtype)
            state, metrics = train_step(state, d, rng)
            acc = (
                metrics if acc is None
                else jax.tree_util.tree_map(jax.numpy.add, acc, metrics)
            )
            n_clips += batch.size
            if guard.fired:
                break
        if guard.fired:
            # save the epoch-boundary snapshot under epoch-1 semantics:
            # --resume replays this epoch and the continued run is
            # step-for-step identical to an uninterrupted one (tested)
            state_b = state.replace(
                params=boundary["params"], opt_state=boundary["opt_state"],
                step=jnp_int(boundary["step"]))
            save_checkpoint(cfg, state_b, tag="latest", epoch=epoch - 1,
                            best_full=best_full, best_missing=best_missing)
            log(f"preemption signal: saved resumable checkpoint, "
                f"epoch {epoch} will be redone on --resume")
            return {"state": state_b, "best_full": best_full,
                    "best_missing": best_missing, "history": history,
                    "preempted": True}
        acc = jax.device_get(acc) if acc is not None else {}
        train_time = time.time() - t0
        cnt = float(acc.get("count", 0.0))
        train_mse_full = float(acc.get("sq_err_full", 0.0)) / max(cnt, 1)
        train_mse_missing = float(acc.get("sq_err_missing", 0.0)) / max(cnt, 1)

        eval_results = run_eval(eval_step, state.params, eval_ds, cfg, mesh,
                                shard=shard, multihost=multihost)
        test_results = run_eval(eval_step, state.params, test_ds, cfg, mesh,
                                shard=shard, multihost=multihost)

        tr_full = test_results["metric_full"]
        tr_missing = test_results["metric_missing"]
        if tr_full["mae"] <= best_full.get("mae", float("inf")):
            best_full = dict(tr_full, epoch=epoch)
            save_checkpoint(cfg, state, tag="best_full")
        if tr_missing["mae"] <= best_missing.get("mae", float("inf")):
            best_missing = dict(tr_missing, epoch=epoch)
            save_checkpoint(cfg, state, tag="best_missing")
        # per-epoch resumable checkpoint (params + optimizer + bests)
        save_checkpoint(cfg, state, tag="latest", epoch=epoch,
                        best_full=best_full, best_missing=best_missing)

        log(
            f"epoch:{epoch + 1}; train_val_mse_full:{train_mse_full:.4f}; "
            f"train_val_mse_missing:{train_mse_missing:.4f}; "
            f"test_mae_full:{tr_full['mae']:.4f}; test_mae_missing:{tr_missing['mae']:.4f}; "
            f"{n_clips / max(train_time, 1e-9):.1f} clips/s"
        )
        history.append(
            {
                "epoch": epoch,
                "train_mse_full": train_mse_full,
                "train_mse_missing": train_mse_missing,
                "eval_mse_full": eval_results["val_mse_full"],
                "test": {"full": tr_full, "missing": tr_missing},
                "clips_per_sec": n_clips / max(train_time, 1e-9),
            }
        )

    return {
        "state": state,
        "best_full": best_full,
        "best_missing": best_missing,
        "history": history,
    }


def save_checkpoint(cfg: ExperimentConfig, state, tag: str = "latest",
                    epoch: Optional[int] = None, best_full: Optional[dict] = None,
                    best_missing: Optional[dict] = None) -> Optional[str]:
    """Orbax save (reference equivalent: torch.save of
    {'epoch','state_dict','optimizer'}, main:375). The 'latest' tag also
    carries the optimizer state for mid-run resume."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return None
    path = os.path.abspath(os.path.join(cfg.train.checkpoint_dir, tag))
    blob = {"params": jax.device_get(state.params), "step": int(state.step)}
    if epoch is not None:
        blob["opt_state"] = jax.device_get(state.opt_state)
        blob["epoch"] = int(epoch)
        # fixed structure for orbax restore-with-target
        blob["best_full"] = {
            "mae": float((best_full or {}).get("mae", 1e9)),
            "epoch": int((best_full or {}).get("epoch", -1)),
        }
        blob["best_missing"] = {
            "mae": float((best_missing or {}).get("mae", 1e9)),
            "epoch": int((best_missing or {}).get("epoch", -1)),
        }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, blob, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def load_checkpoint_full(path: str, template_state):
    """Restore a 'latest' checkpoint into a TrainState (params + optimizer +
    step), using the freshly-built state as the structure template."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": jax.device_get(template_state.params),
        "step": 0,
        "opt_state": jax.device_get(template_state.opt_state),
        "epoch": 0,
        "best_full": {"mae": 1e9, "epoch": -1},
        "best_missing": {"mae": 1e9, "epoch": -1},
    }
    blob = ckptr.restore(os.path.abspath(path), target=target)
    state = template_state.replace(
        params=blob["params"],
        opt_state=blob["opt_state"],
        step=jnp_int(blob["step"]),
    )
    return {
        "state": state,
        "epoch": blob["epoch"],
        "best_full": blob["best_full"],
        "best_missing": blob["best_missing"],
    }


def jnp_int(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.int32)
