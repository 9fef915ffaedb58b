"""SPMD training loop — the TPU replacement for the reference's forked
pytorch-lightning trainer (``NeuralSeq/utils/pl_utils.py`` ``BaseTrainer``,
1618 LoC of process spawning, DDP wrapping, closure juggling).

Design (SURVEY.md §2.6, §7.10): ONE process per host, ONE jitted train step
whose gradient allreduce is a compiler-inserted ``psum`` over the mesh's
``data`` axis (donated state, so optimizer memory stays put). What survives
from the reference's semantics, because it matters:

  * grad accumulation (``optax.MultiSteps`` inside the step — vs the closure
    loop at ``pl_utils.py:1476-1544``),
  * global-norm clipping (``pl_utils.py:1535``),
  * validate every ``val_check_interval`` steps, sanity-val at start
    (``pl_utils.py:555-565,1400-1405``),
  * atomic keep-N + best checkpoints, resume-from-newest,
  * hard stop at ``max_updates`` (``pl_utils.py:1427-1429``),
  * NaN guard: skip + count non-finite losses instead of crashing
    (reference prints NaN grads, ``pl_utils.py:1079``).

A :class:`Task` owns the model: params init, loss, and (optionally) multiple
optimized param groups for GANs (the reference's multi-optimizer batches,
``pl_utils.py:1436``) via one :class:`TrainStepSpec` per group.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable, Mapping, Protocol

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from audiogpt_tpu.parallel.mesh import make_mesh, shard_batch
from audiogpt_tpu.train.checkpoint import CheckpointStore
from audiogpt_tpu.train.metrics import MeterBank, MetricsLogger
from audiogpt_tpu.train.optim import OptimConfig, make_optimizer


class Task(Protocol):
    """A training recipe. ``loss_fns`` maps group name → loss callable
    ``(params_all, batch, rng) -> (loss, metrics)`` where gradients are taken
    w.r.t. ``params_all[group]``. Single-model tasks have one group."""

    def init_params(self, rng: jax.Array) -> dict[str, Any]: ...
    @property
    def loss_fns(self) -> Mapping[str, Callable]: ...
    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]: ...


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    work_dir: str = "work_dir"
    max_updates: int = 1_000_000          # config_base.yaml max_updates
    val_check_interval: int = 2000
    num_sanity_val_steps: int = 2
    log_interval: int = 100
    num_ckpt_keep: int = 3
    monitor: str = "total_loss"
    seed: int = 1234
    use_tensorboard: bool = True


class Trainer:
    def __init__(self, task: Task, cfg: TrainerConfig | None = None,
                 mesh=None):
        self.task = task
        self.cfg = cfg or TrainerConfig()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.groups = list(task.loss_fns.keys())
        self.tx = {g: make_optimizer(task.optim_cfgs[g]) for g in self.groups}
        self.logger = MetricsLogger(self.cfg.work_dir, self.cfg.use_tensorboard)
        self.store = CheckpointStore(self.cfg.work_dir, self.cfg.num_ckpt_keep,
                                     monitor=self.cfg.monitor)
        self._train_steps: dict[str, Any] = {}
        self._compiled_steps: dict[Any, Any] = {}
        self._flops_window = 0.0
        self._val_step = None

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: jax.Array | None = None) -> dict[str, Any]:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        params = self.task.init_params(rng)
        assert set(params) >= set(self.groups), \
            f"task params groups {set(params)} must cover {set(self.groups)}"
        repl = NamedSharding(self.mesh, P())
        params = jax.tree.map(lambda x: jax.device_put(x, repl), params)
        opt_state = {g: self.tx[g].init(params[g]) for g in self.groups}
        opt_state = jax.tree.map(lambda x: jax.device_put(x, repl), opt_state)
        # weight-EMA shadows (reference LitEma, ddpm.py use_ema) — one copy
        # per group that asks for it, resident next to the live params
        ema = {g: jax.tree.map(jnp.array, params[g]) for g in self.groups
               if self.task.optim_cfgs[g].ema_decay > 0.0}
        return {"params": params, "opt": opt_state, "ema": ema,
                "step": jax.device_put(jnp.zeros((), jnp.int32), repl)}

    def restore_or_init(self) -> dict[str, Any]:
        state = self.init_state()
        latest = self.store.latest_step()
        if latest is not None:
            state = self._restore_compat(state, latest)
            if self.logger.is_main:
                print(f"| resumed from step {latest}")
        return state

    def _restore_compat(self, state: dict[str, Any], step: int) -> dict[str, Any]:
        """Restore tolerating EMA-layout drift: checkpoints written before a
        recipe turned EMA on (or with different EMA'd groups) have a different
        ``state['ema']`` subtree, which a plain Orbax StandardRestore rejects
        with a tree-structure mismatch. Probe the saved layout, restore
        exactly what was saved, and seed any missing EMA shadows from the
        restored params (= what LitEma does on first construction)."""
        try:
            return self.store.restore(state, step)
        except Exception as first_err:
            saved_ema = self.store.saved_ema_groups(step)
        target: dict[str, Any] = {k: state[k] for k in ("params", "opt", "step")}
        if saved_ema:
            target["ema"] = {
                g: (state["ema"].get(g) or state["params"][g])
                for g in saved_ema if g in state["params"]}
        try:
            restored = self.store.restore(target, step)
        except Exception as second_err:
            # not EMA-layout drift (shape mismatch, corrupt dir, ...):
            # raise the legacy-path error with the original failure chained
            # as its cause, so both restore attempts are visible
            raise second_err from first_err
        ema = {g: restored.get("ema", {}).get(
                   g, jax.tree.map(jnp.array, restored["params"][g]))
               for g in state["ema"]}
        return {"params": restored["params"], "opt": restored["opt"],
                "ema": ema, "step": restored["step"]}

    # -- compiled steps ------------------------------------------------------
    def ema_params(self, state) -> dict[str, Any]:
        """Params with EMA-tracked groups swapped in — the eval/export view
        (the reference samples and checkpoints under ``ema_scope``,
        ddpm.py ``use_ema``)."""
        params = dict(state["params"])
        params.update(state.get("ema", {}))
        return params

    def _make_train_step(self, group: str):
        loss_fn = self.task.loss_fns[group]
        tx = self.tx[group]
        optim_cfg = self.task.optim_cfgs[group]

        def step_fn(state, batch, rng):
            params = state["params"]
            # expose the global step to step-dependent losses (KL ramps,
            # posterior warmups) without a second jit argument
            batch = dict(batch)
            batch.setdefault("step", state["step"])

            def scoped(p_g):
                p_all = dict(params)
                p_all[group] = p_g
                loss, metrics = loss_fn(p_all, batch, rng)
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(
                scoped, has_aux=True)(params[group])
            finite = jnp.isfinite(loss)
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, new_opt_g = tx.update(
                grads, state["opt"][group], params[group])
            new_p_g = optax.apply_updates(params[group], updates)
            new_params = dict(params)
            new_params[group] = new_p_g
            new_opt = dict(state["opt"])
            new_opt[group] = new_opt_g
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["nonfinite"] = 1.0 - finite.astype(jnp.float32)
            new_ema = dict(state.get("ema", {}))
            if optim_cfg.ema_decay > 0.0:
                # LitEma semantics (ldm/modules/ema.py): shadow -= (1-d) *
                # (shadow - p), with d ramped by update count — fused into
                # this step's program, no extra dispatch. Decay counts
                # trainer steps (the reference has no grad accumulation on
                # its EMA'd recipes).
                d = jnp.asarray(optim_cfg.ema_decay, jnp.float32)
                if optim_cfg.ema_warmup:
                    # LitEma increments num_updates BEFORE computing
                    # (1+n)/(10+n), so with n = this update's 1-based count
                    # the first update uses decay 2/11.
                    n = state["step"].astype(jnp.float32) + 1.0
                    d = jnp.minimum(d, (n + 1.0) / (10.0 + n))
                new_ema[group] = jax.tree.map(
                    lambda e, p: e - (1.0 - d) * (e - p),
                    state["ema"][group], new_p_g)
            new_state = {"params": new_params, "opt": new_opt, "ema": new_ema,
                         "step": state["step"] + (1 if group == self.groups[-1] else 0)}
            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    def train_step(self, group: str):
        if group not in self._train_steps:
            self._train_steps[group] = self._make_train_step(group)
        return self._train_steps[group]

    def _run_step(self, group: str, state, batch, rng):
        """AOT-compile once per (group, batch bucket); the compiled
        executable also yields XLA's exact flop count, so the metrics log
        can report MFU against chip peak (SURVEY.md §5 — the reference has
        wall-clock timers only). Falls back to the traced path when the
        backend exposes no cost analysis."""
        key = (group, tuple(sorted((k, getattr(v, "shape", ()),
                                    str(getattr(v, "dtype", type(v))))
                                   for k, v in batch.items())))
        entry = self._compiled_steps.get(key)
        if entry is None:
            fn = self.train_step(group)
            flops = None
            try:
                compiled = fn.lower(state, batch, rng).compile()
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0] if ca else {}
                flops = float(ca.get("flops", 0.0)) or None
                entry = (compiled, flops)
            except Exception:
                entry = (fn, None)
            self._compiled_steps[key] = entry
        compiled, flops = entry
        if flops:
            self._flops_window += flops
        return compiled(state, batch, rng)

    def _make_val_step(self):
        val_fn = getattr(self.task, "val_loss_fn", None)
        if val_fn is None:
            # default: sum of all group losses
            def val_fn(params, batch, rng):
                total, metrics = 0.0, {}
                for g, fn in self.task.loss_fns.items():
                    l, m = fn(params, batch, rng)
                    total += l
                    metrics.update({f"{g}_{k}": v for k, v in m.items()})
                metrics["total_loss"] = total
                return total, metrics

        def step_fn(params, batch, rng):
            _, metrics = val_fn(params, batch, rng)
            return metrics

        return jax.jit(step_fn)

    # -- loops ---------------------------------------------------------------
    def validate(self, state, val_batches: Iterable, max_batches: int | None = None
                 ) -> dict[str, float]:
        if self._val_step is None:
            self._val_step = self._make_val_step()
        bank = MeterBank()
        rng = jax.random.PRNGKey(0)
        first_batch = None
        # EMA recipes validate (and pick best-by-monitor) on the shadow
        # weights — the reference runs validation/sampling under ema_scope
        # (ddpm.py use_ema), and those are the weights that get exported.
        val_params = self.ema_params(state) if state.get("ema") \
            else state["params"]
        for i, batch in enumerate(val_batches):
            if max_batches is not None and i >= max_batches:
                break
            batch = shard_batch(batch, self.mesh)
            if first_batch is None:
                first_batch = batch
            metrics = self._val_step(val_params, batch, rng)
            n = int(np.asarray(batch["weight"]).sum()) if "weight" in batch \
                else next(iter(batch.values())).shape[0]
            bank.update(jax.device_get(metrics), n=max(n, 1))
        avgs = bank.averages()
        if "total_loss" not in avgs and avgs:
            avgs["total_loss"] = sum(
                v for k, v in avgs.items() if k.endswith("loss"))
        # validation visuals (save_valid_result parity): tasks may expose
        # visualize(params, batch, rng) -> {name: (mel_pred, mel_gt|None)}
        if first_batch is not None and hasattr(self.task, "visualize"):
            try:
                figs = self.task.visualize(val_params, first_batch, rng)
                step = int(jax.device_get(state["step"]))
                for name, (pred, gt) in figs.items():
                    self.logger.log_mel_figure(
                        step, name, np.asarray(pred),
                        None if gt is None else np.asarray(gt))
            except Exception as e:  # plots must never kill training
                if self.logger.is_main:
                    print(f"| visualize failed: {e}")
        return avgs

    def fit(self, train_batches: Iterable, val_batches_fn: Callable[[], Iterable]
            | None = None, max_updates: int | None = None) -> dict[str, Any]:
        cfg = self.cfg
        max_updates = max_updates if max_updates is not None else cfg.max_updates
        state = self.restore_or_init()

        # Preemption handling (reference has none — SURVEY.md §5): SIGTERM /
        # SIGINT requests a graceful stop; the loop checkpoints and returns,
        # so a restarted job resumes at the same step.
        stop_requested = {"flag": False}
        old_handlers = {}
        try:
            import signal

            def _request_stop(signum, frame):
                stop_requested["flag"] = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _request_stop)
        except (ValueError, OSError):
            pass  # non-main thread / restricted env: no handler, no harm
        start_step = int(jax.device_get(state["step"]))
        rng = jax.random.PRNGKey(cfg.seed + start_step)

        if val_batches_fn is not None and cfg.num_sanity_val_steps > 0 \
                and start_step == 0:
            sanity = self.validate(state, val_batches_fn(),
                                   max_batches=cfg.num_sanity_val_steps)
            self.logger.log(0, sanity, prefix="sanity")

        bank = MeterBank()
        t0 = time.time()
        step = start_step
        for batch in train_batches:
            if step >= max_updates or stop_requested["flag"]:
                break
            batch = shard_batch(batch, self.mesh)
            rng, krng = jax.random.split(rng)
            for group in self.groups:
                state, metrics = self._run_step(group, state, batch, krng)
                bank.update(jax.device_get(metrics))
            step += 1

            if step % cfg.log_interval == 0:
                avgs = bank.averages()
                elapsed = max(time.time() - t0, 1e-9)
                avgs["steps_per_sec"] = cfg.log_interval / elapsed
                if self._flops_window:
                    from audiogpt_tpu.utils.flops import peak_flops

                    peak = peak_flops()
                    if peak is not None:
                        n_dev = max(self.mesh.size, 1)
                        avgs["mfu"] = (self._flops_window / elapsed /
                                       (peak[0] * n_dev))
                    self._flops_window = 0.0
                self.logger.log(step, avgs, prefix="tr")
                bank.reset()
                t0 = time.time()

            if step % cfg.val_check_interval == 0:
                val_metrics = {}
                if val_batches_fn is not None:
                    val_metrics = self.validate(state, val_batches_fn())
                    self.logger.log(step, val_metrics, prefix="val")
                last_val = {cfg.monitor: float(val_metrics.get(cfg.monitor, 0.0))}
                self.store.save(step, state, metrics=last_val)

        if step != start_step and step % cfg.val_check_interval != 0:
            # large finite sentinel: never wins best-by-monitor, stays JSON-safe
            self.store.save(step, state, metrics={cfg.monitor: 1e30})
        if stop_requested["flag"] and self.logger.is_main:
            print(f"| graceful stop at step {step} (checkpoint saved)")
        for sig, h in old_handlers.items():
            import signal

            signal.signal(sig, h)
        return state
