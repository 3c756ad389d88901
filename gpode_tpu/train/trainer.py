"""Jitted Adam training loop with meters, logging, and periodic checkpointing.

Replaces the reference's hand-written per-script loops
(`train_vdp_gpode.py:114-145`, `src/gpode/model_builder.py:123-170`): one
`value_and_grad` + optax-Adam update compiled into a single XLA program per
step; the PRNG key threads through the carry so runs are bit-reproducible.

Parameter freezing (the reference's `requires_grad_(False)` on kernel
hyperparameters and constraint scales) is an optimizer mask: gradients for
frozen leaves are zeroed before the update.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from gpode_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from gpode_tpu.utils.meters import Meter


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training knobs (defaults: the paper's, `train_vdp_gpode.py:56-68`)."""

    num_iter: int = 5000
    lr: float = 5e-3
    lr_schedule: str = "constant"  # constant | cosine (decays to lr/100)
    grad_clip: float = 0.0         # global-norm gradient clip (0 = off)
    log_freq: int = 10
    checkpoint_every: int = 0  # 0 = no periodic checkpoints
    warmup_iters: int = 0      # meters start after this many iters (MoCap uses 100)
    # Adaptive-solver health check: the number of observation times each solve
    # must cover (terms.ncov). 0 disables. When a drained step reports
    # ncov < ncov_expected the budget-exhaustion fallback fired (outputs
    # silently freeze at the final integrator state, `ops/ode.py:odeint_dopri5`)
    # — the Trainer logs an explicit warning instead of staying silent.
    ncov_expected: int = 0
    # Run Adam over ONE flat concatenated vector (optax.flatten) instead of
    # 14+ per-leaf update ops. Numerically identical (Adam is elementwise);
    # measured +8% on the official bench step (278.6 -> 300.6 steps/s, the
    # ~0.37 ms of <40 us ops in PROFILE.md's rollup was mostly per-leaf Adam).
    # Changes the opt_state pytree layout: resuming a pre-flatten checkpoint
    # requires flatten_opt=False (`--flatten_opt false`).
    flatten_opt: bool = True
    # Donate params/opt_state buffers to the step (+2%: 300.6 -> 307.1
    # steps/s, in-place update). Off by default: a KeyboardInterrupt landing
    # inside a donated step leaves params/opt_state deleted, so graceful
    # interrupt falls back to the last periodic checkpoint.
    donate_step: bool = False


def build_frozen_mask(params: Any, frozen_predicate: Callable[[str], bool]):
    """Boolean mask pytree: True = frozen. The predicate sees dotted key paths
    like 'gp.kernel.raw_lengthscales' or 'constraint.raw_scale'."""

    def _mask(path, leaf):
        name = ".".join(str(getattr(p, "name", getattr(p, "key", p))) for p in path)
        return frozen_predicate(name)

    return jax.tree_util.tree_map_with_path(_mask, params)


def default_optimizer(lr, grad_clip: float = 0.0,
                      flatten: bool = True) -> optax.GradientTransformation:
    """The framework's Adam stack: optional global-norm clip, and by default
    `optax.flatten` so the update runs over ONE concatenated vector instead
    of ~40 per-leaf tiny ops (+8% on the official bench step; numerically
    identical since Adam is elementwise — `scripts/diag_adam_fusion.py`).
    `lr` may be a float or an optax schedule."""
    opt = (optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(lr))
           if grad_clip > 0 else optax.adam(lr))
    return optax.flatten(opt) if flatten else opt


def make_step_bodies(loss_at: Callable,
                     optimizer: optax.GradientTransformation,
                     frozen_mask: Optional[Any] = None):
    """The ONE copy of the train-step body, shared by the single-device step
    and both sharded step styles (`parallel.train`, `parallel.shard_map_step`
    wrap these in jit-with-shardings).

    loss_at(params, sub_key, itr_or_None, *batch) -> (loss, aux-NamedTuple);
    `itr` is None for the plain step and the device-side counter for the
    iteration-threaded one (callers decide what the counter means — e.g.
    constraint-scale annealing).

    Returns (step, step_itr), both UNjitted:
      step(params, opt_state, key, *batch) -> (params, opt_state, key, terms)
      step_itr(..., key, itr, *batch) -> (..., key, itr + 1, terms)
    """

    def _update(params, opt_state, grads):
        if frozen_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: jnp.zeros_like(g) if m else g, grads, frozen_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def step(params, opt_state, key, *batch):
        key, sub = jax.random.split(key)
        (_, terms), grads = jax.value_and_grad(
            lambda p: loss_at(p, sub, None, *batch), has_aux=True)(params)
        params, opt_state = _update(params, opt_state, grads)
        return params, opt_state, key, terms

    def step_itr(params, opt_state, key, itr, *batch):
        key, sub = jax.random.split(key)
        (_, terms), grads = jax.value_and_grad(
            lambda p: loss_at(p, sub, itr, *batch), has_aux=True)(params)
        params, opt_state = _update(params, opt_state, grads)
        return params, opt_state, key, itr + 1, terms

    return step, step_itr


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    frozen_mask: Optional[Any] = None,
                    with_iteration: bool = False,
                    donate: bool = False):
    """Build a jitted step: (params, opt_state, key, *batch) -> updated state.

    loss_fn(params, key, *batch) must return (loss, aux-NamedTuple).

    with_iteration=True threads a device-side iteration counter through the
    carry — the step becomes (params, opt_state, key, itr, *batch) ->
    (..., itr+1, terms) and loss_fn receives (params, key, itr, *batch).
    Used by iteration-dependent objectives (constraint-scale annealing)
    without a per-step host->device transfer.

    donate=True donates the params/opt_state input buffers (in-place
    update, +2% on the bench step). The caller must treat its previous
    params/opt_state references as DEAD after each call.
    """

    def loss_at(p, sub, itr, *batch):
        return (loss_fn(p, sub, *batch) if itr is None
                else loss_fn(p, sub, itr, *batch))

    step, step_itr = make_step_bodies(loss_at, optimizer, frozen_mask)
    return jax.jit(step_itr if with_iteration else step,
                   donate_argnums=(0, 1) if donate else ())


class Trainer:
    """Stateful training driver with optimization-trace meters.

    Meter names cover both model variants (`train_vdp_gpode.py:108-112`,
    `train_vdp_gpode_shooting.py:119-124`); unused ones stay empty. Training
    survives KeyboardInterrupt gracefully (finish + save), matching the
    reference scripts' behavior.
    """

    def __init__(self, loss_fn: Callable, cfg: TrainConfig,
                 frozen_mask: Optional[Any] = None,
                 logger=None, checkpoint_path: Optional[str] = None,
                 callback: Optional[Callable] = None,
                 callback_every: int = 0,
                 step_factory: Optional[Callable] = None,
                 pass_iteration: bool = False):
        """`step_factory(optimizer, frozen_mask) -> step_fn` overrides the
        default single-device jitted step — the hook the multi-chip drivers
        use to swap in a mesh-sharded step (`parallel/shard_map_step.py`,
        `parallel/train.py`) while keeping the loop, meters, async metric
        drain, checkpoints, and callbacks identical."""
        self.cfg = cfg
        lr = (optax.cosine_decay_schedule(cfg.lr, cfg.num_iter, alpha=0.01)
              if cfg.lr_schedule == "cosine" else cfg.lr)
        self.optimizer = default_optimizer(lr, grad_clip=cfg.grad_clip,
                                           flatten=cfg.flatten_opt)
        self.pass_iteration = pass_iteration
        if step_factory is not None:
            if cfg.donate_step and logger is not None:
                logger.info("donate_step has no effect with a custom "
                            "step_factory (the sharded steps manage their own "
                            "buffers); proceeding without donation")
            self.step_fn = step_factory(self.optimizer, frozen_mask)
        else:
            self.step_fn = make_train_step(loss_fn, self.optimizer, frozen_mask,
                                           with_iteration=pass_iteration,
                                           donate=cfg.donate_step)
        self.logger = logger
        self.checkpoint_path = checkpoint_path
        # periodic host callback(itr, params) — e.g. validation evaluation;
        # runs after a drain so `params` is settled, and its wall time is
        # excluded from the step-time meter
        self.callback = callback
        self.callback_every = callback_every

        self.loss_meter = Meter("ema", 0.98)
        self.observ_nll_meter = Meter("ema", 0.98)
        self.state_kl_meter = Meter("ema", 0.98)
        self.init_kl_meter = Meter("ema", 0.98)
        self.inducing_kl_meter = Meter("ema", 0.98)
        self.time_meter = Meter("mean")
        self.last_nfe = 0
        self.last_natt = None   # adaptive-solver step attempts (last step)
        self.last_ncov = None   # observation times covered (last step)
        self._ncov_warned_at = 0

        # Window packing: the per-step scalars of a whole drain window
        # collapse into ONE (L, W) f32 block in a single jitted dispatch:
        # the inner stack runs over the L term fields of one step, the outer
        # axis=1 stack over the W steps of the window, giving (L, W) with
        # host[i] = the window trace of field i.
        # Through a remote-device tunnel every EAGER op costs ~20 ms and every
        # device_get ~100 ms; packing jitted + copying host-side
        # asynchronously (collected a window later) hides both — measured
        # 8.4 -> 3.0 ms/step on the MoCap shooting script loop. Short windows
        # (log-boundary drains, the tail) are padded to the first-seen window
        # length by repeating their last element, so `_pack` compiles exactly
        # once per run; `_collect_one` reads only the valid columns.
        self._pack = jax.jit(lambda ts_list: jnp.stack(
            [jnp.stack([leaf.astype(jnp.float32)
                        for leaf in jax.tree_util.tree_leaves(t)])
             for t in ts_list], axis=1))
        self._pack_width: Optional[int] = None
        self._terms_fields: Optional[tuple] = None
        self._inflight: list = []   # (iters, per_step_secs, device block)

    def _log(self, msg: str):
        if self.logger is not None:
            self.logger.info(msg)

    def _flush_window(self, pending, begin, warmup_iters):
        """Pack pending step scalars into one device block + async host copy.

        Keeps at most ONE block in flight: before packing a new window, the
        older one is waited out (inside this window's elapsed time, so the
        time meter stays honest — it measures true throughput with a
        pipeline depth of one window, not raw dispatch rate).
        """
        if not pending:
            return begin
        if self._terms_fields is None:
            self._terms_fields = tuple(pending[0][1]._fields)
        while len(self._inflight) >= 1:
            self._collect_one(warmup_iters)
        iters = [itr for itr, _ in pending]
        terms = [t for _, t in pending]
        if self._pack_width is None or len(terms) > self._pack_width:
            self._pack_width = len(terms)  # grows at most once per new max
        if len(terms) < self._pack_width:
            terms = terms + [terms[-1]] * (self._pack_width - len(terms))
        block = self._pack(terms)
        block.copy_to_host_async()
        elapsed = time.time() - begin
        self._inflight.append((iters, elapsed / len(iters), block))
        pending.clear()
        return time.time()

    def _collect_one(self, warmup_iters):
        """Fetch the oldest in-flight block into the host meters."""
        iters, per_step, block = self._inflight.pop(0)
        host = jax.device_get(block)         # (L, W); async copy already done
        row = {name: host[i] for i, name in enumerate(self._terms_fields)}
        for j, itr in enumerate(iters):
            if itr <= warmup_iters:
                continue
            self.loss_meter.update(float(row["loss"][j]), itr)
            self.observ_nll_meter.update(float(row["observ_nll"][j]), itr)
            self.init_kl_meter.update(float(row["x0_kl"][j]), itr)
            self.inducing_kl_meter.update(float(row["inducing_kl"][j]), itr)
            if "state_kl" in row:
                self.state_kl_meter.update(float(row["state_kl"][j]), itr)
            self.time_meter.update(per_step, itr)
        if "nfe" in row:
            self.last_nfe = int(row["nfe"][-1])
        if "ncov" in row:
            self.last_natt = int(row["natt"][-1]) if "natt" in row else None
            self.last_ncov = int(row["ncov"][-1])
            expected = self.cfg.ncov_expected
            if expected:
                worst = int(row["ncov"].min())
                # geometric backoff: a persistently starved run warns at
                # iters ~1, ~10x, ~100x, ... instead of once per drain
                # window (~470 repeats on a 30k-iter run at window 64)
                if worst < expected and iters[-1] >= 10 * self._ncov_warned_at:
                    self._ncov_warned_at = max(iters[-1], 1)
                    self._log(
                        f"WARNING: solver budget exhausted near iter "
                        f"{iters[-1]}: covered {worst}/{expected} observation "
                        f"times (uncovered outputs freeze at the final "
                        f"integrator state and carry no dynamics gradient) — "
                        f"raise max_steps or loosen rtol/atol")

    def _drain(self, pending, begin, warmup_iters):
        """Synchronous drain: flush the window and wait all scalars home.

        Used at log/callback/checkpoint boundaries (and loop end), where the
        meters must be current and `params` settled; the every-64-step
        intermediate drains stay one-window-deep asynchronous.
        """
        begin = self._flush_window(pending, begin, warmup_iters)
        while self._inflight:
            self._collect_one(warmup_iters)
        return begin

    def train(self, params, key, *batch, start_iter: int = 1,
              opt_state=None):
        """Run the loop; returns (params, opt_state, key)."""
        if opt_state is None:
            opt_state = self.optimizer.init(params)
        else:
            # A resumed opt_state must match this optimizer's layout —
            # checkpoints written before the optax.flatten default carry the
            # per-leaf layout and need `flatten_opt=False` to keep their
            # Adam moments.
            # eval_shape: layout comparison without allocating a throwaway
            # opt_state on device (wasteful through the TPU tunnel)
            want = jax.tree_util.tree_structure(
                jax.eval_shape(self.optimizer.init, params))
            got = jax.tree_util.tree_structure(opt_state)
            if want != got:
                raise ValueError(
                    "resumed opt_state layout does not match the optimizer "
                    f"(checkpoint {got}, optimizer {want}). If the checkpoint "
                    "predates the flat-Adam default, resume with "
                    "flatten_opt=False (`--flatten_opt false`).")
        cfg = self.cfg
        pending = []  # (iteration, device-side terms) awaiting meter drain
        begin = time.time()
        # device-side iteration counter for iteration-dependent losses
        itr_dev = (jnp.asarray(start_iter, dtype=jnp.float32)
                   if self.pass_iteration else None)
        # Iterations are numbered 1..num_iter inclusive: exactly num_iter
        # optimizer steps, matching the reference's `for itr in range(iters)`.
        for itr in range(start_iter, cfg.num_iter + 1):
            try:
                if self.pass_iteration:
                    params, opt_state, key, itr_dev, terms = self.step_fn(
                        params, opt_state, key, itr_dev, *batch)
                else:
                    params, opt_state, key, terms = self.step_fn(
                        params, opt_state, key, *batch)
                pending.append((itr, terms))

                # Flush windows asynchronously: one jitted pack dispatch +
                # copy_to_host_async per 64 steps; the block is harvested a
                # window later (or at the next sync point) so the hot loop
                # never waits on a host round trip.
                log_now = cfg.log_freq > 0 and itr % cfg.log_freq == 0
                if len(pending) >= 64 and not log_now:
                    begin = self._flush_window(pending, begin,
                                               cfg.warmup_iters)

                if log_now:
                    begin = self._drain(pending, begin, cfg.warmup_iters)
                    if itr > cfg.warmup_iters:
                        parts = [
                            f"Iter {itr:06d}",
                            f"Time {self.time_meter.sum:0.4f}({self.time_meter.avg:.4f})",
                            f"Loss {self.loss_meter.val:.3f}({self.loss_meter.avg:.3f})",
                            f"OBS NLL {self.observ_nll_meter.val:.2f}({self.observ_nll_meter.avg:.2f})",
                        ]
                        if hasattr(terms, "state_kl"):
                            parts.append(f"XS KL {self.state_kl_meter.val:.2f}"
                                         f"({self.state_kl_meter.avg:.2f})")
                        parts.append(f"X0 KL {self.init_kl_meter.val:.2f}"
                                     f"({self.init_kl_meter.avg:.2f})")
                        parts.append(f"IND KL {self.inducing_kl_meter.val:.2f}"
                                     f"({self.inducing_kl_meter.avg:.2f})")
                        parts.append(f"NFE {self.last_nfe}")
                        # adaptive-solver health: attempted steps vs coverage
                        # (VERDICT r2: surface natt/ncov, don't just compute)
                        if self.last_ncov is not None:
                            att = ("" if self.last_natt is None
                                   else f"ATT {self.last_natt} ")
                            cov_target = (f"/{self.cfg.ncov_expected}"
                                          if self.cfg.ncov_expected else "")
                            parts.append(f"{att}COV {self.last_ncov}{cov_target}")
                        # throughput from the drained windows (BASELINE.json
                        # metrics): steps/s and solver rhs-evals/s
                        if self.time_meter.avg > 0:
                            sps = 1.0 / self.time_meter.avg
                            parts.append(f"Steps/s {sps:.1f}")
                            if self.last_nfe:
                                parts.append(f"RHS/s {sps * self.last_nfe:.0f}")
                        self._log(" | ".join(parts))

                if (cfg.checkpoint_every and self.checkpoint_path
                        and itr % cfg.checkpoint_every == 0):
                    begin = self._drain(pending, begin, cfg.warmup_iters)
                    save_checkpoint(self.checkpoint_path,
                                    {"params": params, "opt_state": opt_state,
                                     "key": key, "step": itr})
                    begin = time.time()

                if (self.callback is not None and self.callback_every
                        and itr % self.callback_every == 0):
                    self._drain(pending, begin, cfg.warmup_iters)
                    self.callback(itr, params)
                    begin = time.time()
            except KeyboardInterrupt:
                self._log("Stopping optimization")
                if self.cfg.donate_step and any(
                        getattr(leaf, "is_deleted", lambda: False)()
                        for leaf in jax.tree_util.tree_leaves(params)):
                    # the interrupt landed inside a donated step: the inputs
                    # are already consumed and the outputs never bound —
                    # recover the last periodic checkpoint instead
                    self._inflight.clear()
                    pending.clear()
                    if self.checkpoint_path and os.path.exists(
                            self.checkpoint_path):
                        state = load_checkpoint(self.checkpoint_path)
                        params, opt_state, key = (state["params"],
                                                  state["opt_state"],
                                                  state["key"])
                        self._log(f"donate_step: interrupted mid-step; "
                                  f"restored iteration {state['step']} from "
                                  f"{self.checkpoint_path}")
                    else:
                        raise RuntimeError(
                            "donate_step=True: interrupted inside a donated "
                            "step with no periodic checkpoint to fall back "
                            "to (set checkpoint_every)") from None
                break
        self._drain(pending, begin, cfg.warmup_iters)
        return params, opt_state, key


def save_trace(trainer: "Trainer", path: str, extra=None):
    """Dump the optimization trace (per-iteration meter histories) to JSON.

    Completes the observability story (SURVEY.md §5): the reference kept
    traces only inside meter objects for plotting; this persists them as an
    artifact alongside `model_predictions.npz`. `extra` maps additional trace
    names to Meters (e.g. validation metrics recorded by a callback).
    """
    import json

    named = [("loss", trainer.loss_meter),
             ("observ_nll", trainer.observ_nll_meter),
             ("state_kl", trainer.state_kl_meter),
             ("x0_kl", trainer.init_kl_meter),
             ("inducing_kl", trainer.inducing_kl_meter),
             ("step_time", trainer.time_meter)]
    if extra:
        named.extend(extra.items())
    payload = {name: {"iters": meter.iters, "vals": meter.vals}
               for name, meter in named if meter.vals}
    with open(path, "w") as f:
        json.dump(payload, f)
