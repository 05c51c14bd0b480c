"""Synchronous data-parallel WaveNet-AE training.

TPU-native re-design of reference nsynth/wavenet/train.py:53-132:

* the piecewise-constant lr ``tf.cond`` chain (train.py:88-92) becomes a
  vectorized schedule lookup;
* ``SyncReplicasOptimizer(Adam) + EMA`` (train.py:101-108) becomes
  optax Adam with a gradient ``psum`` over the mesh's ``data`` axis inside
  ``shard_map`` — the parameter servers disappear, weights are replicated;
* ``slim.learning.train`` checkpoint/resume (train.py:121-132) becomes
  orbax checkpoints with step-tagged directories.

The per-step program (forward + backward + all-reduce + Adam + EMA) is one
jitted XLA computation; the only host work is feeding batches.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from audio_style_transfer_tpu.models.wavenet_ae import (
    Params,
    WaveNetAEConfig,
    forward,
    init_params,
)


def learning_rate(step, schedule: dict[int, float] | None = None):
    """Piecewise-constant schedule (reference model.py:13-21, train.py:88-92)."""
    schedule = schedule or WaveNetAEConfig.learning_rate_schedule
    boundaries = np.asarray(sorted(schedule.keys()), np.int32)
    values = np.asarray([schedule[int(b)] for b in boundaries], np.float32)
    idx = jnp.sum(step >= jnp.asarray(boundaries)) - 1
    idx = jnp.clip(idx, 0, len(values) - 1)
    return jnp.asarray(values)[idx]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    total_batch_size: int = 32
    sample_length: int = 6144
    num_iters: int = 200000
    ema_decay: float = 0.9999
    adam_epsilon: float = 1e-8
    logdir: str = "/tmp/nsynth"
    save_every_steps: int = 1000
    log_every_steps: int = 250
    # Split each device's batch into microbatches and accumulate gradients
    # (lax.scan) before the DP all-reduce — bounds activation memory without
    # changing the synchronous-update semantics. None = single shot.
    microbatch: int | None = None
    # Rematerialize residual blocks on backward (see WaveNetAEConfig.remat);
    # required to fit the reference's batch-32 step on one 16 GB chip.
    remat: bool = True
    # Batches executed per device call (lax.scan inside one jitted program).
    # Dispatching the ~500-leaf train state costs seconds per call through a
    # remote-tunnel runtime (measured 3.2 s host gap vs 0.74 s device
    # compute); scanning K steps per call amortizes it. fit() prefetches K
    # batches and stacks them.
    steps_per_call: int = 8


# Train state is a plain dict pytree: {params, opt_state, ema, step}.
TrainState = dict


def _make_optimizer(cfg: TrainConfig):
    return optax.adam(
        learning_rate=lambda step: learning_rate(step),
        eps=cfg.adam_epsilon,
    )


class Trainer:
    """Owns the jitted DP train step and the checkpoint lifecycle."""

    def __init__(
        self,
        cfg: TrainConfig | None = None,
        model_cfg: WaveNetAEConfig | None = None,
        mesh: Mesh | None = None,
        rng: jax.Array | None = None,
    ):
        self.cfg = cfg or TrainConfig()
        self.model_cfg = model_cfg or WaveNetAEConfig()
        if self.cfg.remat and not self.model_cfg.remat:
            self.model_cfg = dataclasses.replace(self.model_cfg, remat=True)
        if mesh is None:
            from audio_style_transfer_tpu.parallel import make_mesh

            mesh = make_mesh()
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.optimizer = _make_optimizer(self.cfg)
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._step_fn, self._multi_step_fn = self._build_step()

    # ------------------------------------------------------------------ #

    def init_state(self, params: Params | None = None) -> TrainState:
        if params is None:
            params = init_params(self._rng, self.model_cfg)
        return dict(
            params=params,
            opt_state=self.optimizer.init(params),
            ema=jax.tree.map(jnp.copy, params),
            step=jnp.zeros((), jnp.int32),
        )

    def _build_step(self):
        model_cfg = self.model_cfg
        cfg = self.cfg
        optimizer = self.optimizer
        axis = self.axis

        def loss_fn(params, wav):
            out = forward(params, {"wav": wav}, model_cfg)
            return out["loss"]

        def value_and_grads(params, wav):
            if not cfg.microbatch or wav.shape[0] <= cfg.microbatch:
                return jax.value_and_grad(loss_fn)(params, wav)
            # Gradient accumulation over microbatches: same synchronous
            # update, bounded activation memory.
            assert wav.shape[0] % cfg.microbatch == 0
            n = wav.shape[0] // cfg.microbatch
            stacked = wav.reshape(n, cfg.microbatch, *wav.shape[1:])

            def acc(carry, w):
                loss_sum, grad_sum = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, w)
                return (
                    loss_sum + loss,
                    jax.tree.map(jnp.add, grad_sum, grads),
                ), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                acc, (jnp.zeros((), jnp.float32), zeros), stacked
            )
            return loss_sum / n, jax.tree.map(lambda g: g / n, grad_sum)

        def per_device_step(state: TrainState, wav):
            loss, grads = value_and_grads(state["params"], wav)
            # Synchronous DP: mean-reduce gradients over ICI
            # (replaces SyncReplicasOptimizer aggregation, train.py:103-108).
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            updates, opt_state = optimizer.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            # TF-style EMA with num_updates ramp-in
            # (tf.train.ExponentialMovingAverage, train.py:101-102).
            step = state["step"]
            decay = jnp.minimum(
                cfg.ema_decay, (1.0 + step.astype(jnp.float32)) / (10.0 + step)
            )
            ema = jax.tree.map(
                lambda e, p: e * decay + p * (1.0 - decay), state["ema"], params
            )
            new_state = dict(
                params=params, opt_state=opt_state, ema=ema, step=step + 1
            )
            return new_state, loss

        def per_device_multi_step(state: TrainState, wavs):
            # wavs: [K, b_local, T] — K synchronous steps in one program.
            return jax.lax.scan(per_device_step, state, wavs)

        sharded = shard_map(
            per_device_step,
            mesh=self.mesh,
            in_specs=(P(), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        sharded_multi = shard_map(
            per_device_multi_step,
            mesh=self.mesh,
            in_specs=(P(), P(None, axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded), jax.jit(sharded_multi)

    def step(self, state: TrainState, wav: np.ndarray):
        """One synchronous DP step. ``wav`` is the global batch [B, T]."""
        return self._step_fn(state, jnp.asarray(wav, jnp.float32))

    # ------------------------------------------------------------------ #
    # Evaluation under the EMA shadow weights. The reference evaluates the
    # EMA'd variables (tf.train.ExponentialMovingAverage restored through
    # slim's variables_to_restore, nsynth/wavenet/train.py:101-102) — the
    # shadow is the model you ship, not the raw Adam iterate.
    # ------------------------------------------------------------------ #

    def eval_params(self, state: TrainState, ema: bool = True) -> Params:
        """The weights evaluation/serving should use (EMA shadow by default)."""
        return state["ema"] if ema else state["params"]

    def evaluate(self, state: TrainState, wav: np.ndarray,
                 ema: bool = True) -> float:
        """Mean NLL of a batch under the eval weights, one jitted program."""
        if not hasattr(self, "_eval_fn"):
            model_cfg = self.model_cfg

            def _nll(params, wav):
                return forward(params, {"wav": wav}, model_cfg)["loss"]

            self._eval_fn = jax.jit(_nll)
        return float(
            self._eval_fn(self.eval_params(state, ema=ema),
                          jnp.asarray(wav, jnp.float32))
        )

    def run_steps(self, state: TrainState, wavs: np.ndarray):
        """K synchronous DP steps in ONE device call (wavs [K, B, T]).

        Returns (state, losses [K]). Amortizes per-call dispatch of the
        train-state pytree — the dominant cost of step() on remote-tunnel
        runtimes (see TrainConfig.steps_per_call).
        """
        return self._multi_step_fn(state, jnp.asarray(wavs, jnp.float32))

    # ------------------------------------------------------------------ #

    def fit(
        self,
        state: TrainState,
        batches: Iterator[dict],
        num_steps: int | None = None,
        log=print,
    ) -> TrainState:
        """Training loop with periodic checkpoints and preemption safety.

        The reference relied on slim's supervisor for restart-resume
        (SURVEY.md §5: "no preemption handling"); here a SIGTERM/SIGINT
        mid-run triggers a final checkpoint before exiting the loop, so a
        preempted TPU job resumes from its last step, not its last
        periodic save.
        """
        import signal

        cfg = self.cfg
        num_steps = num_steps or cfg.num_iters
        t0 = time.time()
        interrupted = {"flag": False}

        def _handler(signum, frame):
            interrupted["flag"] = True

        prev_term = signal.signal(signal.SIGTERM, _handler)
        prev_int = signal.signal(signal.SIGINT, _handler)
        k = max(1, cfg.steps_per_call)
        # One host sync up front; after that the step counter is tracked
        # on the host so the loop never blocks on the in-flight device
        # step (reading state["step"] each iteration would serialize the
        # batch prefetch against device compute — the exact overlap this
        # loop exists to provide).
        step = int(state["step"])
        step_start = step
        try:
            done = False
            it = iter(batches)
            remaining = num_steps

            def next_group(n):
                nonlocal done
                group = []
                for _ in range(n):
                    try:
                        group.append(next(it)["wav"])
                    except StopIteration:
                        done = True
                        break
                if not group:
                    return None
                # Start the host->device copy now; it overlaps the step
                # currently executing (dispatch is async).
                return jax.device_put(
                    jnp.asarray(np.stack(group), jnp.float32)
                )

            pending = next_group(min(k, remaining))
            while remaining > 0 and pending is not None:
                group = pending
                n_in_group = group.shape[0]
                pending = (
                    next_group(min(k, remaining - n_in_group))
                    if remaining - n_in_group > 0 and not done
                    else None
                )
                if n_in_group == k and k > 1:
                    state, losses = self._multi_step_fn(state, group)
                    loss = losses[-1]
                else:
                    # Partial (trailing) groups run the single-step
                    # program one step at a time: every remainder size
                    # shares ONE compiled program, where the k-step scan
                    # would retrace/recompile per distinct leading dim.
                    for i in range(n_in_group):
                        state, loss = self._step_fn(state, group[i])
                remaining -= n_in_group
                step += n_in_group
                if step % cfg.log_every_steps < n_in_group:
                    log(
                        f"step {step} loss {float(loss):.4f} "
                        f"({(step - step_start) / (time.time() - t0):.2f}"
                        " steps/s)"
                    )
                if cfg.save_every_steps and step % cfg.save_every_steps < n_in_group:
                    self.save(state)
                if interrupted["flag"]:
                    log(f"preemption signal at step {step}: checkpointing")
                    self.save(state)
                    break
        finally:
            signal.signal(signal.SIGTERM, prev_term)
            signal.signal(signal.SIGINT, prev_int)
        return state

    # ------------------------------------------------------------------ #
    # Checkpointing (reference ckpt cadence: train.py:130; resume semantics
    # of slim.learning.train's supervisor).
    # ------------------------------------------------------------------ #

    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(os.path.abspath(self.cfg.logdir), f"ckpt-{step}")

    def save(self, state: TrainState) -> str:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(int(state["step"]))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, dict(state), force=True)
        ckptr.wait_until_finished()
        return path

    def restore(self, step: int | None = None) -> TrainState:
        import orbax.checkpoint as ocp

        logdir = os.path.abspath(self.cfg.logdir)
        if step is None:
            # Only fully-written checkpoints count: a SIGKILL mid-save
            # leaves orbax temp dirs like ckpt-1000.orbax-checkpoint-tmp-*
            # whose suffix is not an int — they must be skipped, not
            # crash the resume path they'd otherwise block.
            steps = [
                int(d[len("ckpt-"):])
                for d in os.listdir(logdir)
                if d.startswith("ckpt-") and d[len("ckpt-"):].isdigit()
            ]
            if not steps:
                raise FileNotFoundError(f"no checkpoints under {logdir}")
            step = max(steps)
        ckptr = ocp.StandardCheckpointer()
        template = jax.tree.map(np.asarray, dict(self.init_state()))
        restored = ckptr.restore(self._ckpt_dir(step), template)
        return restored
