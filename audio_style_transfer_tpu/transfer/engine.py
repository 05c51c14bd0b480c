"""Style-transfer engine: the TPU-native equivalent of reference GatysNet.

Orchestration mirrors reference methods.py:19-216 but the execution model
is inverted: instead of a persistent TF graph + per-iteration SciPy host
round-trips, the *entire multi-epoch optimization* — encoder forward,
gram losses, L-BFGS direction/line-search, epoch loop with the reference's
`< 50 evals` early stop (methods.py:180-181) — is one jitted XLA program.
Per-epoch waveform snapshots come back in a single device->host transfer
and artifacts (ep-N.wav, gram grids, spectrograms: methods.py:169-179)
are written afterwards, byte-compatible with the reference's layout.
"""

from __future__ import annotations

import dataclasses
import os
import time
import jax
import jax.numpy as jnp
import numpy as np

from audio_style_transfer_tpu.models.wavenet_ae import WaveNetAEConfig
from audio_style_transfer_tpu.signal.mu_law import inv_mu_law_numpy, mu_law_numpy
from audio_style_transfer_tpu.transfer.grams import l2_normalize, select_style_layers
from audio_style_transfer_tpu.transfer.lbfgs import LBFGSOptions, lbfgs_minimize
from audio_style_transfer_tpu.transfer.losses import (
    LossSpec,
    transfer_embeds,
    transfer_loss,
)
from audio_style_transfer_tpu.utils.audio_io import load_audio, write_wav


@dataclasses.dataclass(frozen=True)
class TransferSpec:
    """Run configuration (the argparse surface of methods.py:243-271)."""

    savepath: str = "./data/out"
    logdir: str = "./log"
    figdir: str = "./data/fig"
    stack: int | None = 0
    batch_size: int = 16384
    sr: int = 16000
    cont_lyr_ids: tuple = (29,)
    nb_channels: int = 128
    cnt_channels: int = 128
    gatys: bool = False
    style_lyr_ids: tuple | None = None
    epochs: int = 100
    lambd: float = 100.0
    gamma: float = 0.0
    maxiter: int = 100
    early_stop_evals: int = 50  # epoch eval count below which the run stops
    compute_dtype: str = "float32"  # or "bfloat16" for MXU peak throughput
    fused_encoder: bool = False  # Pallas fused residual blocks (TPU only)
    # Chained Pallas trunk (ops/pallas_chain.py): groups of layers per
    # kernel launch + int8 mask stashing + whole-trunk VJP. None = follow
    # fused_encoder (the chained trunk IS the fused encoder's successor);
    # False forces the per-layer fused kernels for comparison.
    chain_encoder: bool | None = None
    # Pallas all-pairs gram kernel (TPU only). None = auto: on whenever
    # the encoder runs EITHER Pallas flavour (fused or chained) — the
    # kernel's single-HBM-read FORWARD beats XLA at every L, and below
    # 16 style layers pair_gram itself routes the backward through an
    # XLA composition where that direction is faster (ops/pallas_gram.py
    # _XLA_BWD_MAX_L).
    fused_gram: bool | None = None
    # Carry the L-BFGS curvature memory across epochs instead of the
    # reference's cold per-epoch restarts (an artifact of SciPy's stateless
    # ScipyOptimizerInterface, methods.py:133-137, not of the algorithm).
    # Reaches the same final loss — every epoch still gets the full maxiter
    # budget and its own artifacts — while epochs past convergence finish
    # in ~2 evaluations instead of re-learning the curvature (~18): the
    # north-star run drops ~4x in wall clock. Off by default: the
    # reference's epoch/early-stop accounting is the parity surface.
    warm_start: bool = False
    write_artifacts: bool = True

    @property
    def late(self) -> int:
        """Receptive-field edge trim (reference methods.py:39)."""
        return (self.batch_size - (self.batch_size // 4096) * 4000) // 2


class StyleTransfer:
    """Builds the jitted loss/optimizer programs and runs transfers."""

    def __init__(self, spec: TransferSpec, params, model_cfg: WaveNetAEConfig | None = None):
        self.spec = spec
        cfg = model_cfg or WaveNetAEConfig()
        if spec.batch_size % 4096:
            # reference constraint (methods.py:250: "must be divided by 4096")
            raise ValueError(
                f"batch_size must be a multiple of 4096, got {spec.batch_size}"
            )
        use_chain = (
            spec.fused_encoder
            if spec.chain_encoder is None
            else spec.chain_encoder
        )
        self.cfg = dataclasses.replace(
            cfg,
            compute_dtype=jnp.dtype(spec.compute_dtype),
            fused_encoder=spec.fused_encoder,
            chain_encoder=use_chain,
        )
        # Pre-cast weights to the compute dtype once; otherwise every L-BFGS
        # evaluation re-casts all 30 layers inside the hot while_loop.
        dtype = self.cfg.compute_dtype
        self.params = jax.tree.map(
            lambda v: v.astype(dtype) if hasattr(v, "astype") else v, params
        )
        style_ids = tuple(
            select_style_layers(cfg.ae_num_layers, spec.stack, spec.style_lyr_ids)
        )
        if spec.fused_gram is None:
            # The all-pairs kernel's FORWARD beats XLA's fused pairwise
            # path at every L (56 vs 82 us at L=10, 406 us vs ~2 ms at
            # L=30, v5e round-3 profile); its backward only wins at large
            # L, so pair_gram itself routes small-L backwards through an
            # XLA composition (ops/pallas_gram.py _XLA_BWD_MAX_L).  Keyed
            # off EITHER Pallas trunk flavour — chain_encoder=True alone
            # (the fused encoder's successor) gets the same treatment.
            fused_gram = bool(spec.fused_encoder or use_chain)
        else:
            fused_gram = spec.fused_gram
        self.loss_spec = LossSpec(
            cont_lyr_ids=tuple(spec.cont_lyr_ids),
            style_layer_ids=style_ids,
            cnt_channels=spec.cnt_channels,
            nb_channels=spec.nb_channels,
            gatys=spec.gatys,
            lambd=spec.lambd,
            gamma=spec.gamma,
            fused_gram=fused_gram,
        )

        self._embeds_fn = jax.jit(
            lambda params, xq: transfer_embeds(params, xq, self.cfg, self.loss_spec)
        )
        self._epochs_fn = jax.jit(self._run_epochs, static_argnames=("epochs",))
        # Single-transfer flavour for the single-clip path: the default
        # x0 (methods.py:49-54 zeros + 1e-6) is created in-program and the
        # four results come back as ONE flat f32 buffer.  Over a remote-
        # tunnel runtime each extra dispatch/result pull costs ~30 ms of
        # latency regardless of size (device-trace: the s32[100] evals
        # pull idled the chip as long as the 6.5 MB snapshots) — packing
        # removed ~0.2 s from the 100-epoch north-star wall.
        def _packed(params, phi_c, phi_s, *, epochs: int):
            x0 = jnp.full((1, self.spec.batch_size), 1e-6, jnp.float32)
            snapshots, metrics, evals, ep = self._run_epochs(
                params, x0, phi_c, phi_s, epochs=epochs
            )
            return jnp.concatenate([
                snapshots.reshape(-1),
                metrics.reshape(-1),
                evals.astype(jnp.float32),
                ep.astype(jnp.float32)[None],
            ])

        self._epochs_packed_fn = jax.jit(_packed, static_argnames=("epochs",))
        # Mesh-path programs (optimize_batch mesh=...), built lazily per
        # (mesh, epochs) by _mesh_batch_fn: shard_map over the clip axis
        # running the SAME fully-fused single-clip epoch program on each
        # device's local clips (sequential lax.map, per-clip early stop).
        # A jit(vmap(...)) over sharded clips cannot do this — XLA has no
        # partitioning rule for the Pallas custom-calls, so the vmapped
        # program would replicate (all-gather) every kernel onto every
        # device; shard_map makes each device run plain single-clip
        # kernels with zero hot-loop communication.
        self._mesh_fns: dict = {}
        # Single-chip K-clip path: an ASYNC host-dispatch pipeline of the
        # single-clip program — all K dispatches are enqueued before
        # blocking, so the device runs the programs back to back.  This
        # reuses the north-star compile and measured 697 vs 372 evals/s
        # against a lax.map(epoch-loop) mega-program on 58 windows x 20
        # epochs: inside the scan every eval carried ~1.6 ms of device
        # idle (one extra level of control-flow nesting), while the async
        # pipeline hides dispatch latency entirely.

    @staticmethod
    def _unpack(packed: np.ndarray, epochs: int, t: int):
        """Invert _packed's concatenation: (snapshots [epochs, t],
        metrics [epochs, 4], evals [epochs], epochs_done)."""
        n_snap = epochs * t
        snapshots = packed[..., :n_snap].reshape(*packed.shape[:-1], epochs, t)
        metrics = packed[..., n_snap : n_snap + epochs * 4].reshape(
            *packed.shape[:-1], epochs, 4
        )
        evals = packed[..., n_snap + epochs * 4 : n_snap + epochs * 5]
        ep_done = packed[..., -1].astype(np.int32)
        return snapshots, metrics, evals.astype(np.int32), ep_done

    # ------------------------------------------------------------------ #
    # Feature extraction (reference methods.py:86-111)
    # ------------------------------------------------------------------ #

    def get_embeds(self, aud: np.ndarray, is_content: bool = True) -> np.ndarray:
        """Features of one window, fed in floor-mu-law space (methods.py:86-95)."""
        aud = np.asarray(aud)
        if aud.ndim == 1:
            aud = aud[: self.spec.batch_size][None, :]
        xq = jnp.asarray(mu_law_numpy(aud), jnp.float32)
        c, s = self._embeds_fn(self.params, xq)
        return np.asarray(c if is_content else s)

    def get_style_phi(
        self, audio: np.ndarray, max_examples: int = 5, show_mat: bool = False,
        figdir: str | None = None,
    ) -> np.ndarray:
        """Chunked style-gram average (reference methods.py:97-111)."""
        bs = self.spec.batch_size
        if len(audio) < bs:
            raise ValueError(
                f"style/content audio has {len(audio)} samples but one "
                f"window needs batch_size={bs}; provide a longer clip or "
                f"a smaller --batch_size"
            )
        n = min(len(audio), max_examples * bs) // bs
        n = max(n, 1)
        grams = [
            self.get_embeds(audio[i * bs : (i + 1) * bs], is_content=False)
            for i in range(n)
        ]
        phi = np.mean(grams, axis=0)
        if show_mat and figdir:
            from audio_style_transfer_tpu.analysis.viz import show_gram

            show_gram(phi, figdir=figdir, gatys=self.spec.gatys)
        return phi

    # ------------------------------------------------------------------ #
    # The fused optimization program
    # ------------------------------------------------------------------ #

    def _run_epochs(self, params, x0, phi_c, phi_s, *, epochs: int):
        """All epochs in one XLA program (replaces methods.py:140-181).

        Returns (snapshots [epochs, T], metrics [epochs, 4], evals [epochs],
        epochs_done). Each epoch is a fresh maxiter-100 L-BFGS, matching
        the per-epoch ``optim.minimize`` restarts of the reference — or,
        with ``spec.warm_start``, a continuation that carries the
        curvature memory across epochs (same loss, ~4x less work).
        """
        spec = self.spec
        # The per-epoch hot path runs the "zoom" line search without
        # ls-failure restarts: each epoch hands off to the next epoch's
        # fresh history anyway, and an epoch that ends on a failed search
        # just ends a little early. Measured on the north-star config the
        # Moré-Thuente search (SciPy's own dcsrch; the LBFGSOptions
        # default) reaches the same final loss (72.849 vs 72.854, both
        # +0.34% of f32) but spends ~22 evals/epoch vs zoom's ~18 — its
        # looser c2=0.9 accepts cheaper steps but runs more iterations
        # before an epoch terminates: 4.0 s vs 3.4 s per 100 epochs.
        # Both configurations hold the two-sided 1% SciPy parity bound
        # (tests/test_lbfgs_scipy_parity.py runs each).
        opts = LBFGSOptions(
            maxiter=spec.maxiter, line_search="zoom", restart_on_ls_fail=False
        )

        # The optimizer iterate is the FLAT [T] waveform: a [1, T] array
        # tiles as (8, 128) with 7/8 sublane padding on TPU, so running
        # L-BFGS's ~45 vector ops per iteration (two-loop, axpys, history
        # slots) on it costs 8x the memory traffic — and flattening
        # inside the optimizer instead forced a physical retiling copy of
        # x and g every evaluation (round-3 device trace: ~48 us/eval).
        # The batch dim is added back inside the loss, where XLA fuses
        # the reshape into the front-conv fusion for free.
        def loss_fn(x):
            return transfer_loss(
                params, x[None, :], phi_c, phi_s, self.cfg, self.loss_spec
            )

        # has_aux: the loss components ride along with every evaluation
        # (they are byproducts of the same forward pass).  L-BFGS returns
        # the aux of its INITIAL evaluation — which is taken at the
        # previous epoch's final iterate — so per-epoch metrics rows cost
        # no extra forward pass: epoch k's row is delivered by epoch
        # k+1's init eval, and only the last epoch pays one closing
        # forward after the loop (previously EVERY epoch re-ran the
        # forward just to decompose the loss: ~55 ms of the 100-epoch
        # north-star wall).
        vg = jax.value_and_grad(loss_fn, has_aux=True)

        def metrics_row(parts):
            return jnp.stack(
                [parts["loss"], parts["content_loss"], parts["style_loss"],
                 parts["regularizer"]]
            )

        t = x0.shape[-1]
        x0 = x0.reshape(t)
        m = opts.memory
        # spec.warm_start: the curvature memory rides along in the epoch
        # loop state and seeds the next epoch's L-BFGS (continuation mode;
        # see TransferSpec). Cold mode carries zeros and resets per epoch.
        # History slots carry the iterate's NATIVE [1, T] shape (see
        # lbfgs_minimize — flattening forced retiling copies every eval).
        history0 = dict(
            s_hist=jnp.zeros((m,) + x0.shape, jnp.float32),
            y_hist=jnp.zeros((m,) + x0.shape, jnp.float32),
            rho=jnp.zeros((m,), jnp.float32),
            head=jnp.array(0, jnp.int32),
            count=jnp.array(0, jnp.int32),
            gamma=jnp.asarray(1.0, jnp.float32),
        )
        state = dict(
            x=x0,
            ep=jnp.array(0, jnp.int32),
            done=jnp.array(False),
            snapshots=jnp.zeros((epochs, t), jnp.float32),
            metrics=jnp.zeros((epochs, 4), jnp.float32),
            evals=jnp.zeros((epochs,), jnp.int32),
            history=history0,
        )

        def cond(st):
            return (~st["done"]) & (st["ep"] < epochs)

        def body(st):
            res, hist = lbfgs_minimize(
                vg, st["x"], opts,
                history=st["history"] if spec.warm_start else None,
                return_history=True,
                has_aux=True,
            )
            # Warm start: an epoch that ended on a failed line search
            # (status 3) hands over its x but a RESET memory — otherwise
            # the next epoch would inherit the identical state and
            # deterministically repeat the failure (an f32-plateau
            # livelock; review finding). Cold mode resets every epoch
            # anyway. In-place restarts (restart_on_ls_fail) are NOT used
            # here: they turn plateau epochs into full-maxiter grinds (a
            # failed search costs maxls evaluations each time).
            if spec.warm_start:
                hist = jax.tree.map(
                    lambda fresh, h: jnp.where(res.status == 3, fresh, h),
                    history0, hist,
                )
            ep = st["ep"]
            # res.aux = loss components at THIS epoch's x0 == the
            # previous epoch's final iterate: write them as epoch ep-1's
            # metrics row (the last epoch's row is closed after the loop).
            prev_row = metrics_row(res.aux)
            metrics = jnp.where(
                ep > 0,
                st["metrics"].at[jnp.maximum(ep - 1, 0)].set(prev_row),
                st["metrics"],
            )
            return dict(
                x=res.x,
                ep=ep + 1,
                done=res.n_evals < spec.early_stop_evals,
                snapshots=st["snapshots"].at[ep].set(res.x.astype(jnp.float32)),
                metrics=metrics,
                evals=st["evals"].at[ep].set(res.n_evals),
                history=hist if spec.warm_start else st["history"],
            )

        st = jax.lax.while_loop(cond, body, state)
        # Close the last executed epoch's metrics row (one forward).
        _, parts = loss_fn(st["x"])
        metrics = st["metrics"].at[jnp.maximum(st["ep"] - 1, 0)].set(
            metrics_row(parts)
        )
        return st["snapshots"], metrics, st["evals"], st["ep"]

    def optimize(self, phi_c, phi_s, epochs: int | None = None, x0=None):
        """Run the optimization; returns a host-side results dict."""
        spec = self.spec
        epochs = epochs or spec.epochs
        t = spec.batch_size
        if x0 is None:
            # methods.py:49-54 zeros + 1e-6, created in-program; all four
            # results come back in one packed device->host transfer.
            packed = np.asarray(
                self._epochs_packed_fn(self.params, phi_c, phi_s, epochs=epochs)
            )
            snapshots, metrics, evals, ep_done = self._unpack(
                packed, epochs, t
            )
            ep_done = int(ep_done)
        else:
            snapshots, metrics, evals, ep_done = self._epochs_fn(
                self.params, x0, phi_c, phi_s, epochs=epochs
            )
            snapshots, metrics = np.asarray(snapshots), np.asarray(metrics)
            ep_done = int(ep_done)
        return {
            "snapshots": np.asarray(snapshots[:ep_done]),
            "metrics": np.asarray(metrics[:ep_done]),
            "evals": np.asarray(evals[:ep_done]).astype(np.int32),
            "epochs_done": ep_done,
            "x": np.asarray(snapshots[max(ep_done - 1, 0)])[None, :],
        }

    def _mesh_batch_fn(self, mesh, epochs: int):
        """shard_map program for the mesh path (see optimize_batch)."""
        key = (mesh, epochs)
        fn = self._mesh_fns.get(key)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]

            def local_run(params, x0, pc, ps):
                return jax.lax.map(
                    lambda args: self._run_epochs(params, *args, epochs=epochs),
                    (x0, pc, ps),
                )

            fn = jax.jit(
                shard_map(
                    local_run,
                    mesh=mesh,
                    in_specs=(P(), P(axis), P(axis), P(axis)),
                    out_specs=P(axis),
                    check_vma=False,
                )
            )
            self._mesh_fns[key] = fn
        return fn

    def optimize_batch(
        self, phi_c, phi_s, epochs: int | None = None, x0=None, mesh=None
    ):
        """Transfer K clips with shared encoder weights.

        Args: phi_c [K, T, C], phi_s [K, ...gram...], optional x0 [K, 1, T].

        On a single chip (``mesh=None``) the clips run SEQUENTIALLY through
        the fully-fused single-clip program, dispatched asynchronously so
        the device executes them back to back: a 16384-sample clip already
        saturates the chip (the eval is HBM-bound), so vmapping K clips
        adds no throughput — it only adds lockstep: under vmap every
        masked while_loop runs until the SLOWEST lane finishes, measured
        ~3x wasted device time at K=8 on the long-form workload. One
        compile (the same program ``optimize`` runs) is shared by all K
        runs, each clip gets exact single-run semantics (its own early
        stop), and the aggregate rate exceeds the fused-loop single-clip
        rate (697 evals/s at K=58 measured).

        With ``mesh`` (1-D), the clip axis is sharded over the mesh's
        devices via shard_map and EVERY device runs the same fully-fused
        single-clip program on its local clips (sequential lax.map) — the
        scale-out path for long-form audio on a slice: weights replicated
        (~8 MB encoder), K/n clips per chip, per-clip early stop, zero
        cross-device communication in the hot loop, and no vmap lockstep
        anywhere. Aggregate throughput is n_devices x the single-chip
        fused rate by construction.
        """
        spec = self.spec
        epochs = epochs or spec.epochs
        k = phi_c.shape[0]
        t = spec.batch_size
        phi_c, phi_s = jnp.asarray(phi_c), jnp.asarray(phi_s)
        if mesh is None and x0 is None:
            # All K dispatches are enqueued before ANY result is pulled,
            # and each clip's four results come back as ONE packed buffer
            # (each separate pull pays ~30 ms of latency over a remote-
            # tunnel runtime — 4 pulls x K windows dominated the batched
            # and long-form walls before packing).
            outs = [
                self._epochs_packed_fn(
                    self.params, phi_c[i], phi_s[i], epochs=epochs
                )
                for i in range(k)
            ]
            packed = np.stack([np.asarray(o) for o in outs])
            snapshots, metrics, evals, ep_done = self._unpack(
                packed, epochs, t
            )
            return {
                "snapshots": snapshots,
                "metrics": metrics,
                "evals": evals,
                "epochs_done": ep_done,
                "x": np.stack(
                    [snapshots[i, max(int(e) - 1, 0)] for i, e in enumerate(ep_done)]
                )[:, None, :],
            }
        if x0 is None:
            x0 = jnp.full((k, 1, spec.batch_size), 1e-6, jnp.float32)
        if mesh is None:
            outs = [
                self._epochs_fn(
                    self.params, x0[i], phi_c[i], phi_s[i], epochs=epochs
                )
                for i in range(k)
            ]
            jax.block_until_ready(outs)
            snapshots = np.stack([np.asarray(o[0]) for o in outs])
            ep_done = np.asarray([int(o[3]) for o in outs])
            return {
                "snapshots": snapshots,
                "metrics": np.stack([np.asarray(o[1]) for o in outs]),
                "evals": np.stack([np.asarray(o[2]) for o in outs]),
                "epochs_done": ep_done,
                "x": np.stack(
                    [snapshots[i, max(int(e) - 1, 0)] for i, e in enumerate(ep_done)]
                )[:, None, :],
            }
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        assert k % mesh.devices.size == 0, (
            f"{k} clips must divide the {mesh.devices.size}-device mesh"
        )
        shard = lambda a: jax.device_put(a, NamedSharding(mesh, P(axis)))
        x0, phi_c, phi_s = shard(x0), shard(phi_c), shard(phi_s)
        snapshots, metrics, evals, ep_done = self._mesh_batch_fn(mesh, epochs)(
            self.params, x0, phi_c, phi_s
        )
        ep_done = np.asarray(ep_done)
        return {
            "snapshots": np.asarray(snapshots),
            "metrics": np.asarray(metrics),
            "evals": np.asarray(evals),
            "epochs_done": ep_done,
            "x": np.stack(
                [
                    np.asarray(snapshots[i, max(int(e) - 1, 0)])
                    for i, e in enumerate(ep_done)
                ]
            )[:, None, :],
        }

    # ------------------------------------------------------------------ #
    # Full run with file IO (reference methods.py:183-216)
    # ------------------------------------------------------------------ #

    def run(
        self,
        cont_file: str,
        source: str,
        target: str,
        epochs: int | None = None,
        audio_channel: int = 0,
        start: float = 1.0,
    ) -> np.ndarray:
        spec = self.spec
        late = spec.late
        t0 = time.time()
        if spec.write_artifacts:
            os.makedirs(spec.savepath, exist_ok=True)
            os.makedirs(spec.figdir, exist_ok=True)

        style_audio_full, _ = load_audio(target, sr=spec.sr, audio_channel=audio_channel)
        source_audio_full, _ = load_audio(source, sr=spec.sr, audio_channel=audio_channel)
        phi_t = self.get_style_phi(
            style_audio_full, show_mat=spec.write_artifacts, figdir=spec.figdir
        )
        phi_s = self.get_style_phi(source_audio_full)

        aud, _ = load_audio(cont_file, sr=spec.sr, audio_channel=audio_channel)
        st = int(start * spec.sr - late)
        st = max(st, 0)
        if st + spec.batch_size > len(aud):
            raise ValueError(
                f"content window [{st}, {st + spec.batch_size}) exceeds the "
                f"{len(aud)}-sample clip; lower --start or --batch_size"
            )
        aud = aud[st : st + spec.batch_size]

        if spec.write_artifacts:
            os.makedirs(spec.savepath, exist_ok=True)
            os.makedirs(spec.figdir, exist_ok=True)
            from audio_style_transfer_tpu.analysis.spectrogram import plotstft

            savep = os.path.join(spec.savepath, "ori.wav")
            write_wav(savep, aud[late:-late], sr=spec.sr)
            plotstft(savep, plotpath=os.path.join(spec.figdir, "ori-spec.png"))

            style_aud = style_audio_full[st : st + spec.batch_size]
            saves = os.path.join(spec.savepath, "style.wav")
            write_wav(saves, style_aud[late:-late], sr=spec.sr)
            plotstft(saves, plotpath=os.path.join(spec.figdir, "style-spec.png"))

        phi_c = self.get_embeds(aud)
        phi = self.get_embeds(aud, is_content=False)
        if spec.write_artifacts:
            from audio_style_transfer_tpu.analysis.viz import show_gram

            show_gram(phi, ep=0, figdir=spec.figdir, gatys=spec.gatys)

        # The gram-translation trick (methods.py:211-212).
        phi = np.asarray(l2_normalize(jnp.asarray(phi + phi_t - phi_s), axes=(1, 2)))

        result = self.optimize(phi_c, phi, epochs=epochs)
        # Per-epoch log lines (the reference streamed these during the run,
        # methods.py:151-155; the fused program reports them afterwards).
        for ep in range(result["epochs_done"]):
            loss_, cnt_, stl_, reg_ = result["metrics"][ep]
            print(
                f"Ep {ep + 1}/{epochs or spec.epochs} - evals "
                f"{result['evals'][ep]} - loss {loss_:.4f} - content "
                f"{cnt_:.4f} - style {stl_:.4f} - regularizer {reg_:.4f}"
            )
        print(
            f"optimized {result['epochs_done']} epochs in {time.time() - t0:.2f}s; "
            f"final loss {result['metrics'][-1, 0]:.4f}"
        )
        if spec.write_artifacts:
            from audio_style_transfer_tpu.utils.profiling import MetricsLogger

            with MetricsLogger(spec.logdir) as m:
                for ep in range(result["epochs_done"]):
                    loss_, cnt_, stl_, reg_ = result["metrics"][ep]
                    m.log(ep, main_loss=loss_, content_loss=cnt_,
                          style_loss=stl_, regularizer=reg_)

        if spec.write_artifacts:
            self._write_epoch_artifacts(result)

        return inv_mu_law_numpy(result["x"])[0]

    def _write_epoch_artifacts(self, result) -> None:
        """Emit per-epoch wav/gram/spectrogram files (methods.py:169-179)."""
        from audio_style_transfer_tpu.analysis.spectrogram import plotstft
        from audio_style_transfer_tpu.analysis.viz import show_gram

        spec = self.spec
        late = spec.late
        for ep in range(result["epochs_done"]):
            audio = inv_mu_law_numpy(result["snapshots"][ep])[late:-late]
            sp = os.path.join(spec.savepath, f"ep-{ep}.wav")
            write_wav(sp, audio / np.max(audio), sr=spec.sr)
            # The reference evaluates embeds_s on the raw variable value
            # (already in quantized space), NOT re-mu-lawed (methods.py:177).
            _, grams = self._embeds_fn(
                self.params, jnp.asarray(result["snapshots"][ep])[None, :]
            )
            grams = np.asarray(grams)
            show_gram(grams, ep + 1, spec.figdir, gatys=spec.gatys)
            plotstft(
                sp, plotpath=os.path.join(spec.figdir, f"ep_{ep + 1}_spectro.png")
            )
