"""Training engine: one jitted SPMD train step + the epoch loop.

Parity: pytorch/libs/training/trainer_online.py (SimpleTrainer), re-designed
TPU-first:

* The whole optimization step — forward, loss, backward, grad clip
  (max_change), optimizer, BN stat update — is ONE jitted function over the
  device mesh. Gradient sync is XLA-inserted psum (no DDP wrapper), and
  BatchNorm batch stats are global (SyncBN for free; reference needed
  convert_synchronized_batchnorm, utils.py:414-421).
* Gradient accumulation uses lax.scan over microbatches inside the step
  (reference used DDP no_sync over python iterations,
  trainer_online.py:253-259).
* bf16 compute: inputs are cast to bf16; margin-loss cos/acos stays fp32
  (loss.py mirrors the reference's AMP-float32 region loss.py:300).
* Non-finite grads skip the update on-device (reference skip_nan_batch +
  grad-norm check trainer_online.py:294-327) — no host sync in the loop.
* Margin-warm (lambda_m, margin_offset) and LR plateau scale enter as
  traced scalars, so schedule changes never retrigger compilation.
"""

from __future__ import annotations

import dataclasses
import inspect
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..nn.loss import accuracy as compute_accuracy
from ..parallel.mesh import (
    batch_sharding,
    make_mesh,
    opt_state_shardings,
    partition_params,
    replicate,
    replicated_sharding,
    shard_batch,
)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class TrainStepConfig:
    max_change: float = 10.0  # grad clip by global norm (reference trainer_online.py:320)
    accum_grad: int = 1
    compute_dtype: Any = jnp.bfloat16
    use_semi_orth: bool = False  # F-TDNN constraint every 4 steps
    skip_nonfinite: bool = True
    mixup_alpha: float = 0.0  # >0 enables batch mixup (components.py:717 + MixupLoss)
    # wave-input mode: batch["x"] is [B, S] raw audio; the fused Pallas
    # fbank + CMVN run INSIDE the jitted step (no host feature stage).
    # The host pipeline then only decodes/augments waveforms (~98k
    # audio-s/s per thread) instead of computing features (~50 audio-s/s)
    # — the difference between starving the chip and saturating it.
    wave_input: bool = False
    fbank_opts: Any = None
    # on-device SpecAugment for wave_input (the host stage needs features;
    # here features only exist inside the step). Mirrors
    # data/augment.spec_augment per row, vectorized over the batch.
    spec_aug: bool = False
    spec_aug_params: Any = None  # {"num_t_mask","num_f_mask","max_t","max_f"}
    # rematerialization of the forward for the backward pass: the measured
    # v5e train step is HBM-saturated (PERF.md) while the MXU sits at ~50%,
    # so trading activation reads for recompute FLOPs can win.
    #   None   - store all activations (XLA default)
    #   "dots" - keep only non-batch matmul outputs; batched convs/GEMMs
    #            are recomputed too
    #            (jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    #   "dots_batch" - keep EVERY matmul/conv output, recompute only the
    #            elementwise/norm chains between them
    #            (jax.checkpoint_policies.dots_saveable)
    #   "full" - store nothing, recompute the whole forward
    remat: Optional[str] = None
    # model-level warmup for transformer stochastic depth (reference
    # trainer_online.py:227: warmup = cur_step / warmup_steps, fed to the
    # encoder's layer-bypass alpha). 0 = always 1.0 (off).
    model_warmup_steps: int = 0


def device_spec_augment(
    feats: jax.Array,
    rng,
    num_t_mask: int = 1,
    num_f_mask: int = 1,
    max_t: int = 50,
    max_f: int = 10,
) -> jax.Array:
    """Vectorized on-device SpecAugment for [B, T, D] features.

    Semantics of data/augment.spec_augment (reference augmentation.py:21-113)
    per batch row: zero `num_*_mask` random bands of width U[1, max] with
    uniform start, band skipped when width >= the axis size. Start positions
    use the uniform*range construction (widths are traced values, so
    randint's static bounds can't express [0, t-width))."""
    b, t, d = feats.shape
    kt, kts, kf, kfs = jax.random.split(rng, 4)

    def band_mask(nmask, size, max_w, kw, ks, axis_len):
        w = jax.random.randint(kw, (b, nmask), 1, max_w + 1)
        start = (
            jax.random.uniform(ks, (b, nmask))
            * jnp.maximum(axis_len - w, 1).astype(jnp.float32)
        ).astype(jnp.int32)
        idx = jnp.arange(size)[None, :, None]
        hit = (idx >= start[:, None, :]) & (idx < (start + w)[:, None, :])
        hit = hit & (w < axis_len)[:, None, :]  # width >= size: band skipped
        return jnp.any(hit, axis=-1)  # [B, size]

    tmask = band_mask(num_t_mask, t, max_t, kt, kts, t)
    fmask = band_mask(num_f_mask, d, max_f, kf, kfs, d)
    keep = (~tmask)[:, :, None] & (~fmask)[:, None, :]
    return feats * keep.astype(feats.dtype)


def make_train_step(
    net,
    tx: optax.GradientTransformation,
    lr_schedule: Optional[Callable] = None,
    config: TrainStepConfig = TrainStepConfig(),
    param_gather_fn: Optional[Callable] = None,
):
    """Build the jitted train step.

    step(state, batch, rng, lambda_m, margin_offset, lr_scale)
      -> (new_state, metrics dict)

    batch = {"x": [B, T, D], "y": [B], optional "mask": [B, T]}. With
    accum_grad>1, B must divide it; microbatches run under lax.scan.

    param_gather_fn (built by Trainer from its partition rules): a
    sharding-constraint map applied to the params *as used in the
    forward*. ZeRO-3 params are sharded AT REST but must be REPLICATED
    AT USE — without the constraint XLA propagates the rest-sharding
    into the activations and silently turns the net into feature-
    parallel TP over the data axis (an all-gather of a full [B, T, C]
    activation at every conv: ~16x the ZeRO communication volume,
    measured in tools/collective_audit.py). With it, XLA all-gathers
    the (bf16) weights instead and the cotangent of the constraint
    reduce-scatters the gradients back to the shards — the scaling-book
    ZeRO-3 recipe.
    """

    # model-level warmup is a transformer-only net input; only pass it to
    # nets that declare it (SpeakerNet; MultiTaskNet etc. don't take it)
    net_takes_warmup = "warmup" in inspect.signature(type(net).__call__).parameters

    def loss_fn(params, batch_stats, x, y, mask, rng, lambda_m, margin_offset,
                warmup=1.0):
        warm_kw = {"warmup": warmup} if net_takes_warmup else {}
        # multi-task batches carry dict targets {"spk": [B], "phone": [B,T]};
        # accuracy is always speaker accuracy (reference get_accuracy,
        # multi_task_xvector_fix.py:258-266)
        y_acc = y["spk"] if isinstance(y, dict) else y
        if config.wave_input:
            from ..features import FbankOptions, cmvn_utterance
            from ..features.pallas_fbank import fused_fbank

            opts = config.fbank_opts or FbankOptions()
            # feature DFT precision follows the training compute dtype:
            # bf16 training tolerates bf16 spectra (leakage ~2^-9 of frame
            # peak, far under the augmentation noise floor); f32 runs keep
            # the golden-parity front-end
            feats, _ = fused_fbank(x, opts, dft_dtype=config.compute_dtype,
                                   with_energy=False)
            if mask is not None:
                shift, win = opts.frame_opts.window_shift, opts.frame_opts.window_size
                n_samples = jnp.sum(mask, axis=1)
                n_frames = jnp.maximum((n_samples - win) // shift + 1, 1)
                mask = jnp.arange(feats.shape[1])[None, :] < n_frames[:, None]
                feats = cmvn_utterance(feats, mask=mask) * mask[..., None]
            else:
                feats = cmvn_utterance(feats)
            if config.spec_aug:
                rng, sa_rng = jax.random.split(rng)
                feats = device_spec_augment(
                    feats, sa_rng, **(config.spec_aug_params or {})
                )
            x = feats
        xc = x.astype(config.compute_dtype)
        # true mixed precision: cast the params used in the forward to the
        # compute dtype (f32 params + bf16 inputs would promote the whole
        # forward back to f32); the f32 master copy lives in the optimizer.
        # The margin-loss head stays f32 internally (loss.py upcasts).
        if config.compute_dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(config.compute_dtype)
                if p.dtype == jnp.float32
                else p,
                params,
            )
        if param_gather_fn is not None:
            # ZeRO-3: gather the compute-dtype weight copies to replicated
            # for the forward/backward; grads reduce-scatter back through
            # the constraint's transpose
            params = param_gather_fn(params)
        if config.mixup_alpha > 0:
            # batch mixup: mixed inputs, loss = lam*L(y) + (1-lam)*L(y[perm])
            from ..nn.tdnn import mixup as _mixup

            rng, mix_rng = jax.random.split(rng)
            xc, lam, perm = _mixup(xc, mix_rng, config.mixup_alpha)

            def apply_once(targets, r):
                return net.apply(
                    {"params": params, "batch_stats": batch_stats},
                    xc, targets, mask=mask, train=True,
                    lambda_m=lambda_m, margin_offset=margin_offset,
                    **warm_kw,
                    mutable=["batch_stats"], rngs={"dropout": r},
                )

            (loss_a, logits, _), mut = apply_once(y, rng)
            y_perm = jax.tree_util.tree_map(lambda t: t[perm], y)
            (loss_b, _, _), _ = apply_once(y_perm, rng)
            loss = lam * loss_a + (1.0 - lam) * loss_b
            acc = compute_accuracy(logits, y_acc)
            return loss.astype(jnp.float32), (mut["batch_stats"], acc)
        (loss, logits, _emb), mut = net.apply(
            {"params": params, "batch_stats": batch_stats},
            xc,
            y,
            mask=mask,
            train=True,
            lambda_m=lambda_m,
            margin_offset=margin_offset,
            **warm_kw,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        acc = compute_accuracy(logits, y_acc)
        return loss.astype(jnp.float32), (mut["batch_stats"], acc)

    if config.remat == "full":
        loss_fn = jax.checkpoint(loss_fn)
    elif config.remat == "dots":
        loss_fn = jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    elif config.remat == "dots_batch":
        loss_fn = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.dots_saveable
        )
    elif config.remat is not None:
        raise ValueError(f"unknown remat policy {config.remat!r}")
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state, batch, rng, lambda_m=1.0, margin_offset=0.0, lr_scale=1.0):
        x, y = batch["x"], batch["y"]
        mask = batch.get("mask")
        warmup = (
            state.step.astype(jnp.float32) / config.model_warmup_steps
            if config.model_warmup_steps > 0 else 1.0
        )
        a = config.accum_grad
        if a > 1:
            b = x.shape[0]
            if b % a:
                raise ValueError(f"batch {b} not divisible by accum_grad {a}")
            mb = b // a
            xs = x.reshape(a, mb, *x.shape[1:])
            ys = y.reshape(a, mb)
            ms = mask.reshape(a, mb, -1) if mask is not None else None
            rngs = jax.random.split(rng, a)

            def micro(carry, inp):
                grads_acc, bs, loss_acc, acc_acc = carry
                xi, yi, ri, mi = inp
                (loss, (bs2, acc)), grads = grad_fn(
                    state.params, bs, xi, yi, mi, ri, lambda_m, margin_offset,
                    warmup,
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, bs2, loss_acc + loss, acc_acc + acc), None

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            inputs = (xs, ys, rngs, ms) if ms is not None else (
                xs, ys, rngs, jnp.zeros((a,), jnp.float32)  # dummy
            )
            if ms is None:

                def micro_nomask(carry, inp):
                    grads_acc, bs, loss_acc, acc_acc = carry
                    xi, yi, ri, _ = inp
                    (loss, (bs2, acc)), grads = grad_fn(
                        state.params, bs, xi, yi, None, ri, lambda_m,
                        margin_offset, warmup,
                    )
                    grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                    return (grads_acc, bs2, loss_acc + loss, acc_acc + acc), None

                micro_fn = micro_nomask
            else:
                micro_fn = micro
            (grads, new_bs, loss_sum, acc_sum), _ = jax.lax.scan(
                micro_fn,
                (zero_grads, state.batch_stats, jnp.zeros(()), jnp.zeros(())),
                inputs,
            )
            grads = jax.tree_util.tree_map(lambda g: g / a, grads)
            loss = loss_sum / a
            acc = acc_sum / a
        else:
            (loss, (new_bs, acc)), grads = grad_fn(
                state.params, state.batch_stats, x, y, mask, rng,
                lambda_m, margin_offset, warmup,
            )

        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        # clip by global norm = the reference's max_change semantics;
        # denominator (gnorm + 1e-6) matches torch clip_grad_norm_ exactly
        scale = jnp.minimum(1.0, config.max_change / (gnorm + 1e-6))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        # Plateau lr_scale must scale the STEP, not the gradients: Adam-family
        # optimizers are invariant to uniform gradient scaling, so scaling
        # grads would make ReduceOnPlateau a no-op (advisor r1, high). Scaling
        # the post-optimizer updates is exactly an lr multiplier for every
        # optax transform.
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)

        if config.use_semi_orth:
            from ..nn.tdnn import apply_semi_orth_constraint

            new_params = jax.lax.cond(
                (state.step % 4) == 0,
                apply_semi_orth_constraint,
                lambda p: p,
                new_params,
            )

        if config.skip_nonfinite:
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new, old
            )
            new_params = keep(new_params, state.params)
            new_opt = keep(new_opt, state.opt_state)
            new_bs = keep(new_bs, state.batch_stats)

        metrics = {
            "loss": loss,
            "accuracy": acc,
            "grad_norm": gnorm,
            "skipped": 1.0 - finite.astype(jnp.float32),
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step) * lr_scale
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            metrics,
        )

    return step


def make_eval_step(net, param_gather_fn=None):
    """Jittable validation step: (state, batch) -> weighted metric sums.

    batch may carry "weight" [B] (1/0) so padded rows — added to make the
    batch shardable over the mesh — contribute nothing.
    param_gather_fn: same ZeRO-3 at-use constraint as the train step —
    without it FSDP-sharded params turn the eval forward into activation
    TP too.
    """

    def step(state, batch):
        params = state.params
        if param_gather_fn is not None:
            params = param_gather_fn(params)
        loss_vec, logits, _ = net.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["x"],
            batch["y"],
            mask=batch.get("mask"),
            train=False,
        )
        # multi-task dict targets: validation metrics are speaker metrics
        y = batch["y"]["spk"] if isinstance(batch["y"], dict) else batch["y"]
        w = batch.get("weight")
        if w is None:
            w = jnp.ones(y.shape[0], jnp.float32)
        correct = (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
        # loss from the head is already a scalar mean; recompute the sum via
        # per-row CE for exact weighting
        from ..nn.loss import cross_entropy

        per_row = cross_entropy(logits, y, reduction="none")
        return {
            "loss_sum": jnp.sum(per_row * w),
            "acc_sum": jnp.sum(correct * w),
            "n": jnp.sum(w),
        }

    return step


def init_train_state(
    net, rng, example_batch: Dict, tx: optax.GradientTransformation
) -> TrainState:
    variables = net.init(
        {"params": rng, "dropout": rng},
        example_batch["x"],
        example_batch["y"],
        mask=example_batch.get("mask"),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_param_gather_fn(mesh, partition_rules) -> Optional[Callable]:
    """ZeRO-3 at-use constraint from partition rules (see
    make_train_step's param_gather_fn): data-axis-sharded (FSDP) params
    are constrained REPLICATED at use; model-axis params keep their spec
    (intentional tensor parallelism — e.g. the row-parallel classifier);
    replicated params pass through untouched. Shared by the standard and
    SAM train steps."""
    if partition_rules is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import MODEL_AXIS

    rep = NamedSharding(mesh, P())
    rules = partition_rules

    def gather(params):
        def one(path, p):
            spec = rules(path, p)
            if spec == P():
                return p
            if any(ax == MODEL_AXIS for ax in spec):
                return jax.lax.with_sharding_constraint(
                    p, NamedSharding(mesh, spec)
                )
            return jax.lax.with_sharding_constraint(p, rep)

        return jax.tree_util.tree_map_with_path(one, params)

    return gather


class Trainer:
    """Epoch loop: data -> sharded jitted steps -> report/validate/checkpoint.

    Parity: SimpleTrainer.run (reference trainer_online.py:429-514), minus
    process-level DDP plumbing (the mesh replaces it).
    """

    def __init__(
        self,
        net,
        tx,
        lr_schedule=None,
        config: TrainStepConfig = TrainStepConfig(),
        mesh=None,
        margin_warm=None,
        plateau=None,
        report_interval: int = 100,
        checkpoint_dir: Optional[str] = None,
        reporter=None,
        nan_debug_dir: Optional[str] = None,
        partition_rules: Optional[Callable] = None,
        step_fn: Optional[Callable] = None,
    ):
        self.net = net
        self.tx = tx
        self.lr_schedule = lr_schedule
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.margin_warm = margin_warm
        self.plateau = plateau
        self.report_interval = report_interval
        self.checkpoint_dir = checkpoint_dir
        self.reporter = reporter
        self.nan_debug_dir = nan_debug_dir
        # model-axis param partitioning: rules(path, leaf) -> PartitionSpec
        # (e.g. parallel.mesh.classifier_partition_rules). None = replicate.
        self.partition_rules = partition_rules

        # step_fn: alternative step with the same (state, batch, rng,
        # lambda_m, margin_offset, lr_scale) signature — e.g.
        # sam.make_sam_train_step (the reference's trainer_online_sam)
        self._step_fn = step_fn or make_train_step(
            net, tx, lr_schedule, config,
            param_gather_fn=self._make_param_gather_fn(),
        )
        self._build_jits(replicated_sharding(self.mesh))
        self._eval_step = jax.jit(
            make_eval_step(net, param_gather_fn=self._make_param_gather_fn())
        )

    def _make_param_gather_fn(self) -> Optional[Callable]:
        return make_param_gather_fn(self.mesh, self.partition_rules)

    def _build_jits(self, state_shardings) -> None:
        """(Re)build the jitted train steps for the given TrainState
        shardings (a prefix pytree — a single sharding replicates all)."""
        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        self._train_step = jax.jit(
            self._step_fn,
            in_shardings=(
                state_shardings,
                {"x": data, "y": data, "mask": data},
                rep, rep, rep, rep,
            ),
            out_shardings=(state_shardings, rep),
            donate_argnums=(0,),
        )
        self._train_step_nomask = jax.jit(
            self._step_fn,
            in_shardings=(
                state_shardings, {"x": data, "y": data}, rep, rep, rep, rep
            ),
            out_shardings=(state_shardings, rep),
            donate_argnums=(0,),
        )

    def init_state(self, rng, example_batch) -> TrainState:
        state = init_train_state(self.net, rng, example_batch, self.tx)
        if self.partition_rules is None:
            return replicate(self.mesh, state)
        rep = replicated_sharding(self.mesh)
        p_sh = partition_params(self.mesh, state.params, self.partition_rules)
        o_sh = opt_state_shardings(self.mesh, state.opt_state, state.params, p_sh)
        state_shardings = TrainState(
            step=rep,
            params=p_sh,
            batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
            opt_state=o_sh,
        )
        self._build_jits(state_shardings)
        return TrainState(
            step=jax.device_put(state.step, rep),
            params=jax.device_put(state.params, p_sh),
            batch_stats=jax.device_put(state.batch_stats, rep),
            opt_state=jax.tree_util.tree_map(
                jax.device_put, state.opt_state, o_sh
            ),
        )

    def run_epoch(
        self,
        state: TrainState,
        data_iter: Iterable[Dict],
        rng,
        epoch: int = 0,
        valid_iter: Optional[Callable] = None,
    ) -> Tuple[TrainState, Dict]:
        """One epoch over `data_iter` of host batches; returns final state
        plus EPOCH-MEAN metrics (skipped = total skipped steps). The means
        accumulate as lazy device scalars — no per-step device_get blocking
        (advisor r1) — and are fetched once at epoch end."""
        agg = {"loss": None, "accuracy": None, "skipped": None, "n": 0}
        metrics = {}
        t0 = time.time()
        # Track the step counter on host: device_get(state.step) every
        # iteration would block on the previous step and serialize
        # host/device work, defeating the Prefetcher overlap (advisor r1).
        host_step = int(jax.device_get(state.step))
        for i, batch in enumerate(data_iter):
            step_idx = host_step + i
            if self.margin_warm is not None:
                moff, lam = self.margin_warm.step(step_idx)
                from ..nn.loss import MarginWarm as _MW

                if isinstance(self.margin_warm, _MW):
                    # step_iter clamps the warm lambda (reference
                    # ecapa_tdnn_xvector.py:526: max(1e-3, lambda_m));
                    # the "m"-annealing path (LambdaMAnneal) does not
                    lam = max(1e-3, lam)
            else:
                moff, lam = 0.0, 1.0
            lr_scale = self.plateau.scale if self.plateau is not None else 1.0
            rng, sub = jax.random.split(rng)
            if "phone_y" in batch:
                # ChunkEgsMultiTask dual-label batches -> MultiTaskNet dict
                # targets (multi_task_xvector_fix.py trainer_mt semantics)
                batch = dict(batch, y={"spk": batch["y"],
                                       "phone": batch["phone_y"]})
            batch = {k: batch[k] for k in ("x", "y", "mask") if k in batch}
            batch = shard_batch(self.mesh, batch)
            fn = self._train_step if "mask" in batch else self._train_step_nomask
            state, metrics = fn(
                state, batch, sub,
                jnp.asarray(lam, jnp.float32),
                jnp.asarray(moff, jnp.float32),
                jnp.asarray(lr_scale, jnp.float32),
            )
            agg["n"] += 1
            for k in ("loss", "accuracy", "skipped"):
                agg[k] = metrics[k] if agg[k] is None else agg[k] + metrics[k]
            if self.nan_debug_dir is not None and float(
                jax.device_get(metrics["skipped"])
            ) > 0:
                # forensic dump + replay file (reference nan_debug,
                # trainer_online.py:232-300)
                from .debug import dump_nan_batch

                dump_nan_batch(self.nan_debug_dir, state, batch, metrics)
            if (i + 1) % self.report_interval == 0:
                m = jax.device_get(metrics)
                rate = self.report_interval / (time.time() - t0)
                t0 = time.time()
                if self.reporter is not None:
                    self.reporter.update(
                        epoch=epoch, iteration=i + 1, steps_per_sec=rate,
                        **{k: float(v) for k, v in m.items()},
                    )
                if valid_iter is not None and self.plateau is not None:
                    vloss = self.validate(state, valid_iter())
                    self.plateau.update(vloss["loss"])
        if not agg["n"]:
            return state, {}
        final_metrics = jax.device_get(metrics)
        out = {k: float(v) for k, v in final_metrics.items()}
        sums = jax.device_get({k: agg[k] for k in ("loss", "accuracy", "skipped")})
        out["loss"] = float(sums["loss"]) / agg["n"]
        out["accuracy"] = float(sums["accuracy"]) / agg["n"]
        out["skipped"] = float(sums["skipped"])  # TOTAL skipped steps
        return state, out

    def validate(self, state: TrainState, valid_iter: Iterable[Dict]) -> Dict:
        n_data = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
        loss_sum = acc_sum = count = 0.0
        for batch in valid_iter:
            if "phone_y" in batch:
                batch = dict(batch, y={"spk": batch["y"],
                                       "phone": batch["phone_y"]})
            batch = {k: batch[k] for k in ("x", "y", "mask") if k in batch}
            b = batch["x"].shape[0]
            pad = (-b) % n_data
            weight = np.concatenate([np.ones(b), np.zeros(pad)]).astype(np.float32)
            if pad:
                batch = jax.tree_util.tree_map(
                    lambda v: np.concatenate(
                        [np.asarray(v)] + [np.asarray(v[:1])] * pad, axis=0
                    ),
                    batch,
                )
            batch["weight"] = weight
            batch = shard_batch(self.mesh, batch)
            m = jax.device_get(self._eval_step(state, batch))
            loss_sum += float(m["loss_sum"])
            acc_sum += float(m["acc_sum"])
            count += float(m["n"])
        count = max(count, 1.0)
        return {"loss": loss_sum / count, "accuracy": acc_sum / count}
