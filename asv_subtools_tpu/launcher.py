"""Stage-gated experiment launcher (parity: pytorch/launcher/run*.py).

One python entry replaces the reference's launcher + shell pipeline:
  stage 0: build egs (data lists, speaker map)
  stage 1: train (SPMD over the mesh)
  stage 2: extract embeddings (bucketed batch extractor) -> xvector ark/scp
  stage 3: score (cosine / PLDA + submean/AS-norm) -> EER/minDCF

Driven by a params dict merged over defaults with assign_params_dict —
the reference launcher idiom (runEcapaXvector_online.py:99-445).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data import SpeechAug, WavEgs, WavEgsXvector, build_spk2int, Prefetcher
from .extract import ExtractConfig, Extractor
from .models import MODELS, SpeakerNet
from .nn.loss import LambdaMAnneal, MarginWarm
from .parallel import make_mesh
from .train import (
    ReduceOnPlateau,
    Reporter,
    TrainStepConfig,
    Trainer,
    get_lr_schedule,
    get_optimizer,
    load_checkpoint,
    save_checkpoint,
)
from .utils import assign_params_dict, init_logger, set_all_seed

def _example_batch(egs):
    """First batch for init/shape probing. MultiprocessLoader must NOT be
    probed with next(iter(...)) — that dispatches an epoch to the pool and
    abandons it mid-flight; its example_batch() builds an in-process
    single-worker pipeline instead."""
    if hasattr(egs, "example_batch"):
        return egs.example_batch()
    return next(iter(egs))


DEFAULT_PARAMS: Dict[str, Any] = {
    "seed": 1024,
    "exp_dir": "exp/test",
    # data
    "data": {
        "train_wav_scp": "",
        "train_utt2spk": "",
        "eval_wav_scp": "",
        "chunk_seconds": 2.015,
        "batch_size": 64,
        "speed_perturb": False,
        "shuffle_buffer": 1000,
        "compute_feat": True,
        # fbank | mfcc | fbank_pitch | mfcc_pitch (makeFeatures.sh family);
        # the _pitch variants append the 3-dim Kaldi pitch feature
        "feat_type": "fbank",
        # host feature backend: "numpy" (golden-exact default) or
        # "native" (C++ frontend via ctypes, ~2.9x faster per core with
        # automatic numpy fallback; agrees within 1e-5)
        "feat_backend": "numpy",
        "spec_aug": False,
        "valid_utts": 0,  # hold out N utts for validation (plateau/reporting)
        # fbank bins for BOTH training egs and extraction (None = library
        # default 23; the reference's voxceleb recipes use 80/81-fbank)
        "num_bins": None,
        # host pipeline threads for the per-sample stages (decode/aug/feats)
        # — ordered fan-out, so results are identical to workers=1
        "workers": 8,
        # waveform augmentation chain (reference speech_aug yaml):
        # {"mode": "random", "clean_prob": 0.25, "stages": [
        #   {"type": "add_noise", "csv": ...}, {"type": "add_reverb", ...}]}
        "speech_aug": None,
        # >1 = persistent PROCESS pool (MultiprocessLoader): the measured
        # scaling path for the aug-heavy pipeline (tools/egs_bench.py)
        "num_workers": 1,
        # "offline" = classic chunk-egs path (runSnowdarXvector.py family):
        # set egs_dir to a dir from data.egs_offline.prepare_egs_dir
        # (train.egs.csv / valid.egs.csv / info); aug/aug_params select the
        # per-chunk SpecAugment/Cutout (augmentation.py get_augmentation)
        "egs_type": "online",
        "egs_dir": "",
    },
    # model
    "model": {"name": "ecapa_tdnn", "params": {}},
    "loss": {"name": "margin_softmax", "params": {"method": "aam", "m": 0.2}},
    # training
    "train": {
        "epochs": 6,
        "optimizer": {"name": "adamW", "learning_rate": 1e-3, "weight_decay": 1e-4},
        "lr_schedule": {"name": "warmR", "base_lr": 1e-3, "t_0": 10000},
        "max_change": 10.0,
        "accum_grad": 1,
        "compute_dtype": "bfloat16",
        "use_semi_orth": False,
        "report_interval": 100,
        "margin_warm": None,  # {"start_epoch", "end_epoch", "offset_margin", "init_lambda"}
        # transformer model-level warmup (reference trainer_online.py:227:
        # warmup = cur_step / warmup_steps fed to the encoder's
        # layer-bypass alpha); 0 = off. Conformer recipes NEED this —
        # without it the encoder trains through full stochastic-depth
        # blocks from step 0 and diverges on short runs.
        "model_warmup_steps": 0,
        # mesh model-axis size (>1 shards the margin-loss classifier rows
        # over the model axis via classifier_partition_rules)
        "num_model": 1,
        # ZeRO-3-style fully-sharded data parallelism (beyond the
        # reference): shard every large param + its optimizer moments over
        # the data axis (parallel.mesh.make_fsdp_rules)
        "fsdp": False,
    },
    # extraction: mode "feature" (host fbank) or "wave" (on-chip fused fbank)
    "extract": {
        "buckets": [200, 400, 800, 1600, 3200, 6400, 10000],
        "batch": 32,
        "mode": "feature",
        "workers": 8,
    },
}


class Launcher:
    def __init__(self, params: Optional[Dict] = None, mesh=None):
        params = params or {}
        self.params = assign_params_dict(DEFAULT_PARAMS, params, support_unknown=True)
        # factory-selection sub-dicts replace the default wholesale when the
        # user picks a different implementation (merging a warmR default's
        # t_0 into a "constant" schedule would be wrong)
        for section, key in [("train", "optimizer"), ("train", "lr_schedule")]:
            user = params.get(section, {}).get(key)
            if user and user.get("name") != DEFAULT_PARAMS[section][key]["name"]:
                self.params[section][key] = dict(user)
        for section in ("model", "loss"):
            user = params.get(section, {})
            if user.get("name") and user["name"] != DEFAULT_PARAMS[section]["name"]:
                self.params[section] = {
                    "name": user["name"],
                    "params": dict(user.get("params", {})),
                }
        self.logger = init_logger()
        set_all_seed(self.params["seed"])
        num_model = int(self.params["train"].get("num_model", 1))
        self.mesh = mesh if mesh is not None else make_mesh(num_model=num_model)
        self.spk2int: Optional[Dict] = None
        self.net: Optional[SpeakerNet] = None
        self.state = None
        self.valid_egs = None

    # -- stage 0 ------------------------------------------------------------
    def build_egs(self) -> WavEgs:
        p = self.params["data"]
        self.feat_opts = None
        if (p.get("feat_type", "fbank") != "fbank"
                and not p.get("compute_feat", True)):
            # wave-input training runs the fused on-chip FBANK only; a
            # silently-ignored mfcc/pitch selection would train on the
            # wrong features
            raise ValueError(
                f"data.feat_type={p['feat_type']!r} requires host feature "
                "computation (data.compute_feat=True); the wave-input path "
                "computes fbank on-chip only")
        if p.get("num_bins"):
            from .features import FbankOptions, MelOptions, MfccOptions

            mel = MelOptions(num_bins=int(p["num_bins"]))
            if p.get("feat_type", "fbank").startswith("mfcc"):
                self.feat_opts = MfccOptions(mel_opts=mel)
            else:
                self.feat_opts = FbankOptions(mel_opts=mel)
        if p.get("egs_type", "online") == "offline":
            return self._build_offline_egs(p)
        self.spk2int = build_spk2int(p["train_utt2spk"])
        num_spks = len(self.spk2int)
        if p.get("speed_perturb"):
            num_spks *= 3
        self.num_targets = num_spks
        self.logger.info("egs: %d speakers (incl. sp-aug)", num_spks)

        train_scp, train_u2s = p["train_wav_scp"], p["train_utt2spk"]
        self.valid_egs = None
        n_valid = int(p.get("valid_utts", 0))
        if n_valid > 0:
            # hold out utterances keeping >=2 per speaker in train
            from .datadir import DataDir

            dd = DataDir.read(os.path.dirname(train_scp))
            train_dd, valid_dd = dd.valid_split(
                num_utts=n_valid, seed=self.params["seed"]
            )
            split_dir = os.path.join(self.params["exp_dir"], "egs_split")
            train_dd.write(os.path.join(split_dir, "train"))
            valid_dd.write(os.path.join(split_dir, "valid"))
            train_scp = os.path.join(split_dir, "train", "wav.scp")
            train_u2s = os.path.join(split_dir, "train", "utt2spk")
            self.valid_egs = WavEgs(
                os.path.join(split_dir, "valid", "wav.scp"),
                os.path.join(split_dir, "valid", "utt2spk"),
                self.spk2int,
                chunk_seconds=p["chunk_seconds"],
                batch_size=p["batch_size"],
                # always features: the eval step applies the net directly
                # (host compute_feats CMVNs identically to the in-step
                # wave path, so wave-trained models validate consistently)
                compute_feat=True,
                feat_opts=self.feat_opts,
                # same family AND backend as training (a native-trained
                # run validating on numpy features would carry a
                # systematic 2e-3 offset into the plateau metric)
                feat_type=p.get("feat_type", "fbank"),
                feat_backend=p.get("feat_backend", "numpy"),
                shuffle_buffer=1,
                seed=self.params["seed"],
            )
            self.logger.info("valid split: %d utts held out", len(valid_dd))
        import functools

        from .data.dataset import _build_train_egs

        make_train_egs = functools.partial(
            _build_train_egs,
            dict(
                train_scp=train_scp,
                train_u2s=train_u2s,
                spk2int=self.spk2int,
                chunk_seconds=p["chunk_seconds"],
                batch_size=p["batch_size"],
                speed_perturb=p.get("speed_perturb", False),
                speech_aug=p.get("speech_aug"),
                compute_feat=p.get("compute_feat", True),
                feat_opts=self.feat_opts,
                feat_type=p.get("feat_type", "fbank"),
                feat_backend=p.get("feat_backend", "numpy"),
                spec_aug=p.get("spec_aug", False),
                shuffle_buffer=p["shuffle_buffer"],
                seed=self.params["seed"],
                workers=p.get("workers", 1),
            ),
        )

        n_proc = int(p.get("num_workers", 1))
        if n_proc > 1:
            from .data import MultiprocessLoader

            # spawn-safe: partial(module-level fn, primitives dict)
            return MultiprocessLoader(make_train_egs, num_workers=n_proc)
        return make_train_egs()

    def _build_offline_egs(self, p: Dict[str, Any]):
        """Offline chunk-egs training path (parity: the classic
        runSnowdarXvector.py launcher family — preprocess_to_egs.sh ->
        get_chunk_egs.py egsdir -> BaseBunch.get_bunch_from_egsdir ->
        trainer.py SimpleTrainer). data params: egs_dir (+optional
        train_csv_name/valid_csv_name, aug/aug_params for the per-chunk
        SpecAugment/Cutout, num_workers for the process pool). Use
        data.egs_offline.prepare_egs_dir to generate the egsdir."""
        import functools

        from .data.egs_offline import (
            ChunkEgs,
            build_chunk_egs_from_dir,
            get_info_from_egsdir,
            read_chunk_csv,
        )

        feat_dim, num_targets, train_csv, valid_csv = get_info_from_egsdir(
            p["egs_dir"], p.get("train_csv_name"), p.get("valid_csv_name")
        )
        self.num_targets = num_targets
        self.feat_dim = feat_dim
        self.logger.info(
            "offline egs: %d targets, feat_dim %d (%s)",
            num_targets, feat_dim, p["egs_dir"],
        )
        if valid_csv:
            valid_chunks = read_chunk_csv(valid_csv)
            if p.get("ali_scp"):
                from .data.egs_offline import ChunkEgsMultiTask, read_ali_scp

                self.valid_egs = ChunkEgsMultiTask(
                    valid_chunks, read_ali_scp(p["ali_scp"]),
                    batch_size=p["batch_size"], drop_last=False,
                    seed=self.params["seed"],
                )
            else:
                self.valid_egs = ChunkEgs(
                    valid_chunks,
                    batch_size=p["batch_size"],
                    drop_last=False,
                    seed=self.params["seed"],
                )
        make_egs = functools.partial(
            build_chunk_egs_from_dir,
            dict(
                train_csv=train_csv,
                batch_size=p["batch_size"],
                aug=p.get("aug"),
                aug_params=p.get("aug_params"),
                # utt->ali rxfile scp: dual-label multitask/FD egs
                # (egs_multi_task.py); pair with model multi_task_xvector
                ali_scp=p.get("ali_scp"),
                # utt->int aux-class file (noise/domain type): FD egs
                # (egs_feature_decompsition.py); pair with model fd_xvector
                aux_utt2label=p.get("aux_utt2label"),
                seed=self.params["seed"],
            ),
        )
        n_proc = int(p.get("num_workers", 1))
        if n_proc > 1:
            from .data import MultiprocessLoader

            return MultiprocessLoader(make_egs, num_workers=n_proc)
        return make_egs()

    def build_model(self) -> SpeakerNet:
        m = self.params["model"]
        l = self.params["loss"]
        mparams = dict(m.get("params", {}))
        if m["name"] == "multi_task_xvector":
            # speaker + frame-phone heads (MultiTaskNet); phone labels come
            # from the egs as dict targets {"spk", "phone"}
            from .models import MultiTaskNet

            num_phones = mparams.pop("num_phones")
            mt_alpha = mparams.pop("mt_alpha", 0.1)
            self.net = MultiTaskNet(
                backbone=MODELS[m["name"]](**mparams),
                num_targets=self.num_targets,
                num_phones=num_phones,
                loss_name=l["name"],
                loss_params=l.get("params", {}),
                mt_alpha=mt_alpha,
            )
            return self.net
        if m["name"] == "fd_xvector":
            # feature-decomposition adversarial net (snowdar-xvector-FD-AL
            # + trainer_fd); trained by the two-optimizer loop in train()
            from .train.fd import FDSpeakerNet

            num_aux = mparams.pop("num_aux_targets", 9)
            self.net = FDSpeakerNet(
                backbone=MODELS[m["name"]](**mparams),
                num_targets=self.num_targets,
                num_aux_targets=num_aux,
                loss_name=l["name"],
                loss_params=l.get("params", {}),
            )
            return self.net
        backbone = MODELS[m["name"]](**mparams)
        self.net = SpeakerNet(
            backbone=backbone,
            loss_name=l["name"],
            loss_params=l.get("params", {}),
            num_targets=self.num_targets,
        )
        return self.net

    # -- stage 1 ------------------------------------------------------------
    def train(self, egs: WavEgs, resume_from: Optional[str] = None):
        t = self.params["train"]
        from .train.fd import FDSpeakerNet

        if isinstance(self.net, FDSpeakerNet):
            return self._train_fd(egs, t, resume_from=resume_from)
        opt = dict(t["optimizer"])
        sched_cfg = dict(t["lr_schedule"])
        sched_name = sched_cfg.pop("name")
        plateau = None
        if sched_name == "reduceP":
            # reduceP = constant base lr + host-side ReduceOnPlateau driven
            # by the valid loss (reference lr_scheduler_online.py:89-117);
            # the scale enters the jitted step as the lr_scale input
            plateau = ReduceOnPlateau(
                **{k: v for k, v in sched_cfg.items() if k != "base_lr"}
            )
            schedule = get_lr_schedule(
                "constant", base_lr=sched_cfg.get("base_lr", 1e-3)
            )
        else:
            schedule = get_lr_schedule(sched_name, **sched_cfg)
        opt["learning_rate"] = schedule
        tx = get_optimizer(opt.pop("name"), **opt)
        margin_warm = None
        if t.get("margin_warm"):
            margin_warm = MarginWarm(**t["margin_warm"])
        elif t.get("lambda_m_anneal"):
            # the reference's step_params["m"] lambda annealing
            margin_warm = LambdaMAnneal(**t["lambda_m_anneal"])

        dtype = jnp.bfloat16 if t["compute_dtype"] == "bfloat16" else jnp.float32
        partition_rules = None
        if t.get("fsdp"):
            from .parallel.mesh import make_fsdp_rules

            partition_rules = make_fsdp_rules(
                self.mesh,
                classifier_model_axis=self.mesh.shape.get("model", 1) > 1,
            )
        elif self.mesh.shape.get("model", 1) > 1:
            from .parallel.mesh import classifier_partition_rules

            partition_rules = classifier_partition_rules
        step_fn = None
        if t.get("sam"):
            # two-pass SAM step (reference runSnowdarXvectorSAM family,
            # trainer_online_sam.py). Feature-input only: the SAM step has
            # no in-step fbank path.
            from .train.sam import make_sam_train_step

            if not self.params["data"].get("compute_feat", True):
                raise ValueError("train.sam requires feature-input egs "
                                 "(data.compute_feat=True or offline egs)")
            sam_cfg = t["sam"] if isinstance(t["sam"], dict) else {}
        trainer_config = TrainStepConfig(
            max_change=t["max_change"],
            accum_grad=t["accum_grad"],
            compute_dtype=dtype,
            use_semi_orth=t.get("use_semi_orth", False),
            # data.compute_feat=False -> wave-input training: host only
            # decodes/augments waveforms; fused fbank + CMVN (+ on-device
            # SpecAugment) run inside the jitted step. TPU-first default
            # for new recipes — host feature computation starves the chip.
            wave_input=not self.params["data"].get("compute_feat", True),
            fbank_opts=self.feat_opts,
            spec_aug=(
                not self.params["data"].get("compute_feat", True)
                and self.params["data"].get("spec_aug", False)
            ),
            model_warmup_steps=int(t.get("model_warmup_steps", 0) or 0),
        )
        if t.get("sam"):
            from .train.trainer import make_param_gather_fn

            step_fn = make_sam_train_step(
                self.net, tx,
                rho=float(sam_cfg.get("rho", 0.05)),
                adaptive=bool(sam_cfg.get("adaptive", False)),
                config=trainer_config,
                # keep SAM's forward ZeRO-3-correct under fsdp/model-axis
                param_gather_fn=make_param_gather_fn(
                    self.mesh, partition_rules
                ),
            )
        trainer = Trainer(
            self.net,
            tx,
            lr_schedule=schedule,
            config=trainer_config,
            mesh=self.mesh,
            margin_warm=margin_warm,
            plateau=plateau,
            report_interval=t["report_interval"],
            reporter=Reporter(log_dir=os.path.join(self.params["exp_dir"], "log")),
            partition_rules=partition_rules,
            step_fn=step_fn,
        )
        example = _example_batch(egs)
        if "phone_y" in example:
            # dual-label egs -> MultiTaskNet dict targets (run_epoch does
            # the same conversion per batch)
            example = dict(example, y={"spk": example["y"],
                                       "phone": example["phone_y"]})
        if not self.params["data"].get("compute_feat", True):
            # wave egs: params must still be initialized on FEATURE shapes
            # (the in-step fused fbank produces them at run time)
            from .features import FbankOptions
            from .features.pallas_fbank import fused_fbank

            feats0, _ = fused_fbank(
                jnp.asarray(example["x"][:2]),
                self.feat_opts or FbankOptions(),
            )
            example = {"x": feats0, "y": jnp.asarray(example["y"][:2])}
        rng = jax.random.PRNGKey(self.params["seed"])
        state = trainer.init_state(rng, example)
        if resume_from:
            state = load_checkpoint(resume_from, state)
        else:
            # transfer-learning init (the reference's LM-finetune /
            # runTransformerXvector_LM idiom, framework.py:133-143):
            # train.transfer = {"from": ckpt, "exclude": ["loss"], ...}
            # copies matching top-level subtrees from a previous phase's
            # checkpoint — the "+LM" step of the ECAPA roadmap
            # (recipe/voxcelebSRC/README.md:62-76) chains through this.
            tr = t.get("transfer") or self.params.get("transfer")
            if tr and tr.get("from"):
                from .train import load_transfer

                state = state.replace(params=load_transfer(
                    state.params, tr["from"],
                    include=tr.get("include"), exclude=tr.get("exclude"),
                    rename=tr.get("rename"),
                ))
                self.logger.info("transfer init from %s (exclude=%s)",
                                 tr["from"], tr.get("exclude"))
        if margin_warm is not None and margin_warm.epoch_iter is None:
            # estimate iters/epoch from the dataset size lazily: one pass count
            margin_warm.update_step_range(max(1, 1000), overwrite=True)
        ckpt_dir = os.path.join(self.params["exp_dir"], "checkpoints")
        for epoch in range(t["epochs"]):
            egs.set_epoch(epoch)
            state, metrics = trainer.run_epoch(
                state, Prefetcher(egs), rng, epoch=epoch
            )
            if self.valid_egs is not None:
                vmetrics = trainer.validate(state, iter(self.valid_egs))
                metrics = {**metrics, **{f"valid_{k}": v for k, v in vmetrics.items()}}
                if trainer.plateau is not None:
                    trainer.plateau.update(vmetrics["loss"])
            save_checkpoint(ckpt_dir, state, epoch + 1, info=metrics)
            self.logger.info("epoch %d: %s", epoch + 1, metrics)
        if hasattr(egs, "close"):  # stop a MultiprocessLoader pool
            egs.close()
        self.state = state
        return state

    def _train_fd(self, egs, t: Dict[str, Any],
                  resume_from: Optional[str] = None):
        """FD-AL two-optimizer alternation through the Launcher (the
        reference's dedicated FD launcher + trainer_fd.GanDalAttTrainer).
        train.fd params: aux_weight, adv_weight, cycle, adv_steps,
        adv_optimizer {name, learning_rate, ...}."""
        from .parallel.mesh import (
            batch_sharding,
            replicated_sharding,
            shard_batch,
        )
        from .train.fd import init_fd_state, make_fd_train_step

        fd = t.get("fd") or {}
        opt = dict(t["optimizer"])
        sched_cfg = dict(t["lr_schedule"])
        schedule = get_lr_schedule(sched_cfg.pop("name"), **sched_cfg)
        opt["learning_rate"] = schedule
        tx_main = get_optimizer(opt.pop("name"), **opt)
        adv_cfg = dict(fd.get("adv_optimizer",
                              {"name": "sgd", "learning_rate": 1e-2}))
        tx_adv = get_optimizer(adv_cfg.pop("name"), **adv_cfg)
        dtype = (jnp.bfloat16 if t["compute_dtype"] == "bfloat16"
                 else jnp.float32)
        step = make_fd_train_step(
            self.net, tx_main, tx_adv,
            aux_weight=float(fd.get("aux_weight", 0.1)),
            adv_weight=float(fd.get("adv_weight", 0.1)),
            cycle=int(fd.get("cycle", 70)),
            adv_steps=int(fd.get("adv_steps", 20)),
            config=TrainStepConfig(
                max_change=t["max_change"], compute_dtype=dtype
            ),
        )
        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        example = _example_batch(egs)
        batch_keys = tuple(
            k for k in ("x", "y", "aux_y", "mask") if k in example
        )
        jit_step = jax.jit(
            step,
            in_shardings=(rep, {k: data for k in batch_keys}, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        rng = jax.random.PRNGKey(self.params["seed"])
        state = jax.device_put(
            init_fd_state(self.net, rng, example, tx_main, tx_adv), rep
        )
        if resume_from:
            state = load_checkpoint(resume_from, state)
        ckpt_dir = os.path.join(self.params["exp_dir"], "checkpoints")
        metrics = {}
        for epoch in range(t["epochs"]):
            egs.set_epoch(epoch)
            for batch in Prefetcher(egs):
                rng, sub = jax.random.split(rng)
                batch = shard_batch(
                    self.mesh, {k: batch[k] for k in batch_keys}
                )
                state, metrics = jit_step(state, batch, sub)
            metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
            save_checkpoint(ckpt_dir, state, epoch + 1, info=metrics)
            self.logger.info("epoch %d: %s", epoch + 1, metrics)
        if hasattr(egs, "close"):
            egs.close()
        self.state = state
        return state

    def find_lr(
        self,
        egs,
        start_lr: float = 1e-8,
        end_lr: float = 1.0,
        num_steps: int = 100,
    ) -> Dict[str, Any]:
        """LR range finder on this config's model/optimizer/egs (parity:
        the reference launchers' run_lr_finder flag -> trainer.run_lr_finder,
        lr_finder.py:24-219). Returns {"lrs", "losses", "suggested_lr"}."""
        from .train import (
            TrainStepConfig,
            get_optimizer,
            init_train_state,
            make_train_step,
            run_lr_finder,
        )

        t = self.params["train"]
        opt = dict(t["optimizer"])
        opt.pop("learning_rate", None)
        tx = get_optimizer(opt.pop("name"), learning_rate=1.0, **opt)
        dtype = (jnp.bfloat16 if t["compute_dtype"] == "bfloat16"
                 else jnp.float32)
        wave = not self.params["data"].get("compute_feat", True)
        cfg = TrainStepConfig(
            max_change=t["max_change"], compute_dtype=dtype,
            wave_input=wave, fbank_opts=self.feat_opts,
        )
        step = jax.jit(make_train_step(self.net, tx, config=cfg))

        def step_fn(state, batch, rng, lr):
            batch = {k: batch[k] for k in ("x", "y", "mask") if k in batch}
            return step(state, batch, rng, 1.0, 0.0, lr)

        rng = jax.random.PRNGKey(self.params["seed"])
        example = _example_batch(egs)
        if wave:
            from .features import FbankOptions
            from .features.pallas_fbank import fused_fbank

            feats0, _ = fused_fbank(
                jnp.asarray(example["x"][:2]),
                self.feat_opts or FbankOptions(),
            )
            example = {"x": feats0, "y": jnp.asarray(example["y"][:2])}
        state = init_train_state(self.net, rng, example, tx)
        out = run_lr_finder(
            step_fn, state, iter(egs), rng,
            start_lr=start_lr, end_lr=end_lr, num_steps=num_steps,
        )
        self.logger.info("lr finder: suggested_lr=%s", out["suggested_lr"])
        return out

    # -- stage 2 ------------------------------------------------------------
    def extract(self, wav_scp: str, out_prefix: str, state=None):
        state = state if state is not None else self.state
        e = self.params["extract"]
        backbone = self.net.backbone

        def model_apply(x, mask):
            out = backbone.apply(
                {"params": state.params["backbone"],
                 "batch_stats": state.batch_stats.get("backbone", {})},
                x, mask=mask, train=False,
            )
            if isinstance(out, tuple):
                # FDXvector returns (spk, content); extraction wants the
                # speaker part (FD-AL extract_embedding semantics)
                out = out[0]
            return out

        if e.get("mode", "feature") == "wave":
            if self.params["data"].get("feat_type", "fbank") != "fbank":
                raise ValueError(
                    "extract.mode='wave' computes fbank on-chip only; use "
                    "mode='feature' for "
                    f"feat_type={self.params['data']['feat_type']!r}")
            # on-chip fused fbank: host only decodes wav (fast + scalable)
            from .data import ParallelMapper
            from .extract import WAVE_BUCKETS, make_wave_embed_fn
            from .io import read_wav

            embed_fn = make_wave_embed_fn(
                model_apply, fbank_opts=getattr(self, "feat_opts", None)
            )
            ex = Extractor(
                embed_fn,
                ExtractConfig(
                    buckets=WAVE_BUCKETS, default_batch=e["batch"],
                    max_chunk=WAVE_BUCKETS[-1],
                ),
            )
            entries = []
            with open(wav_scp) as f:
                for line in f:
                    parts = line.split(None, 1)
                    if len(parts) == 2:
                        entries.append((parts[0], parts[1].strip()))

            def decode(kv):
                k, path = kv
                wav, _sr = read_wav(path)
                return k, (wav[0] if wav.ndim > 1 else wav)

            items = ParallelMapper(decode, entries, workers=e.get("workers", 8))
        else:
            embed_fn = model_apply
            ex = Extractor(
                embed_fn,
                ExtractConfig(buckets=tuple(e["buckets"]), default_batch=e["batch"]),
            )
            items = iter(WavEgsXvector(
                wav_scp, feat_opts=getattr(self, "feat_opts", None),
                feat_type=self.params["data"].get("feat_type", "fbank"),
                feat_backend=self.params["data"].get("feat_backend",
                                                     "numpy"),
                workers=e.get("workers", 1),
            ))
        stats = ex.extract_to_ark(
            iter(items), out_prefix + ".ark", out_prefix + ".scp"
        )
        self.logger.info("extraction: %s", stats)
        return stats

    # -- stage 3 ------------------------------------------------------------
    def score(
        self,
        train_scp: str,
        train_utt2spk: str,
        enroll_scp: str,
        test_scp: str,
        trials_path: str,
        *,
        process: str = "submean-norm",
        classifier: str = "cosine",
        score_norm: Optional[str] = None,
        top_n: int = 300,
        cohort_size: int = 3000,
    ):
        """scoreSets stage: transform chain + classifier + metrics."""
        import numpy as np

        from .backend import ScoreConfig, ScoreSets, Trials
        from .io import read_vec_flt_scp

        train = dict(read_vec_flt_scp(train_scp))
        u2s = dict(
            line.split()[:2] for line in open(train_utt2spk) if line.strip()
        )
        keys = sorted(k for k in train if k in u2s)
        spks = sorted(set(u2s[k] for k in keys))
        s2i = {s: i for i, s in enumerate(spks)}
        x = np.stack([train[k] for k in keys])
        ids = np.asarray([s2i[u2s[k]] for k in keys])
        cfg = ScoreConfig(
            process=process, classifier=classifier,
            score_norm=score_norm, top_n=top_n,
        )
        pipe = ScoreSets(cfg).fit(x, ids)
        enroll = dict(read_vec_flt_scp(enroll_scp))
        test = dict(read_vec_flt_scp(test_scp))
        cohort = x[:cohort_size] if score_norm else None
        out = pipe.run(enroll, test, Trials.read(trials_path), cohort=cohort)
        self.logger.info("scoring: %s", out)
        return out

    def gather_results_from_epochs(
        self,
        epochs,
        train_scp_fmt: str,
        train_utt2spk: str,
        enroll_scp_fmt: str,
        test_scp_fmt: str,
        trials_path: str,
        **score_kwargs,
    ):
        """Score a range of epoch checkpoints and collect metrics per epoch
        (parity: gather_results_from_epochs.sh — the reference loops
        scoreSets.sh over exp/<model>/far_epoch_N vector dirs).

        The *_fmt paths may contain "{epoch}" which is substituted per
        epoch; pass plain paths to reuse one extraction for all epochs
        (useful when only the back-end config varies). Returns
        {epoch: metrics dict} and logs a summary table.
        """
        results = {}
        for epoch in epochs:
            fmt = lambda s: s.format(epoch=epoch)
            results[epoch] = self.score(
                fmt(train_scp_fmt), train_utt2spk,
                fmt(enroll_scp_fmt), fmt(test_scp_fmt), trials_path,
                **score_kwargs,
            )
        for epoch, m in sorted(results.items()):
            self.logger.info("epoch %s: %s", epoch, m)
        return results
