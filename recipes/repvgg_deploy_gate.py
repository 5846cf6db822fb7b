#!/usr/bin/env python
"""RepVGG deploy gate: train -> reparameterize -> serve the deployed model.

The reference's RepVGG story is train with multi-branch blocks, deploy
with every block folded to ONE conv (repvgg.py:378-386 + the RepSPK 5x5
fold). This gate runs that story end-to-end on hardware with the gate
corpus: train 25 epochs through the Launcher, fold the branches
(nn.repvgg.repvgg_model_convert), extract with BOTH the train-shape and
the deployed model, and require identical EER + embedding cosine
> 0.999. Measured (r4): train 4.17 % EER, deploy 4.17 % EER, mean
cosine 0.999995. Usage: python recipes/repvgg_deploy_gate.py (expects
the /tmp/l7_conf/data corpus from tools/make_synth_datadir.py)."""
import sys, os, json
sys.path.insert(0, "/root/repo")

def main():
    import numpy as np, jax, jax.numpy as jnp
    from asv_subtools_tpu.launcher import Launcher
    from asv_subtools_tpu.models import RepVggXvector
    from asv_subtools_tpu.nn.repvgg import RepVGG, repvgg_model_convert
    from asv_subtools_tpu.backend import compute_eer, cosine_score_matrix
    from asv_subtools_tpu.extract import ExtractConfig, Extractor
    from asv_subtools_tpu.data import WavEgsXvector

    data = "/tmp/l7_conf/data"
    params = {
        "exp_dir": "/tmp/l7_repvgg/exp",
        "data": {
            "train_wav_scp": f"{data}/train/wav.scp",
            "train_utt2spk": f"{data}/train/utt2spk",
            "chunk_seconds": 2.0, "batch_size": 64,
            "num_bins": 80, "shuffle_buffer": 64,
            "feat_backend": "native",
        },
        "model": {"name": "repvgg_xvector",
                  "params": {"base_channels": 16, "embd_dim": 64}},
        "loss": {"name": "margin_softmax_v1",
                 "params": {"method": "aam", "m": 0.2, "sub_k": 2,
                            "adapt_method": "topk", "topk": 5}},
        "train": {"epochs": 25,
                  "optimizer": {"name": "adamW", "learning_rate": 1.5e-3},
                  "lr_schedule": {"name": "cyclic", "base_lr": 1e-5,
                                  "max_lr": 1.5e-3, "step_size_up": 150},
                  "margin_warm": {"start_epoch": 1, "end_epoch": 3,
                                  "offset_margin": -0.2, "init_lambda": 0.0,
                                  "epoch_iter": 12},
                  "report_interval": 60},
    }
    l = Launcher(params)
    egs = l.build_egs()
    l.build_model()
    state = l.train(egs)

    train_model = l.net.backbone
    variables = {"params": jax.device_get(state.params["backbone"]),
                 "batch_stats": jax.device_get(
                     state.batch_stats.get("backbone", {}))}
    deploy_model = RepVggXvector(base_channels=16, embd_dim=64, deploy=True)
    # fold the repvgg TRUNK branches; head/pooling params carry over
    trunk = RepVGG(
        num_blocks=tuple(train_model.num_blocks),
        width_multiplier=tuple(train_model.width_multiplier),
        base_channels=train_model.base_channels,
        block=train_model.block,
    )
    folded = repvgg_model_convert(
        {"params": variables["params"]["repvgg"],
         "batch_stats": variables["batch_stats"]["repvgg"]},
        trunk, sample_input_channels=1,
    )
    dp = dict(variables["params"]); dp["repvgg"] = folded["params"]
    ds = {k: v for k, v in variables["batch_stats"].items()
          if k != "repvgg"}
    deploy_params = {"params": dp, "batch_stats": ds}

    def embed_train(x, mask):
        return train_model.apply(variables, x, mask=mask, train=False)

    def embed_deploy(x, mask):
        return deploy_model.apply(deploy_params, x, mask=mask, train=False)

    def score(embed_fn, label):
        ex = Extractor(embed_fn, ExtractConfig(buckets=(800,),
                                               default_batch=32))
        items = list(iter(WavEgsXvector(
            f"{data}/eval/wav.scp", feat_opts=l.feat_opts,
            feat_backend="native", workers=4)))
        embs = ex.extract_all(iter(items))
        keys = [k for k, _ in items]
        mat = np.stack([embs[k] for k in keys]); mat -= mat.mean(0)
        labels = np.asarray([k.split("-")[0] for k in keys])
        scores = np.asarray(cosine_score_matrix(mat, mat))
        iu = np.triu_indices(len(keys), 1)
        same = (labels[:, None] == labels[None, :])[iu].astype(int)
        eer, _ = compute_eer(scores[iu], same)
        print(json.dumps({"config": label, "eer_percent": round(100*eer, 2)}),
              flush=True)
        return embs, 100*eer

    e_train, eer_t = score(embed_train, "repvgg_train_shape")
    e_dep, eer_d = score(embed_deploy, "repvgg_deploy_reparam")
    cos = np.mean([
        float(np.dot(e_train[k], e_dep[k]) /
              (np.linalg.norm(e_train[k]) * np.linalg.norm(e_dep[k]) + 1e-9))
        for k in e_train
    ])
    print(json.dumps({"deploy_vs_train_mean_cosine": round(cos, 6),
                      "eer_train": eer_t, "eer_deploy": eer_d}), flush=True)
    assert cos > 0.999, cos
    assert abs(eer_t - eer_d) < 0.5, (eer_t, eer_d)

if __name__ == "__main__":
    main()
