"""Reference (PyTorch) checkpoint conversion -> flax params.

The BASELINE north star requires embedding parity with the reference
extractor: this module maps ASV-Subtools ECAPA state_dicts
(pytorch/model/ecapa_tdnn_xvector.py) onto models.EcapaTdnn parameter
pytrees, so reference-trained checkpoints load directly and users can
switch frameworks without re-training.

Layout rules:
  torch conv1d weight [out, in, k]  -> flax Conv kernel [k, in, out]
  torch TdnnAffine with dilated context [-d,0,d] stores a masked
    full-width kernel [out, in, 2d+1]  -> take taps {0, d, 2d}
  torch Linear/conv1x1 [out, in(,1)] -> flax Dense kernel [in, out]
  BatchNorm weight/bias/running_*    -> scale/bias + batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray, context_taps=None) -> np.ndarray:
    """torch [out, in, k] -> flax [k', in, out] (optionally select taps)."""
    w = np.asarray(w)
    if context_taps is not None:
        w = w[:, :, list(context_taps)]
    return np.transpose(w, (2, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch [out, in] or [out, in, 1] -> flax [in, out]."""
    w = np.asarray(w)
    if w.ndim == 3:
        w = w[:, :, 0]
    return np.transpose(w, (1, 0))


def _bn(sd: Dict, prefix: str) -> Tuple[Optional[Dict], Dict]:
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }
    if f"{prefix}.weight" in sd:
        params = {
            "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        }
    else:
        # affine=False BatchNorm (the snowdar-family bn_params default):
        # the flax side has NO scale/bias params (bn_affine=False), so the
        # converted tree must omit them too
        params = None
    return params, stats


def _tdnn_layer(sd: Dict, prefix: str, taps=None) -> Tuple[Dict, Dict]:
    """ReluBatchNormTdnnLayer: {affine/conv, act_bn/bn}."""
    p_bn, s_bn = _bn(sd, f"{prefix}.batchnorm")
    params = {
        "affine": {
            "conv": {
                "kernel": _conv_kernel(sd[f"{prefix}.affine.weight"], taps),
                "bias": np.asarray(sd[f"{prefix}.affine.bias"], np.float32),
            }
        },
    }
    if p_bn is not None:
        params["act_bn"] = {"bn": p_bn}
    stats = {"act_bn": {"bn": s_bn}}
    return params, stats


def convert_ecapa_state_dict(
    sd: Dict, scale: int = 8
) -> Tuple[Dict, Dict]:
    """ASV-Subtools ECAPA_TDNN state_dict -> (params, batch_stats) for
    models.EcapaTdnn (pooling='ecpa-attentive', fc1=False)."""
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    params["layer1"], stats["layer1"] = _tdnn_layer(sd, "layer1")

    for li, dilation in ((2, 2), (3, 3), (4, 4)):
        name = f"layer{li}"
        p: Dict = {}
        s: Dict = {}
        p["conv1"], s["conv1"] = _tdnn_layer(sd, f"{name}.conv_relu_bn1")
        res_p: Dict = {}
        res_s: Dict = {}
        for b in range(scale - 1):
            taps = (0, dilation, 2 * dilation)
            bp, bs = _tdnn_layer(
                sd, f"{name}.res2net_block.blocks.{b}", taps=taps
            )
            res_p[f"block_{b}"] = bp
            res_s[f"block_{b}"] = bs
        p["res2net"] = res_p
        s["res2net"] = res_s
        p["conv2"], s["conv2"] = _tdnn_layer(sd, f"{name}.conv_relu_bn2")
        p["se"] = {
            "fc1": {
                "kernel": _dense_kernel(sd[f"{name}.se.se.1.weight"]),
                "bias": np.asarray(sd[f"{name}.se.se.1.bias"], np.float32),
            },
            "fc2": {
                "kernel": _dense_kernel(sd[f"{name}.se.se.3.weight"]),
                "bias": np.asarray(sd[f"{name}.se.se.3.bias"], np.float32),
            },
        }
        if f"{name}.shortcut.weight" in sd:
            p["shortcut"] = {
                "kernel": _conv_kernel(sd[f"{name}.shortcut.weight"]),
                "bias": np.asarray(sd[f"{name}.shortcut.bias"], np.float32),
            }
        params[name] = p
        stats[name] = s

    params["mfa"], stats["mfa"] = _tdnn_layer(sd, "mfa")

    att_bn_p, att_bn_s = _bn(sd, "stats.attention.2")
    params["stats"] = {
        "att1": {
            "kernel": _conv_kernel(sd["stats.attention.0.weight"]),
            "bias": np.asarray(sd["stats.attention.0.bias"], np.float32),
        },
        "att_bn": att_bn_p,
        "att2": {
            "kernel": _conv_kernel(sd["stats.attention.4.weight"]),
            "bias": np.asarray(sd["stats.attention.4.bias"], np.float32),
        },
    }
    stats["stats"] = {"att_bn": att_bn_s}

    params["bn_stats"], stats["bn_stats"] = _bn(sd, "bn_stats")

    params["fc2_affine"] = {
        "kernel": _dense_kernel(sd["fc2.affine.weight"]),
        "bias": np.asarray(sd["fc2.affine.bias"], np.float32),
    }
    params["fc2_bn"], stats["fc2_bn"] = _bn(sd, "fc2.batchnorm")

    if "fc1.affine.weight" in sd:
        params["fc1_affine"] = {
            "kernel": _dense_kernel(sd["fc1.affine.weight"]),
            "bias": np.asarray(sd["fc1.affine.bias"], np.float32),
        }
        params["fc1_bn"], stats["fc1_bn"] = _bn(sd, "fc1.batchnorm")

    return params, stats


def load_reference_ecapa(checkpoint_path: str, **kwargs) -> Tuple[Dict, Dict]:
    """Load a reference {epoch}.params torch checkpoint into flax trees."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_ecapa_state_dict(sd, **kwargs)


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv2d [out, in, kF, kT] (reference maps are [B, C, F, T]) ->
    flax NHWC-with-time-as-H kernel [kT, kF, in, out]."""
    return np.transpose(np.asarray(w), (3, 2, 1, 0))


def convert_resnet_state_dict(
    sd: Dict, freq_out: int
) -> Tuple[Dict, Dict]:
    """ASV-Subtools ResNetXvector state_dict -> (params, batch_stats) for
    models.ResNetXvector (full_pre_activation default, fc1 optional).

    freq_out: F' after the trunk (ceil(F/8) for 3 stride-2 stages) —
    needed because the reference flattens [C, F'] channel-major while we
    flatten [F', C] freq-major; fc1/fc2 input rows are permuted to match.
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params: Dict = {"resnet": {}, "head": {}}
    stats: Dict = {"resnet": {}, "head": {}}
    rp, rs = params["resnet"], stats["resnet"]

    rp["stem"] = {"kernel": _conv2d_kernel(sd["resnet.conv1.weight"])}
    rp["stem_bn"], rs["stem_bn"] = _bn(sd, "resnet.bn1")

    layer_sizes = []
    for stage in range(1, 5):
        b = 0
        while f"resnet.layer{stage}.{b}.conv1.weight" in sd:
            name = f"layer{stage}_{b}"
            pre = f"resnet.layer{stage}.{b}"
            blk_p: Dict = {
                "conv1": {"kernel": _conv2d_kernel(sd[f"{pre}.conv1.weight"])},
                "conv2": {"kernel": _conv2d_kernel(sd[f"{pre}.conv2.weight"])},
            }
            blk_s: Dict = {}
            blk_p["bn1"], blk_s["bn1"] = _bn(sd, f"{pre}.bn1")
            blk_p["bn2"], blk_s["bn2"] = _bn(sd, f"{pre}.bn2")
            if f"{pre}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv2d_kernel(sd[f"{pre}.downsample.0.weight"])
                }
                blk_p["downsample_bn"], blk_s["downsample_bn"] = _bn(
                    sd, f"{pre}.downsample.1"
                )
            if f"{pre}.se.fc.0.weight" in sd:  # SE variant
                blk_p["se"] = {
                    "fc1": {
                        "kernel": _dense_kernel(sd[f"{pre}.se.fc.0.weight"]),
                        "bias": np.asarray(sd[f"{pre}.se.fc.0.bias"], np.float32),
                    },
                    "fc2": {
                        "kernel": _dense_kernel(sd[f"{pre}.se.fc.2.weight"]),
                        "bias": np.asarray(sd[f"{pre}.se.fc.2.bias"], np.float32),
                    },
                }
            rp[name] = blk_p
            rs[name] = blk_s
            b += 1
        layer_sizes.append(b)

    hp, hs = _convert_channelmajor_head(sd, freq_out)
    params["head"], stats["head"] = hp, hs
    return params, stats


def _convert_channelmajor_head(sd: Dict, freq_out: int) -> Tuple[Dict, Dict]:
    """Head fc layers after a 2D trunk: permute fc rows from the reference's
    channel-major [C, F'] flatten to our freq-major [F', C]."""
    first_fc = "fc1" if "fc1.affine.weight" in sd else "fc2"
    w = sd[f"{first_fc}.affine.weight"]
    if w.ndim == 3:
        w = w[:, :, 0]
    in_dim = w.shape[1]
    half = in_dim // 2  # stats pooling: [mean, std]
    c_dim = half // freq_out
    # torch input index (mean half): c * freq_out + f ; ours: f * c_dim + c
    perm = np.zeros(in_dim, np.int64)
    for f in range(freq_out):
        for c in range(c_dim):
            perm[f * c_dim + c] = c * freq_out + f
    perm[half:] = perm[:half] + half
    w_perm = w[:, perm]

    hp: Dict = {}
    hs: Dict = {}
    hp[f"{first_fc}_affine"] = {
        "kernel": np.transpose(w_perm, (1, 0)),
        "bias": np.asarray(sd[f"{first_fc}.affine.bias"], np.float32),
    }
    hp[f"{first_fc}_bn"], hs[f"{first_fc}_bn"] = _bn(sd, f"{first_fc}.batchnorm")
    if first_fc == "fc1" and "fc2.affine.weight" in sd:
        hp["fc2_affine"] = {
            "kernel": _dense_kernel(sd["fc2.affine.weight"]),
            "bias": np.asarray(sd["fc2.affine.bias"], np.float32),
        }
        hp["fc2_bn"], hs["fc2_bn"] = _bn(sd, "fc2.batchnorm")
    return hp, hs


def convert_repvgg_state_dict(
    sd: Dict,
    freq_out: int,
    num_blocks=(2, 4, 14, 1),
) -> Tuple[Dict, Dict]:
    """ASV-Subtools RepVggXvector state_dict -> (params, batch_stats) for
    models.RepVggXvector (both RepSPK and plain RepVGG blocks; train-shape
    OR deploy-shape rbr_reparam checkpoints).

    Reference layout (repvgg_xvector.py:93 + libs/nnet/repvgg.py): blocks
    `repvgg.stage0` and `repvgg.stage{1..4}.{b}` with branches
    rbr_dense.conv/bn, rbr_1x1.conv/bn (vgg) or rbr_dense_dilation.conv/bn
    (spk), rbr_identity BN, or a single rbr_reparam conv when deployed.
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params: Dict = {"repvgg": {}, "head": {}}
    stats: Dict = {"repvgg": {}, "head": {}}
    rp, rs = params["repvgg"], stats["repvgg"]

    def one_block(tprefix: str, name: str):
        blk_p: Dict = {}
        blk_s: Dict = {}
        if f"{tprefix}.rbr_reparam.weight" in sd:  # deploy checkpoint
            blk_p["reparam"] = {
                "kernel": _conv2d_kernel(sd[f"{tprefix}.rbr_reparam.weight"]),
                "bias": np.asarray(sd[f"{tprefix}.rbr_reparam.bias"], np.float32),
            }
        else:
            blk_p["dense_conv"] = {
                "kernel": _conv2d_kernel(sd[f"{tprefix}.rbr_dense.conv.weight"])
            }
            blk_p["dense_bn"], blk_s["dense_bn"] = _bn(sd, f"{tprefix}.rbr_dense.bn")
            if f"{tprefix}.rbr_dense_dilation.conv.weight" in sd:  # RepSPK
                blk_p["dil_conv"] = {
                    "kernel": _conv2d_kernel(
                        sd[f"{tprefix}.rbr_dense_dilation.conv.weight"]
                    )
                }
                blk_p["dil_bn"], blk_s["dil_bn"] = _bn(
                    sd, f"{tprefix}.rbr_dense_dilation.bn"
                )
            else:
                blk_p["one_conv"] = {
                    "kernel": _conv2d_kernel(sd[f"{tprefix}.rbr_1x1.conv.weight"])
                }
                blk_p["one_bn"], blk_s["one_bn"] = _bn(sd, f"{tprefix}.rbr_1x1.bn")
            if f"{tprefix}.rbr_identity.running_mean" in sd:
                blk_p["id_bn"], blk_s["id_bn"] = _bn(sd, f"{tprefix}.rbr_identity")
        rp[name] = blk_p
        if blk_s:
            rs[name] = blk_s

    one_block("repvgg.stage0", "stage0")
    for stage in range(4):
        for b in range(num_blocks[stage]):
            one_block(f"repvgg.stage{stage + 1}.{b}", f"stage{stage + 1}_{b}")

    params["head"], stats["head"] = _convert_channelmajor_head(sd, freq_out)
    return params, stats


def convert_ftdnn_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """ASV-Subtools factored x-vector (F-TDNN) state_dict -> (params,
    batch_stats) for models.FactoredXvector.

    Reference layout (pytorch/model/factored_xvector.py:31-52 +
    components.py FTdnnBlock :168-215): layer01/layer10 are
    ReluBatchNormTdnnLayer; layer02-09 are FTdnnBlocks whose `factor` stores
    a masked full-width kernel over context [-c, 0] (valid taps {0, c}) and
    `affine` over [0, c]; embedding1/2 are 1x1 TdnnAffine + BN.
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    params["layer01"], stats["layer01"] = _tdnn_layer(sd, "layer01")

    # (layer index, context size) — the reference plan
    plan = [(2, 2), (3, 0), (4, 3), (5, 0), (6, 3), (7, 3), (8, 3), (9, 0)]
    for idx, ctx in plan:
        prefix = f"layer{idx:02d}"
        taps = (0, ctx) if ctx > 0 else (0,)
        bn_p, bn_s = _bn(sd, f"{prefix}.bn")
        params[prefix] = {
            "factor1": {
                "conv": {
                    "kernel": _conv_kernel(sd[f"{prefix}.factor.weight"], taps)
                }
            },
            "factor2": {
                "conv": {
                    "kernel": _conv_kernel(sd[f"{prefix}.affine.weight"], taps),
                    "bias": np.asarray(sd[f"{prefix}.affine.bias"], np.float32),
                }
            },
            "bn": bn_p,
        }
        stats[prefix] = {"bn": bn_s}

    params["layer10"], stats["layer10"] = _tdnn_layer(sd, "layer10")

    for i in (1, 2):
        params[f"embed{i}_affine"] = {
            "kernel": _dense_kernel(sd[f"embedding{i}.affine.weight"]),
            "bias": np.asarray(sd[f"embedding{i}.affine.bias"], np.float32),
        }
        params[f"embed{i}_bn"], stats[f"embed{i}_bn"] = _bn(
            sd, f"embedding{i}.batchnorm"
        )
    return params, stats


def _ln(sd: Dict, prefix: str) -> Dict:
    """torch LayerNorm weight/bias -> flax scale/bias."""
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }


def _enc_norm(sd: Dict, prefix: str) -> Tuple[Dict, Optional[Dict]]:
    """Encoder-block norm: LayerNorm (norm_type=layer_norm) or a
    BatchNorm1d (norm_type=batch_norm). Trans_Bat (layer_norm.py:8-31)
    nests its working BatchNorm1d at `.norm` (the inherited BatchNorm1d
    buffers on the wrapper itself are dead weight and are skipped); the
    conv module's BatchNorm1d (convolution.py:64) sits at the prefix
    directly. Returns (params, batch_stats-or-None)."""
    if f"{prefix}.norm.running_mean" in sd:  # Trans_Bat wrapper
        return _bn(sd, f"{prefix}.norm")
    if f"{prefix}.running_mean" in sd:  # bare BatchNorm1d (cnn module)
        return _bn(sd, prefix)
    if f"{prefix}.eps" in sd:  # BasicNorm: learnable log-eps scalar
        return {"eps": np.asarray(sd[f"{prefix}.eps"], np.float32)}, None
    return _ln(sd, prefix), None


def convert_conformer_state_dict(
    sd: Dict, num_blocks: int, freq_out: int
) -> Tuple[Dict, Dict]:
    """ASV-Subtools TransformerXvector (conformer) state_dict ->
    (params, batch_stats) for models.ConformerXvector.

    Handles every subsampling variant (conv2d2/conv2d/conv2d6 have two
    convs at torch indices conv.0/conv.2, conv2d8 adds conv.4) and every
    positional-encoding type: rel_pos params (linear_pos + pos_bias_u/v)
    convert when present; abs_pos/rot_pos/no_pos have no positional
    parameters (encoder.py:127-141). q/k/v linears fuse into our single
    qkv kernel.

    freq_out: F' after the subsampling convs — conv2d: ((F-1)//2-1)//2;
    conv2d2: F-4 (SVConv2dSubsampling2, time-only stride);
    conv2d6: ((F-1)//2-2)//3; conv2d8: (((F-1)//2-1)//2-1)//2.
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    # Fold ScaledLinear/ScaledConv1d/2d parameterizations (ReConformer,
    # scaling.py:105-260): effective weight = weight * exp(weight_scale),
    # bias = bias * exp(bias_scale). After folding, every downstream
    # mapping sees ordinary weights.
    folded = {}
    for k, v in sd.items():
        if (k.endswith(".weight_scale") or k.endswith(".bias_scale")) and (
            k.rsplit("_scale", 1)[0] in sd
        ):
            continue
        sc = sd.get(f"{k}_scale")
        if sc is not None and (k.endswith(".weight") or k.endswith(".bias")):
            v = (np.asarray(v, np.float64) * np.exp(np.asarray(sc, np.float64))).astype(
                np.float32
            )
        folded[k] = v
    sd = folded
    params: Dict = {"transformer": {}}
    stats: Dict = {}
    tp = params["transformer"]

    # subsampling: torch maps are [B, 1, T, F] -> kernel [out, in, kT, kF]
    sub_kernel = lambda w: np.transpose(np.asarray(w), (2, 3, 1, 0))
    # ReConv2dSubsampling4 interleaves balancers/DoubleSwish in the conv
    # Sequential (torch indices 0/3/6) and its `out` is a bare ScaledLinear
    # (subsampling.py:150-250); the plain classes use indices 0/2/4 and
    # out.0.
    re_embed = "transformer.embed.conv.3.weight" in sd
    out_key = (
        "transformer.embed.out.weight" if re_embed
        else "transformer.embed.out.0.weight"
    )
    proj_w = np.asarray(sd[out_key])  # [d, C*F']
    d_att, in_dim = proj_w.shape
    c_dim = in_dim // freq_out
    perm = np.zeros(in_dim, np.int64)
    for f in range(freq_out):
        for c in range(c_dim):
            perm[f * c_dim + c] = c * freq_out + f
    tp["embed"] = {
        "proj": {
            "kernel": np.transpose(proj_w[:, perm], (1, 0)),
            "bias": np.asarray(sd[out_key.rsplit(".weight", 1)[0] + ".bias"], np.float32),
        },
    }
    conv_idx = (("conv1", 0), ("conv2", 3), ("conv3", 6)) if re_embed else (
        ("conv1", 0), ("conv2", 2), ("conv3", 4))
    for n, idx in conv_idx:
        wkey = f"transformer.embed.conv.{idx}.weight"
        if wkey in sd:
            tp["embed"][n] = {
                "kernel": sub_kernel(sd[wkey]),
                "bias": np.asarray(
                    sd[f"transformer.embed.conv.{idx}.bias"], np.float32),
            }

    def _gau(prefix: str) -> Dict:
        """GAU params (attention.py:394-520): to_gate / to_v / to_qk fuse
        into our single uv projection (split order u=gate, v, base=qk in
        nn.conformer.attention.GAU); the two OffsetScale modules stack into
        gamma/beta rows [q, k]. to_out is a Linear, or a kernel-3 Conv1d
        when conv_out (attention.py:437-441). AttentionNormalize learned
        params convert when present."""
        out_w = np.asarray(sd[f"{prefix}.to_out.0.weight"])
        out = {
            "kernel": (
                np.transpose(out_w.astype(np.float32), (2, 1, 0))
                if out_w.ndim == 3 else _dense_kernel(out_w)
            ),
            "bias": np.asarray(sd[f"{prefix}.to_out.0.bias"], np.float32),
        }
        g = {
            "uv": {
                "kernel": np.concatenate(
                    [
                        _dense_kernel(sd[f"{prefix}.to_gate.0.weight"]),
                        _dense_kernel(sd[f"{prefix}.to_v.0.weight"]),
                        _dense_kernel(sd[f"{prefix}.to_qk.0.weight"]),
                    ],
                    axis=1,
                ),
                "bias": np.concatenate(
                    [
                        np.asarray(sd[f"{prefix}.to_gate.0.bias"], np.float32),
                        np.asarray(sd[f"{prefix}.to_v.0.bias"], np.float32),
                        np.asarray(sd[f"{prefix}.to_qk.0.bias"], np.float32),
                    ]
                ),
            },
            "gamma": np.concatenate(
                [
                    np.asarray(sd[f"{prefix}.scale_q.gamma"], np.float32),
                    np.asarray(sd[f"{prefix}.scale_k.gamma"], np.float32),
                ],
                axis=0,
            ),
            "beta": np.concatenate(
                [
                    np.asarray(sd[f"{prefix}.scale_q.beta"], np.float32),
                    np.asarray(sd[f"{prefix}.scale_k.beta"], np.float32),
                ],
                axis=0,
            ),
            "out": out,
        }
        for tkey, okey in (
            ("att_norm.scale", "att_scale"),
            ("att_norm.train_len", "train_len"),
            ("att_norm.omiga", "g_sa_omiga"),
            ("att_norm.bias", "g_sa_bias"),
        ):
            if f"{prefix}.{tkey}" in sd:
                g[okey] = np.asarray(sd[f"{prefix}.{tkey}"], np.float32)
        return g

    def _pw(prefix: str) -> Dict:
        """Positionwise layer: a GAU (positionwise_layer_type='gau'), or
        w_1/w_2 where each weight may be Linear [out, in] or Conv1d
        [out, in, k] (multi_layer_conv.py: conv1d / conv1d-linear)."""
        if f"{prefix}.to_gate.0.weight" in sd:
            return _gau(prefix)
        layer = {}
        for t, o in (("w_1", "w1"), ("w_2", "w2")):
            w = np.asarray(sd[f"{prefix}.{t}.weight"])
            layer[o] = {
                "kernel": (
                    np.transpose(w.astype(np.float32), (2, 1, 0))
                    if w.ndim == 3 else _dense_kernel(w)
                ),
                "bias": np.asarray(sd[f"{prefix}.{t}.bias"], np.float32),
            }
        return layer

    for i in range(num_blocks):
        pre = f"transformer.encoders.{i}"
        if f"{pre}.self_attn.to_gate.0.weight" in sd:
            attn = _gau(f"{pre}.self_attn")
        else:
            qkv_w = np.concatenate(
                [
                    _dense_kernel(sd[f"{pre}.self_attn.linear_q.weight"]),
                    _dense_kernel(sd[f"{pre}.self_attn.linear_k.weight"]),
                    _dense_kernel(sd[f"{pre}.self_attn.linear_v.weight"]),
                ],
                axis=1,
            )
            qkv_b = np.concatenate(
                [
                    np.asarray(sd[f"{pre}.self_attn.linear_q.bias"], np.float32),
                    np.asarray(sd[f"{pre}.self_attn.linear_k.bias"], np.float32),
                    np.asarray(sd[f"{pre}.self_attn.linear_v.bias"], np.float32),
                ]
            )
            out_w = np.asarray(sd[f"{pre}.self_attn.linear_out.weight"])
            attn = {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                # attention_conv_out: linear_out is a k=3 Conv1d
                # (attention.py:43-45) -> flax conv kernel [k, in, out]
                "out": {
                    "kernel": (
                        np.transpose(out_w.astype(np.float32), (2, 1, 0))
                        if out_w.ndim == 3 else _dense_kernel(out_w)
                    ),
                    "bias": np.asarray(sd[f"{pre}.self_attn.linear_out.bias"], np.float32),
                },
            }
        blk_stats: Dict = {}

        def _norm_into(key: str, torch_prefix: str):
            # Re layers carry no per-branch norms (encoder_layer.py
            # ReConformerEncoderLayer) — return None and the caller prunes
            if not any(
                f"{torch_prefix}{suf}" in sd
                for suf in (".weight", ".norm.running_mean", ".running_mean", ".eps")
            ):
                return None
            p_, s_ = _enc_norm(sd, torch_prefix)
            if s_ is not None:
                blk_stats[key] = s_
            return p_

        cm_norm = _norm_into("__cm_norm__", f"{pre}.conv_module.norm")
        if "__cm_norm__" in blk_stats:  # cnn_module_norm = batch_norm
            blk_stats["conv_module"] = {"norm": blk_stats.pop("__cm_norm__")}
        blk = {
            "norm_ff_macaron": _norm_into("norm_ff_macaron", f"{pre}.norm_ff_macaron"),
            "ff_macaron": _pw(f"{pre}.feed_forward_macaron"),
            "norm_mha": _norm_into("norm_mha", f"{pre}.norm_mha"),
            "self_attn": attn,
            "norm_conv": _norm_into("norm_conv", f"{pre}.norm_conv"),
            "conv_module": {
                "pointwise1": {
                    "kernel": _conv_kernel(sd[f"{pre}.conv_module.pointwise_conv1.weight"]),
                    "bias": np.asarray(sd[f"{pre}.conv_module.pointwise_conv1.bias"], np.float32),
                },
                "depthwise": {
                    "kernel": _conv_kernel(sd[f"{pre}.conv_module.depthwise_conv.weight"]),
                    "bias": np.asarray(sd[f"{pre}.conv_module.depthwise_conv.bias"], np.float32),
                },
                "norm": cm_norm,
                "pointwise2": {
                    "kernel": _conv_kernel(sd[f"{pre}.conv_module.pointwise_conv2.weight"]),
                    "bias": np.asarray(sd[f"{pre}.conv_module.pointwise_conv2.bias"], np.float32),
                },
            },
            "norm_ff": _norm_into("norm_ff", f"{pre}.norm_ff"),
            "ff": _pw(f"{pre}.feed_forward"),
            "norm_final": _norm_into("norm_final", f"{pre}.norm_final"),
        }
        if cm_norm is None:
            del blk["conv_module"]["norm"]
        blk = {k: v for k, v in blk.items() if v is not None}
        if blk_stats:
            stats.setdefault("transformer", {})[f"block_{i}"] = blk_stats
        if f"{pre}.concat_linear.weight" in sd:
            # concat_after=True: x + concat_linear([x; att(x)])
            # (encoder_layer.py:85-86, :268-270)
            blk["concat_linear"] = {
                "kernel": _dense_kernel(sd[f"{pre}.concat_linear.weight"]),
                "bias": np.asarray(sd[f"{pre}.concat_linear.bias"], np.float32),
            }
        # AttentionNormalize learned params (attention.py:640-672): present
        # only when the option is on (scale_adapt / softmax_plus / g_sa)
        for tkey, okey in (
            ("att_norm.scale", "att_scale"),
            ("att_norm.train_len", "train_len"),
            ("att_norm.omiga", "g_sa_omiga"),
            ("att_norm.bias", "g_sa_bias"),
        ):
            full = f"{pre}.self_attn.{tkey}"
            if full in sd:
                attn[okey] = np.asarray(sd[full], np.float32)
        if f"{pre}.self_attn.t5rel_module.relative_attention_bias.weight" in sd:
            # add_t5rel_bias: per-layer learned bucket bias (attention.py:38)
            blk["t5_bias"] = {
                "rel_bias": np.asarray(
                    sd[f"{pre}.self_attn.t5rel_module.relative_attention_bias.weight"],
                    np.float32,
                )
            }
        if f"{pre}.self_attn.linear_pos.weight" in sd:  # rel_pos only
            blk["self_attn"]["pos"] = {
                "kernel": _dense_kernel(sd[f"{pre}.self_attn.linear_pos.weight"])
            }
            blk["self_attn"]["pos_bias_u"] = np.asarray(
                sd[f"{pre}.self_attn.pos_bias_u"], np.float32)
            blk["self_attn"]["pos_bias_v"] = np.asarray(
                sd[f"{pre}.self_attn.pos_bias_v"], np.float32)
        tp[f"block_{i}"] = blk

    if (
        "transformer.after_norm.weight" in sd
        or "transformer.after_norm.norm.weight" in sd
        or "transformer.after_norm.eps" in sd
    ):
        # after_norm exists iff normalize_before or combiner_type == "mfa"
        # (encoder.py:204-214); Trans_Bat when norm_type == "batch_norm"
        an_p, an_s = _enc_norm(sd, "transformer.after_norm")
        tp["after_norm"] = an_p
        if an_s is not None:
            stats.setdefault("transformer", {})["after_norm"] = an_s

    params["transform_out_affine"] = {
        "kernel": _dense_kernel(sd["transform_out.affine.weight"]),
        "bias": np.asarray(sd["transform_out.affine.bias"], np.float32),
    }
    params["transform_out_norm"] = _ln(sd, "transform_out.batchnorm")
    params["stats"] = {
        "att1": {
            "kernel": _conv_kernel(sd["stats.attention.0.weight"]),
            "bias": np.asarray(sd["stats.attention.0.bias"], np.float32),
        },
        "att_norm": _ln(sd, "stats.attention.2"),
        "att2": {
            "kernel": _conv_kernel(sd["stats.attention.4.weight"]),
            "bias": np.asarray(sd["stats.attention.4.bias"], np.float32),
        },
    }
    params["bn_stats"] = _ln(sd, "stats.norm_stats")
    params["fc2_affine"] = {
        "kernel": _dense_kernel(sd["fc2.affine.weight"]),
        "bias": np.asarray(sd["fc2.affine.bias"], np.float32),
    }
    params["fc2_norm"] = _ln(sd, "fc2.batchnorm")
    return params, stats


def convert_multitask_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """multi_task_xvector_fix.py state_dict -> (params, batch_stats) for
    models.MultiTaskXvector: the snowdar trunk/tail mapping plus the
    phonetic_tdnn5/6/7 branch. The loss heads (loss_spk margin weight,
    loss_phone frame affine) are handled by the caller (they live in
    MultiTaskNet, not the backbone)."""
    params, stats = convert_snowdar_state_dict(sd)
    sdn = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
           for k, v in sd.items()}
    for name in ("phonetic_tdnn5", "phonetic_tdnn6", "phonetic_tdnn7"):
        params[name], stats[name] = _tdnn_layer(sdn, name)
    return params, stats


def convert_fd_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """snowdar-xvector-FD-AL.py state_dict -> (params, batch_stats) for
    models.FDXvector: the snowdar trunk/tail mapping plus the att gate
    (SEBlock fc_1/fc_2, FD-AL :15-40). The DAL projections and the two
    loss heads live in FDSpeakerNet and are handled by the caller."""
    params, stats = convert_snowdar_state_dict(sd)
    sdn = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
           for k, v in sd.items()}
    for ours, theirs in (("att_fc1", "att.fc_1"), ("att_fc2", "att.fc_2")):
        params[ours] = {
            "kernel": _dense_kernel(sdn[f"{theirs}.weight"]),
            "bias": np.asarray(sdn[f"{theirs}.bias"], np.float32),
        }
    return params, stats


def convert_snowdar_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """ASV-Subtools standard Xvector/snowdar_xvector state_dict ->
    (params, batch_stats) for models.Xvector (5 TDNN layers, stats pooling,
    tdnn6/tdnn7 head). Dilated contexts stored as masked full-width kernels
    are tap-selected like the ECAPA converter."""
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}
    taps_by_layer = {
        "tdnn1": None,       # [-2..2] contiguous
        "tdnn2": (0, 2, 4),  # [-2, 0, 2] in a width-5 masked kernel
        "tdnn3": (0, 3, 6),  # [-3, 0, 3] in a width-7 masked kernel
        "tdnn4": None,
        "tdnn5": None,
    }
    if "ex_tdnn1.affine.weight" in sd:  # extend=True (E-TDNN interleave)
        taps_by_layer.update({
            "ex_tdnn1": None, "ex_tdnn2": None, "ex_tdnn3": None,
            "ex_tdnn4": (0, 4, 8),  # [-4, 0, 4] in a width-9 masked kernel
            "ex_tdnn5": None,
        })
    for name, taps in taps_by_layer.items():
        params[name], stats[name] = _tdnn_layer(sd, name, taps=taps)
    # SE blocks (snowdar SE=True: se1-3, + se4 under extend): TdnnAffine
    # fc_1/fc_2 map to Dense fc1/fc2 (components.py SEBlock :565-598)
    for i in (1, 2, 3, 4):
        if f"se{i}.fc_1.weight" in sd:
            params[f"se{i}"] = {
                "fc1": {
                    "kernel": _dense_kernel(sd[f"se{i}.fc_1.weight"]),
                    "bias": np.asarray(sd[f"se{i}.fc_1.bias"], np.float32),
                },
                "fc2": {
                    "kernel": _dense_kernel(sd[f"se{i}.fc_2.weight"]),
                    "bias": np.asarray(sd[f"se{i}.fc_2.bias"], np.float32),
                },
            }
    if "stats.prior_mean" in sd:
        # xi-vector pooling head (pooling="xi-postmean/postdist-softplus2",
        # snowdar_xvector.py:131-134 -> pooling.py:165-218): learnable
        # prior rows [1, D] squeeze to our [D] params, plus the
        # log-precision estimator TDNN (lin1_relu_bn + lin2)
        lin1_p, lin1_s = _tdnn_layer(sd, "stats.lin1_relu_bn")
        lin2 = {"kernel": _conv_kernel(sd["stats.lin2.weight"])}
        if "stats.lin2.bias" in sd:
            lin2["bias"] = np.asarray(sd["stats.lin2.bias"], np.float32)
        params["stats"] = {
            "prior_mean": np.asarray(sd["stats.prior_mean"][0], np.float32),
            "prior_logprec": np.asarray(sd["stats.prior_logprec"][0],
                                        np.float32),
            "lin1_relu_bn": lin1_p,
            "lin2": {"conv": lin2},
        }
        stats["stats"] = {"lin1_relu_bn": lin1_s}
    params["tdnn6_affine"] = {
        "kernel": _dense_kernel(sd["tdnn6.affine.weight"]),
        "bias": np.asarray(sd["tdnn6.affine.bias"], np.float32),
    }
    p6, stats["tdnn6_bn"] = _bn(sd, "tdnn6.batchnorm")
    if p6 is not None:
        params["tdnn6_bn"] = p6
    params["tdnn7_affine"] = {
        "kernel": _dense_kernel(sd["tdnn7.affine.weight"]),
        "bias": np.asarray(sd["tdnn7.affine.bias"], np.float32),
    }
    p7, stats["tdnn7_bn"] = _bn(sd, "tdnn7.batchnorm")
    if p7 is not None:
        params["tdnn7_bn"] = p7
    return params, stats


def convert_ecapa_lawlict_state_dict(
    sd: Dict, scale: int = 8
) -> Tuple[Dict, Dict]:
    """lawlict ECAPA_TDNN state_dict (pytorch/model/ecapa-tdnn-xvector.py)
    -> (params, batch_stats) for models.EcapaLawlict.

    Layout notes vs the primary ECAPA converter: Conv1dReluBn convs have no
    bias; the res2 chain stores full [out, in, 3] dilated kernels (no tap
    masking); SE is two Linear layers; the MFA conv keeps its width and has
    a bias; fc1/fc2 are reference ReluBatchNormTdnnLayer (affine+batchnorm).
    """
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    def conv_relu_bn(prefix: str, bias: bool = False) -> Tuple[Dict, Dict]:
        conv: Dict = {"kernel": _conv_kernel(sd[f"{prefix}.conv.weight"])}
        if bias:
            conv["bias"] = np.asarray(sd[f"{prefix}.conv.bias"], np.float32)
        p_bn, s_bn = _bn(sd, f"{prefix}.bn")
        p = {"affine": {"conv": conv}, "act_bn": {"bn": p_bn}}
        return p, {"act_bn": {"bn": s_bn}}

    params["layer1"], stats["layer1"] = conv_relu_bn("layer1")

    for li in (2, 3, 4):
        name = f"layer{li}"
        p: Dict = {}
        s: Dict = {}
        p["conv1"], s["conv1"] = conv_relu_bn(f"{name}.0")
        res_p: Dict = {}
        res_s: Dict = {}
        for b in range(scale - 1):
            bp_bn, bs_bn = _bn(sd, f"{name}.1.bns.{b}")
            res_p[f"block_{b}"] = {
                "affine": {
                    "conv": {
                        "kernel": _conv_kernel(sd[f"{name}.1.convs.{b}.weight"])
                    }
                },
                "act_bn": {"bn": bp_bn},
            }
            res_s[f"block_{b}"] = {"act_bn": {"bn": bs_bn}}
        p["res2net"] = res_p
        s["res2net"] = res_s
        p["conv2"], s["conv2"] = conv_relu_bn(f"{name}.2")
        p["se"] = {
            "linear1": {
                "kernel": _dense_kernel(sd[f"{name}.3.linear1.weight"]),
                "bias": np.asarray(sd[f"{name}.3.linear1.bias"], np.float32),
            },
            "linear2": {
                "kernel": _dense_kernel(sd[f"{name}.3.linear2.weight"]),
                "bias": np.asarray(sd[f"{name}.3.linear2.bias"], np.float32),
            },
        }
        params[name] = p
        stats[name] = s

    # model-level conv + bn_conv -> our "mfa" ReluBatchNormTdnnLayer
    p_bn, s_bn = _bn(sd, "bn_conv")
    params["mfa"] = {
        "affine": {
            "conv": {
                "kernel": _conv_kernel(sd["conv.weight"]),
                "bias": np.asarray(sd["conv.bias"], np.float32),
            }
        },
        "act_bn": {"bn": p_bn},
    }
    stats["mfa"] = {"act_bn": {"bn": s_bn}}

    params["stats"] = {
        "linear1": {
            "kernel": _conv_kernel(sd["stats.linear1.weight"]),
            "bias": np.asarray(sd["stats.linear1.bias"], np.float32),
        },
        "linear2": {
            "kernel": _conv_kernel(sd["stats.linear2.weight"]),
            "bias": np.asarray(sd["stats.linear2.bias"], np.float32),
        },
    }

    params["bn_stats"], stats["bn_stats"] = _bn(sd, "bn_stats")

    if "fc1.affine.weight" in sd:
        params["fc1_affine"] = {
            "kernel": _dense_kernel(sd["fc1.affine.weight"]),
            "bias": np.asarray(sd["fc1.affine.bias"], np.float32),
        }
        params["fc1_bn"], stats["fc1_bn"] = _bn(sd, "fc1.batchnorm")

    params["fc2_affine"] = {
        "kernel": _dense_kernel(sd["fc2.affine.weight"]),
        "bias": np.asarray(sd["fc2.affine.bias"], np.float32),
    }
    params["fc2_bn"], stats["fc2_bn"] = _bn(sd, "fc2.batchnorm")

    return params, stats
