"""Model export for serving (parity: pipeline/export_jit_model.sh +
onestep/export_jit.py:26-58 and the nnet.config blueprint idiom,
utils.py:189-202).

Two artifacts per export, mirroring the reference's jit .pt + nnet.config:
  <dir>/model.stablehlo      — jax.export serialized embed function
                               (per bucket length), loadable without the
                               model's python class
  <dir>/nnet_config.yaml     — model name + constructor params + ckpt ref,
                               so python consumers can rebuild the flax
                               module instead (transfer learning etc.)
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from jax import export as jax_export


def export_embed_fn(
    embed_fn: Callable,
    feat_dim: int,
    out_dir: str,
    bucket_lengths: Sequence[int] = (200, 400, 800, 1600, 3200, 6400, 10000),
    batch_sizes: Sequence[int] = (1, 8, 32),
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> Dict[str, str]:
    """Serialize `embed_fn(x [B, T, D], mask [B, T]) -> [B, E]` for every
    (bucket, batch) shape; returns {shape_key: path}."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for t in bucket_lengths:
        for b in batch_sizes:
            exp = jax_export.export(
                jax.jit(embed_fn), platforms=list(platforms)
            )(
                jax.ShapeDtypeStruct((b, t, feat_dim), jnp.float32),
                jax.ShapeDtypeStruct((b, t), jnp.bool_),
            )
            key = f"b{b}_t{t}"
            path = os.path.join(out_dir, f"model_{key}.stablehlo")
            with open(path, "wb") as f:
                f.write(exp.serialize())
            paths[key] = path
    return paths


def load_embed_fn(path: str) -> Callable:
    """Load a serialized embed function; returns a callable."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(bytearray(f.read()))
    return exp.call


_PJRT_DTYPES = {
    "float32": "f32",
    "bfloat16": "bf16",
    "float16": "f16",
    "float64": "f64",
    "int32": "s32",
    "int64": "s64",
    "uint8": "u8",
    "uint32": "u32",
    "int8": "s8",
    "bool": "pred",
}


def export_pjrt_bundle(
    fn: Callable,
    example_args: Sequence[Any],
    out_dir: str,
    *,
    baked: Sequence[bool] | None = None,
    platform: str = "tpu",
    params_ref: str = "params.bin",
) -> str:
    """Export `fn(*args)` as a native-runtime bundle for runtime/bin/pjrt_runner.

    The C++ runner (runtime/pjrt/pjrt_executor.cc) dlopens a PJRT plugin,
    compiles model.mlir with compile_options.pb, and feeds args from
    params.bin (baked leaves, e.g. model weights) or from the caller
    (runtime leaves, e.g. the feature batch). This replaces the
    reference's libtorch-embedded C++ runtime
    (runtime/onnxruntime/... in Snowdar/asv-subtools' deployment docs)
    with a PJRT-native one: the same binary serves on TPU (libtpu) or any
    other PJRT plugin, with zero Python in the serve path.

    Args:
      fn: pure jittable function; its flattened leaves become PJRT args.
      example_args: concrete arrays (baked values are stored verbatim).
      baked: per-flattened-leaf flags — True leaves are stored in
        params.bin; False leaves are fed at run time. Default: all False.
      platform: lowering platform for jax.export.
      params_ref: manifest-relative path for the params blob; pass e.g.
        "../params.bin" to share one blob across per-bucket bundles.
    """
    from jaxlib import xla_client

    os.makedirs(out_dir, exist_ok=True)
    leaves, _ = jax.tree_util.tree_flatten(tuple(example_args))
    if baked is None:
        baked = [False] * len(leaves)
    baked = list(baked)
    assert len(baked) == len(leaves), (len(baked), len(leaves))

    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tuple(example_args),
    )
    exp = jax_export.export(jax.jit(fn), platforms=[platform])(*specs)
    mlir_text = exp.mlir_module()
    with open(os.path.join(out_dir, "model.mlir"), "w") as f:
        f.write(mlir_text)

    co = xla_client.CompileOptions()
    with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
        f.write(co.SerializeAsString())

    manifest = ["# asvtpu-pjrt-bundle v1", "mlir model.mlir",
                "compile_options compile_options.pb", f"params {params_ref}"]
    params_blob = bytearray()
    for i, (leaf, is_baked) in enumerate(zip(leaves, baked)):
        arr = np.asarray(leaf)
        dt = _PJRT_DTYPES.get(
            jnp.asarray(leaf).dtype.name, None
        )
        if dt is None:
            raise ValueError(f"arg {i}: unsupported dtype {arr.dtype}")
        dims = " ".join(str(d) for d in arr.shape)
        if is_baked:
            if dt == "bf16":
                raw = np.asarray(jnp.asarray(leaf)).view(np.uint16).tobytes()
            else:
                raw = np.ascontiguousarray(arr).tobytes()
            off = len(params_blob)
            params_blob += raw
            manifest.append(
                f"arg {i} {dt} param {off} {len(raw)} {arr.ndim} {dims}".rstrip()
            )
        else:
            nbytes = arr.size * jnp.asarray(leaf).dtype.itemsize
            manifest.append(
                f"arg {i} {dt} runtime 0 {nbytes} {arr.ndim} {dims}".rstrip()
            )
    with open(os.path.normpath(os.path.join(out_dir, params_ref)), "wb") as f:
        f.write(bytes(params_blob))
    with open(os.path.join(out_dir, "manifest.txt"), "w") as f:
        f.write("\n".join(manifest) + "\n")
    return out_dir


def export_pjrt_embed_bundles(
    model,
    variables: Dict,
    feat_dim: int,
    out_dir: str,
    bucket_lengths: Sequence[int] = (200, 400, 800, 1600, 3200),
    compute_dtype=None,
    platform: str = "tpu",
    batch: int = 1,
    feats_dtype=None,
) -> Dict[int, str]:
    """Export the embedding head as one PJRT bundle per bucket length for
    the native extractor (runtime/bin/asv_extractor_main --pjrt_plugin).

    Each bundle computes `embed(variables, x [B, T, D] f32, mask [B, T]
    pred) -> [B, E] f32` (B = `batch`, default 1; when B > 1 the C++
    extractor automatically groups utterances per execute) with the variables raveled
    into one flat vector baked into params.bin
    (bf16-cast when compute_dtype is bfloat16 — the serving configuration
    that bench.py validates at <1e-2 cosine distance from f32).

    `feats_dtype=jnp.bfloat16` makes the exported module take the feature
    batch `x` as bf16 instead of f32. The C++ extractor converts its f32
    features to bf16 (round-to-nearest-even) at pack time — halving the
    per-request H2D bytes, which is the measured ceiling of the serving
    path over bandwidth-limited transports (see runtime/README.md
    breakdown). The model casts to compute_dtype internally anyway, so a
    bf16 wire format loses nothing the bf16 compute path hadn't already.

    `feats_dtype="int8"` goes further: the module takes `x_q` s8 [B, T, D]
    plus a per-utterance per-channel `scale` f32 [B, D] runtime arg and
    dequantizes on device (x = x_q * scale[:, None, :]) before the normal
    embed graph — a 4x smaller wire format (~48 dB feature SNR; embedding
    cosine vs the f32 wire validated on real audio in runtime/README.md).
    The C++ extractor detects the s8 arg and quantizes symmetrically
    (scale = max|x[:, d]| / 127) at pack time.
    """
    import jax.tree_util as jtu
    from jax.flatten_util import ravel_pytree

    if compute_dtype is not None:
        cast = lambda a: (
            a.astype(compute_dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a
        )
        variables = jtu.tree_map(cast, variables)

    # One flat parameter vector instead of hundreds of leaf args: a single
    # baked H2D per call, and it keeps the native executor's per-execute
    # argument count tiny (large per-op arg lists are also where proxying
    # PJRT transports hit wire limits).
    flat_v, unravel = ravel_pytree(variables)

    int8_wire = isinstance(feats_dtype, str) and feats_dtype == "int8"

    def embed(flat, x, mask):
        v = unravel(flat)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        out = model.apply(v, x, mask=mask, method=model.embed)
        return out.astype(jnp.float32)

    def embed_q(flat, x_q, scale, mask):
        dq = compute_dtype if compute_dtype is not None else jnp.float32
        x = x_q.astype(dq) * scale[:, None, :].astype(dq)
        return embed(flat, x, mask)

    x_dtype = jnp.float32 if feats_dtype is None or int8_wire else feats_dtype
    paths: Dict[int, str] = {}
    for t in bucket_lengths:
        m = jnp.ones((int(batch), int(t)), bool)
        d = os.path.join(out_dir, f"t{t}")
        if int8_wire:
            x_q = jnp.zeros((int(batch), int(t), feat_dim), jnp.int8)
            scale = jnp.ones((int(batch), feat_dim), jnp.float32)
            export_pjrt_bundle(
                embed_q,
                (flat_v, x_q, scale, m),
                d,
                baked=[True, False, False, False],
                platform=platform,
                params_ref="../params.bin",
            )
        else:
            x = jnp.zeros((int(batch), int(t), feat_dim), x_dtype)
            export_pjrt_bundle(
                embed,
                (flat_v, x, m),
                d,
                baked=[True, False, False],
                platform=platform,
                params_ref="../params.bin",  # identical blob shared across buckets
            )
        paths[int(t)] = d
    return paths


def write_nnet_config(
    out_dir: str,
    model_name: str,
    model_params: Dict,
    checkpoint_path: str,
    feat_config: Optional[Dict] = None,
) -> str:
    """Blueprint + creation-string equivalent: enough to rebuild the model
    class and reload params (reference config/nnet.config)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "nnet_config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(
            {
                "model_name": model_name,
                "model_params": model_params,
                "checkpoint": os.path.abspath(checkpoint_path),
                "feat_config": feat_config or {},
            },
            f,
            sort_keys=False,
        )
    return path


def load_model_from_config(config_path: str):
    """Rebuild (module, variables) from nnet_config.yaml."""
    from .models import MODELS
    from .train.checkpoint import load_checkpoint

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    module = MODELS[cfg["model_name"]](**cfg.get("model_params", {}))
    payload = load_checkpoint(cfg["checkpoint"])
    variables = {
        "params": payload["params"],
        "batch_stats": payload.get("batch_stats", {}),
    }
    return module, variables, cfg
