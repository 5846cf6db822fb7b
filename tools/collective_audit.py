"""Per-step collective audit of the PRODUCTION training config.

Compiles (AOT, nothing executed) the real train step — ECAPA-C1024,
B=128 x 2 s audio, 5994 classes (VoxCeleb2 inventory), bf16, FSDP over
data x row-parallel classifier over model — on an 8-device virtual CPU
mesh, then inventories every collective in the compiled HLO: kind, shape,
bytes. The reference cannot see inside NCCL; here the communication
volume is a compile-time artifact we assert on.

Run:  JAX_PLATFORMS= python tools/collective_audit.py  (forces CPU itself)
Writes PERF_collectives.json and prints the PERF.md table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def expected_volume(state, mesh) -> dict:
    """First-principles expectation for a ZeRO-3 step (scaling-book
    recipe): every data-axis-sharded param is all-gathered for the forward
    and again for the backward (bf16 compute copies), its gradient is
    reduce-scattered (f32); unsharded params' grads are all-reduced (f32);
    plus O(KB) of loss/metric psums."""
    n_data = int(mesh.shape.get("data", 1))
    sharded = unsharded = 0
    for x in jax.tree_util.tree_leaves(state.params):
        spec = getattr(x.sharding, "spec", ())
        nbytes = int(np.prod(x.shape))  # element count
        if any(ax == "data" for ax in spec):
            sharded += nbytes
        else:
            unsharded += nbytes
    return {
        "sharded_param_elems": sharded,
        "unsharded_param_elems": unsharded,
        # bf16 fwd + bwd gathers of sharded params
        "expected_allgather_mb": 2 * sharded * 2 / 1e6,
        # f32 grad reduce-scatter for sharded, all-reduce for unsharded
        "expected_reduce_mb": (sharded + unsharded) * 4 / 1e6,
        "data_axis": n_data,
    }


def main(batch_size: int = 128, seconds: float = 2.0, channels: int = 1024,
         num_targets: int = 5994, accum: int = 2) -> dict:
    from asv_subtools_tpu.models import EcapaTdnn, SpeakerNet
    from asv_subtools_tpu.parallel import make_fsdp_rules, make_mesh
    from asv_subtools_tpu.parallel.audit import (
        audit_compiled_text,
        capture_stderr_fd,
    )
    from asv_subtools_tpu.train import TrainStepConfig, Trainer, get_optimizer

    mesh = make_mesh(num_data=4, num_model=2)
    net = SpeakerNet(
        backbone=EcapaTdnn(channels=channels, embd_dim=192),
        loss_name="margin_softmax",
        loss_params={"method": "aam", "m": 0.2},
        num_targets=num_targets,
    )
    trainer = Trainer(
        net, get_optimizer("adamW", learning_rate=1e-3),
        config=TrainStepConfig(
            compute_dtype=jnp.bfloat16, accum_grad=accum, wave_input=True,
        ),
        mesh=mesh,
        partition_rules=make_fsdp_rules(mesh),
    )

    n_samples = int(seconds * 16000)
    rng = jax.random.PRNGKey(0)
    # init on tiny feature shapes (params don't depend on B/T), then
    # compile the step at the PRODUCTION batch shape abstractly
    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank

    feats0, _ = fused_fbank(
        jnp.zeros((2, 4000), jnp.float32), FbankOptions()
    )
    state = trainer.init_state(
        rng, {"x": feats0, "y": jnp.zeros((2,), jnp.int32)}
    )
    abstract_state = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state,
    )
    batch = {
        "x": jax.ShapeDtypeStruct((batch_size, n_samples), jnp.float32),
        "y": jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    }
    scal = jax.ShapeDtypeStruct((), jnp.float32)
    key = jax.ShapeDtypeStruct(rng.shape, rng.dtype)
    print(
        f"compiling production step: B={batch_size} x {seconds}s, "
        f"C={channels}, {num_targets} classes, mesh={dict(mesh.shape)} ...",
        file=sys.stderr,
    )
    with capture_stderr_fd() as err:
        compiled = trainer._train_step_nomask.lower(
            abstract_state, batch, key, scal, scal, scal
        ).compile()
    hlo_text = compiled.as_text()
    if os.environ.get("AUDIT_DUMP_HLO"):
        with open(os.environ["AUDIT_DUMP_HLO"], "w") as f:
            f.write(hlo_text)
    audit = audit_compiled_text(hlo_text, err[0] if err else "")
    exp = expected_volume(state, mesh)
    top = sorted(audit.collectives, key=lambda c: -c["bytes"])[:12]
    for c in top:
        print(f"  {c['bytes']/1e6:9.2f} MB  {c['op']:20s} {c['shape']}",
              file=sys.stderr)

    out = {
        "config": {
            "batch": batch_size, "seconds": seconds, "channels": channels,
            "num_targets": num_targets, "accum_grad": accum,
            "mesh": dict(mesh.shape),
        },
        "counts": audit.counts(),
        "bytes_by_op_mb": {
            k: round(v / 1e6, 3) for k, v in audit.bytes_by_op().items()
        },
        "total_mb": round(audit.total_bytes / 1e6, 3),
        "involuntary_remats": audit.involuntary_remats,
        "expected": {k: round(v, 3) if isinstance(v, float) else v
                     for k, v in exp.items()},
    }
    print(audit.table())
    print(json.dumps(out))
    with open("PERF_collectives.json", "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
