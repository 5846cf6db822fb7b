"""Real multi-process multi-host test: two processes, jax.distributed,
one global mesh spanning both — the TPU-pod bring-up path exercised on
CPU (each process contributes 4 virtual devices to an 8-device mesh).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

coordinator = sys.argv[1]
rank = int(sys.argv[2])
repo = sys.argv[3]
sys.path.insert(0, repo)

from asv_subtools_tpu.parallel import initialize_multihost, make_mesh
initialize_multihost(coordinator_address=coordinator, num_processes=2, process_id=rank)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # global
assert len(jax.local_devices()) == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(num_data=8, num_model=1)

# global psum across both processes via a sharded sum
from jax.experimental import multihost_utils

local = np.full((4, 8), float(rank + 1), np.float32)  # rank0: 1s, rank1: 2s
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("data")
)

@jax.jit
def total(x):
    return jnp.sum(x)

out = total(garr)
s = float(jax.device_get(out))  # replicated scalar: addressable everywhere
expected = 4 * 8 * 1.0 + 4 * 8 * 2.0
assert abs(s - expected) < 1e-5, (s, expected)

# full train step over the global mesh
from asv_subtools_tpu.models import SpeakerNet, Xvector
from asv_subtools_tpu.train import TrainStepConfig, get_optimizer, init_train_state, make_train_step
from asv_subtools_tpu.parallel import replicate

net = SpeakerNet(
    backbone=Xvector(num_frame_channels=16, embd_dim=8),
    loss_name="softmax", loss_params={}, num_targets=4,
)
tx = get_optimizer("sgd", learning_rate=1e-2)
rng = jax.random.PRNGKey(0)
host_batch = {
    "x": np.random.default_rng(0).normal(size=(8, 20, 8)).astype(np.float32),
    "y": (np.arange(8) % 4).astype(np.int32),
}
state = init_train_state(net, rng, {k: jnp.asarray(v) for k, v in host_batch.items()}, tx)
state = replicate(mesh, state)
gbatch = {
    k: multihost_utils.host_local_array_to_global_array(v, mesh, P("data"))
    for k, v in host_batch.items()
}
step = jax.jit(make_train_step(net, tx, config=TrainStepConfig(compute_dtype=jnp.float32)))
state, m = step(state, gbatch, rng)
loss = float(jax.device_get(m["loss"]))
assert np.isfinite(loss)
print(f"RANK{rank} OK loss={loss:.4f}")

# checkpoint save on rank 0 / restore on BOTH ranks, then resume training
ckpt_dir = sys.argv[4]
from jax.experimental import multihost_utils as mhu
from asv_subtools_tpu.train import save_checkpoint, load_checkpoint

if rank == 0:
    save_checkpoint(ckpt_dir, state, 1)
mhu.sync_global_devices("ckpt_saved")

# fresh differently-seeded state as the restore template
state2 = init_train_state(
    net, jax.random.PRNGKey(7),
    {k: jnp.asarray(v) for k, v in host_batch.items()}, tx,
)
state2 = load_checkpoint(
    os.path.join(ckpt_dir, "1.params"), state2, restore_optimizer=True
)
state2 = replicate(mesh, state2)
diff = jax.tree_util.tree_map(
    lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state2.params
)
maxd = max(jax.tree_util.tree_leaves(diff))
assert maxd == 0.0, f"restored params differ: {maxd}"
assert int(jax.device_get(state2.step)) == int(jax.device_get(state.step))

# resume: one more global step from the restored state
state2, m2 = step(state2, gbatch, rng)
loss2 = float(jax.device_get(m2["loss"]))
assert np.isfinite(loss2)
print(f"RANK{rank} CKPT loss2={loss2:.4f}")

# FSDP (ZeRO-3) through the public Trainer across BOTH processes: params
# sharded over the global data axis (each process holds only its shards),
# at-use gather constraint active, loss must decrease
from asv_subtools_tpu.parallel import make_fsdp_rules, shard_batch
from asv_subtools_tpu.train import Trainer

trainer = Trainer(
    net, tx,
    config=TrainStepConfig(compute_dtype=jnp.float32),
    mesh=mesh,
    partition_rules=make_fsdp_rules(mesh, min_size=64),
)
fstate = trainer.init_state(rng, {k: jnp.asarray(v) for k, v in host_batch.items()})
n_sharded = sum(
    1 for x in jax.tree_util.tree_leaves(fstate.params)
    if any(ax is not None for ax in x.sharding.spec)
)
assert n_sharded > 0, "no param sharded under FSDP rules"
# a sharded param's addressable shards live only on LOCAL devices
w = next(
    x for x in jax.tree_util.tree_leaves(fstate.params)
    if any(ax is not None for ax in x.sharding.spec)
)
assert len(w.addressable_shards) == 4, len(w.addressable_shards)
losses = []
for i in range(3):
    fb = {
        k: multihost_utils.host_local_array_to_global_array(v, mesh, P("data"))
        for k, v in host_batch.items()
    }
    fstate, fm = trainer._train_step_nomask(
        fstate, fb, jax.random.PRNGKey(i),
        jnp.asarray(1.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
        jnp.asarray(1.0, jnp.float32),
    )
    losses.append(float(jax.device_get(fm["loss"])))
assert losses[-1] < losses[0], losses
print(f"RANK{rank} FSDP ok losses={[round(l,3) for l in losses]}")
"""


@pytest.mark.timeout(300)
def test_two_process_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    ckpt_dir = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # keep axon sitecustomize out of workers
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(rank), repo, ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank} OK" in out
        assert f"RANK{rank} CKPT" in out
    # both ranks must compute the SAME global loss, before and after the
    # checkpoint save/restore round-trip
    for marker in ("OK loss=", "CKPT loss2="):
        l0 = [l for l in outs[0].splitlines() if marker in l][0].split("=")[1]
        l1 = [l for l in outs[1].splitlines() if marker in l][0].split("=")[1]
        assert l0 == l1, (marker, l0, l1)
