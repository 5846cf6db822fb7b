"""Compiled-HLO collective audit for SPMD training steps.

The reference's distributed layer (DDP/NCCL, pytorch/libs/support/utils.py
:401-495) hides its communication inside torch; here the entire per-step
communication volume is visible in the compiled XLA module. This audit
compiles a train step AOT over the mesh and reports every collective —
op kind, tensor shape, bytes — so the partitioning can be *verified*
efficient, not assumed: an FSDP step should show per-use all-gathers of
the sharded params plus one reduce-scatter (or all-reduce) per gradient,
and nothing else; a replicated-param DP step should show gradient
all-reduces only.

Also counts the SPMD partitioner's "Involuntary full rematerialization"
warnings (spmd_partitioner.cc:652) during compilation — those mean a
parameter's sharding cannot follow its use (e.g. a non-shard-aligned
slice) and XLA silently all-gathers + repartitions it every step. A clean
production config must compile with zero.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import re
import tempfile
from typing import Any, Dict, List, Optional

import numpy as np

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# `%all-gather.7 = bf16[128,1024]{1,0} all-gather(...)` and tuple-shaped
# variants `(f32[8], f32[8]) all-reduce(...)`
_COLLECTIVE_RE = re.compile(
    r"=\s+(?P<shape>\([^)]*\)|\S+)\s+"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)(?:-start|-done)?\(",
)
_SHAPE_RE = re.compile(r"(?P<dtype>\w+)\[(?P<dims>[\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        d = _DTYPE_BYTES.get(m.group("dtype"))
        if d is None:
            continue
        dims = m.group("dims")
        n = 1
        for x in dims.split(","):
            if x:
                n *= int(x)
        total += n * d
    return total


@dataclasses.dataclass
class CollectiveAudit:
    """Per-compiled-module collective inventory."""

    collectives: List[Dict[str, Any]]
    involuntary_remats: int
    flops_estimate: Optional[float] = None

    def counts(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for c in self.collectives:
            out[c["op"]] = out.get(c["op"], 0) + 1
        return out

    def bytes_by_op(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for c in self.collectives:
            out[c["op"]] = out.get(c["op"], 0) + c["bytes"]
        return out

    @property
    def total_bytes(self) -> int:
        return sum(c["bytes"] for c in self.collectives)

    def table(self) -> str:
        """Markdown table for PERF.md."""
        lines = ["| collective | count | bytes/step |", "|---|---|---|"]
        for op in sorted(self.counts()):
            lines.append(
                f"| {op} | {self.counts()[op]} | "
                f"{self.bytes_by_op()[op] / 1e6:.2f} MB |"
            )
        lines.append(
            f"| **total** | {sum(self.counts().values())} | "
            f"**{self.total_bytes / 1e6:.2f} MB** |"
        )
        lines.append(
            f"\nInvoluntary full rematerializations: "
            f"**{self.involuntary_remats}**"
        )
        return "\n".join(lines)


@contextlib.contextmanager
def capture_stderr_fd():
    """Capture OS-level fd 2 (XLA's C++ warnings bypass sys.stderr)."""
    saved = os.dup(2)
    with tempfile.TemporaryFile(mode="w+b") as tmp:
        os.dup2(tmp.fileno(), 2)
        buf: List[str] = []
        try:
            yield buf
        finally:
            os.dup2(saved, 2)
            os.close(saved)
            tmp.seek(0)
            data = tmp.read().decode("utf-8", "replace")
            buf.append(data)
            # re-emit so nothing is swallowed from the user's view
            os.write(2, data.encode())


def audit_compiled_text(hlo_text: str, stderr_text: str = "") -> CollectiveAudit:
    """Parse a compiled HLO module's text for collectives."""
    seen = set()
    collectives = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        # -start/-done pairs describe ONE collective; count the -start (or
        # the plain op) and skip the matching -done (any async form)
        if re.search(
            r"(all-gather|all-reduce|reduce-scatter|collective-permute|"
            r"all-to-all)-done\(",
            line,
        ):
            continue
        name = line.strip().split(" ")[0]
        if name in seen:
            continue
        seen.add(name)
        shape = m.group("shape")
        is_start = f"{m.group('op')}-start(" in line
        if is_start and shape.startswith("("):
            # async-start results are (operand..., result...) tuples —
            # counting every member would double the moved bytes; the
            # RESULT is the last member
            # the final full shape token (dtype[dims]{layout}) is the result
            mlast = list(_SHAPE_RE.finditer(shape))
            nbytes = 0
            if mlast:
                fin = mlast[-1]
                d = _DTYPE_BYTES.get(fin.group("dtype"), 0)
                n = 1
                for x in fin.group("dims").split(","):
                    if x:
                        n *= int(x)
                nbytes = n * d
        else:
            nbytes = _shape_bytes(shape)
        collectives.append(
            {
                "op": m.group("op"),
                "shape": shape,
                "bytes": nbytes,
            }
        )
    n_remat = stderr_text.count("Involuntary full rematerialization")
    return CollectiveAudit(collectives=collectives, involuntary_remats=n_remat)


def audit_train_step(
    trainer,
    example_batch: Dict[str, Any],
    rng=None,
    with_mask: bool = False,
) -> CollectiveAudit:
    """AOT-compile a Trainer's jitted step over its mesh and audit it.

    example_batch gives the REAL shapes ({"x": [B, ...], "y": [B]});
    only abstract values are used — nothing is executed, so production
    shapes compile fine on a virtual CPU mesh.
    """
    import jax
    import jax.numpy as jnp

    state = trainer.init_state(
        rng if rng is not None else jax.random.PRNGKey(0),
        example_batch["init_example"]
        if "init_example" in example_batch
        else example_batch,
    )
    batch = {
        k: jax.ShapeDtypeStruct(np.asarray(v).shape, np.asarray(v).dtype)
        for k, v in example_batch.items()
        if k in (("x", "y", "mask") if with_mask else ("x", "y"))
    }
    fn = trainer._train_step if with_mask else trainer._train_step_nomask
    scal = jax.ShapeDtypeStruct((), jnp.float32)
    key = jax.ShapeDtypeStruct(
        jax.random.PRNGKey(0).shape, jax.random.PRNGKey(0).dtype
    )
    abstract_state = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state,
    )
    with capture_stderr_fd() as err:
        compiled = fn.lower(
            abstract_state, batch, key, scal, scal, scal
        ).compile()
    text = "\n".join(
        m.to_string() for m in compiled.runtime_executable().hlo_modules()
    ) if hasattr(compiled, "runtime_executable") else compiled.as_text()
    audit = audit_compiled_text(text, err[0] if err else "")
    try:
        audit.flops_estimate = float(
            compiled.cost_analysis()["flops"]
        )
    except Exception:
        pass
    return audit
