"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform and splitting it into 8 XLA devices.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the real TPU tunnel),
# which is slow for tiny unit-test shapes and uses MXU bf16-ish default
# matmul precision. Unit tests run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# sitecustomize (axon) imports jax at interpreter startup, which snapshots
# JAX_PLATFORMS=axon before this file runs — override via the config API.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1024)


# ---------------------------------------------------------------------------
# Suite tiering: `pytest -m quick` = a <5-minute smoke subset (measured
# ~3 min on this host) for per-commit use; the full suite (~25 min) stays
# the round ritual. Centralized here so the tier list has one home:
# cheap WHOLE suites are included by filename, expensive suites by one
# representative node (chosen from --durations of a full run).
# ---------------------------------------------------------------------------
QUICK_PATTERNS = (
    # cheap whole suites (each < ~20 s)
    "test_backend.py",
    "test_backend_scale.py",
    "test_score_norm_parity.py",
    "test_signal_parity.py",
    "test_plda_parity.py",
    "test_offline_aug.py",
    "test_kaldi_plda_io.py",
    "test_kaldi_io_parity.py",
    "test_adaptation_parity.py",
    "test_metrics_parity.py",
    "test_optim_parity.py",
    "test_pitch.py",
    "test_lr_scheduler_parity.py",
    "test_pooling_parity.py",
    "test_loss_parity.py",
    "test_collective_audit.py",
    "test_runtime_parity.py",
    "test_quality_gate.py",
    # representatives from the expensive suites
    "test_convert_parity.py::TestEcapaParity::",
    "test_train_parity.py::TestEcapaTrainParity::",
    "test_train_loop_parity.py::TestEcapaLoopParity::",
    "test_reverse_convert.py::TestEcapaRoundTrip::",
    "test_train.py::TestTrainStep::",
    "test_train.py::TestFsdp::",
    "test_data.py::TestMultiprocessLoader::test_epoch_coverage_matches_single_process",
    "test_features.py::test_fbank_batch_vmap",
    "test_extract.py::TestExtractor::test_real_model_extraction",
    "test_nn_components.py::TestPooling::test_stats_pooling_matches_numpy",
    "test_nn_components.py::TestBatchNormMasked::",
    "test_zoo_train.py::test_one_step_every_family[xvector]",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in QUICK_PATTERNS):
            item.add_marker(pytest.mark.quick)
