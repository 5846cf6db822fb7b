"""Unit tests for the PAIRED quality-gate logic (r5 redesign).

The real gate trains on the chip; these tests mock run_gate and verify
the statistical machinery: per-seed deltas vs CALIBRATION, the
|mean delta| <= DELTA_BAND decision, and the absolute sanity band.
"""

import sys

import numpy as np
import pytest


@pytest.fixture
def gate(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import recipes.quality_gate as qg

    def fake_run_gate(shift):
        def run_gate(steps=400, n_spk=48, channels=128, band=None, seed=7,
                     **kw):
            return {"eer_percent": qg.CALIBRATION[seed] + shift(seed),
                    "pass": True}
        return run_gate

    qg._fake = fake_run_gate
    return qg


def test_paired_gate_passes_under_chaos_noise(gate, monkeypatch):
    """Per-seed chaos (~±0.4, zero-mean) must NOT trip the gate."""
    rng = np.random.default_rng(0)
    noise = {s: float(rng.normal(0, 0.3)) for s in gate.MULTI_SEEDS}
    monkeypatch.setattr(gate, "run_gate", gate._fake(lambda s: noise[s]))
    out = gate.run_gate_multi()
    assert out["pass"], out
    assert abs(out["mean_delta_vs_calibration"]) <= gate.DELTA_BAND


def test_paired_gate_catches_small_uniform_regression(gate, monkeypatch):
    """A +0.6 pt common shift (~8% relative) — invisible to an absolute
    band at this seed budget — trips the paired gate."""
    monkeypatch.setattr(gate, "run_gate", gate._fake(lambda s: 0.6))
    out = gate.run_gate_multi()
    assert not out["pass"], out
    # the absolute band alone would have let it through
    assert gate.MULTI_BAND[0] <= out["eer_percent_mean"] <= gate.MULTI_BAND[1]


def test_absolute_sanity_band_catches_broken_runs(gate, monkeypatch):
    """Chance-level EER (broken training) fails even if the calibration
    dict were stale/absent for those seeds."""
    monkeypatch.setattr(gate, "run_gate",
                        gate._fake(lambda s: 50.0 - gate.CALIBRATION[s]))
    out = gate.run_gate_multi()
    assert not out["pass"], out


def test_improvements_are_in_band(gate, monkeypatch):
    """A uniform small IMPROVEMENT (-0.3) stays in band — the gate flags
    regressions beyond chaos, it does not punish wins (a large win will
    trip it, prompting recalibration, which is the desired behavior)."""
    monkeypatch.setattr(gate, "run_gate", gate._fake(lambda s: -0.3))
    out = gate.run_gate_multi()
    assert out["pass"], out
