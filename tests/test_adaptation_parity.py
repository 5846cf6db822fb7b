"""PLDA domain-adaptation parity vs the reference pyplda scripts.

CORAL, CORAL+, LIP(+Reg), CIP(+Reg) — each reference class is loaded
live from its ivector-adapt-plda-*.py script (kaldi_io shimmed; the
file-reading plumbing bypassed by setting mean/covariances directly) and
run against our TwoCovPlda adapters on identical models + adaptation
data, comparing the adapted (mean, within, between) exactly.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

from asv_subtools_tpu.backend.adaptation import (
    TwoCovPlda,
    adapt_plda_cip,
    adapt_plda_cip_reg,
    adapt_plda_coral,
    adapt_plda_coral_plus,
    adapt_plda_lip,
    adapt_plda_lip_reg,
)

D = 8


def _load(path, name):
    for shim in ("scipye", "kaldi_io"):
        sys.modules.setdefault(shim, types.ModuleType(shim))
    sys.path.insert(0, "/root/reference/pytorch")  # for `import libs...`
    if "plda_base" not in sys.modules:  # the scripts `from plda_base import *`
        pb = importlib.util.spec_from_file_location(
            "plda_base", "/root/reference/score/pyplda/plda_base.py"
        )
        pm = importlib.util.module_from_spec(pb)
        pb.loader.exec_module(pm)
        sys.modules["plda_base"] = pm
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import {path}: {e}")
    return mod


def _models(seed=0):
    rng = np.random.default_rng(seed)

    def spd(scale):
        a = rng.normal(size=(D, D))
        return a @ a.T / D * scale + np.eye(D) * 0.5

    out = TwoCovPlda(rng.normal(size=D), spd(1.0), spd(2.0))
    inn = TwoCovPlda(rng.normal(size=D) + 0.5, spd(0.8), spd(1.5))
    adapt = rng.normal(size=(50, D)) * 1.3 + 0.7
    return out, inn, adapt


def _feed_coral(cls, plda: TwoCovPlda, adapt):
    c = cls()
    c.mean = plda.mean.reshape(-1, 1).copy()
    c.within_var = plda.within_var.copy()
    c.between_var = plda.between_var.copy()
    for v in adapt:
        c.add_stats(1.0, v)
    c.update_plda()
    return c


def _close(ours: TwoCovPlda, mean, within, between, tol=1e-9):
    np.testing.assert_allclose(ours.mean, np.asarray(mean).ravel(),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(ours.within_var, within, rtol=tol, atol=tol)
    np.testing.assert_allclose(ours.between_var, between, rtol=tol,
                               atol=tol)


def test_coral():
    m = _load(
        "/root/reference/score/pyplda/ivector-adapt-plda-coral.py", "r_coral"
    )
    out, _, adapt = _models()
    ref = _feed_coral(m.CORAL, out, adapt)
    ours = adapt_plda_coral(out, adapt)
    _close(ours, ref.mean, ref.within_var, ref.between_var)


def test_coral_plus():
    m = _load(
        "/root/reference/score/pyplda/ivector-adapt-plda-coralplus.py",
        "r_cplus",
    )
    out, _, adapt = _models()
    ref = _feed_coral(m.CORALPlus, out, adapt)
    ours = adapt_plda_coral_plus(out, adapt)
    _close(ours, ref.mean, ref.within_var, ref.between_var)


def test_lip_and_reg():
    m = _load(
        "/root/reference/score/pyplda/ivector-adapt-plda-lip.py", "r_lip"
    )
    mr = _load(
        "/root/reference/score/pyplda/ivector-adapt-plda-lip-reg.py",
        "r_lipreg",
    )
    out, inn, _ = _models()

    def read_stub(_self, which):
        p = out if which == "out" else inn
        return p.mean.reshape(-1, 1).copy(), p.between_var.copy(), \
            p.within_var.copy()

    lip = m.LIP()
    lip.plda_read = read_stub.__get__(lip)
    lip.interpolation("out", "in")
    ours = adapt_plda_lip(out, inn, interpolation_weight=0.4)
    _close(ours, lip.mean, lip.within_var, lip.between_var)

    lipreg = mr.LIPReg()
    lipreg.plda_read = read_stub.__get__(lipreg)
    lipreg.interpolation("out", "in")
    ours_r = adapt_plda_lip_reg(out, inn, interpolation_weight=0.6)
    _close(ours_r, lipreg.mean, lipreg.within_var, lipreg.between_var)


def test_cip_and_reg():
    m = _load(
        "/root/reference/score/pyplda/ivector-adapt-plda-cip.py", "r_cip"
    )
    mr = _load(
        "/root/reference/score/pyplda/ivector-adapt-plda-cip-reg.py",
        "r_cipreg",
    )
    out, inn, adapt = _models()
    coral = _feed_coral(m.CORAL, out, adapt)

    def read_in(_self, _which):
        return inn.mean.reshape(-1, 1).copy(), inn.between_var.copy(), \
            inn.within_var.copy()

    cip = m.CIP()
    cip.plda_read = read_in.__get__(cip)
    cip.interpolation(coral, "in")
    ours = adapt_plda_cip(out, inn, adapt, interpolation_weight=0.5)
    _close(ours, cip.mean, cip.within_var, cip.between_var)

    coral_r = _feed_coral(mr.CORAL, out, adapt)
    cipreg = mr.CIPReg()
    cipreg.mean = inn.mean.reshape(-1, 1).copy()
    cipreg.dim = D
    cipreg.within_var = inn.within_var.copy()
    cipreg.between_var = inn.between_var.copy()
    cipreg.interpolation(coral_r)
    ours_r = adapt_plda_cip_reg(out, inn, adapt, interpolation_weight=0.5)
    _close(ours_r, cipreg.mean, cipreg.within_var, cipreg.between_var)
