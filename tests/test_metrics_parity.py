"""Cavg parity vs the reference computeCavg.py / computeCavg_unknown.py.

The reference scripts are python2 (`has_key`) so they cannot import as
modules; their core `get_cavg` functions are py3-clean, so the test
extracts and execs just those blocks from the files and compares against
our vectorized compute_cavg on randomized LID score pairs — every
threshold bin plus the min, both with and without unknown-language
utterances (lang_id -1).
"""

import math
import re

import numpy as np
import pytest

from asv_subtools_tpu.backend.metrics import compute_cavg


def _extract_get_cavg(path):
    src = open(path).read()
    m = re.search(r"(def get_cavg.*?return cavgs, min\(cavgs\)\n)", src,
                  re.DOTALL)
    if not m:  # pragma: no cover
        pytest.skip(f"cannot locate get_cavg in {path}")
    ns = {"floor": math.floor, "ceil": math.ceil}
    exec(m.group(1), ns)
    return ns["get_cavg"]


def _pairs(lang_num, n, seed, with_unknown=False):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(n):
        claimed = int(rng.integers(0, lang_num))
        if with_unknown and rng.uniform() < 0.2:
            true = -1
        else:
            true = int(rng.integers(0, lang_num))
        # correct claims score higher on average, with overlap
        score = rng.normal(1.0 if claimed == true else -0.5, 1.0)
        pairs.append((claimed, true, float(score)))
    return pairs


@pytest.mark.parametrize("lang_num,bins,p_target", [(3, 20, 0.5),
                                                    (5, 7, 0.3)])
def test_cavg_parity(lang_num, bins, p_target):
    ref_fn = _extract_get_cavg("/root/reference/computeCavg.py")
    pairs = _pairs(lang_num, 400, seed=lang_num)
    scores = [p[2] for p in pairs]
    lo, hi = min(scores), max(scores)
    ref_cavgs, ref_min = ref_fn(
        [list(p) for p in pairs], lang_num, lo, hi, bins=bins,
        p_target=p_target,
    )
    our_cavgs, our_min = compute_cavg(
        pairs, lang_num, p_target=p_target, bins=bins,
        min_score=lo, max_score=hi,
    )
    np.testing.assert_allclose(our_cavgs, ref_cavgs, rtol=1e-12)
    np.testing.assert_allclose(our_min, ref_min, rtol=1e-12)


def test_cavg_unknown_parity():
    """computeCavg_unknown.py: unknown-language utts (true id -1) count as
    an extra nontarget class for every claimed language."""
    ref_fn = _extract_get_cavg("/root/reference/computeCavg_unknown.py")
    lang_num = 4
    pairs = _pairs(lang_num, 500, seed=7, with_unknown=True)
    scores = [p[2] for p in pairs]
    lo, hi = min(scores), max(scores)
    ref_cavgs, ref_min = ref_fn(
        [list(p) for p in pairs], lang_num, lo, hi, bins=15, p_target=0.5
    )
    our_cavgs, our_min = compute_cavg(
        pairs, lang_num, bins=15, min_score=lo, max_score=hi,
        unknown_as_nontarget=True,
    )
    np.testing.assert_allclose(our_cavgs, ref_cavgs, rtol=1e-12)
    np.testing.assert_allclose(our_min, ref_min, rtol=1e-12)


# ---------------------------------------------------------------------------
# EER (Bosaris-like), minDCF (kaldi sid), min t-DCF — head-to-head vs the
# LIVE reference scripts in /root/reference.
# ---------------------------------------------------------------------------

import importlib.util
import subprocess
import sys

from asv_subtools_tpu.backend.metrics import (
    compute_eer_bosaris,
    compute_eer_kaldi,
    compute_min_dcf,
    compute_min_tdcf,
)

REF = "/root/reference"


def _import_from(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scores(seed, n_tar=200, n_non=800, sep=1.5):
    rng = np.random.default_rng(seed)
    s = np.concatenate([rng.normal(sep, 1.0, n_tar), rng.normal(0, 1.0, n_non)])
    l = np.concatenate([np.ones(n_tar, int), np.zeros(n_non, int)])
    perm = rng.permutation(len(s))
    return s[perm], l[perm]


@pytest.mark.parametrize("seed,sep", [(0, 1.5), (1, 0.3), (2, 3.0), (3, 0.0)])
def test_eer_bosaris_parity(seed, sep):
    ref = _import_from(f"{REF}/computeEER-like-Bosaris.py", "ref_bosaris_eer")
    s, l = _scores(seed, sep=sep)
    all_scores = [[float(x), "target" if y else "nontarget"]
                  for x, y in zip(s, l)]
    ref_eer, ref_thr = ref.compute_eer(all_scores)
    eer, thr = compute_eer_bosaris(s, l)
    assert eer == pytest.approx(ref_eer, rel=1e-12, abs=1e-15)
    assert thr == pytest.approx(ref_thr, rel=1e-12)


def test_eer_kaldi_golden():
    """compute_eer_kaldi vs a float64 loop transcription of Kaldi's
    ComputeEer (src/bin/compute-eer.cc semantics: walk sorted target
    scores against quantile-matched descending nontarget scores)."""

    def kaldi_loop(scores, labels):
        tar = sorted(scores[labels == 1])
        non = sorted(scores[labels == 0])
        target_position = 0
        while target_position + 1 < len(tar):
            nontarget_n = int(len(non) * target_position * 1.0 / len(tar))
            nontarget_position = len(non) - 1 - nontarget_n
            if nontarget_position < 0:
                nontarget_position = 0
            if non[nontarget_position] < tar[target_position]:
                break
            target_position += 1
        return target_position / len(tar), tar[target_position]

    for seed, sep in [(10, 1.5), (11, 0.2), (12, 4.0)]:
        s, l = _scores(seed, sep=sep)
        ref_eer, ref_thr = kaldi_loop(s, l)
        eer, thr = compute_eer_kaldi(s, l)
        assert eer == pytest.approx(ref_eer, rel=1e-12, abs=1e-15)
        assert thr == pytest.approx(ref_thr, rel=1e-12)


@pytest.mark.parametrize(
    "seed,p_target,c_miss,c_fa,sep",
    [(0, 0.01, 1.0, 1.0, 1.5), (1, 0.05, 1.0, 1.0, 0.5),
     (2, 0.5, 10.0, 1.0, 2.0), (3, 0.001, 1.0, 10.0, 1.0),
     (4, 0.01, 1.0, 1.0, 0.0)],  # garbage system: accept-nothing endpoint
)
def test_min_dcf_parity(seed, p_target, c_miss, c_fa, sep):
    ref = _import_from(f"{REF}/kaldi/sid/compute_min_dcf.py", "ref_min_dcf")
    s, l = _scores(seed, sep=sep)
    fnrs, fprs, thresholds = ref.ComputeErrorRates(list(s), list(l))
    ref_dcf, _ = ref.ComputeMinDcf(fnrs, fprs, thresholds, p_target,
                                   c_miss, c_fa)
    dcf, _ = compute_min_dcf(s, l, p_target=p_target, c_miss=c_miss,
                             c_fa=c_fa)
    assert dcf == pytest.approx(ref_dcf, rel=1e-12)


def _extract_tdcf_funcs():
    src = open(f"{REF}/computeMin-t-DCF.py").read()
    ns = {}
    for pat in (r"(def abs.*?return x\n)",
                r"(def compute_eer\(allScores\).*?memory=\[far,frr,tuple\[0\]\]\n)",
                r"(def t_DCF_norm.*?return beta \* P_miss_cm \+ P_fa_cm\n)",
                r"(def get_rate.*?return x\*1\.0/y\n)",
                r"(def obtain_asv_error_rates.*?return P_miss_asv,P_fa_asv,P_miss_spoof_asv\n)"):
        m = re.search(pat, src, re.DOTALL)
        assert m, pat
        exec(m.group(1), ns)
    return ns


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_min_tdcf_parity(seed):
    """Replicates computeMin-t-DCF.py's main sweep (:160-225, a python2
    script that cannot import) with the reference's own extracted
    functions, vs our vectorized compute_min_tdcf."""
    ns = _extract_tdcf_funcs()
    rng = np.random.default_rng(seed)
    n = 400
    asv_tar = rng.normal(2, 1, n)
    asv_non = rng.normal(0, 1, n)
    asv_spoof = rng.normal(1.0, 1.2, n)
    cm_bona = rng.normal(1.5, 1, n)
    cm_spoof = rng.normal(-1.5, 1.3, n)

    # reference procedure
    asv_file = ([["-", "target", str(x)] for x in asv_tar]
                + [["-", "nontarget", str(x)] for x in asv_non]
                + [["VC", "spoof", str(x)] for x in asv_spoof])
    asv_for_eer = [[float(x[2]), x[1]] for x in asv_file
                   if x[1] in ("target", "nontarget")]
    asv_eer, asv_thr = ns["compute_eer"](asv_for_eer)
    p_miss_asv, p_fa_asv, p_miss_spoof_asv = ns["obtain_asv_error_rates"](
        asv_file, asv_thr)
    pi_tar, pi_non, pi_spoof = 0.9405, 0.0095, 0.05
    c1 = pi_tar * (1 - 1 * p_miss_asv) - pi_non * 10 * p_fa_asv
    c2 = 10 * pi_spoof * (1 - p_miss_spoof_asv)
    beta = c1 / c2
    cm_score = sorted([[float(x), 1] for x in cm_bona]
                      + [[float(x), 0] for x in cm_spoof])
    count_bona, count_spoof = 0, n
    dcf = [ns["t_DCF_norm"](beta, 0.0, count_spoof * 1.0 / n)]
    for t in cm_score:
        if t[1] == 1:
            count_bona += 1
        else:
            count_spoof -= 1
        dcf.append(ns["t_DCF_norm"](beta, count_bona * 1.0 / n,
                                    count_spoof * 1.0 / n))
    ref_min_tdcf = min(dcf)

    ours = compute_min_tdcf(
        np.concatenate([asv_tar, asv_non, asv_spoof]),
        np.concatenate([np.ones(n, int), np.zeros(n, int), -np.ones(n, int)]),
        np.concatenate([cm_bona, cm_spoof]),
        np.concatenate([np.ones(n, int), np.zeros(n, int)]),
    )
    assert ours == pytest.approx(ref_min_tdcf, rel=1e-12)


def test_svm_fusion_parity(tmp_path):
    """backend.fusion.svm_fusion vs the reference fusionBySvm.py run as a
    live subprocess (fusionBySvm.py:131-160, SVC linear C=1 seed 777)."""
    from asv_subtools_tpu.backend.fusion import svm_fusion

    rng = np.random.default_rng(7)
    n, k = 300, 3
    labels = (rng.uniform(size=n) < 0.3).astype(int)
    sys_scores = [labels * rng.uniform(0.5, 2.0) + rng.normal(0, 1, n)
                  for _ in range(k)]

    trials = tmp_path / "trials"
    with open(trials, "w") as f:
        for i, y in enumerate(labels):
            f.write(f"e{i} t{i} {'target' if y else 'nontarget'}\n")
    paths = []
    for j, s in enumerate(sys_scores):
        p = tmp_path / f"score{j}"
        with open(p, "w") as f:
            for i, v in enumerate(s):
                f.write(f"e{i} t{i} {v:.10f}\n")
        paths.append(p)
    scp = tmp_path / "score.scp"
    scp.write_text("".join(f"sys{j} {p}\n" for j, p in enumerate(paths)))
    out = tmp_path / "fused.score"
    r = subprocess.run(
        [sys.executable, f"{REF}/fusionBySvm.py", str(trials), str(scp),
         str(out)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    ref_fused = np.array([float(line.split()[2])
                          for line in open(out).read().splitlines()])

    _, _, fused = svm_fusion(sys_scores, labels)
    # the reference writes %f (6 decimals)
    assert np.allclose(fused, ref_fused, atol=2e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_retrieval_map_parity(seed, tmp_path):
    """mAP@10 vs the live CNSRC cal_mAP.py (recipe/cnsrc/sr/cal_mAP.py):
    build a random pool + top-10 lists, run the reference on its file
    formats, capture its printed mAP."""
    import contextlib
    import importlib.util
    import io

    import numpy as np

    from asv_subtools_tpu.backend import retrieval_map

    rng = np.random.default_rng(seed)
    n_spk, n_pool = 8, 60
    pool_spk = rng.integers(0, n_spk, size=n_pool)
    scores = rng.normal(size=(n_spk, n_pool))
    # make targets generally score higher so hits exist in the top-10
    scores += 1.5 * (pool_spk[None, :] == np.arange(n_spk)[:, None])
    relevant = pool_spk[None, :] == np.arange(n_spk)[:, None]

    ours = retrieval_map(scores, relevant, top_n=10)

    # reference file formats: top10 = "spk utt1..utt10"; meta =
    # "dir/utt.wav spk-xxx" per pool utt (spk parsed before '-', utt
    # between '/' and '.wav')
    top = np.argsort(-scores, axis=1)[:, :10]
    with open(tmp_path / "top10", "w") as f:
        for s in range(n_spk):
            f.write(f"spk{s} " + " ".join(f"u{j}" for j in top[s]) + "\n")
    with open(tmp_path / "meta", "w") as f:
        for j, s in enumerate(pool_spk):
            f.write(f"pool/u{j}.wav spk{s}-seg\n")

    spec = importlib.util.spec_from_file_location(
        "cal_map_ref", "/root/reference/recipe/cnsrc/sr/cal_mAP.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod.cal_mAP(str(tmp_path / "top10"), str(tmp_path / "meta"))
    ref = float(buf.getvalue().strip().split("=")[1])
    assert abs(ours - ref) < 5e-4, (ours, ref)  # ref prints %.3f
