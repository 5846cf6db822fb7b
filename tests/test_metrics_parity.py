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
