"""Scoring pipeline orchestrator (parity: scoreSets.sh + score/process.sh
+ score/score.sh + gather_results_from_epochs.sh).

The reference drives per-dataset transform chains ("mean-lda-submean-
whiten-norm"), classifier dispatch (cosine/plda/aplda/svm/gmm/lr) and
metrics (eer/Cavg) through shell config files and Kaldi binaries. Here the
whole DAG is one python call over in-memory embedding tables.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .adaptation import TwoCovPlda, adapt_plda_unsupervised
from .metrics import compute_eer, compute_min_dcf
from .plda import Plda, PldaStats, estimate_plda
from .score_norm import asnorm, cosine_score_matrix, snorm
from .transforms import (
    PCAWhitening,
    ZCAWhitening,
    apply_lda,
    global_mean,
    length_norm,
    speaker_means,
    train_lda,
)
from .trials import Trials


@dataclasses.dataclass
class ScoreConfig:
    """One scoring run (a row of the reference's per-set config files)."""

    process: str = "submean-norm"  # '-'-joined: mean|submean|lda|whiten|pcawhiten|norm
    # cosine | plda | aplda score trials pairwise; svm | lr | gmm train a
    # per-class model on the ENROLL set (reference scoreSets.sh check
    # "cosine svm plda aplda gmm lr", svm/gmm/lr_process blocks) — the
    # LID path, where enroll classes come from `enroll_labels`
    classifier: str = "cosine"
    gmm_components: int = 64  # scoreSets.sh cnum
    classifier_c: float = 1.0  # SVM/LR regularization
    lda_dim: int = 128
    score_norm: Optional[str] = None  # None | snorm | asnorm
    top_n: int = 300
    plda_iters: int = 10
    metrics: Sequence[str] = ("eer", "mindcf")
    p_target: float = 0.01


class ScoreSets:
    """Fit transforms/classifier on a training set of embeddings, then
    score enroll/test (+cohort) sets. All vectors are [N, D] numpy arrays
    keyed by utterance id."""

    def __init__(self, config: ScoreConfig = ScoreConfig()):
        self.config = config
        self._mean: Optional[np.ndarray] = None
        self._lda: Optional[np.ndarray] = None
        self._whiten: Optional[ZCAWhitening] = None
        self._pca: Optional[PCAWhitening] = None
        self._plda: Optional[Plda] = None

    # -- fitting ------------------------------------------------------------
    def fit(
        self,
        train_vectors: np.ndarray,
        train_spk_ids: np.ndarray,
        adapt_vectors: Optional[np.ndarray] = None,
    ) -> "ScoreSets":
        cfg = self.config
        x = train_vectors.astype(np.float64)
        steps = cfg.process.split("-") if cfg.process else []
        for step in steps:
            if step in ("mean", "submean"):
                self._mean = global_mean(x)
                x = x - self._mean
            elif step == "lda":
                self._lda = train_lda(x, train_spk_ids, cfg.lda_dim)
                x = x @ self._lda
            elif step == "whiten":
                self._whiten = ZCAWhitening().fit(x)
                x = self._whiten.transform(x)
            elif step == "pcawhiten":
                # process.sh:250-260 trainpcawhiten (Kaldi est-pca)
                self._pca = PCAWhitening(dim=cfg.lda_dim).fit(x)
                x = self._pca.transform(x)
            elif step == "norm":
                x = length_norm(x)
            else:
                raise ValueError(f"unknown process step {step!r}")
        if cfg.classifier in ("plda", "aplda"):
            stats = PldaStats.from_vectors(x, train_spk_ids)
            self._plda = estimate_plda(stats, cfg.plda_iters)
            if cfg.classifier == "aplda":
                if adapt_vectors is None:
                    raise ValueError("aplda needs adapt_vectors")
                self._plda = adapt_plda_unsupervised(
                    self._plda, self.transform(adapt_vectors)
                )
        return self

    # -- application --------------------------------------------------------
    def transform(self, vectors: np.ndarray) -> np.ndarray:
        x = vectors.astype(np.float64)
        for step in (self.config.process.split("-") if self.config.process else []):
            if step in ("mean", "submean"):
                x = x - self._mean
            elif step == "lda":
                x = x @ self._lda
            elif step == "whiten":
                x = self._whiten.transform(x)
            elif step == "pcawhiten":
                x = self._pca.transform(x)
            elif step == "norm":
                x = length_norm(x)
        return x

    def score_matrix(
        self, enroll: np.ndarray, test: np.ndarray,
        enroll_counts: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        e = self.transform(enroll)
        t = self.transform(test)
        if self.config.classifier == "cosine":
            return np.asarray(cosine_score_matrix(e, t))
        if self.config.classifier in ("plda", "aplda"):
            n = 1 if enroll_counts is None else enroll_counts
            ep = self._plda.transform_vectors(e, num_examples=n)
            tp = self._plda.transform_vectors(t)
            return self._plda.llr_matrix(ep, tp, enroll_counts)
        raise ValueError(f"unknown classifier {self.config.classifier!r}")

    def class_score_matrix(
        self,
        enroll: Dict[str, np.ndarray],
        test_mat: np.ndarray,
        enroll_labels: Optional[Dict[str, str]] = None,
    ) -> Tuple[np.ndarray, list]:
        """Per-class classifier scoring (the reference's svm/gmm/lr path):
        train one-vs-rest on the transformed ENROLL vectors grouped by
        `enroll_labels` (default: each enroll key is its own class), score
        the test set -> ([n_class, n_test] scores, class list).

        Parity: scoreSets.sh svm/gmm/lr dispatch + score/svm/svm_ratelimit,
        scoreByGMM.sh, Logistic Regression block (:104-109).
        """
        from .classifiers import (
            gmm_lid_scores,
            train_diag_gmm,
            train_logistic_regression,
            train_svm,
        )

        cfg = self.config
        e_keys = sorted(enroll)
        labels = np.asarray(
            [(enroll_labels or {}).get(k, k) for k in e_keys]
        )
        e = self.transform(np.stack([enroll[k] for k in e_keys]))
        t = self.transform(test_mat)
        classes = sorted(set(labels.tolist()))
        if cfg.classifier == "gmm":
            gmms = {
                c: train_diag_gmm(
                    e[labels == c],
                    num_components=min(cfg.gmm_components,
                                       int((labels == c).sum())),
                )
                for c in classes
            }
            scores, langs = gmm_lid_scores(gmms, t)
            return scores.T, list(langs)
        if cfg.classifier == "svm":
            clf = train_svm(e, labels, c=cfg.classifier_c)
        elif cfg.classifier == "lr":
            clf = train_logistic_regression(e, labels, c=cfg.classifier_c)
        else:
            raise ValueError(f"not a class classifier {cfg.classifier!r}")
        s = clf.scores(t)  # [n_test, C] in clf.classes order
        order = [list(clf.classes).index(c) for c in classes]
        return s[:, order].T, classes

    def run(
        self,
        enroll: Dict[str, np.ndarray],
        test: Dict[str, np.ndarray],
        trials: Trials,
        cohort: Optional[np.ndarray] = None,
        enroll_labels: Optional[Dict[str, str]] = None,
    ) -> Dict[str, float]:
        """Score trials end-to-end; returns metric dict."""
        cfg = self.config
        t_keys = sorted(test)
        t = np.stack([test[k] for k in t_keys])
        if cfg.classifier in ("svm", "lr", "gmm"):
            if cfg.score_norm:
                raise ValueError(
                    "score_norm applies to pairwise classifiers only"
                )
            raw, e_keys = self.class_score_matrix(enroll, t, enroll_labels)
            scores = trials.select_scores(
                raw, {k: i for i, k in enumerate(e_keys)},
                {k: i for i, k in enumerate(t_keys)},
            )
            return self._metrics(scores, trials)
        e_keys = sorted(enroll)
        e = np.stack([enroll[k] for k in e_keys])
        raw = self.score_matrix(e, t)
        if cfg.score_norm:
            if cohort is None:
                raise ValueError("score_norm needs a cohort")
            ec = self.score_matrix(e, cohort)
            tc = self.score_matrix(t, cohort)
            if cfg.score_norm == "snorm":
                raw = snorm(raw, ec, tc)
            elif cfg.score_norm == "asnorm":
                raw = asnorm(raw, ec, tc, top_n=cfg.top_n)
            else:
                raise ValueError(f"unknown score norm {cfg.score_norm!r}")
        scores = trials.select_scores(
            raw, {k: i for i, k in enumerate(e_keys)},
            {k: i for i, k in enumerate(t_keys)},
        )
        return self._metrics(scores, trials)

    def _metrics(self, scores: np.ndarray, trials: Trials) -> Dict[str, float]:
        cfg = self.config
        out: Dict[str, float] = {}
        if trials.labels is not None:
            if "eer" in cfg.metrics:
                eer, thr = compute_eer(scores, trials.labels)
                out["eer"] = eer
                out["eer_threshold"] = thr
            if "mindcf" in cfg.metrics:
                dcf, _ = compute_min_dcf(scores, trials.labels, p_target=cfg.p_target)
                out["min_dcf"] = dcf
        out["num_trials"] = float(len(scores))
        return out
