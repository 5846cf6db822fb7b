"""Kaldi binary model I/O for the backend (VERDICT r3 missing #4).

Reference-trained artifacts must load directly:
  * Kaldi's binary `<Plda>` object (src/ivector/plda.h layout — what
    `ivector-compute-plda` writes) — golden buffer built independently
    with struct.pack in this test, never with the writer under test;
  * the pyplda two-covariance ark (plda_base.py plda_write :337-342);
  * the pyplda text `<Plda>` (plda_trans_write :216-225);
  * standalone `ivector-mean` vectors / transform matrices (read_vec /
    read_mat_file), binary and text.

Scoring parity: a model estimated by the LIVE reference PldaEstimation,
exported through the binary object file, must give OUR llr_matrix the
same scores as the reference's own log_likelihood_ratio loop.
"""

import struct
import sys

import numpy as np
import pytest

from asv_subtools_tpu.backend import (
    Plda,
    PldaStats,
    estimate_plda,
    plda_from_two_cov,
    read_kaldi_plda,
    write_kaldi_plda,
)
from asv_subtools_tpu.backend.plda import write_two_cov_ark
from asv_subtools_tpu.io.kaldi import (
    read_mat_file,
    read_vec,
    write_mat_file,
    write_vec,
)


def _golden_binary_plda(mean, transform, psi) -> bytes:
    """Independent transcription of Kaldi's binary Plda::Write: \\0B,
    WriteToken("<Plda>"), Vector<double>::Write, Matrix<double>::Write,
    Vector<double>::Write, WriteToken("</Plda>")."""
    out = b"\x00B"
    out += b"<Plda> "
    out += b"DV " + b"\x04" + struct.pack("<i", len(mean))
    out += np.asarray(mean, "<f8").tobytes()
    out += b"DM " + b"\x04" + struct.pack("<i", transform.shape[0])
    out += b"\x04" + struct.pack("<i", transform.shape[1])
    out += np.asarray(transform, "<f8").tobytes()
    out += b"DV " + b"\x04" + struct.pack("<i", len(psi))
    out += np.asarray(psi, "<f8").tobytes()
    out += b"</Plda> "
    return out


def _rand_plda(rng, d=8):
    a = rng.normal(size=(d, d))
    return Plda(
        mean=rng.normal(size=d),
        transform=a + d * np.eye(d),
        psi=np.sort(rng.uniform(0.5, 5.0, size=d))[::-1].copy(),
    )


class TestKaldiPldaObject:
    def test_read_golden_binary(self, tmp_path):
        rng = np.random.default_rng(0)
        ref = _rand_plda(rng)
        p = tmp_path / "plda"
        p.write_bytes(_golden_binary_plda(ref.mean, ref.transform, ref.psi))
        got = read_kaldi_plda(str(p))
        np.testing.assert_array_equal(got.mean, ref.mean)
        np.testing.assert_array_equal(got.transform, ref.transform)
        np.testing.assert_array_equal(got.psi, ref.psi)

    def test_binary_roundtrip_bit_exact(self, tmp_path):
        rng = np.random.default_rng(1)
        ref = _rand_plda(rng)
        p = tmp_path / "plda"
        write_kaldi_plda(ref, str(p))
        # our writer's bytes ARE the golden layout
        assert p.read_bytes() == _golden_binary_plda(
            ref.mean, ref.transform, ref.psi
        )
        got = read_kaldi_plda(str(p))
        np.testing.assert_array_equal(got.transform, ref.transform)

    def test_text_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        ref = _rand_plda(rng)
        p = tmp_path / "plda.txt"
        write_kaldi_plda(ref, str(p), binary=False)
        got = read_kaldi_plda(str(p))
        np.testing.assert_allclose(got.mean, ref.mean, rtol=1e-12)
        np.testing.assert_allclose(got.transform, ref.transform, rtol=1e-12)
        np.testing.assert_allclose(got.psi, ref.psi, rtol=1e-12)

    def test_two_cov_ark_branch(self, tmp_path):
        """A pyplda plda_write file loads through the same entry point and
        produces the same diagonalization as estimate_plda would."""
        rng = np.random.default_rng(3)
        d = 6
        a = rng.normal(size=(d, d))
        within = a @ a.T + d * np.eye(d)
        b = rng.normal(size=(d, d))
        between = b @ b.T + np.eye(d)
        mean = rng.normal(size=d)
        p = tmp_path / "plda.ark"
        write_two_cov_ark(mean, within, between, str(p))
        got = read_kaldi_plda(str(p))
        want = plda_from_two_cov(mean, within, between)
        np.testing.assert_allclose(got.transform, want.transform, rtol=1e-10)
        np.testing.assert_allclose(got.psi, want.psi, rtol=1e-10)


class TestScoringParityThroughBinaryFile:
    def test_reference_trained_model_scores_identically(self, tmp_path):
        """LIVE reference estimation -> binary <Plda> file -> our reader
        + llr_matrix == the reference PLDA class's own scoring loop."""
        # the reference file ships with an `import scipye` typo and an
        # unused kaldi_io import — stub both (same as test_plda_parity)
        import importlib.util
        import types

        for name in ("scipye", "kaldi_io"):
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
        spec = importlib.util.spec_from_file_location(
            "plda_base_io", "/root/reference/score/pyplda/plda_base.py"
        )
        ref_mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(ref_mod)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"cannot import reference pyplda: {e}")

        rng = np.random.default_rng(4)
        d, n_spk, per = 10, 24, 6
        spk_means = rng.normal(size=(n_spk, d)) * 2.0
        x = np.concatenate(
            [m + rng.normal(size=(per, d)) for m in spk_means]
        )
        ids = np.repeat(np.arange(n_spk), per)

        stats = ref_mod.PldaStats(d)
        for s in range(n_spk):
            stats.add_samples(1.0, x[ids == s])
        stats.sort()
        est = ref_mod.PldaEstimation(stats)
        est.estimate()
        scorer = est.get_output()  # the reference PLDA scoring object
        mean_ref = np.asarray(scorer.mean).ravel()

        p = tmp_path / "plda"
        write_kaldi_plda(
            Plda(mean=mean_ref, transform=np.asarray(scorer.transform),
                 psi=np.asarray(scorer.psi).ravel()),
            str(p),
        )
        ours = read_kaldi_plda(str(p))
        # get_output leaves mean as a [D,1] column which breaks the
        # reference's own 1-D transform_ivector broadcasting — flatten
        # (its file-reading path uses flat vectors; see test_plda_parity)
        scorer.mean = mean_ref
        scorer.compute_derived_vars()

        enroll = rng.normal(size=(5, d))
        test = rng.normal(size=(7, d))
        e_t = ours.transform_vectors(enroll, num_examples=1)
        t_t = ours.transform_vectors(test, num_examples=1)
        got = ours.llr_matrix(e_t, t_t)

        for i in range(5):
            ei = scorer.transform_ivector(enroll[i], 1)
            for j in range(7):
                tj = scorer.transform_ivector(test[j], 1)
                want = scorer.log_likelihood_ratio(
                    np.asarray(ei).ravel(), 1, np.asarray(tj).ravel()
                )
                np.testing.assert_allclose(
                    got[i, j], float(np.asarray(want).ravel()[0]),
                    rtol=2e-5,
                    err_msg=f"LLR mismatch at ({i},{j})",
                )


class TestStandaloneArtifacts:
    """`ivector-mean` vectors and transform matrices (the other two
    reference backend artifacts, scoreSets.sh submean/transform inputs)."""

    def test_vec_binary_and_text(self, tmp_path):
        v = np.random.default_rng(5).normal(size=17)
        write_vec(str(tmp_path / "mean.vec"), v)
        np.testing.assert_allclose(
            read_vec(str(tmp_path / "mean.vec")), v.astype(np.float32),
            rtol=1e-6,
        )
        write_vec(str(tmp_path / "mean64.vec"), v.astype(np.float64))
        np.testing.assert_array_equal(
            read_vec(str(tmp_path / "mean64.vec")), v
        )
        write_vec(str(tmp_path / "mean.txt"), v, binary=False)
        np.testing.assert_allclose(
            read_vec(str(tmp_path / "mean.txt")), v, rtol=1e-12
        )

    def test_mat_binary_and_text(self, tmp_path):
        m = np.random.default_rng(6).normal(size=(5, 9))
        write_mat_file(str(tmp_path / "t.mat"), m.astype(np.float64))
        np.testing.assert_array_equal(
            read_mat_file(str(tmp_path / "t.mat")), m
        )
        write_mat_file(str(tmp_path / "t.txt"), m, binary=False)
        got = read_mat_file(str(tmp_path / "t.txt"))
        assert np.asarray(got).shape == m.shape
        np.testing.assert_allclose(got, m, rtol=1e-12)


class TestRxfilenameForms:
    """Kaldi rxfilename support for the standalone object readers (round-4
    review #8): pipes cannot seek, so the binary/text sniff must not."""

    def test_vec_through_pipe(self, tmp_path):
        v = np.arange(5, dtype=np.float64)
        p = tmp_path / "m.vec"
        write_vec(str(p), v)  # binary
        got = read_vec(f"cat {p} |")
        np.testing.assert_array_equal(got, v)
        # text form through a pipe too
        pt = tmp_path / "m.txt"
        write_vec(str(pt), v, binary=False)
        np.testing.assert_allclose(read_vec(f"cat {pt} |"), v, rtol=1e-12)

    def test_mat_through_pipe(self, tmp_path):
        m = np.arange(12, dtype=np.float64).reshape(3, 4)
        p = tmp_path / "t.mat"
        write_mat_file(str(p), m)
        np.testing.assert_array_equal(read_mat_file(f"cat {p} |"), m)

    def test_single_row_text_matrix_keeps_shape(self, tmp_path):
        m = np.asarray([[1.0, 2.0, 3.0, 4.0]])
        p = tmp_path / "row.txt"
        write_mat_file(str(p), m, binary=False)
        got = read_mat_file(str(p))
        assert np.asarray(got).shape == (1, 4)
        np.testing.assert_allclose(got, m, rtol=1e-12)
