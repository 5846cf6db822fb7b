"""Kaldi table I/O cross-parity vs the LIVE reference kaldi_io.py.

Round-trips every format BOTH directions: bytes written by our writers are
read by the reference module (pytorch/libs/support/kaldi_io.py) and
vice-versa, byte-stream in the middle. Compressed 'CM ' streams are
synthesized from the on-disk spec and fed to both decoders.
"""

import importlib.util
import struct

import numpy as np
import pytest

from asv_subtools_tpu.io import kaldi as our_io

REF_KALDI_IO = "/root/reference/pytorch/libs/support/kaldi_io.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_kaldi_io", REF_KALDI_IO)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand_mats(seed, n=4, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return {
        f"utt{i}": rng.normal(size=(int(rng.integers(3, 40)),
                                    int(rng.integers(2, 30)))).astype(dtype)
        for i in range(n)
    }


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_mat_ours_to_reference(tmp_path, ref, dtype):
    mats = _rand_mats(0, dtype=dtype)
    ark = str(tmp_path / "ours.ark")
    for k, m in mats.items():
        our_io.write_mat(ark, m, k)
    got = dict(ref.read_mat_ark(ark))
    assert set(got) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_mat_reference_to_ours(tmp_path, ref, dtype):
    mats = _rand_mats(1, dtype=dtype)
    ark = str(tmp_path / "ref.ark")
    with open(ark, "wb") as f:
        for k, m in mats.items():
            ref.write_mat(f, m, key=k)
    got = dict(our_io.read_mat_ark(ark))
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])


def test_vec_flt_both_directions(tmp_path, ref):
    rng = np.random.default_rng(2)
    vecs = {f"v{i}": rng.normal(size=int(rng.integers(2, 100))).astype(
        np.float32 if i % 2 else np.float64) for i in range(6)}
    ours_ark = str(tmp_path / "ours.ark")
    for k, v in vecs.items():
        our_io.write_vec_flt(ours_ark, v, k)
    got = dict(ref.read_vec_flt_ark(ours_ark))
    for k in vecs:
        np.testing.assert_array_equal(got[k], vecs[k])

    ref_ark = str(tmp_path / "ref.ark")
    with open(ref_ark, "wb") as f:
        for k, v in vecs.items():
            ref.write_vec_flt(f, v, key=k)
    got2 = dict(our_io.read_vec_flt_ark(ref_ark))
    for k in vecs:
        np.testing.assert_array_equal(got2[k], vecs[k])


def test_vec_int_both_directions(tmp_path, ref):
    """Alignment (ali-to-phones) int-vector arks, reference
    kaldi_io.py:191-267.

    Latent reference defect: its read_vec_int_ark (:175) never reads the
    utterance keys — it calls read_vec_int on the raw stream, falls into
    the ascii branch on the key bytes, and returns garbage even for arks
    the reference itself wrote. So the ours->reference direction reads
    per-record at scp offsets (the path its egs pipeline actually uses).
    """
    rng = np.random.default_rng(3)
    vecs = {f"a{i}": rng.integers(0, 4000, size=int(rng.integers(1, 200)))
            .astype(np.int32) for i in range(5)}
    ours_ark = str(tmp_path / "ours.ark")
    offsets = {k: our_io.write_vec_int(ours_ark, v, k)
               for k, v in vecs.items()}
    for k, v in vecs.items():
        got = ref.read_vec_int(f"{ours_ark}:{offsets[k]}")
        np.testing.assert_array_equal(got, v)

    ref_ark = str(tmp_path / "ref.ark")
    with open(ref_ark, "wb") as f:
        for k, v in vecs.items():
            ref.write_vec_int(f, v, key=k)
    got2 = dict(our_io.read_vec_int_ark(ref_ark))
    for k in vecs:
        np.testing.assert_array_equal(got2[k], vecs[k])

    # byte-identical writers: the ark format itself is pinned
    with open(ref_ark, "rb") as a, open(ours_ark, "rb") as b:
        assert a.read() == b.read()


def test_vec_int_chunk_read_vs_reference(tmp_path, ref):
    """Range reads: our [start, end) vs the reference's inclusive chunk
    on a single-record rxfile (where its overread is harmless)."""
    v = np.arange(100, dtype=np.int32) * 3
    path = str(tmp_path / "one.ark")
    our_io.write_vec_int(path, v, "u")
    # skip the "u " key prefix via an offset rxspecifier
    rx = f"{path}:2"
    ref_chunk = ref.read_vec_int(rx, chunk=[10, 29])
    ours = our_io.read_vec_int(rx, row_range=(10, 30))
    np.testing.assert_array_equal(ref_chunk, ours)
    np.testing.assert_array_equal(ours, v[10:30])


def test_mat_chunk_read_vs_reference(tmp_path, ref):
    m = np.random.default_rng(4).normal(size=(50, 13)).astype(np.float32)
    path = str(tmp_path / "one.ark")
    our_io.write_mat(path, m, "u")
    rx = f"{path}:2"
    ref_chunk = ref.read_mat(rx, chunk=[7, 18])
    ours = our_io.read_mat(rx, row_range=(7, 19))
    np.testing.assert_array_equal(ref_chunk, ours)
    np.testing.assert_array_equal(ours, m[7:19])


def test_scp_offsets_cross_read(tmp_path, ref):
    """Our ArkScpWriter 'path:offset' scp lines read by the reference's
    read_mat_scp (open_or_fd offset seek, kaldi_io.py:84-113)."""
    mats = _rand_mats(5)
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with our_io.ArkScpWriter(ark, scp) as w:
        for k, m in mats.items():
            w.write(k, m)
    got = dict(ref.read_mat_scp(scp))
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])


def test_pipe_rxspecifier_cross(tmp_path, ref):
    mats = _rand_mats(6, n=2)
    ark = str(tmp_path / "p.ark")
    for k, m in mats.items():
        our_io.write_mat(ark, m, k)
    got_ref = dict(ref.read_mat_ark(f"cat {ark} |"))
    got_ours = dict(our_io.read_mat_ark(f"cat {ark} |"))
    for k in mats:
        np.testing.assert_array_equal(got_ref[k], mats[k])
        np.testing.assert_array_equal(got_ours[k], mats[k])


def _synth_cm_record(rng, rows, cols):
    """A valid Kaldi 'CM ' compressed record from the on-disk spec:
    16-byte global header, 8-byte per-column percentile headers
    (non-decreasing uint16), uint8 data col-major."""
    glob_min = float(rng.normal())
    glob_range = float(rng.uniform(0.5, 3.0))
    out = [b"\x00B", b"CM ",
           struct.pack("<ffii", glob_min, glob_range, rows, cols)]
    for _ in range(cols):
        p = np.sort(rng.integers(0, 65536, size=4)).astype("<u2")
        out.append(p.tobytes())
    data = rng.integers(0, 256, size=(cols, rows)).astype(np.uint8)
    out.append(data.tobytes())
    return b"".join(out)


@pytest.mark.parametrize("seed,rows,cols", [(0, 25, 7), (1, 3, 1), (2, 200, 40)])
def test_compressed_mat_decode_parity(tmp_path, ref, seed, rows, cols):
    """Both decoders over the same synthetic 'CM ' bytes
    (reference _read_compressed_mat vs ours)."""
    rng = np.random.default_rng(seed)
    path = tmp_path / "cm.bin"
    path.write_bytes(_synth_cm_record(rng, rows, cols))
    ref_mat = ref.read_mat(str(path))
    our_mat = our_io.read_mat(str(path))
    assert ref_mat.shape == our_mat.shape == (rows, cols)
    np.testing.assert_allclose(our_mat, ref_mat, rtol=1e-6, atol=1e-6)


def test_compressed_chunk_parity(tmp_path, ref):
    rng = np.random.default_rng(9)
    path = tmp_path / "cm.bin"
    path.write_bytes(_synth_cm_record(rng, 60, 11))
    ref_mat = ref.read_mat(str(path), chunk=[5, 24])
    our_mat = our_io.read_mat(str(path), row_range=(5, 25))
    np.testing.assert_allclose(our_mat, ref_mat, rtol=1e-6, atol=1e-6)


def test_read_ali_sniffs_both_formats(tmp_path):
    v = np.arange(40, dtype=np.int32)
    ivec = str(tmp_path / "ivec.ark")
    our_io.write_vec_int(ivec, v, "u")
    np.testing.assert_array_equal(our_io.read_ali(f"{ivec}:2"), v)
    np.testing.assert_array_equal(
        our_io.read_ali(f"{ivec}:2", row_range=(5, 15)), v[5:15])

    fmat = str(tmp_path / "fmat.ark")
    our_io.write_mat(fmat, v[:, None].astype(np.float32), "u")
    np.testing.assert_array_equal(our_io.read_ali(f"{fmat}:2"), v)
    np.testing.assert_array_equal(
        our_io.read_ali(f"{fmat}:2", row_range=(5, 15)), v[5:15])


def test_multitask_egs_reads_int_vector_ali(tmp_path):
    """ChunkEgsMultiTask over a REAL int-vector alignment ark (the format
    ali-to-phones writes), not just the float-matrix fallback."""
    from asv_subtools_tpu.data.egs_offline import Chunk, ChunkEgsMultiTask

    rng = np.random.default_rng(11)
    feat_ark = str(tmp_path / "feat.ark")
    ali_ark = str(tmp_path / "ali.ark")
    chunks, ali_rx, alis = [], {}, {}
    for i in range(3):
        utt = f"utt{i}"
        frames = 50
        off = our_io.write_mat(
            feat_ark, rng.normal(size=(frames, 8)).astype(np.float32), utt)
        ali = rng.integers(0, 100, frames).astype(np.int32)
        aoff = our_io.write_vec_int(ali_ark, ali, utt)
        chunks.append(Chunk(utt=utt, rxfile=f"{feat_ark}:{off}", start=10,
                            end=30, label=i))
        ali_rx[utt] = f"{ali_ark}:{aoff}"
        alis[utt] = ali
    egs = ChunkEgsMultiTask(chunks, ali_rx, batch_size=3)
    batch = next(iter(egs))
    assert batch["x"].shape == (3, 20, 8)
    assert batch["phone_y"].shape == (3, 20)
    assert batch["phone_y"].dtype == np.int32
    for row, utt in zip(batch["phone_y"], batch["keys"]):
        np.testing.assert_array_equal(row, alis[utt][10:30])
