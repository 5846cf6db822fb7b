"""Offline 1:N augmentation datadir workflow (augmentDataByNoise.sh +
computeAugmentedVad.sh + correctSpeakerAfterSp3way.sh parity)."""

import os

import numpy as np
import pytest

from asv_subtools_tpu.datadir import DataDir
from asv_subtools_tpu.io.wav import read_wav, write_wav
from asv_subtools_tpu.offline_aug import (
    augment_data_dir,
    compute_augmented_vad,
    correct_speaker_after_sp3way,
)

SR = 16000


@pytest.fixture()
def clean_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "clean"
    w = tmp_path / "wavs"
    os.makedirs(d)
    os.makedirs(w)
    wav_scp, utt2spk, vad = {}, {}, {}
    for i in range(6):
        utt = f"utt{i}"
        path = str(w / f"{utt}.wav")
        write_wav(path, (rng.normal(size=SR // 2) * 3000).astype(np.float32), SR)
        wav_scp[utt] = path
        utt2spk[utt] = f"spk{i % 3}"
        vad[utt] = f"fake_ark:{i}"
    dd = DataDir({"wav.scp": wav_scp, "utt2spk": utt2spk, "vad.scp": vad})
    dd.write(str(d))
    return str(d), str(tmp_path)


@pytest.fixture()
def manifests(tmp_path):
    rng = np.random.default_rng(1)
    out = {}
    for kind, n in [("rir", 2), ("noise", 3), ("music", 2), ("babble", 4)]:
        rows = ["ID,duration,wav,wav_format,type"]
        for i in range(n):
            p = str(tmp_path / f"{kind}{i}.wav")
            if kind == "rir":
                sig = np.zeros(1600, np.float32)
                sig[0] = 1.0
                sig[200] = 0.4
            else:
                sig = (rng.normal(size=SR) * 2000).astype(np.float32)
            write_wav(p, sig, SR)
            rows.append(f"{kind}{i},1.0,{p},wav,{kind}")
        csv = str(tmp_path / f"{kind}.csv")
        with open(csv, "w") as f:
            f.write("\n".join(rows) + "\n")
        out[kind] = csv
    return out


class TestOfflineAug:
    def test_full_workflow(self, clean_dir, manifests, tmp_path):
        clean, _root = clean_dir
        out_dir = str(tmp_path / "aug_out")
        dd = augment_data_dir(
            clean, out_dir,
            reverb_csv=manifests["rir"],
            noise_csv=manifests["noise"],
            music_csv=manifests["music"],
            babble_csv=manifests["babble"],
            factor=2.0, seed=3,
        )
        # 6 clean + 2x6 subset of the 24 additive copies
        assert len(dd) == 6 + 12
        # suffixed keys present, speakers preserved, vad carried
        aug_keys = [u for u in dd.utts if "-" in u]
        assert aug_keys and all(
            u.rsplit("-", 1)[1] in {"reverb", "noise", "music", "babble"}
            for u in aug_keys
        )
        u2s = dd.tables["utt2spk"]
        vad = dd.tables["vad.scp"]
        for u in aug_keys:
            base = u.rsplit("-", 1)[0]
            assert u2s[u] == u2s[base]
            assert vad[u] == vad[base]
        # materialized wavs decode and differ from the clean signal
        k = aug_keys[0]
        w_aug, sr = read_wav(dd.tables["wav.scp"][k])
        w_cln, _ = read_wav(dd.tables["wav.scp"][k.rsplit("-", 1)[0]])
        assert sr == SR and len(w_aug) == len(w_cln)
        assert np.abs(np.asarray(w_aug, np.float32)
                      - np.asarray(w_cln, np.float32)).max() > 1.0
        # written datadir round-trips
        dd2 = DataDir.read(out_dir)
        assert sorted(dd2.utts) == sorted(dd.utts)

    def test_factor_caps_at_num_types(self, clean_dir, manifests, tmp_path):
        clean, _root = clean_dir
        out_dir = str(tmp_path / "aug_capped")
        dd = augment_data_dir(
            clean, out_dir, noise_csv=manifests["noise"], factor=5.0, seed=3
        )
        # factor clamps to the number of aug types (1): 6 clean + 6 noise
        assert len(dd) == 12

    def test_compute_augmented_vad(self, clean_dir, manifests, tmp_path):
        clean, root = clean_dir
        out_dir = str(tmp_path / "aug_vad")
        augment_data_dir(
            clean, out_dir,
            noise_csv=manifests["noise"], music_csv=manifests["music"],
            factor=2.0, seed=3,
        )
        # write a clean vad scp covering only 5 of 6 utts
        vad_scp = str(tmp_path / "clean_vad.scp")
        with open(vad_scp, "w") as f:
            for i in range(5):
                f.write(f"utt{i} ark:{i}\n")
        dd = compute_augmented_vad(out_dir, vad_scp,
                                   suffixes=("noise", "music"))
        vad = dd.tables["vad.scp"]
        assert vad.get("utt0") == "ark:0"
        for u in dd.utts:
            if u.startswith("utt5"):
                assert u not in vad  # lost
            elif u.endswith(("-noise", "-music")):
                base = u.rsplit("-", 1)[0]
                if base != "utt5":
                    assert vad[u] == vad[base]
        lost = open(os.path.join(out_dir, "lost_clean.utts")).read().split()
        assert all(u.startswith("utt5") for u in lost) and lost

    def test_correct_speaker_after_sp3way(self):
        dd = DataDir({
            "wav.scp": {
                "sp0.9-utt1": "a", "sp1.1-utt1": "b", "utt1": "c",
            },
            "utt2spk": {
                "sp0.9-utt1": "sp0.9-spkA", "sp1.1-utt1": "sp1.1-spkA",
                "utt1": "spkA",
            },
        })
        fixed = correct_speaker_after_sp3way(dd)
        assert set(fixed.tables["wav.scp"]) == {
            "utt1-sp0.9", "utt1-sp1.1", "utt1"
        }
        assert set(fixed.tables["utt2spk"].values()) == {"spkA"}
