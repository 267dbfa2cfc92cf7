"""Spirit room scene end-to-end: scene-correct speaker geometry, the
4-tier head-yaw parser, and offline-writer label fidelity (real
distance_m, true 5-class ids, the reference's Spirit debug field set —
generate_spirit_data.py:380-404)."""

import glob
import os

import numpy as np
import pytest

import jax

from biear_tpu.data import (ReverbSynthesizer, AnechoicSynthesizer,
                            make_test_brir_bank, make_test_hrir_bank,
                            make_test_segments, scene_speaker_xy,
                            SPIRIT_SPEAKER_XY, AUDITORIUM3_SPEAKER_XY,
                            dist_class_5)
from biear_tpu.train import unpack_targets
from tools.sofa_io import extract_head_yaw
from tools.generate_binaural_data import write_split, build_synthesizer

# Reference npz field sets (generate_anechoic_data.py:268-281,
# generate_spirit_data.py:383-404).
BASE_FIELDS = {"audio_path", "num_sources", "aoa_deg", "distance_m",
               "sector_id", "sector_angle_norm", "distance_class"}
SPIRIT_DEBUG_FIELDS = {"speaker_id", "head_yaw_deg", "head_index",
                       "dist_protos", "other_thresh_m", "other_class_id",
                       "az_offset_deg", "head_yaw_offset_deg"}


# ---------------- geometry selection ----------------

def test_scene_speaker_xy_spirit():
    xy = scene_speaker_xy("spirit", 3)
    np.testing.assert_array_equal(xy, SPIRIT_SPEAKER_XY)
    # Spirit speakers all within the 5-class prototypes (~2 m -> class 3)
    d = np.sqrt((xy ** 2).sum(1))
    assert (np.abs(d - 2.0) < 0.01).all()
    assert all(dist_class_5(x) == 2 for x in d)   # prototype 2 m -> class 2


def test_scene_speaker_xy_auditorium_and_alias():
    np.testing.assert_array_equal(scene_speaker_xy("auditorium", 6),
                                  AUDITORIUM3_SPEAKER_XY)
    np.testing.assert_array_equal(scene_speaker_xy("room", 4),
                                  AUDITORIUM3_SPEAKER_XY[:4])


def test_scene_speaker_xy_rejects_mismatch():
    with pytest.raises(ValueError, match="3 loudspeakers"):
        scene_speaker_xy("spirit", 6)      # a 6-emitter SOFA is not Spirit
    with pytest.raises(ValueError, match="unknown room scene"):
        scene_speaker_xy("garage", 3)


# ---------------- 4-tier head-yaw parser ----------------

def test_yaw_tier1_listener_view_vector():
    ang = np.linspace(0, 330, 12)
    view = np.stack([np.cos(np.deg2rad(ang)), np.sin(np.deg2rad(ang)),
                     np.zeros(12)], 1)
    yaw, tag = extract_head_yaw(view, None, 12)
    assert tag == "ListenerView(vector)->az"
    np.testing.assert_allclose(yaw, ang % 360.0, atol=1e-9)


def test_yaw_tier2_listener_view_degrees():
    lv = np.stack([np.linspace(-90, 90, 7), np.zeros(7)], 1)
    yaw, tag = extract_head_yaw(lv, None, 7)
    assert tag == "ListenerView[:,0](deg)"
    np.testing.assert_allclose(yaw, np.linspace(-90, 90, 7) % 360.0)


def test_yaw_tier3_source_position():
    sp = np.stack([np.linspace(0, 180, 5), np.zeros(5), np.ones(5) * 2], 1)
    yaw, tag = extract_head_yaw(None, sp, 5)
    assert tag == "SourcePosition[:,0](deg)"
    np.testing.assert_allclose(yaw, np.linspace(0, 180, 5))
    # vector-valued SourcePosition (unit-ish norms)
    ang = np.array([10.0, 100.0, 200.0])
    spv = np.stack([np.cos(np.deg2rad(ang)), np.sin(np.deg2rad(ang)),
                    np.zeros(3)], 1) * 1000.0  # big norms: NOT vector-like
    yaw, tag = extract_head_yaw(None, spv, 3)
    assert tag == "fallback linspace(-90,90)"


def test_yaw_tier4_fallback():
    yaw, tag = extract_head_yaw(None, None, 9)
    assert tag == "fallback linspace(-90,90)"
    np.testing.assert_allclose(yaw, np.linspace(-90, 90, 9) % 360.0)


def test_yaw_vector_priority_over_degrees():
    """A ListenerView whose first column is within [-360,360] but whose rows
    are unit vectors must be parsed as vectors (the reference checks the
    vector case first)."""
    ang = np.array([30.0, 60.0, 120.0, 240.0])
    view = np.stack([np.cos(np.deg2rad(ang)), np.sin(np.deg2rad(ang)),
                     np.zeros(4)], 1)
    yaw, tag = extract_head_yaw(view, None, 4)
    assert tag == "ListenerView(vector)->az"
    np.testing.assert_allclose(yaw, ang, atol=1e-9)


# ---------------- spirit synthesis + offline writer ----------------

@pytest.fixture(scope="module")
def spirit_synth():
    ir, yaw, sxy = make_test_brir_bank(n_yaw=12,
                                       speaker_xy=SPIRIT_SPEAKER_XY)
    return ReverbSynthesizer(ir, yaw, sxy, make_test_segments(8))


def test_spirit_synth_labels(spirit_synth):
    """3 speakers at ~2 m: every active sector's distance one-hot must be
    class 2 (+1 shift -> index 3 in the label layout)."""
    _, _, _, y = spirit_synth.sample_batch(jax.random.PRNGKey(0), 32)
    ys, _, yd = (np.asarray(a) for a in unpack_targets(y))
    assert (yd[ys == 1].argmax(-1) == 3).all()   # class 2 shifted +1
    assert (yd[ys == 0].argmax(-1) == 0).all()


def test_build_synthesizer_spirit_uses_spirit_geometry():
    s = build_synthesizer("spirit", None, make_test_segments(4), 16000)
    np.testing.assert_allclose(s._sp_dist_np,
                               np.sqrt((SPIRIT_SPEAKER_XY ** 2).sum(1)))
    assert s.n_speakers == 3


def test_write_split_spirit_npz_fields(tmp_path, spirit_synth):
    out = str(tmp_path / "spirit_test")
    write_split(spirit_synth, out, "spirit_test", 6, seed=0,
                test_thirds=True, fs=16000, scene="spirit")
    npzs = sorted(glob.glob(os.path.join(out, "*.npz")))
    wavs = sorted(glob.glob(os.path.join(out, "*.wav")))
    assert len(npzs) == 6 and len(wavs) == 6
    for i, p in enumerate(npzs):
        d = dict(np.load(p, allow_pickle=True))
        assert set(d) == BASE_FIELDS | SPIRIT_DEBUG_FIELDS
        n = int(d["num_sources"])
        # test_thirds: 2 samples each of 1, 2, 3 sources
        assert n == 1 + i // 2
        assert d["aoa_deg"].shape == (n,)
        # real distances: all Spirit speakers are ~2 m
        np.testing.assert_allclose(d["distance_m"], 2.0, atol=0.01)
        assert (d["distance_class"] == 2).all()
        assert (np.diff(d["sector_id"]) > 0).all() or n == 1
        # aoa within its claimed sector
        np.testing.assert_array_equal(
            np.floor(d["aoa_deg"] / 45.0).astype(int), d["sector_id"])
        assert (d["sector_angle_norm"] > 0).all()
        assert (d["sector_angle_norm"] <= 1).all()
        # debug fields
        assert d["speaker_id"].shape == (n,)
        assert (d["speaker_id"] < 3).all()
        np.testing.assert_allclose(d["dist_protos"], [0.5, 1, 2, 3])
        assert float(d["other_thresh_m"]) == 3.0
        assert int(d["other_class_id"]) == 4
        # head_yaw consistency: aoa_deg == (speaker_world_az - yaw) % 360
        sxy = SPIRIT_SPEAKER_XY[d["speaker_id"]]
        world = np.degrees(np.arctan2(sxy[:, 1], sxy[:, 0])) % 360.0
        np.testing.assert_allclose(
            d["aoa_deg"], (world - float(d["head_yaw_deg"])) % 360.0,
            atol=1e-4)


def test_write_split_auditorium_true_other_class(tmp_path):
    """Auditorium far speakers must be written with the TRUE class-4
    'other' id (the H5 one-hot clamps it; the npz must not)."""
    ir, yaw, sxy = make_test_brir_bank()
    s = ReverbSynthesizer(ir, yaw, sxy, make_test_segments(8))
    out = str(tmp_path / "aud")
    write_split(s, out, "aud", 24, seed=1, test_thirds=False, fs=16000,
                scene="auditorium")
    classes, dists = [], []
    for p in glob.glob(os.path.join(out, "*.npz")):
        d = dict(np.load(p, allow_pickle=True))
        assert set(d) == BASE_FIELDS          # no spirit debug extras
        classes.extend(d["distance_class"].tolist())
        dists.extend(d["distance_m"].tolist())
    classes, dists = np.asarray(classes), np.asarray(dists)
    assert (classes[dists > 3.0] == 4).all()
    assert (classes[dists <= 3.0] <= 3).all()
    assert (dists > 0).all()                  # real distances, not zeros


def test_write_split_anechoic_real_distance(tmp_path):
    ir, az, dist = make_test_hrir_bank()
    s = AnechoicSynthesizer(ir, az, dist, make_test_segments(8))
    out = str(tmp_path / "ane")
    write_split(s, out, "ane", 9, seed=2, test_thirds=True, fs=16000,
                scene="anechoic")
    for p in glob.glob(os.path.join(out, "*.npz")):
        d = dict(np.load(p, allow_pickle=True))
        assert set(d) == BASE_FIELDS
        # anechoic distances come from the HRIR bank prototypes
        assert np.isin(d["distance_m"], [0.5, 1.0, 2.0, 3.0]).all()
        # aoa_deg is the continuous measurement azimuth; its sector must
        # match sector_id and the norm formula (anechoic :111-122)
        sec = np.floor(d["aoa_deg"] / 45.0).astype(int)
        np.testing.assert_array_equal(sec, d["sector_id"])
        norm = np.minimum((d["aoa_deg"] - sec * 45.0 + 1e-3) / 45.0, 1.0)
        np.testing.assert_allclose(d["sector_angle_norm"], norm, atol=1e-6)


def test_meta_matches_labels(spirit_synth):
    """sample_batch_meta's metadata must agree with the packed y labels."""
    wavL, wavR, x3, y, meta = spirit_synth.sample_batch_meta(
        jax.random.PRNGKey(7), 16)
    ys, ya, _ = (np.asarray(a) for a in unpack_targets(y))
    act = np.asarray(meta["active"]) > 0.5
    secs = np.asarray(meta["sector_id"]).astype(int)
    for b in range(16):
        assert set(secs[b][act[b]]) == set(np.nonzero(ys[b] > 0.5)[0])


def test_meta_and_plain_same_waveforms(spirit_synth):
    """The meta variant must sample the identical batch for the same key."""
    a = spirit_synth.sample_batch(jax.random.PRNGKey(3), 4)
    b = spirit_synth.sample_batch_meta(jax.random.PRNGKey(3), 4)
    for x, z in zip(a, b[:4]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(z))
