"""Audio/video modality: pcmz + vraw codecs and the feature/demux
stages (SURVEY §2 multimodal operators; the decode seam is repo-local,
everything downstream is the real computation)."""
import numpy as np
import pyarrow as pa
import pytest

from kafka_delta_rs_ray.codecs import pcmz, vraw
from kafka_delta_rs_ray.errors import FormatError
from kafka_delta_rs_ray.pipelines.synth import (audio_dataset,
                                                make_video_row,
                                                video_dataset)
from kafka_delta_rs_ray.stages.codec_stage import AudioFeatures, FrameSample


def test_pcmz_roundtrip_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(-32768, 32767, 5000).astype(np.int16)
    assert np.array_equal(pcmz.decode(pcmz.encode(a)), a)
    # float input quantizes once, then round-trips exactly
    f = rng.uniform(-1, 1, 1000)
    q = pcmz.decode(pcmz.encode(f))
    assert np.array_equal(pcmz.decode(pcmz.encode(q)), q)


def test_pcmz_corrupt_raises():
    with pytest.raises(FormatError):
        pcmz.decode(b"nope")
    good = pcmz.encode(np.zeros(100, np.int16))
    with pytest.raises(FormatError):
        pcmz.decode(good[:8] + b"garbage")


def test_vraw_roundtrip_exact():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (7, 16, 24, 3), dtype=np.uint8)
    assert np.array_equal(vraw.decode(vraw.encode(frames)), frames)
    with pytest.raises(FormatError):
        vraw.encode(frames[..., :2])  # not RGB
    with pytest.raises(FormatError):
        vraw.decode(b"VRW1" + b"\0" * 20)


def test_audio_features_sine_band(ray_session):
    """A pure 1 kHz tone's energy must land in the band containing
    1 kHz, and the window count must match the framing arithmetic."""
    sr, secs = 16000, 0.5
    t = np.arange(int(sr * secs)) / sr
    clip = pcmz.encode(0.5 * np.sin(2 * np.pi * 1000.0 * t))
    batch = pa.table({
        "media_id": pa.array(["tone"]),
        "bytes": pa.array([clip], pa.large_binary()),
        "fmt": pa.array(["pcmz"]),
        "sample_rate": pa.array([sr], pa.int32()),
    })
    af = AudioFeatures(window_ms=25, hop_ms=10, n_bands=16)
    out = af(batch)
    win, hop = sr * 25 // 1000, sr * 10 // 1000
    n_expected = 1 + (int(sr * secs) - win) // hop
    assert out.num_rows == n_expected
    feats = np.array(out["features"].to_pylist())
    assert feats.shape == (n_expected, 16)
    # the hottest band must be the one whose filter peaks nearest 1 kHz
    _, _, _, filt = af._plan(sr)
    freqs = np.fft.rfftfreq(win, d=1.0 / sr)
    peak_freq = freqs[np.argmax(filt[np.argmax(feats.mean(axis=0))])]
    assert 500 <= peak_freq <= 2000


def test_audio_features_dataset_deterministic(ray_session):
    ds = audio_dataset(3, seconds=0.25)
    out = (ds.map_batches(AudioFeatures(), batch_format="pyarrow")
           .to_pandas().sort_values(["media_id", "window_idx"])
           .reset_index(drop=True))
    out2 = (audio_dataset(3, seconds=0.25)
            .map_batches(AudioFeatures(), batch_format="pyarrow")
            .to_pandas().sort_values(["media_id", "window_idx"])
            .reset_index(drop=True))
    assert out.equals(out2)
    assert set(out["media_id"]) == {f"aud-{i:08d}" for i in range(3)}
    assert (out.groupby("media_id")["window_idx"].count() > 10).all()


def test_frame_sample_indices_and_pixels(ray_session):
    from kafka_delta_rs_ray.codecs import decode

    out = (video_dataset(2, n_frames=10)
           .map_batches(FrameSample(every_n=4), batch_format="pyarrow")
           .to_pandas().sort_values(["media_id", "frame_idx"])
           .reset_index(drop=True))
    assert list(out[out["media_id"] == "vid-00000000"]["frame_idx"]) == [0, 4, 8]
    # sampled frame pixels must equal the synthesized source frame
    src = make_video_row(0, 42, n_frames=10)["frames"]
    row = out[(out["media_id"] == "vid-00000000")
              & (out["frame_idx"] == 4)].iloc[0]
    assert np.array_equal(decode(row["bytes"], row["fmt"]), src[4])
    assert row["fmt"] == "rawz" and row["w"] == 32 and row["h"] == 32

def test_cross_modality_payloads_dead_letter(ray_session, tmp_path):
    """The fmt registry spans modalities, so a decodable WRONG-modality
    payload must hit the FormatError dead-letter path everywhere, never
    crash a stage or slip through validation."""
    from kafka_delta_rs_ray.stages.validate import ValidateImages

    audio_buf = pcmz.encode(np.zeros(16, np.int16))
    video_buf = vraw.encode(np.zeros((2, 4, 4, 3), np.uint8))
    image_buf = __import__(
        "kafka_delta_rs_ray.codecs", fromlist=["encode"]).encode(
        np.zeros((4, 4, 3), np.uint8), "rawz")

    # image validation quarantines audio/video payloads (both with and
    # without the pixel-dimension check)
    for check_pixels in (True, False):
        vi = ValidateImages(str(tmp_path), check_pixels=check_pixels,
                            retry_backoff_secs=0.0)
        bad = pa.table({
            "image_id": pa.array(["a", "v"]),
            "bytes": pa.array([audio_buf, video_buf], pa.large_binary()),
            "w": pa.array([16, 4], pa.int32()),
            "h": pa.array([1, 4], pa.int32()),
            "fmt": pa.array(["pcmz", "vraw"]),
            "caption": pa.array(["x", "y"]),
            "phash": pa.array([0, 0], pa.int64()),
        })
        assert vi(bad).num_rows == 0

    # audio stage rejects image/video payloads with FormatError
    af = AudioFeatures()
    for buf, fmt in ((image_buf, "rawz"), (video_buf, "vraw")):
        b = pa.table({"media_id": pa.array(["m"]),
                      "bytes": pa.array([buf], pa.large_binary()),
                      "fmt": pa.array([fmt]),
                      "sample_rate": pa.array([16000], pa.int32())})
        with pytest.raises(FormatError):
            af(b)

    # video stage rejects audio/image payloads with FormatError
    fs = FrameSample(every_n=1)
    for buf, fmt in ((audio_buf, "pcmz"), (image_buf, "rawz")):
        b = pa.table({"media_id": pa.array(["m"]),
                      "bytes": pa.array([buf], pa.large_binary()),
                      "fmt": pa.array([fmt])})
        with pytest.raises(FormatError):
            fs(b)


def test_scene_cuts_detects_planted_boundary():
    """SceneCuts finds exactly the planted abrupt transition and
    nothing inside the static segments; list column carries the cut
    frame index."""
    import pyarrow as pa

    from kafka_delta_rs_ray.stages.codec_stage import SceneCuts

    frames = np.zeros((20, 8, 8, 3), np.uint8)
    frames[10:] = 200  # one hard cut at frame 10
    batch = pa.table({"media_id": ["clip-1"],
                      "bytes": [vraw.encode(frames)],
                      "fmt": ["vraw"]})
    out = SceneCuts(threshold=0.18)(batch)
    assert out["n_frames"][0].as_py() == 20
    assert out["n_cuts"][0].as_py() == 1
    assert out["cut_idxs"][0].as_py() == [10]
    assert out["max_delta"][0].as_py() > 0.5

    # static clip → zero cuts; single-frame clip → defined zeros
    static = pa.table({"media_id": ["clip-2", "clip-3"],
                       "bytes": [vraw.encode(np.zeros((5, 4, 4, 3),
                                                      np.uint8)),
                                 vraw.encode(np.zeros((1, 4, 4, 3),
                                                      np.uint8))],
                       "fmt": ["vraw", "vraw"]})
    out2 = SceneCuts()(static)
    assert out2["n_cuts"].to_pylist() == [0, 0]
    assert out2["max_delta"].to_pylist() == [0.0, 0.0]


def test_video_scene_cuts_query_deterministic(ray_session):
    from kafka_delta_rs_ray.ops.queries import QUERIES

    a = QUERIES["video_scene_cuts"]("/root/testdata/sf0.001").to_pandas()
    b = QUERIES["video_scene_cuts"]("/root/testdata/sf0.001").to_pandas()
    assert len(a) == 32 and a.equals(b)


def test_silence_trim_planted_spans():
    """SilenceTrim removes exactly the planted silent lead/tail, keeps
    the loud span byte-identical, and handles all-silent clips."""
    import pyarrow as pa

    from kafka_delta_rs_ray.stages.codec_stage import SilenceTrim

    loud = (np.sin(np.linspace(0.3, 40, 400)) * 20000).astype(np.int16)
    assert abs(int(loud[0])) > 655 and abs(int(loud[-1])) > 655
    clip = np.concatenate([np.zeros(150, np.int16), loud,
                           np.zeros(70, np.int16)])
    batch = pa.table({"media_id": ["a", "b"],
                      "bytes": [pcmz.encode(clip),
                                pcmz.encode(np.zeros(100, np.int16))],
                      "fmt": ["pcmz", "pcmz"],
                      "sample_rate": [16000, 16000]})
    out = SilenceTrim(threshold=0.02)(batch)
    assert out["lead"][0].as_py() == 150
    assert out["tail"][0].as_py() == 150 + 400 - 1
    assert out["kept_samples"][0].as_py() == 400
    trimmed = pcmz.decode(memoryview(out["bytes"][0].as_py()))
    assert np.array_equal(trimmed, loud)
    # all-silent clip → empty payload, defined metadata
    assert out["kept_samples"][1].as_py() == 0
    assert out["lead"][1].as_py() == 100 and out["tail"][1].as_py() == -1


def test_image_augment_stage(ray_session):
    """ImageAugment: deterministic id-hash op choice, flip involution,
    crop preserves dims, lossless rows byte-exact vs a local re-run,
    and the registry entry's self-checks pass end-to-end."""
    import numpy as np
    import pyarrow as pa

    from kafka_delta_rs_ray.codecs import decode
    from kafka_delta_rs_ray.pipelines.synth import image_dataset
    from kafka_delta_rs_ray.stages.codec_stage import ImageAugment

    stage = ImageAugment(seed=7)
    src = pa.concat_tables(list(image_dataset(24, batch_size=24)
                                .iter_batches(batch_format="pyarrow",
                                              batch_size=24)))
    out = stage(src)
    assert out.num_rows == 24 and "aug" in out.column_names
    ops = set(out["aug"].to_pylist())
    assert ops <= {"hflip", "vflip", "crop"} and len(ops) >= 2

    for r_in, r_out in zip(src.to_pylist(), out.to_pylist()):
        assert r_out["aug"] == stage.op_for(r_in["image_id"])
        img = decode(r_in["bytes"], r_in["fmt"])
        got = decode(r_out["bytes"], r_out["fmt"])
        assert got.shape == img.shape
        want = np.ascontiguousarray(stage.apply(img, r_out["aug"]))
        if r_in["fmt"] == "rawz":
            assert np.array_equal(got, want)
        if r_out["aug"] in ("hflip", "vflip"):
            assert np.array_equal(
                stage.apply(stage.apply(img, r_out["aug"]),
                            r_out["aug"]), img)

    # different seed → different (still deterministic) op assignment
    other = ImageAugment(seed=8)
    assert any(stage.op_for(r["image_id"]) != other.op_for(r["image_id"])
               for r in src.to_pylist())
