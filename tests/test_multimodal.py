"""Multimodal plumbing tests: binary-column feature extraction through
mapInArrow (real batching, deterministic fake kernel), resize planning,
frame sampling, and the real-decoder NotImplementedError gate."""

import numpy as np
import pyarrow as pa
import pytest

from plc.multimodal import (decode_image_real, extract_features,
                            fake_feature_kernel, resize_metadata,
                            sample_frames)


def _media_df(spark, n=50):
    rng = np.random.default_rng(4)
    rows = [(i, bytes(rng.integers(0, 256, int(rng.integers(10, 500)))
                      .astype(np.uint8)), "image", 640, 480, 0, 0)
            for i in range(n)]
    return spark.createDataFrame(
        rows, "media_id bigint, payload binary, media_type string, "
              "width int, height int, n_frames int, sample_rate int")


def test_extract_features_shapes_and_determinism(spark):
    df = _media_df(spark)
    out = extract_features(df, n_features=8)
    rows = {r["media_id"]: r["features"] for r in out.collect()}
    assert len(rows) == 50
    assert all(len(v) == 8 for v in rows.values())
    # histogram fractions sum to 1 for non-empty payloads
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in rows.values())
    rows2 = {r["media_id"]: r["features"]
             for r in extract_features(df, n_features=8).collect()}
    assert rows == rows2


def test_fake_kernel_matches_numpy_reference():
    rng = np.random.default_rng(8)
    blobs = [bytes(rng.integers(0, 256, n).astype(np.uint8))
             for n in (0, 1, 17, 300)]
    feats = fake_feature_kernel(pa.array(blobs, pa.binary()), 4)
    for i, b in enumerate(blobs):
        arr = np.frombuffer(b, np.uint8)
        expect = np.array([np.mean((arr % 4) == f) if arr.size else 0.0
                           for f in range(4)], np.float32)
        assert np.allclose(feats[i], expect), i


def test_media_column_encodes_through_pipeline(spark):
    """A media table (binary payload + typed metadata) must round-trip
    through the columnar engine itself."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from plc.pipeline import PipelineConfig, encode, verify

    df = _media_df(spark).withColumn(
        "doc_id", F.format_string("m-%08d", "media_id"))
    dst = tempfile.mkdtemp(prefix="plc_mm_")
    try:
        encode(spark, df, dst,
               PipelineConfig(num_partitions=3, straggler_parts=0),
               mode="overwrite")
        assert verify(spark, df, dst)["mismatches"] == 0
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_resize_metadata(spark):
    df = spark.createDataFrame(
        [(1, 640, 480), (2, 100, 50), (3, 4000, 1000)],
        "media_id bigint, width int, height int")
    out = {r["media_id"]: (r["target_w"], r["target_h"])
           for r in resize_metadata(df, max_side=256).collect()}
    assert out[1] == (256, 192)
    assert out[2] == (100, 50)          # under the cap: untouched
    assert out[3] == (256, 64)


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, 25), (2, 0), (3, 1)],
                               "media_id bigint, n_frames int")
    out = sample_frames(df, every_k=10).collect()
    got = sorted((r["media_id"], r["frame_idx"]) for r in out)
    assert got == [(1, 0), (1, 10), (1, 20), (3, 0)]


def test_fake_kernel_handles_sliced_arrays():
    """A sliced Arrow array's data buffer extends past offsets[-1]; the
    kernel must slice to the logical range (regression)."""
    arr = pa.array([b"abcdef", b"ghijkl", b"mnopqr"], pa.binary()).slice(0, 2)
    feats = fake_feature_kernel(arr, 4)
    assert feats.shape == (2, 4)
    full = fake_feature_kernel(pa.array([b"abcdef", b"ghijkl"], pa.binary()),
                               4)
    assert np.allclose(feats, full)


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image_real(pa.array([b"x"], pa.binary()))


def test_decode_image_real_gated_without_pil():
    """In environments without PIL the real kernel raises the documented
    NotImplementedError (never a raw ImportError deep in a worker)."""
    import pyarrow as pa

    from plc.multimodal import decode_image_real

    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; covered by test_decode_image_real_with_pil")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="needs PIL"):
        decode_image_real(pa.array([b"\x89PNG..."], pa.binary()))


def test_decode_image_real_with_pil(spark):
    """On a cluster that ships PIL, the real kernel decodes actual images
    through the same extract_features plumbing as the fake kernel
    (VERDICT r2 #7 done-criterion)."""
    import io

    import numpy as np
    import pyarrow as pa

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from plc.multimodal import decode_image_real, extract_features

    blobs = []
    for shade in (0, 128, 255):
        img = Image.new("L", (32, 32), shade)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        blobs.append(buf.getvalue())
    # kernel-level: constant-shade images put all mass in one bucket
    feats = decode_image_real(pa.array(blobs, pa.binary()), n_features=8)
    assert feats.shape == (3, 8)
    assert np.isclose(feats[0, 0], 1.0) and np.isclose(feats[2, 7], 1.0)
    # plumbing-level: same operator, real kernel
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)],
        "media_id bigint, payload binary")
    out = extract_features(df, kernel=decode_image_real).collect()
    assert len(out) == 3 and all(len(r["features"]) == 8 for r in out)


def test_fake_kernel_any_feature_count():
    """Review fix companion: histogram binning must cover the full byte
    range for non-power-of-two feature counts (rows sum to ~1)."""
    import numpy as np
    import pyarrow as pa

    from plc.multimodal import fake_feature_kernel

    blobs = pa.array([bytes(range(256)), b"\xff" * 64], pa.binary())
    for n in (6, 8, 10):
        feats = fake_feature_kernel(blobs, n_features=n)
        assert feats.shape == (2, n)
        assert np.allclose(feats.sum(axis=1), 1.0)


def _wav_bytes(freq_hz, sec, rate=8000, chans=1, width=2, amp=0.5):
    import io
    import wave

    t = np.arange(int(rate * sec)) / rate
    x = (amp * np.sin(2 * np.pi * freq_hz * t)).astype(np.float32)
    if chans == 2:
        x = np.repeat(x, 2)
    pcm = (x * 32767).astype("<i2").tobytes() if width == 2 else \
        ((x * 127) + 128).astype(np.uint8).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(chans)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm)
    return buf.getvalue()


def test_decode_audio_wav_features():
    """Real audio kernel (stdlib wave — runs in CI, never skipped):
    duration/rate/channels parse exactly; RMS of a sine tracks a/sqrt(2);
    undecodable and empty payloads yield zero rows."""
    from plc.multimodal import decode_audio_wav

    blobs = [
        _wav_bytes(440, 0.5, rate=8000, amp=0.5),
        _wav_bytes(100, 0.25, rate=16000, chans=2, amp=0.9),
        _wav_bytes(50, 0.1, rate=8000, width=1, amp=0.8),
        b"not a wav at all",
        b"",
    ]
    feats = decode_audio_wav(pa.array(blobs, pa.binary()))
    assert feats.shape == (5, 8) and feats.dtype == np.float32
    # clip 0: 0.5 s @ 8 kHz mono 16-bit
    assert abs(feats[0, 0] - 0.5) < 1e-3      # duration
    assert abs(feats[0, 1] - 8.0) < 1e-6      # kHz
    assert feats[0, 2] == 1 and feats[0, 3] == 2
    assert abs(feats[0, 4] - 0.5 / np.sqrt(2)) < 0.01  # sine RMS = a/√2
    assert abs(feats[0, 5] - 0.5) < 0.01      # peak ≈ amplitude
    # clip 1: stereo halves nothing (identical channels average to mono)
    assert abs(feats[1, 0] - 0.25) < 1e-3 and feats[1, 2] == 2
    assert abs(feats[1, 4] - 0.9 / np.sqrt(2)) < 0.02
    # clip 2: 8-bit path decodes (coarse quantization → loose bound)
    assert abs(feats[2, 4] - 0.8 / np.sqrt(2)) < 0.05
    # garbage + empty → zero rows, no exception
    assert not feats[3].any() and not feats[4].any()


def test_decode_audio_wav_through_extract_features(spark):
    """The audio kernel drops into the same mapInArrow plumbing as every
    other media kernel — end-to-end on a Spark binary column."""
    from plc.multimodal import decode_audio_wav, extract_features

    rows = [(i, _wav_bytes(200 + 100 * i, 0.2 + 0.1 * i)) for i in range(4)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["features"] for r in
           extract_features(df, kernel=decode_audio_wav).collect()}
    assert len(out) == 4
    for i in range(4):
        assert abs(out[i][0] - (0.2 + 0.1 * i)) < 1e-3  # per-clip duration
        assert abs(out[i][1] - 8.0) < 1e-6


def _y4m_bytes(w, h, frames, fps=(25, 1), chroma=b"420", levels=None):
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        w, h, fps[0], fps[1], chroma)
    cb = (0 if chroma.startswith(b"mono") else
          2 * w * h if chroma.startswith(b"444") else
          w * h if chroma.startswith(b"422") else w * h // 2)
    body = b""
    for f in range(frames):
        lv = 128 if levels is None else levels[f]
        body += b"FRAME\n" + bytes([lv]) * (w * h) + b"\x80" * cb
    return head + body


def test_decode_video_y4m_features():
    """Real video kernel (raw YUV4MPEG2, numpy-only — runs in CI, never
    skipped): header geometry/fps parse exactly, luma stats and
    frame-to-frame motion compute from the planes, and garbage /
    truncated clips zero out instead of failing the batch."""
    from plc.multimodal import decode_video_y4m

    blobs = [
        _y4m_bytes(8, 4, 3, fps=(30, 1), levels=[0, 255, 0]),
        _y4m_bytes(4, 4, 1, chroma=b"mono"),
        _y4m_bytes(4, 2, 2, chroma=b"444"),
        b"RIFFnot a video",
        _y4m_bytes(8, 4, 2)[:40],  # truncated mid-frame
    ]
    feats = decode_video_y4m(pa.array(blobs, pa.binary()))
    assert feats.shape == (5, 8) and feats.dtype == np.float32
    # clip 0: 3 frames @30fps, 8x4, alternating black/white → motion = 1
    assert feats[0, 0] == 3 and abs(feats[0, 1] - 30) < 1e-6
    assert feats[0, 2] == 8 and feats[0, 3] == 4
    assert abs(feats[0, 4] - (255 / 255 / 3)) < 1e-3   # mean luma 1/3
    assert abs(feats[0, 6] - 1.0) < 1e-3               # full-swing motion
    assert abs(feats[0, 7] - 0.1) < 1e-6               # 3 frames / 30 fps
    # clip 1: mono chroma single frame, constant 128 luma, zero motion
    assert feats[1, 0] == 1 and abs(feats[1, 4] - 128 / 255) < 1e-3
    assert feats[1, 6] == 0.0
    # clip 2: 4:4:4 parses both frames
    assert feats[2, 0] == 2
    # garbage + truncated-before-any-complete-frame → zero rows
    assert not feats[3].any() and not feats[4].any()


def test_decode_video_y4m_truncation_and_444alpha():
    """Truncation INSIDE a later frame header must keep the fully-parsed
    frames (same as mid-plane truncation — review finding), and
    C444alpha strides its extra alpha plane so frame counts stay exact."""
    from plc.multimodal import decode_video_y4m

    two = _y4m_bytes(4, 4, 2)
    # cut so the blob ends with a dangling b"FRAME" (no newline)
    head_end = two.index(b"\n") + 1
    frame1_len = len(b"FRAME\n") + 16 + 8  # luma + 420 chroma
    cut = two[: head_end + frame1_len + 5]
    assert cut.endswith(b"FRAME")
    # alpha: hand-build a C444alpha clip (luma + Cb + Cr + A per frame)
    aw, ah, af = 4, 2, 3
    alpha = b"YUV4MPEG2 W%d H%d F25:1 C444alpha\n" % (aw, ah)
    for _ in range(af):
        alpha += b"FRAME\n" + b"\x40" * (aw * ah) + b"\x80" * (3 * aw * ah)
    feats = decode_video_y4m(pa.array([cut, alpha], pa.binary()))
    assert feats[0, 0] == 1          # dangling header keeps frame 1
    assert abs(feats[0, 4] - 128 / 255) < 1e-3
    assert feats[1, 0] == af         # alpha plane strides correctly
    assert abs(feats[1, 4] - 0x40 / 255) < 1e-3


def test_decode_video_y4m_unknown_chroma_rejected():
    """An unrecognized chroma tag (e.g. C410) must yield a zero row, not
    a guessed stride that silently truncates frames (ADVICE r4)."""
    from plc.multimodal import decode_video_y4m

    clip = _y4m_bytes(8, 4, 3)
    weird = clip.replace(b" C420", b" C410", 1)
    assert weird != clip
    feats = decode_video_y4m(pa.array([weird, clip], pa.binary()))
    assert feats[0].sum() == 0       # undecodable, flagged not guessed
    assert feats[1, 0] == 3


def test_decode_video_y4m_through_extract_features(spark):
    from plc.multimodal import decode_video_y4m, extract_features

    rows = [(i, _y4m_bytes(4, 4, i + 1)) for i in range(3)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["features"] for r in
           extract_features(df, kernel=decode_video_y4m).collect()}
    for i in range(3):
        assert out[i][0] == i + 1  # per-clip frame count


def test_decode_media_av_is_gated():
    """The compressed-codec kernel (PyAV/ffmpeg) is import-gated like
    PIL: absent the library it raises NotImplementedError with the
    in-sandbox alternatives named; present, it decodes (gated test)."""
    import pytest as _pytest

    from plc.multimodal import decode_media_av

    try:
        import av  # noqa: F401
        has_av = True
    except ImportError:
        has_av = False
    if not has_av:
        with _pytest.raises(NotImplementedError, match="PyAV"):
            decode_media_av(pa.array([b"\x00\x01"], pa.binary()))
        return
    feats = decode_media_av(pa.array([b"not-a-real-container"], pa.binary()))
    assert feats.shape == (1, 8) and feats.sum() == 0
