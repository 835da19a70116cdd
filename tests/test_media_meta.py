"""MP3/MP4 container metadata (pipeline/media_meta.py) against
hand-assembled fixtures built from the published specs — no third-party
media files."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from apache___solr_spark.pipeline.media_meta import (
    media_metadata,
    mp3_metadata,
    mp4_metadata,
)

# MPEG-1 Layer III, 128 kbps, 44100 Hz, joint stereo, no padding:
# frame size = 144 * 128000 / 44100 = 417 bytes
_FRAME_HDR = bytes([0xFF, 0xFB, 0x90, 0x40])
_FRAME = _FRAME_HDR + bytes(417 - 4)


def _id3(size: int) -> bytes:
    return b"ID3\x04\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    ) + bytes(size)


def test_mp3_cbr_with_id3():
    mp3 = _id3(100) + _FRAME * 50
    m = mp3_metadata(mp3)
    assert m["codec"] == "mp3(mpeg1-layer3)"
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["bitrate"] == 128000 and not m["vbr"]
    assert m["n_frames"] == 50
    assert abs(m["duration_sec"] - 50 * 1152 / 44100) < 1e-9


def test_mp3_xing_frame_count_wins():
    # Xing header in the first frame: side info 32 bytes (MPEG-1 stereo)
    first = bytearray(_FRAME)
    at = 4 + 32
    first[at : at + 4] = b"Xing"
    first[at + 4 : at + 8] = struct.pack(">I", 0x1)  # frames flag
    first[at + 8 : at + 12] = struct.pack(">I", 1234)
    mp3 = bytes(first) + _FRAME * 3
    m = mp3_metadata(mp3)
    assert m["vbr"] and m["n_frames"] == 1234
    assert abs(m["duration_sec"] - 1234 * 1152 / 44100) < 1e-9


def test_mp3_false_sync_rejected():
    # a lone 0xFF FB inside junk whose "next frame" is garbage must not
    # parse; a real frame pair later must
    junk = b"\x00\xff\xfb\x90\x40" + bytes(10)
    mp3 = junk + _FRAME * 2
    m = mp3_metadata(mp3)
    assert m["n_frames"] >= 2
    with pytest.raises(ValueError):
        mp3_metadata(b"not audio at all")


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_fixture() -> bytes:
    mvhd = b"\x00" + b"\x00" * 3 + bytes(8) + struct.pack(">II", 1000, 5000)
    mdhd = b"\x00" + b"\x00" * 3 + bytes(8) + struct.pack(">II", 48000, 96000)
    hdlr = bytes(8) + b"soun" + bytes(12)
    stsd = b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">I", 16) + b"mp4a" + bytes(8)
    stsz = b"\x00" * 4 + struct.pack(">II", 0, 250)
    stbl = _box(b"stsd", stsd) + _box(b"stsz", stsz)
    minf = _box(b"stbl", stbl)
    mdia = _box(b"mdhd", mdhd) + _box(b"hdlr", hdlr) + _box(b"minf", minf)
    trak = _box(b"mdia", mdia)
    moov = _box(b"mvhd", mvhd) + _box(b"trak", trak)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _box(b"moov", moov)


def test_mp4_box_walk():
    m = mp4_metadata(_mp4_fixture())
    assert m["brand"] == "isom"
    assert m["timescale"] == 1000 and m["duration_sec"] == 5.0
    (t,) = m["tracks"]
    assert t["handler"] == "soun" and t["codec"] == "mp4a"
    assert t["timescale"] == 48000 and t["duration_sec"] == 2.0
    assert t["n_samples"] == 250
    with pytest.raises(ValueError):
        mp4_metadata(b"GIF89a" + bytes(100))


def test_media_metadata_spark(spark):
    from apache___solr_spark.pipeline.flac import encode_flac
    from apache___solr_spark.pipeline.multimodal import encode_wav

    wav = encode_wav(np.zeros(8000, np.float32), 16000)
    flac = encode_flac(np.arange(-100, 100, dtype=np.int64), 8000, 16)
    # stereo WAV fixture (encode_wav is mono-only): interleaved L/R
    import io
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(8000 * 2, "<i2").tobytes())
    stereo = buf.getvalue()
    rows = [
        (1, bytearray(_id3(10) + _FRAME * 20)),
        (2, bytearray(_mp4_fixture())),
        (3, bytearray(wav)),
        (4, bytearray(flac)),
        (5, bytearray(b"\x00garbage")),
        (6, None),
        (7, bytearray(stereo)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert got[1]["format"] == "mp3" and got[1]["sample_rate"] == 44100
    assert got[2]["format"] == "mp4" and got[2]["codec"] == "mp4a"
    assert got[2]["duration_sec"] == 5.0 and got[2]["n_tracks"] == 1
    assert got[3]["format"] == "wav" and got[3]["duration_sec"] == 0.5
    assert got[3]["channels"] == 1
    assert got[4]["format"] == "flac" and got[4]["sample_rate"] == 8000
    assert got[5]["format"] == "unknown" and got[6]["format"] == "unknown"
    # stereo WAV reports its real channel count (regression: decode_wav
    # downmixes, the header must be read for metadata)
    assert got[7]["format"] == "wav" and got[7]["channels"] == 2
    assert got[7]["duration_sec"] == 0.5
    plan = media_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only
