"""Container-level media metadata: MP3 and MP4 without codec decode.

Full MP3 (Huffman + IMDCT + polyphase) and MP4 codec decode stay out of
scope (pipeline/multimodal.py raises honestly); what a crawl pipeline
actually needs from these files first is METADATA — duration, sample
rate, channels, codec — to filter, bucket, and budget before any
expensive decode.  That layer is deterministic container parsing:

- :func:`mp3_metadata` — skips ID3v2, parses MPEG audio frame headers
  (version/layer/bitrate/samplerate tables from ISO 11172-3), reads a
  Xing/Info VBR header when present (exact frame count), else estimates
  duration from the byte length at the first frame's bitrate (CBR
  assumption, flagged in the output).
- :func:`mp4_metadata` — ISO BMFF box walk: ftyp brand, movie timescale
  + duration (mvhd), per-track handler (vide/soun), codec fourcc
  (stsd), sample count (stsz), track timescale/duration (mdhd).
- :func:`media_metadata` — the Arrow-batched Spark surface over a
  binary column, dispatching on magic (also accepts WAV/FLAC through
  the real decoders' headers).

Malformed input raises ValueError; truncated-but-recognizable input
parses what is present.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

# ISO 11172-3 / 13818-3 tables: bitrate kbps by (version_key, layer)
_BITRATES = {
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLERATES = {
    "1": [44100, 48000, 32000],      # MPEG-1
    "2": [22050, 24000, 16000],      # MPEG-2
    "2.5": [11025, 12000, 8000],     # MPEG-2.5
}
_SAMPLES_PER_FRAME = {
    ("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
    ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576,
    ("2.5", 1): 384, ("2.5", 2): 1152, ("2.5", 3): 576,
}


def _parse_mp3_frame_header(b: bytes):
    """4 header bytes -> dict or None if not a sync frame."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    ver_bits = (b[1] >> 3) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    layer = {1: 3, 2: 2, 3: 1}.get((b[1] >> 1) & 0x3)
    if version is None or layer is None:
        return None
    br_idx = (b[2] >> 4) & 0xF
    sr_idx = (b[2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vkey = "1" if version == "1" else "2"
    bitrate = _BITRATES[(vkey, layer)][br_idx] * 1000
    samplerate = _SAMPLERATES[version][sr_idx]
    padding = (b[2] >> 1) & 0x1
    mode = (b[3] >> 6) & 0x3
    spf = _SAMPLES_PER_FRAME[(version, layer)]
    if layer == 1:
        size = (12 * bitrate // samplerate + padding) * 4
    else:
        size = spf // 8 * bitrate // samplerate + padding
    return {
        "version": version,
        "layer": layer,
        "bitrate": bitrate,
        "samplerate": samplerate,
        "channels": 1 if mode == 3 else 2,
        "frame_size": size,
        "samples_per_frame": spf,
    }


def mp3_metadata(content: bytes) -> dict:
    """MP3 bytes -> {codec, sample_rate, channels, bitrate, n_frames,
    duration_sec, vbr, layer}.  Raises ValueError when no MPEG audio
    frame is found."""
    data = bytes(content)
    pos = 0
    if data[:3] == b"ID3":  # ID3v2: 10-byte header + syncsafe size
        if len(data) < 10:
            raise ValueError("mp3: truncated ID3v2 header")
        size = (
            (data[6] & 0x7F) << 21
            | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7
            | (data[9] & 0x7F)
        )
        pos = 10 + size
    # scan for the first valid frame sync (tolerate leading junk)
    hdr = None
    while pos + 4 <= len(data):
        hdr = _parse_mp3_frame_header(data[pos : pos + 4])
        if hdr:
            # require the NEXT frame to also parse (or EOF) — kills
            # false syncs inside tag payloads
            nxt = pos + hdr["frame_size"]
            if nxt + 4 > len(data) or _parse_mp3_frame_header(
                data[nxt : nxt + 4]
            ):
                break
            hdr = None
        pos += 1
    if not hdr:
        raise ValueError("mp3: no MPEG audio frame found")
    # Xing/Info header (VBR): side-info offset depends on version/mode
    side = (
        (17 if hdr["channels"] == 1 else 32)
        if hdr["version"] == "1"
        else (9 if hdr["channels"] == 1 else 17)
    )
    tag_at = pos + 4 + side
    n_frames = None
    vbr = False
    tag = data[tag_at : tag_at + 4]
    if tag in (b"Xing", b"Info"):
        vbr = tag == b"Xing"
        flags = struct.unpack(">I", data[tag_at + 4 : tag_at + 8])[0]
        if flags & 0x1:
            n_frames = struct.unpack(">I", data[tag_at + 8 : tag_at + 12])[0]
    if n_frames is None:
        # CBR estimate from the audio byte length
        n_frames = max(1, (len(data) - pos) // hdr["frame_size"])
    duration = n_frames * hdr["samples_per_frame"] / hdr["samplerate"]
    return {
        "codec": f"mp3(mpeg{hdr['version']}-layer{hdr['layer']})",
        "sample_rate": hdr["samplerate"],
        "channels": hdr["channels"],
        "bitrate": hdr["bitrate"],
        "n_frames": int(n_frames),
        "duration_sec": float(duration),
        "vbr": vbr,
        "layer": hdr["layer"],
    }


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def mp4_metadata(content: bytes) -> dict:
    """ISO BMFF (MP4/MOV) bytes -> {brand, timescale, duration_sec,
    tracks: [{handler, codec, timescale, duration_sec, n_samples}]}.
    Raises ValueError when the stream is not ISO BMFF."""
    data = bytes(content)
    top = list(_iter_boxes(data, 0, len(data)))
    if not any(t == b"ftyp" for t, _, _ in top) and not any(
        t == b"moov" for t, _, _ in top
    ):
        raise ValueError("mp4: no ftyp/moov box")
    out: dict = {"brand": None, "timescale": None, "duration_sec": None,
                 "tracks": []}
    track: dict | None = None

    def walk(start: int, end: int) -> None:
        nonlocal track
        for btype, body, bend in _iter_boxes(data, start, end):
            if btype == b"ftyp":
                out["brand"] = data[body : body + 4].decode(
                    "ascii", "replace"
                )
            elif btype == b"mvhd":
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", data[body + 20 : body + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", data[body + 12 : body + 20]
                    )
                out["timescale"] = ts
                out["duration_sec"] = dur / ts if ts else None
            elif btype == b"trak":
                track = {
                    "handler": None, "codec": None, "timescale": None,
                    "duration_sec": None, "n_samples": None,
                }
                walk(body, bend)
                out["tracks"].append(track)
                track = None
                continue
            elif btype == b"mdhd" and track is not None:
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", data[body + 20 : body + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", data[body + 12 : body + 20]
                    )
                track["timescale"] = ts
                track["duration_sec"] = dur / ts if ts else None
            elif btype == b"hdlr" and track is not None:
                track["handler"] = data[body + 8 : body + 12].decode(
                    "ascii", "replace"
                )
            elif btype == b"stsd" and track is not None:
                # version/flags (4) + entry_count (4) + first entry
                n = struct.unpack(">I", data[body + 4 : body + 8])[0]
                if n >= 1 and body + 16 <= bend:
                    track["codec"] = data[body + 12 : body + 16].decode(
                        "ascii", "replace"
                    )
            elif btype == b"stsz" and track is not None:
                track["n_samples"] = struct.unpack(
                    ">I", data[body + 8 : body + 12]
                )[0]
            if btype in _CONTAINERS:
                walk(body, bend)

    walk(0, len(data))
    return out


def media_metadata(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """binary media column -> (id, format, codec, sample_rate, channels,
    duration_sec, n_tracks) by container sniffing: MP3 (ID3/sync), MP4
    (ftyp), WAV (RIFF), FLAC (fLaC).  Unknown formats yield
    format='unknown' with null fields (a filter predicate, not an
    error); map-only Arrow pass."""
    import pandas as pd

    def one(content) -> tuple:
        if content is None:
            return ("unknown", None, None, None, None, None)
        b = bytes(content)
        try:
            if b[:3] == b"ID3" or (
                len(b) > 1 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
            ):
                m = mp3_metadata(b)
                return (
                    "mp3", m["codec"], m["sample_rate"], m["channels"],
                    m["duration_sec"], 1,
                )
            if b[4:8] == b"ftyp" or b[4:8] == b"moov":
                m = mp4_metadata(b)
                audio = [t for t in m["tracks"] if t["handler"] == "soun"]
                sr = audio[0]["timescale"] if audio else None
                codec = ",".join(
                    t["codec"] or "?" for t in m["tracks"]
                ) or None
                return (
                    "mp4", codec, sr, None, m["duration_sec"],
                    len(m["tracks"]),
                )
            if b[:4] == b"RIFF":
                import io
                import wave

                from apache___solr_spark.pipeline.multimodal import decode_wav

                # channel count from the header — decode_wav downmixes to
                # mono, so the metadata must read nchannels itself
                with wave.open(io.BytesIO(b), "rb") as w:
                    nch = w.getnchannels()
                s, rate = decode_wav(b)
                return ("wav", "pcm", rate, nch, len(s) / rate, 1)
            if b[:4] == b"fLaC":
                from apache___solr_spark.pipeline.flac import decode_flac

                s, rate, bps = decode_flac(b)
                return (
                    "flac", f"flac{bps}", rate, s.shape[1],
                    len(s) / rate, 1,
                )
        except (ValueError, NotImplementedError, struct.error):
            pass
        return ("unknown", None, None, None, None, None)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                (mid, *one(c))
                for mid, c in zip(pdf[id_col], pdf[content_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "format", "codec", "sample_rate", "channels",
                    "duration_sec", "n_tracks",
                ],
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, format string, codec string, "
            "sample_rate long, channels int, duration_sec double, "
            "n_tracks int"
        ),
    )
