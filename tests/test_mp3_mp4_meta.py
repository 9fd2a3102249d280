"""Container-level mp3/mp4 parsing (functions/mp3.py, functions/mp4.py) +
the multimodal metadata path.

These close the container half of the no-ffmpeg gap: the frame walk / box
walk is REAL and driver-checked (``media_meta_mp3``, ``media_meta_mp4``,
``mp4_sample_index``); the codec payload stays a documented boundary.
"""

import struct

import pytest

from web2llmstxt_spark.functions import mp3, mp4
from web2llmstxt_spark.operators import multimodal


class TestMp3Walk:
    def test_vbr_stats(self):
        frames = [(1, 0), (14, 1), (9, 0), (9, 1), (5, 0)]
        info = mp3.parse_mp3(mp3.build_mp3(frames, sr_idx=0, mode=3))
        assert info["n_frames"] == 5
        assert info["sample_rate"] == 44100 and info["channels"] == 1
        assert info["duration_ms"] == 5 * 1152 * 1000 // 44100
        assert (info["bitrate_min"], info["bitrate_max"]) == (32, 320)
        assert not info["is_cbr"]

    def test_cbr_and_stereo(self):
        info = mp3.parse_mp3(mp3.build_mp3([(9, 0)] * 4, sr_idx=2, mode=0))
        assert info["is_cbr"] and info["channels"] == 2
        assert info["sample_rate"] == 32000

    def test_id3_skip_and_resync(self):
        blob = mp3.build_mp3([(9, 0)] * 3, sr_idx=1,
                             id3_payload=b"TIT2 some title bytes")
        assert blob[:3] == b"ID3"
        assert mp3.parse_mp3(blob)["n_frames"] == 3
        # garbage prefix: scan-forward resync like a real player
        info = mp3.parse_mp3(b"\x00junk\xff\x00" + mp3.build_mp3([(5, 1)] * 2))
        assert info["n_frames"] == 2

    def test_padding_changes_size_not_stats(self):
        # same bitrates, different padding -> different byte lengths but
        # identical reported stats: proves the walk uses size arithmetic
        a = mp3.build_mp3([(9, 0)] * 6)
        b = mp3.build_mp3([(9, 1)] * 6)
        assert len(a) != len(b)
        ia, ib = mp3.parse_mp3(a), mp3.parse_mp3(b)
        assert ia == ib

    def test_no_frames_rejected(self):
        with pytest.raises(ValueError, match="no MPEG-1"):
            mp3.parse_mp3(b"\x00" * 100)


class TestMp4Walk:
    def test_roundtrip_meta_and_samples(self):
        samples = [bytes([i] * (20 + i)) for i in range(10)]
        blob = mp4.build_mp4(320, 240, samples, sample_delta=40)
        info = mp4.parse_mp4(blob)
        assert (info["width"], info["height"]) == (320, 240)
        assert info["n_samples"] == 10 and info["duration_ms"] == 400
        assert info["handler"] == "vide"
        assert info["total_sample_bytes"] == sum(len(s) for s in samples)
        assert [r[2] for r in info["sample_ranges"]] == [40 * k for k in range(10)]
        for k, s in enumerate(samples):
            assert mp4.read_sample(blob, k) == s

    def test_synth_chunk_offset_constant(self):
        # the oracle derives offsets as 32 + cumulative sizes: pin it
        w, h, n, sizes = multimodal.synth_mp4_params("mp4-7")
        blob = multimodal._synth_mp4_blob("mp4-7")
        info = mp4.parse_mp4(blob)
        assert info["sample_ranges"][0][0] == multimodal.MP4_CHUNK_OFFSET
        off = multimodal.MP4_CHUNK_OFFSET
        for k, (o, s, _t) in enumerate(info["sample_ranges"]):
            assert (o, s) == (off, sizes[k])
            off += s

    def test_largesize_and_co64(self):
        # rewrite the mdat header to a 64-bit largesize; parser must still
        # walk past it (offsets unchanged because stco, not box math,
        # locates samples — but our mdat grows 8 bytes, so rebuild stco too)
        samples = [b"abcd", b"efghij"]
        blob = bytearray(mp4.build_mp4(64, 48, samples))
        info = mp4.parse_mp4(bytes(blob))
        mdat_at = blob.find(b"mdat") - 4
        (old_size,) = struct.unpack_from(">I", blob, mdat_at)
        patched = (
            bytes(blob[:mdat_at])
            + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", old_size + 8)
            + bytes(blob[mdat_at + 8 : ])
        )
        # all byte offsets after the mdat header moved +8: patch stco
        patched = bytearray(patched)
        stco_at = patched.find(b"stco")
        (n_ent,) = struct.unpack_from(">I", patched, stco_at + 8)
        (off0,) = struct.unpack_from(">I", patched, stco_at + 12)
        struct.pack_into(">I", patched, stco_at + 12, off0 + 8)
        info2 = mp4.parse_mp4(bytes(patched))
        assert info2["n_samples"] == 2
        assert mp4.read_sample(bytes(patched), 1) == b"efghij"

    def test_malformed_rejected(self):
        with pytest.raises(ValueError, match="moov"):
            mp4.parse_mp4(mp4._box(b"ftyp", b"isom") + mp4._box(b"free", b""))
        blob = mp4.build_mp4(64, 48, [b"xx"])
        with pytest.raises(ValueError):
            mp4.parse_mp4(blob[: len(blob) // 3])

    def test_multitrack_picks_video(self):
        # audio trak listed FIRST in moov (a common real-world mux order):
        # metadata and the sample index must come from the vide track only
        vs = [bytes([k] * (10 + k)) for k in range(4)]
        aus = [b"AUDIO0", b"AUDIO11", b"AUDIO222"]
        blob = mp4.build_mp4(320, 240, vs, audio_samples=aus)
        info = mp4.parse_mp4(blob)
        assert info["handler"] == "vide"
        assert (info["width"], info["height"]) == (320, 240)
        assert info["n_samples"] == 4
        assert info["total_sample_bytes"] == sum(len(s) for s in vs)
        for k, s in enumerate(vs):
            assert mp4.read_sample(blob, k, info) == s

    def test_declared_count_past_box_end_is_valueerror(self):
        # stsz sample_count patched huge: ValueError, never struct.error
        blob = bytearray(mp4.build_mp4(64, 48, [b"abc", b"defg"]))
        stsz_at = blob.find(b"stsz")
        struct.pack_into(">I", blob, stsz_at + 12, 0xFFFFFF)
        with pytest.raises(ValueError, match="truncated stsz"):
            mp4.parse_mp4(bytes(blob))

    def test_missing_stsc_is_valueerror(self):
        # blank out the stsc box tag: incomplete table must raise, not
        # return n_samples>0 with an empty sample index
        blob = bytearray(mp4.build_mp4(64, 48, [b"abc", b"defg"]))
        stsc_at = blob.find(b"stsc")
        blob[stsc_at : stsc_at + 4] = b"free"
        with pytest.raises(ValueError, match="stsc"):
            mp4.parse_mp4(bytes(blob))

    def test_runaway_nesting_is_valueerror(self):
        # ~1000 nested trak headers in 8 KB: ValueError, not RecursionError
        inner = b""
        for _ in range(1000):
            inner = mp4._box(b"trak", inner)
        with pytest.raises(ValueError, match="nesting"):
            mp4.parse_mp4(mp4._box(b"moov", inner))

    def test_read_sample_reuses_parse(self):
        samples = [b"one", b"twotwo"]
        blob = mp4.build_mp4(64, 48, samples)
        info = mp4.parse_mp4(blob)
        assert mp4.read_sample(blob, 1, info) == b"twotwo"
        assert mp4.read_sample(blob, 0) == b"one"  # back-compat path


class TestSparkPath:
    def test_media_meta_mp3(self, spark):
        docs = spark.createDataFrame([(str(i),) for i in range(20)], "doc_id string")
        rows = multimodal.extract_mp3_meta(multimodal.synth_mp3_media(docs)).collect()
        assert len(rows) == 20
        for r in rows:
            frames = multimodal.synth_mp3_frames(r["media_ref"])
            brs = [mp3.BITRATES[bi] for bi, _p in frames]
            assert r["n_frames"] == len(frames)
            assert r["bitrate_sum"] == sum(brs)
            assert r["duration_ms"] == len(frames) * 1152 * 1000 // 44100
            assert r["is_cbr"] == (min(brs) == max(brs))

    def test_mp4_sample_index(self, spark):
        docs = spark.createDataFrame([(str(i),) for i in range(10)], "doc_id string")
        media = multimodal.synth_mp4_media(docs)
        idx = multimodal.mp4_sample_index(media).collect()
        by_ref = {}
        for r in idx:
            by_ref.setdefault(r["media_ref"], []).append(r)
        for ref, rows in by_ref.items():
            _w, _h, n, sizes = multimodal.synth_mp4_params(ref)
            rows.sort(key=lambda r: r["k"])
            assert len(rows) == n
            off = multimodal.MP4_CHUNK_OFFSET
            for k, r in enumerate(rows):
                assert (r["offset"], r["size"], r["t_ms"]) == (off, sizes[k], 40 * k)
                off += sizes[k]
