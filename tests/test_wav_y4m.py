"""Stdlib WAV + YUV4MPEG2 codecs (functions/wav.py, functions/y4m.py) and
the real multimodal audio/video paths.

These complete the media triple started by the PNG codec: audio blobs are
real RIFF/WAVE files (with a planted LIST chunk => the decoder's chunk-walk
is exercised), video blobs are real .y4m streams (extension tokens +
per-frame params => the parser can't assume bare headers), decode happens
inside mapInPandas, and the driver-checked ``audio_features`` /
``video_frames`` rows verify encode->decode->stats against DuckDB twins.
"""

import random
import struct

import pytest

from web2llmstxt_spark.functions.wav import decode_wav, encode_wav
from web2llmstxt_spark.functions.y4m import decode_y4m, encode_y4m
from web2llmstxt_spark.operators import multimodal


class TestWavCodec:
    def test_roundtrip_16bit_mono(self):
        rng = random.Random(7)
        samples = [rng.randrange(-32768, 32768) for _ in range(300)]
        blob = encode_wav(8000, 1, 16, struct.pack("<300h", *samples))
        assert decode_wav(blob) == (8000, 1, 16, samples)

    def test_roundtrip_16bit_stereo(self):
        rng = random.Random(8)
        samples = [rng.randrange(-32768, 32768) for _ in range(64)]
        blob = encode_wav(44100, 2, 16, struct.pack("<64h", *samples))
        rate, ch, bits, got = decode_wav(blob)
        assert (rate, ch, bits) == (44100, 2, 16) and got == samples

    def test_roundtrip_8bit_odd_length_padded(self):
        # 8-bit mono, odd byte count: RIFF word-alignment pad must not leak
        payload = bytes(range(251))
        blob = encode_wav(11025, 1, 8, payload)
        assert decode_wav(blob) == (11025, 1, 8, list(payload))

    def test_list_chunk_is_skipped(self):
        # planted LIST sits BETWEEN fmt and data; a decoder that assumes
        # data follows fmt reads garbage
        blob = encode_wav(8000, 1, 16, struct.pack("<2h", -5, 7))
        assert b"LIST" in blob
        assert decode_wav(blob)[3] == [-5, 7]
        bare = encode_wav(8000, 1, 16, struct.pack("<2h", -5, 7),
                          plant_list_chunk=False)
        assert b"LIST" not in bare
        assert decode_wav(bare)[3] == [-5, 7]

    @pytest.mark.parametrize(
        "mutate,msg",
        [
            (lambda b: b"JUNK" + b[4:], "not a RIFF"),
            (lambda b: b[:-3], "overruns|truncated"),
            (lambda b: b.replace(struct.pack("<HH", 1, 1),
                                 struct.pack("<HH", 3, 1), 1), "audio format"),
        ],
    )
    def test_loud_failures(self, mutate, msg):
        blob = encode_wav(8000, 1, 16, struct.pack("<4h", 1, -2, 3, -4))
        with pytest.raises(ValueError, match=msg):
            decode_wav(mutate(blob))

    def test_encode_rejects_partial_frames(self):
        with pytest.raises(ValueError, match="whole frames"):
            encode_wav(8000, 2, 16, b"\x00" * 6)  # 1.5 stereo frames
        with pytest.raises(ValueError, match="bits"):
            encode_wav(8000, 1, 24, b"\x00" * 6)


class TestY4mCodec:
    def test_roundtrip_mono(self):
        rng = random.Random(9)
        frames = [bytes(rng.randrange(256) for _ in range(8 * 8)) for _ in range(5)]
        blob = encode_y4m(8, 8, (4, 1), frames, cspace="mono")
        assert decode_y4m(blob) == (8, 8, (4, 1), "mono", frames)

    def test_roundtrip_420(self):
        rng = random.Random(10)
        fsize = 6 * 4 * 3 // 2
        frames = [bytes(rng.randrange(256) for _ in range(fsize)) for _ in range(3)]
        blob = encode_y4m(6, 4, (30, 1), frames, cspace="420")
        assert decode_y4m(blob) == (6, 4, (30, 1), "420", frames)

    def test_per_frame_params_and_x_tokens_skipped(self):
        frames = [bytes(64), bytes(range(64))]
        blob = encode_y4m(8, 8, (25, 1), frames)
        assert b"XW2LST" in blob and b"FRAME Xi1\n" in blob
        assert decode_y4m(blob)[4] == frames

    @pytest.mark.parametrize(
        "blob,msg",
        [
            (b"NOTY4M W8 H8 F4:1\n", "not a YUV4MPEG2"),
            (b"YUV4MPEG2 W8 H8\n", "missing W/H/F"),
            (b"YUV4MPEG2 W8 H8 F4:1 C444\n", "unsupported colorspace"),
            (b"YUV4MPEG2 W8 H8 F4:1 Cmono\nFRAME\n" + bytes(63), "want 64 bytes"),
            (b"YUV4MPEG2 W8 H8 F4:1 Cmono\nJUNK\n" + bytes(64), "expected FRAME"),
        ],
    )
    def test_loud_failures(self, blob, msg):
        with pytest.raises(ValueError, match=msg):
            decode_y4m(blob)


class TestSparkPaths:
    def _docs(self, spark, n=12):
        return spark.createDataFrame([(i, f"t{i}") for i in range(n)],
                                     "doc_id long, text string")

    def test_audio_features_match_pure_python(self, spark):
        media = multimodal.synth_audio(self._docs(spark))
        got = {r.media_ref: r for r in
               multimodal.extract_audio_features(media).collect()}
        assert len(got) == 12
        for i in range(12):
            ref = f"wav-{i}"
            payload = multimodal.synth_wav_payload(ref)
            samples = struct.unpack(f"<{len(payload) // 2}h", payload)
            r = got[ref]
            assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 1, 128)
            assert r.duration_ms == 16
            assert r.peak_abs == max(abs(s) for s in samples)
            assert r.mean_abs == sum(abs(s) for s in samples) / (32768 * 128)
            assert r.zero_crossings == sum(
                (samples[k] < 0) != (samples[k - 1] < 0) for k in range(1, 128)
            )

    def test_video_frames_match_pure_python(self, spark):
        media = multimodal.synth_video(self._docs(spark))
        rows = multimodal.extract_video_frames(media, every_ms=500).collect()
        by_ref = {}
        for r in rows:
            by_ref.setdefault(r.media_ref, []).append(r)
        assert len(by_ref) == 12
        for i in range(12):
            ref = f"y4m-{i}"
            nf = 4 + i % 3
            dur = nf * 250
            want_ts = list(range(0, dur, 500))
            got = sorted(by_ref[ref], key=lambda r: r.ts_ms)
            assert [r.ts_ms for r in got] == want_ts
            frames = multimodal.synth_y4m_frames(ref, nf)
            for r in got:
                fidx = r.ts_ms * 4 // 1000
                assert r.frame_idx == fidx
                assert r.mean_luma == sum(frames[fidx]) / (255 * 64)

    def test_nonstub_decoders_raise(self, spark):
        media = multimodal.synth_audio(self._docs(spark, 2))
        with pytest.raises(NotImplementedError, match="production"):
            multimodal.extract_audio_features(media, decoder="mp3")
        with pytest.raises(NotImplementedError, match="production"):
            multimodal.extract_video_frames(media, decoder="mp4")
