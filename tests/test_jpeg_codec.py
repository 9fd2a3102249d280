"""Baseline JPEG codec (functions/jpeg.py) + the lossy multimodal decode path.

The codec closes the last 'missing' multimodal decoder: blobs are real
baseline JFIF JPEGs (numpy DCT, Annex-K tables written into the stream),
decode happens inside mapInPandas, and the driver-checked
``media_features_jpeg`` row verifies encode->decode->stats against a DuckDB
twin end-to-end (exact, via the flat-block q=100 contract).
"""

import struct

import numpy as np
import pytest

from web2llmstxt_spark.functions import jpeg
from web2llmstxt_spark.functions.jpeg import decode_jpeg, encode_jpeg
from web2llmstxt_spark.operators import multimodal


def _err(a: bytes, b: bytes) -> int:
    x = np.frombuffer(a, dtype=np.uint8).astype(int)
    y = np.frombuffer(b, dtype=np.uint8).astype(int)
    return int(np.max(np.abs(x - y)))


class TestFlatBlockExactness:
    def test_every_gray_value_roundtrips_exactly(self):
        # 16x16 grid of flat 8x8 blocks covering ALL 256 gray values: the
        # q=100 DC-only contract the SQL oracle relies on, checked
        # exhaustively (also exercises 256 DC differentials + huffman).
        vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        blob = encode_jpeg(128, 128, img.tobytes(), channels=1, quality=100)
        w, h, ch, px = decode_jpeg(blob)
        assert (w, h, ch) == (128, 128, 1)
        assert px == img.tobytes()

    def test_synth_pixels_match_sql_derivation(self):
        ref = "jmg-17"
        import hashlib

        hexd = hashlib.md5(f"{ref}:j0".encode()).hexdigest()
        want = [int(hexd[2 * k : 2 * k + 2], 16) for k in range(4)]
        assert multimodal.synth_jpeg_block_values(ref) == want
        px = multimodal.synth_jpeg_pixels(ref)
        assert len(px) == 256
        assert px[0] == want[0] and px[8] == want[1]
        assert px[128] == want[2] and px[136] == want[3]
        # and the blob round-trips those bytes exactly
        blob = multimodal._synth_jpeg_blob(ref)
        assert decode_jpeg(blob) == (16, 16, 1, px)


class TestLossyRoundtrip:
    def test_gray_q100_near_exact(self):
        rng = np.random.default_rng(3)
        g = rng.integers(0, 256, size=(24, 21), dtype=np.uint8)
        blob = encode_jpeg(21, 24, g.tobytes(), channels=1, quality=100)
        w, h, ch, px = decode_jpeg(blob)
        assert (w, h, ch) == (21, 24, 1)
        assert _err(px, g.tobytes()) <= 2  # integer DCT round error only

    def test_color_444_q100_near_exact(self):
        rng = np.random.default_rng(5)
        c = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
        blob = encode_jpeg(19, 17, c.tobytes(), channels=3, quality=100,
                           subsampling="444")
        w, h, ch, px = decode_jpeg(blob)
        assert (w, h, ch) == (19, 17, 3)
        # color convert float round trip adds ±1 per channel on top of DCT
        assert _err(px, c.tobytes()) <= 3

    def test_color_420_smooth(self):
        yy, xx = np.mgrid[0:33, 0:31]
        sm = np.stack(
            [(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256], axis=-1
        ).astype(np.uint8)
        blob = encode_jpeg(31, 33, sm.tobytes(), channels=3, quality=90,
                           subsampling="420")
        w, h, ch, px = decode_jpeg(blob)
        assert (w, h, ch) == (31, 33, 3)
        out = np.frombuffer(px, dtype=np.uint8).astype(int)
        mean_err = float(np.mean(np.abs(out - sm.reshape(-1).astype(int))))
        assert mean_err < 6.0  # sawtooth wrap edges dominate; bulk is close

    def test_quality_monotonic(self):
        g = (np.arange(32 * 32) * 7 % 256).astype(np.uint8).reshape(32, 32)
        errs = []
        for q in (95, 75, 40):
            blob = encode_jpeg(32, 32, g.tobytes(), channels=1, quality=q)
            _, _, _, px = decode_jpeg(blob)
            x = np.frombuffer(px, dtype=np.uint8).astype(int)
            errs.append(float(np.mean(np.abs(x - g.reshape(-1).astype(int)))))
        assert errs == sorted(errs)  # lower quality -> larger mean error

    def test_deterministic_bytes(self):
        px = multimodal.synth_jpeg_pixels("jmg-0")
        assert (
            encode_jpeg(16, 16, px, channels=1, quality=100)
            == encode_jpeg(16, 16, px, channels=1, quality=100)
        )

    def test_odd_sizes_and_1x1(self):
        blob = encode_jpeg(1, 1, bytes([137]), channels=1, quality=100)
        assert decode_jpeg(blob) == (1, 1, 1, bytes([137]))
        rng = np.random.default_rng(11)
        odd = rng.integers(0, 256, size=(5, 13), dtype=np.uint8)
        blob = encode_jpeg(13, 5, odd.tobytes(), channels=1, quality=100)
        w, h, ch, px = decode_jpeg(blob)
        assert (w, h) == (13, 5) and _err(px, odd.tobytes()) <= 2


class TestStreamRobustness:
    def test_foreign_segments_skipped(self):
        # APP1/COM segments (what real camera files carry) must be skipped
        px = multimodal.synth_jpeg_pixels("jmg-3")
        blob = encode_jpeg(16, 16, px, channels=1, quality=100)
        com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
        app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
        patched = blob[:2] + app1 + com + blob[2:]
        assert decode_jpeg(patched) == (16, 16, 1, px)

    def test_restart_markers(self):
        # hand-assemble a DRI/RSTn stream: same 4 flat blocks, restart
        # interval 2 -> one RST0 between the two halves, DC preds reset
        px = multimodal.synth_jpeg_pixels("jmg-9")
        base = encode_jpeg(16, 16, px, channels=1, quality=100)
        # split the original entropy segment: re-encode the two halves
        vals = multimodal.synth_jpeg_block_values("jmg-9")
        q1 = jpeg.quality_scale(jpeg.QUANT_LUMA, 100)
        dc = jpeg._build_codes(*jpeg.DC_LUMA_SPEC)
        ac = jpeg._build_codes(*jpeg.AC_LUMA_SPEC)
        segs = []
        for half in (vals[:2], vals[2:]):
            w = jpeg._BitWriter()
            pred = 0
            for v in half:
                block = np.full((8, 8), float(v))
                pred = jpeg._encode_block(w, block, q1, dc, ac, pred)
            w.flush()
            segs.append(bytes(w.out))
        sos_at = base.find(b"\xff\xda")
        (sos_len,) = struct.unpack_from(">H", base, sos_at + 2)
        head = base[: sos_at + 2 + sos_len]
        dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)
        stream = (
            base[:sos_at] + dri + base[sos_at : sos_at + 2 + sos_len]
            + segs[0] + b"\xff\xd0" + segs[1] + b"\xff\xd9"
        )
        assert head  # silence unused warning path
        w_, h_, ch_, out = decode_jpeg(stream)
        assert (w_, h_, ch_) == (16, 16, 1)
        assert out == px

    def test_progressive_rejected(self):
        px = multimodal.synth_jpeg_pixels("jmg-4")
        blob = bytearray(encode_jpeg(16, 16, px, channels=1, quality=100))
        blob[blob.find(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2
        with pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg(bytes(blob))

    def test_truncated_and_garbage(self):
        px = multimodal.synth_jpeg_pixels("jmg-5")
        blob = encode_jpeg(16, 16, px, channels=1, quality=100)
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"JUNK" + blob)
        with pytest.raises(ValueError):
            decode_jpeg(blob[: len(blob) // 2])


class TestSparkPath:
    def test_media_features_jpeg_stats(self, spark):
        # end-to-end through the mapInPandas decode: stats equal the
        # flat-block derivation (the SQL oracle's arithmetic, in python)
        docs = spark.createDataFrame(
            [(str(i),) for i in range(20)], "doc_id string"
        )
        media = multimodal.synth_jpeg_media(docs)
        rows = multimodal.extract_image_features(media, decoder="jpeg").collect()
        assert len(rows) == 20
        for r in rows:
            vals = multimodal.synth_jpeg_block_values(r["media_ref"])
            assert (r["width"], r["height"]) == (16, 16)
            assert r["mean_luma"] == sum(64000 * v for v in vals) / 65280000
            for j in range(16):
                want = sum(64 for v in vals if v >> 4 == j) / 256
                assert r["feat"][j] == want
