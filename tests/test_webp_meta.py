"""WebP container/header parsing (functions/webp.py) + the multimodal path.

Closes the webp entry of the no-ffmpeg gap at the container level: RIFF
walk and VP8/VP8L/VP8X header bit unpacking are REAL and driver-checked
(``media_meta_webp``); pixel decode stays the documented libwebp boundary.
"""

import struct

import pytest

from web2llmstxt_spark.functions.webp import build_webp, parse_webp
from web2llmstxt_spark.operators import multimodal


class TestHeaderParse:
    def test_all_variants(self):
        for v in ("vp8", "vp8l", "vp8x"):
            info = parse_webp(build_webp(320, 240, v))
            assert info["variant"] == v
            assert (info["width"], info["height"]) == (320, 240)

    def test_vp8l_alpha_bit(self):
        assert parse_webp(build_webp(10, 10, "vp8l", alpha=True))["has_alpha"]
        assert not parse_webp(build_webp(10, 10, "vp8l"))["has_alpha"]

    def test_vp8l_dimension_bits(self):
        # 14-bit fields straddle byte boundaries: exercise LSB-first unpack
        for w, h in [(1, 1), (16383, 1), (1, 16383), (5000, 12000)]:
            info = parse_webp(build_webp(w, h, "vp8l"))
            assert (info["width"], info["height"]) == (w, h)

    def test_vp8x_animation(self):
        info = parse_webp(build_webp(100, 80, "vp8x", alpha=True, n_frames=3))
        assert info["is_animated"] and info["n_frames"] == 3
        assert info["has_alpha"]
        still = parse_webp(build_webp(100, 80, "vp8x"))
        assert not still["is_animated"] and still["n_frames"] == 0

    def test_odd_chunk_padding(self):
        # VP8L body is 5 + payload bytes; force an odd payload so the RIFF
        # even-alignment path runs and later chunks still parse
        blob = build_webp(30, 20, "vp8l", payload_len=63)
        assert parse_webp(blob)["width"] == 30

    def test_malformed_rejected(self):
        with pytest.raises(ValueError, match="RIFF"):
            parse_webp(b"JUNK" + build_webp(10, 10)[4:])
        blob = bytearray(build_webp(10, 10, "vp8"))
        blob[20] ^= 0xFF  # clobber the start-code region
        with pytest.raises(ValueError):
            parse_webp(bytes(blob))
        # interframe (non-key) VP8 chunk: no dimensions to read
        frame_tag_at = blob.find(b"VP8 ") + 8
        blob = bytearray(build_webp(10, 10, "vp8"))
        blob[frame_tag_at] |= 1
        with pytest.raises(ValueError, match="interframe"):
            parse_webp(bytes(blob))

    def test_short_vp8x_is_valueerror(self):
        # a VP8X chunk truncated to flags-only must raise, not silently
        # parse as 1x1 (and an empty one must not IndexError)
        import struct as _s

        for short in (b"", b"\x00\x00\x00\x00"):
            chunk = b"VP8X" + _s.pack("<I", len(short)) + short
            blob = b"RIFF" + _s.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
            with pytest.raises(ValueError, match="VP8X"):
                parse_webp(blob)


class TestSparkPath:
    def test_media_meta_webp(self, spark):
        docs = spark.createDataFrame([(str(i),) for i in range(30)], "doc_id string")
        rows = multimodal.extract_webp_meta(
            multimodal.synth_webp_media(docs)
        ).collect()
        assert len(rows) == 30
        variants = set()
        for r in rows:
            variant, w, h, alpha, n = multimodal.synth_webp_params(r["media_ref"])
            assert r["variant"] == variant
            assert (r["width"], r["height"]) == (w, h)
            assert r["has_alpha"] == alpha
            assert r["n_frames"] == n and r["is_animated"] == (n > 0)
            variants.add(variant)
        assert variants == {"vp8", "vp8l", "vp8x"}  # all three exercised
