"""Stdlib PNG codec (functions/png.py) + the real multimodal decode path.

The codec replaces the round-3 'plumbing-only' multimodal stub: blobs are
real PNGs (cycling row filters => every unfilter path exercised), decode
happens inside the mapInPandas, and the driver-checked ``media_features``
row verifies encode->decode->stats against a DuckDB twin end-to-end.
"""

import random
import struct
import zlib

import pytest

from web2llmstxt_spark.functions.png import decode_png, encode_png
from web2llmstxt_spark.operators import multimodal


class TestCodecRoundtrip:
    def test_all_filters_all_color_types(self):
        rng = random.Random(7)
        for w, h, ct in [(8, 8, 2), (5, 7, 2), (1, 1, 2), (16, 3, 0), (4, 9, 6)]:
            ch = {0: 1, 2: 3, 6: 4}[ct]
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            for filters in (None, [0] * h, [1] * h, [2] * h, [3] * h, [4] * h):
                blob = encode_png(w, h, px, ct, filters)
                assert decode_png(blob) == (w, h, ch, px), (w, h, ct, filters)

    def test_default_filters_cycle(self):
        # an 8-row image under the default cycling policy hits filters 0..4
        px = multimodal.synth_png_pixels("img-42")
        blob = encode_png(8, 8, px)
        raw = zlib.decompress(_idat(blob))
        stride = 8 * 3
        assert [raw[y * (stride + 1)] for y in range(8)] == [0, 1, 2, 3, 4, 0, 1, 2]
        assert decode_png(blob)[3] == px

    def test_signature_and_crc_verified(self):
        blob = encode_png(4, 4, bytes(48))
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"JUNK" + blob[4:])
        corrupted = bytearray(blob)
        corrupted[20] ^= 0xFF  # inside IHDR data
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(corrupted))

    def test_unsupported_variants_fail_loudly(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlaced
        sig = b"\x89PNG\r\n\x1a\n"
        chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(sig + chunk)
        with pytest.raises(KeyError):
            encode_png(2, 2, bytes(4), color_type=3)  # palette unsupported


def _idat(blob: bytes) -> bytes:
    pos, out = 8, b""
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        if tag == b"IDAT":
            out += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    return out


class TestRealDecodeInSpark:
    def test_synth_media_features_match_local_stats(self, spark):
        """decoder='png' stats must equal stats computed directly from the
        known pixel bytes — i.e. the PNG round trip inside mapInPandas is
        lossless and width/height come from the parsed IHDR."""
        docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
        media = multimodal.synth_media(docs)
        rows = {r.media_ref: r for r in
                multimodal.extract_image_features(media, decoder="png").collect()}
        assert len(rows) == 7
        for i in range(7):
            ref = f"img-{i}"
            px = multimodal.synth_png_pixels(ref)
            r = rows[ref]
            assert (r.width, r.height) == (8, 8)
            bins = [0] * 16
            for b in px:
                bins[b >> 4] += 1
            assert r.feat == [n / 192 for n in bins]
            luma = sum(
                299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]
                for i in range(0, 192, 3)
            )
            assert r.mean_luma == luma / (255 * 1000 * 64)

    def test_fake_decoder_still_available(self, spark):
        docs = spark.createDataFrame([(1,)], "doc_id long")
        media = multimodal.synth_media(docs)
        r = multimodal.extract_image_features(media, decoder="fake").collect()[0]
        assert r.width is None and len(r.feat) == 16

    def test_corrupt_blob_fails_loudly(self, spark):
        media = spark.createDataFrame(
            [("d1", "m1", "image", b"not a png", None)], multimodal.MEDIA
        )
        with pytest.raises(Exception, match="not a PNG"):
            multimodal.extract_image_features(media, decoder="png").collect()
