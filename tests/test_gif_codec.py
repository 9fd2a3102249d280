"""GIF LZW codec (functions/gif.py) + the multimodal decode path.

Lossless, so the driver-checked ``media_features_gif`` row gets the same
md5-chain SQL oracle shape as the PNG row; these tests pin the LZW
variable-width/dictionary/clear/interlace behavior the oracle row rides on.
"""

import random
import struct

import pytest

from web2llmstxt_spark.functions.gif import (
    _INTERLACE_PASSES,
    decode_gif,
    encode_gif,
)
from web2llmstxt_spark.operators import multimodal


def _gray_rgb(px: bytes) -> bytes:
    return bytes(v for p in px for v in (p, p, p))


class TestCodecRoundtrip:
    def test_random_sizes(self):
        rng = random.Random(7)
        for w, h in [(16, 16), (1, 1), (5, 13), (64, 3)]:
            px = bytes(rng.randrange(256) for _ in range(w * h))
            assert decode_gif(encode_gif(w, h, px)) == (w, h, 3, _gray_rgb(px))

    def test_dictionary_growth_and_reset(self):
        # 100x100 random crosses code widths 9->10->11->12; a long
        # compressible tail drives the table to 4096 and the clear-code path
        rng = random.Random(3)
        px = bytes(rng.randrange(256) for _ in range(100 * 100))
        assert decode_gif(encode_gif(100, 100, px))[3] == _gray_rgb(px)
        runs = bytes([7] * 5000 + [9] * 4000 + list(range(256)) * 4)
        assert decode_gif(encode_gif(1253, 8, runs))[3] == _gray_rgb(runs)

    def test_kwkwk_case(self):
        # aaaa... forces the code-equals-table-size branch immediately
        px = bytes([42] * 64)
        assert decode_gif(encode_gif(8, 8, px))[3] == _gray_rgb(px)

    def test_deterministic(self):
        px = multimodal.synth_gif_pixels("gmg-0")
        assert encode_gif(16, 16, px) == encode_gif(16, 16, px)


class TestForeignStreams:
    def test_gif89a_extensions_skipped(self):
        # wrap the encoder's image block in 89a graphic-control + comment
        # extensions, as real animated/transparent files carry
        px = multimodal.synth_gif_pixels("gmg-1")
        blob = encode_gif(16, 16, px)
        head, img = blob[:13 + 768], blob[13 + 768:-1]  # split at descriptor
        gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        com = b"\x21\xfe\x05hello\x00"
        patched = b"GIF89a" + head[6:] + gce + com + img + b"\x3b"
        assert decode_gif(patched) == (16, 16, 3, _gray_rgb(px))

    def test_interlaced(self):
        # hand-weave an interlaced variant of the encoder's output: rows
        # re-ordered into pass order + the interlace flag set
        px = multimodal.synth_gif_pixels("gmg-2")
        rows = [px[r * 16 : (r + 1) * 16] for r in range(16)]
        order = [r for first, step in _INTERLACE_PASSES
                 for r in range(first, 16, step)]
        woven = b"".join(rows[r] for r in order)
        blob = bytearray(encode_gif(16, 16, woven))
        desc_at = 13 + 768
        assert blob[desc_at] == 0x2C
        blob[desc_at + 9] |= 0x40  # set interlace flag
        assert decode_gif(bytes(blob)) == (16, 16, 3, _gray_rgb(px))

    def test_local_palette_wins(self):
        # image with a 2-entry LOCAL palette (inverted) over a global one
        w = h = 4
        idx = bytes([0, 1] * 8)
        out = bytearray(b"GIF87a") + struct.pack("<HH", w, h)
        out += bytes([0xF0, 0, 0]) + bytes(6)  # global: 2 entries, all black
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x80])  # local table flag, 2 entries
        out += bytes([10, 20, 30, 200, 210, 220])
        from web2llmstxt_spark.functions.gif import _lzw_encode

        payload = _lzw_encode(idx, 2)
        out.append(2)  # min code size
        out.append(len(payload))
        out += payload
        out += b"\x00\x3b"
        got = decode_gif(bytes(out))
        want = bytes(
            v
            for i in idx
            for v in ((10, 20, 30) if i == 0 else (200, 210, 220))
        )
        assert got == (4, 4, 3, want)

    def test_malformed_rejected(self):
        px = multimodal.synth_gif_pixels("gmg-3")
        blob = encode_gif(16, 16, px)
        with pytest.raises(ValueError, match="signature"):
            decode_gif(b"JUNK" + blob[4:])
        with pytest.raises(ValueError):
            decode_gif(blob[: len(blob) // 2])


class TestAnimation:
    def test_anim_roundtrip_with_delays(self):
        import random

        from web2llmstxt_spark.functions.gif import (
            decode_gif_frames,
            encode_gif_anim,
        )

        rng = random.Random(9)
        frames = [bytes(rng.randrange(256) for _ in range(12 * 10))
                  for _ in range(4)]
        out = decode_gif_frames(encode_gif_anim(12, 10, frames, delay_cs=7))
        assert (out["width"], out["height"]) == (12, 10)
        assert out["delays_cs"] == [7] * 4
        for k, f in enumerate(frames):
            assert out["frames"][k] == _gray_rgb(f)

    def test_subrect_composites_onto_canvas(self):
        # hand-build: full first frame, then a 4x3 patch at (2,1) — the
        # composited second frame must equal frame 1 with the rect painted
        import struct as _s

        from web2llmstxt_spark.functions.gif import (
            _GRAY_PALETTE,
            _image_block,
            decode_gif_frames,
        )

        base = bytes(range(0, 80))  # 10x8
        patch = bytes([200] * 12)  # 4x3
        out = bytearray(b"GIF89a") + _s.pack("<HH", 10, 8)
        out += bytes([0xF7, 0, 0]) + _GRAY_PALETTE
        out += _image_block(10, 8, base)
        patch_block = bytearray(_image_block(4, 3, patch))
        _s.pack_into("<HHHH", patch_block, 1, 2, 1, 4, 3)  # left=2, top=1
        out += patch_block + b"\x3b"
        dec = decode_gif_frames(bytes(out))
        want = bytearray(_gray_rgb(base))
        for r in range(3):
            for c in range(4):
                i = 3 * ((1 + r) * 10 + (2 + c))
                want[i : i + 3] = b"\xc8\xc8\xc8"
        assert dec["frames"][1] == bytes(want)
        assert dec["frames"][0] == _gray_rgb(base)

    def test_overflowing_subrect_rejected(self):
        # left+w past the canvas edge: must raise, never wrap into the next
        # row or grow the canvas on the last row
        import struct as _s

        from web2llmstxt_spark.functions.gif import (
            _GRAY_PALETTE,
            _image_block,
            decode_gif_frames,
        )

        base = bytes(range(0, 80))  # 10x8
        patch = bytes([200] * 12)  # 4x3
        for left, top in [(8, 1), (2, 6)]:
            out = bytearray(b"GIF89a") + _s.pack("<HH", 10, 8)
            out += bytes([0xF7, 0, 0]) + _GRAY_PALETTE
            out += _image_block(10, 8, base)
            pb = bytearray(_image_block(4, 3, patch))
            _s.pack_into("<HHHH", pb, 1, left, top, 4, 3)
            out += pb + b"\x3b"
            with pytest.raises(ValueError, match="outside canvas"):
                decode_gif_frames(bytes(out))

    def test_truncation_is_valueerror(self):
        # truncated header and mid-descriptor cuts: ValueError per the
        # documented loud-boundary contract, never struct.error
        blob = encode_gif(16, 16, multimodal.synth_gif_pixels("gmg-8"))
        with pytest.raises(ValueError, match="truncated"):
            decode_gif(b"GIF89a\x01\x00")
        desc_at = 13 + 768  # image descriptor offset
        with pytest.raises(ValueError, match="truncated"):
            decode_gif(blob[: desc_at + 4])

    def test_still_gif_is_one_frame(self):
        from web2llmstxt_spark.functions.gif import decode_gif_frames

        px = multimodal.synth_gif_pixels("gmg-5")
        out = decode_gif_frames(encode_gif(16, 16, px))
        assert len(out["frames"]) == 1 and out["delays_cs"] == [0]

    def test_extract_gif_frames_spark(self, spark):
        docs = spark.createDataFrame([(str(i),) for i in range(8)], "doc_id string")
        media = multimodal.synth_gif_anim_media(docs)
        rows = multimodal.extract_gif_frames(media).collect()
        by_ref = {}
        for r in rows:
            by_ref.setdefault(r["media_ref"], []).append(r)
        for ref, rs in by_ref.items():
            n = multimodal.synth_gif_anim_frames(ref)
            assert len(rs) == n
            for r in sorted(rs, key=lambda r: r["frame"]):
                px = multimodal.synth_gif_frame_pixels(ref, r["frame"])
                assert r["delay_cs"] == 4
                assert r["mean_luma"] == sum(1000 * v for v in px) / 65280000


class TestSparkPath:
    def test_media_features_gif_stats(self, spark):
        docs = spark.createDataFrame(
            [(str(i),) for i in range(20)], "doc_id string"
        )
        media = multimodal.synth_gif_media(docs)
        rows = multimodal.extract_image_features(media, decoder="gif").collect()
        assert len(rows) == 20
        for r in rows:
            px = multimodal.synth_gif_pixels(r["media_ref"])
            assert (r["width"], r["height"]) == (16, 16)
            assert r["mean_luma"] == sum(1000 * v for v in px) / 65280000
            for j in range(16):
                want = 3 * sum(1 for v in px if v >> 4 == j) / 768
                assert r["feat"][j] == want
