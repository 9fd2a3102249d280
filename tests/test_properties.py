"""Property-based tests (hypothesis) for the pure kernels and codecs.

These run WITHOUT a SparkSession — they pin the driver-side Python kernels
and the stdlib codecs over randomized inputs, complementing the
example-based parity tests (SURVEY §5: the reference's own test strategy is
example-based; property tests harden the from-scratch pieces the reference
never had, the codecs above all)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from web2llmstxt_spark.functions import kernels, png, wav, y4m

# ------------------------------------------------------------------ codecs


@given(
    width=st.integers(1, 24),
    height=st.integers(1, 24),
    color_type=st.sampled_from([0, 2]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip(width, height, color_type, data):
    ch = 1 if color_type == 0 else 3
    n = width * height * ch
    pixels = data.draw(st.binary(min_size=n, max_size=n))
    w, h, got_ch, out = png.decode_png(png.encode_png(width, height, pixels, color_type))
    assert (w, h, got_ch) == (width, height, ch)
    assert out == pixels  # every scanline filter type unfilters exactly


@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    n_channels=st.integers(1, 2),
    bits=st.sampled_from([8, 16]),
    n_frames=st.integers(1, 64),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip(rate, n_channels, bits, n_frames, data):
    block = n_channels * bits // 8
    n = n_frames * block
    payload = data.draw(st.binary(min_size=n, max_size=n))
    got_rate, got_ch, got_bits, samples = wav.decode_wav(
        wav.encode_wav(rate, n_channels, bits, payload)
    )
    assert (got_rate, got_ch, got_bits) == (rate, n_channels, bits)
    assert len(samples) == n_frames * n_channels
    # re-encode the decoded samples: byte-identical payload
    if bits == 8:
        again = bytes(s for s in samples)
    else:
        import struct

        again = b"".join(struct.pack("<h", s) for s in samples)
    assert again == payload


@given(
    width=st.integers(2, 16).map(lambda x: x * 2),  # 420 needs even dims
    height=st.integers(2, 16).map(lambda x: x * 2),
    cspace=st.sampled_from(["mono", "420"]),
    n_frames=st.integers(1, 6),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_y4m_roundtrip(width, height, cspace, n_frames, data):
    size = width * height if cspace == "mono" else width * height * 3 // 2
    frames = [
        data.draw(st.binary(min_size=size, max_size=size))
        for _ in range(n_frames)
    ]
    w, h, _fps, got_cs, got = y4m.decode_y4m(
        y4m.encode_y4m(width, height, (25, 1), frames, cspace)
    )
    assert (w, h) == (width, height)
    assert got_cs == cspace  # decoder normalizes C420jpeg -> "420"
    assert got == frames


# ------------------------------------------------------------------ kernels

_url_path = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_/.", min_size=0, max_size=30
)


@given(host=st.sampled_from(["ex.example", "EX.Example", "a.b.example"]),
       path=_url_path,
       frag=st.sampled_from(["", "#x", "#section-2"]))
@settings(max_examples=60, deadline=None)
def test_normalize_url_idempotent(host, path, frag):
    """normalize(normalize(u)) == normalize(u) — the URL-seen set's identity
    function must be a projection, or the anti-join would leak re-fetches."""
    u = f"https://{host}/{path}{frag}"
    once = kernels.normalize_url(u)
    assert kernels.normalize_url(once) == once


@given(st.text(max_size=200))
@settings(max_examples=60, deadline=None)
def test_word_count_non_negative_and_split_stable(text):
    wc = kernels.word_count(text)
    assert wc >= 0
    # pinned ASCII class: counting is join-stable on single spaces
    tokens = [t for t in text.split(" ") if t]
    rejoined = " ".join(tokens)
    assert kernels.word_count(rejoined) == kernels.word_count(rejoined + "")
