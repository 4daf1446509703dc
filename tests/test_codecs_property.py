"""Property-based round-trip tests for the pure-numpy codecs: ANY
valid array must survive encode→decode bit-exactly, for every PNG
filter type and arbitrary MP4 sample tables.  Hypothesis drives the
shapes and contents; the deterministic synth tests elsewhere pin
specific values."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from bigdatamlteamrepo_spark.sources.codecs import (
    decode_png,
    decode_ppm,
    decode_wav,
    encode_mp4_skeleton,
    encode_png,
    encode_ppm,
    encode_wav,
    parse_mp4_frames,
    resize_rgb,
)

_rgb = arrays(
    np.uint8,
    st.tuples(
        st.integers(1, 24), st.integers(1, 24), st.sampled_from([3])
    ),
    elements=st.integers(0, 255),
)
_rgba = arrays(
    np.uint8,
    st.tuples(
        st.integers(1, 16), st.integers(1, 16), st.sampled_from([4])
    ),
    elements=st.integers(0, 255),
)


@settings(max_examples=40, deadline=None)
@given(img=_rgb, ft=st.integers(0, 4))
def test_png_rgb_roundtrip(img, ft):
    out = decode_png(encode_png(img, filter_type=ft))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=20, deadline=None)
@given(img=_rgba, ft=st.integers(0, 4))
def test_png_rgba_roundtrip(img, ft):
    out = decode_png(encode_png(img, filter_type=ft))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=40, deadline=None)
@given(img=_rgb)
def test_ppm_roundtrip(img):
    out = decode_ppm(encode_ppm(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=40, deadline=None)
@given(img=_rgb, max_side=st.integers(1, 32))
def test_resize_bounds_and_determinism(img, max_side):
    small = resize_rgb(img, max_side)
    assert max(small.shape[:2]) <= max(max_side, 1)
    assert small.dtype == np.uint8
    again = resize_rgb(img, max_side)
    assert (small == again).all()


@settings(max_examples=40, deadline=None)
@given(
    samples=arrays(
        np.int16,
        st.integers(1, 500),
        elements=st.integers(-(2**15), 2**15 - 1),
    ),
    rate=st.sampled_from([8_000, 16_000, 44_100]),
)
def test_wav_roundtrip(samples, rate):
    got, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate and (got == samples).all()


@settings(max_examples=40, deadline=None)
@given(
    deltas=st.lists(st.integers(1, 10_000), min_size=1, max_size=200),
    timescale=st.sampled_from([600, 1000, 90_000]),
    data=st.data(),
)
def test_mp4_sample_tables_roundtrip(deltas, timescale, data):
    sizes = data.draw(
        st.lists(
            st.integers(0, 5_000),
            min_size=len(deltas),
            max_size=len(deltas),
        )
    )
    d = np.array(deltas, dtype=np.uint32)
    s = np.array(sizes, dtype=np.uint32)
    dd, ss, ts = parse_mp4_frames(encode_mp4_skeleton(d, s, timescale))
    assert ts == timescale and (dd == d).all() and (ss == s).all()


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=1, max_size=400), min_size=1, max_size=12),
    timescale=st.integers(1, 90_000),
    data=st.data(),
)
def test_mp4_mjpeg_demux_roundtrip(payloads, timescale, data):
    """ANY list of opaque sample payloads survives the MJPEG container
    round-trip byte-exactly: encode_mp4_mjpeg → parse_mp4_frame_payloads
    recovers every sample and every duration (the demuxer never looks
    inside the samples, so arbitrary bytes exercise the stco/stsz walk
    harder than real JPEGs)."""
    from bigdatamlteamrepo_spark.sources.codecs import (
        encode_mp4_mjpeg,
        parse_mp4_frame_payloads,
    )

    deltas = np.array(
        data.draw(
            st.lists(
                st.integers(1, 5000),
                min_size=len(payloads),
                max_size=len(payloads),
            )
        ),
        dtype=np.uint32,
    )
    box = encode_mp4_mjpeg(payloads, deltas, timescale)
    d2, frames, ts = parse_mp4_frame_payloads(box)
    assert ts == timescale
    assert list(d2) == list(deltas)
    assert [bytes(f) for f in frames] == [bytes(p) for p in payloads]
