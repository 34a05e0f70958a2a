"""Unit + property tests for the pure-stdlib RIFF/WAVE PCM codec."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_db_light_spark.functions.wav import (
    WavError,
    decode_wav,
    encode_wav,
    window_energy,
)


def test_roundtrip_16bit_mono():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    data = encode_wav(samples, sample_rate=8000)
    sr, ch, bits, out = decode_wav(data)
    assert (sr, ch, bits) == (8000, 1, 16)
    assert out == samples


def test_roundtrip_8bit_stereo():
    samples = [0, 255, 128, 7]  # 2 frames x 2 channels
    data = encode_wav(samples, sample_rate=44100, bits=8, channels=2)
    sr, ch, bits, out = decode_wav(data)
    assert (sr, ch, bits) == (44100, 2, 8)
    assert out == samples


def test_odd_sized_data_chunk_padding():
    # 3 bytes of 8-bit data -> odd chunk, encoder pads; decoder must not
    # swallow the pad into the sample stream
    data = encode_wav([1, 2, 3], bits=8)
    assert len(data) % 2 == 0
    _, _, _, out = decode_wav(data)
    assert out == [1, 2, 3]


def test_unknown_chunks_skipped():
    # splice a LIST chunk between fmt and data — real-world files do this
    base = encode_wav([100, -100], sample_rate=16000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr, ch, bits, out = decode_wav(spliced)
    assert (sr, out) == (16000, [100, -100])


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[:30], "truncated"),
        # format tag 3 = IEEE float
        (lambda b: b[:20] + b"\x03" + b[21:], "non-PCM"),
    ],
)
def test_malformed_inputs_raise_waverror(mutate, msg):
    data = encode_wav([5, 6, 7, 8])
    with pytest.raises(WavError, match=msg):
        decode_wav(mutate(data))


def test_window_energy_exact():
    assert window_energy([3, 4, 0, -5, 1, 1], 2) == [25, 25, 2]
    # trailing partial window dropped
    assert window_energy([7, 7, 7], 2) == [98]
    # extremes stay integer-exact
    assert window_energy([-32768, 32767], 2) == [32768**2 + 32767**2]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
    st.sampled_from([8000, 16000, 44100]),
)
def test_roundtrip_property_16bit(samples, sr):
    sr2, ch, bits, out = decode_wav(encode_wav(samples, sample_rate=sr))
    assert (sr2, ch, bits) == (sr, 1, 16)
    assert out == samples


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=2, max_size=64).filter(lambda s: len(s) % 2 == 0))
def test_roundtrip_property_8bit_stereo(samples):
    _, ch, bits, out = decode_wav(encode_wav(samples, bits=8, channels=2))
    assert (ch, bits) == (2, 8)
    assert out == samples
