"""Pure-stdlib RIFF/WAVE PCM codec, closing the audio-frontend stub.

The multimodal audio stage (reference analogue: the document pipeline's
per-format parser dispatch, ``document_processor.py``; audio itself is
beyond-reference training-pipeline surface) previously windowed raw
payload bytes through a hash stub. RIFF/WAVE PCM is a pure container
format — a four-byte-tagged chunk walk plus little-endian sample words —
so, like PNG (zlib + filters) and CFB/OLE2 before it, it is fully
decodable with the stdlib: no entropy coding, no codec.

Supported: canonical PCM (format tag 1), 8-bit unsigned or 16-bit
signed, any channel count (samples returned interleaved). Compressed
WAVE variants (IEEE float, ADPCM, extensible) raise :class:`WavError`
and land in the operator's per-row error column, never poisoning a
batch.

Decoded samples are EXACT integers, so downstream features (windowed
sum-of-squares energy) are BIGINT-exact and the DuckDB oracle replays
them arithmetically from the fixture's md5 sample formula — the same
decode-facts-carry-the-parity move as PNG/JPEG.
"""

from __future__ import annotations

import struct


class WavError(ValueError):
    """Malformed or unsupported WAVE input."""


def encode_wav(
    samples: list[int], sample_rate: int = 8000, bits: int = 16, channels: int = 1
) -> bytes:
    """Serialize interleaved integer samples to canonical RIFF/WAVE PCM.

    16-bit samples are signed [-32768, 32767]; 8-bit are unsigned
    [0, 255]. ``len(samples)`` must be a multiple of ``channels``."""
    if bits not in (8, 16):
        raise WavError(f"unsupported bit depth {bits}")
    if channels < 1 or len(samples) % channels:
        raise WavError("sample count not a multiple of channel count")
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = bytes(samples)
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks pad to even
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """(sample_rate, channels, bits, interleaved samples) from RIFF/WAVE
    PCM bytes. Walks the chunk list tolerantly (unknown chunks — LIST,
    fact, cue — are skipped; odd-sized chunks consume their pad byte),
    which is what real-world WAV files require."""
    try:
        return _decode_wav(data)
    except WavError:
        raise
    except (struct.error, IndexError, ValueError) as ex:
        raise WavError(f"{type(ex).__name__}: {ex}") from ex


def _decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WavError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # chunks pad to even
    if fmt is None or pcm is None:
        raise WavError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise WavError(f"non-PCM format tag {audio_format} unsupported")
    if bits not in (8, 16):
        raise WavError(f"unsupported bit depth {bits}")
    if channels < 1 or block_align != channels * (bits // 8):
        raise WavError("inconsistent fmt block alignment")
    if bits == 16:
        n = len(pcm) // 2
        samples = list(struct.unpack(f"<{n}h", pcm[: 2 * n]))
    else:
        samples = list(pcm)
    return sample_rate, channels, bits, samples


def window_energy(samples: list[int], window: int) -> list[int]:
    """Exact integer sum-of-squares energy per non-overlapping window of
    ``window`` samples (trailing partial window dropped — same contract
    as the byte-windowed stub it replaces). 32 samples x 32768^2 is
    well inside BIGINT, and integer summation has no float-order
    exposure, so the oracle reproduces it exactly."""
    if window < 1:
        raise WavError("window must be positive")
    return [
        sum(s * s for s in samples[i * window : (i + 1) * window])
        for i in range(len(samples) // window)
    ]
