"""Corrupt-input contract sweep for the wire parsers (the network twin
of tests/test_codec_fuzz.py): msgpacklite, hpacklite, and protowire
parse untrusted socket bytes, and their server loops catch ValueError —
anything else escaping would kill a connection thread instead of
producing a protocol error.  The r11 hardening (truncation bounds,
MAX_DEPTH, reserved-byte rejection) made these ValueError-only; this
sweep keeps them that way."""

import random

import pytest

from marketstore_spark import hpacklite, msgpacklite, protowire

_MP_VALID = msgpacklite.packb(
    {"a": [1, 2.5, "x", b"y", None, True], "n": {"k": -7}}
)
_HP_VALID = hpacklite.Encoder().encode(
    [(":status", "200"), ("content-type", "application/grpc"),
     ("x-custom", "abcdef0123456789")]
)


def _mutants(blob: bytes, seed: int, trials: int):
    rng = random.Random(seed)
    for _ in range(trials):
        b = bytearray(blob)
        mode = rng.randrange(3)
        if mode in (0, 2):
            b = b[: rng.randrange(len(b) or 1)]
        if mode in (1, 2):
            for _ in range(rng.randrange(1, 6)):
                if b:
                    b[rng.randrange(len(b))] = rng.randrange(256)
        yield bytes(b)


def test_msgpack_corrupt_inputs_raise_valueerror_only():
    bad = set()
    for m in _mutants(_MP_VALID, 11, 1500):
        try:
            msgpacklite.unpackb(m)
        except ValueError:
            pass
        except Exception as ex:  # noqa: BLE001
            bad.add(type(ex).__name__)
    assert not bad, bad


def test_hpack_corrupt_inputs_raise_valueerror_only():
    bad = set()
    for m in _mutants(_HP_VALID, 12, 1500):
        try:
            hpacklite.Decoder().decode(m)
        except ValueError:
            pass
        except Exception as ex:  # noqa: BLE001
            bad.add(type(ex).__name__)
    assert not bad, bad


@pytest.mark.parametrize("name", sorted(protowire.MESSAGES))
def test_protowire_corrupt_inputs_raise_valueerror_only(name):
    bad = set()
    for m in _mutants(_MP_VALID, hash(name) & 0xFFFF, 200):
        try:
            protowire.decode(name, m)
        except ValueError:
            pass
        except Exception as ex:  # noqa: BLE001
            bad.add(type(ex).__name__)
    assert not bad, f"{name}: {bad}"
