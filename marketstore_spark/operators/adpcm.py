"""IMA (DVI4) and Microsoft ADPCM codecs — pure stdlib + numpy.

The two 4-bit ADPCM families are the compressed WAV forms wild
corpora actually contain (WAVE_FORMAT_ADPCM 0x0002 and
WAVE_FORMAT_IMA_ADPCM 0x0011 — telephony archives, game assets, old
recorders), and until now the repo's decode_wav fenced them.  Both are
tiny, fully-public specs: IMA ADPCM per the IMA Digital Audio Pocket
Guide / RFC 3551 §4.5.1 (DVI4), MS ADPCM per the Microsoft WAV RIFF
registration (the 7-entry coefficient + 16-entry adaptation tables).

Validation (the G.711 precedent, multimodal.py): the IMA step
recurrence is pinned against CPython's ``audioop.adpcm2lin`` — an
independent C implementation of the same IMA algorithm — on random
nibble streams, and both codecs pin decode(encode(x)) BITWISE against
the encoder's own reconstruction (ADPCM encoders must track the
decoder's state, so the reconstruction IS the decode).  Block
structure (headers, nibble order, channel interleave) is exercised
mono AND stereo across block boundaries.

Everything is a serial integer recurrence per channel — Python loops,
fine for clip-scale payloads inside an Arrow batch; the 100 TB seam is
the same ``decoder=`` swap as the rest of the codec family.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------
# IMA ADPCM (DVI4): 89-entry step table + 8-entry index adaptation
# ---------------------------------------------------------------------

IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _clamp16(x: int) -> int:
    return -32768 if x < -32768 else (32767 if x > 32767 else x)


def ima_decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA step: (new_pred, new_index).  The canonical bit-serial
    difference expansion — diff = (2·magnitude + 1) · step / 8 computed
    with the spec's shift ladder so rounding matches every conformant
    implementation (incl. CPython's audioop, which tests pin)."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = _clamp16(pred - diff if nibble & 8 else pred + diff)
    index = index + IMA_INDEX_TABLE[nibble & 7]
    return pred, max(0, min(88, index))


def ima_encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Quantize one sample: (nibble, new_pred, new_index) — new_pred is
    the DECODER's reconstruction, which the encoder must track."""
    step = IMA_STEP_TABLE[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    pred, index = ima_decode_nibble(nibble, pred, index)
    return nibble, pred, index


# -- WAV block form (WAVE_FORMAT_IMA_ADPCM 0x0011) ---------------------
#
# Each block: per channel a 4-byte header (predictor int16 LE — which
# IS the first output sample — index u8, reserved u8), then the data
# area in 4-byte-per-channel interleaved groups, LOW nibble first.


def ima_wav_samples_per_block(block_align: int, nch: int) -> int:
    if block_align < 4 * nch or (block_align - 4 * nch) % (4 * nch):
        raise ValueError("IMA ADPCM block_align inconsistent with channels")
    return (block_align - 4 * nch) * 2 // nch + 1


def decode_ima_wav(data: bytes, nch: int, block_align: int) -> "np.ndarray":
    """IMA ADPCM data chunk → (n, nch) int16."""
    if nch < 1 or block_align <= 0:
        raise ValueError("bad IMA ADPCM geometry")
    spb = ima_wav_samples_per_block(block_align, nch)
    out = []
    for bs in range(0, len(data) - block_align + 1, block_align):
        block = data[bs : bs + block_align]
        preds, idxs, chans = [], [], []
        for c in range(nch):
            pred, index, _rsv = struct.unpack_from("<hBB", block, c * 4)
            if index > 88:
                raise ValueError("IMA ADPCM step index out of range")
            preds.append(pred)
            idxs.append(index)
            chans.append([pred])
        pos = 4 * nch
        # data area: 4 bytes per channel, round-robin
        while pos + 4 * nch <= len(block):
            for c in range(nch):
                word = block[pos : pos + 4]
                pos += 4
                pred, index = preds[c], idxs[c]
                for byte in word:
                    for nib in (byte & 0xF, byte >> 4):  # low nibble first
                        pred, index = ima_decode_nibble(nib, pred, index)
                        chans[c].append(pred)
                preds[c], idxs[c] = pred, index
        block_out = np.zeros((spb, nch), np.int16)
        for c in range(nch):
            block_out[:, c] = chans[c][:spb]
        out.append(block_out)
    if not out:
        raise ValueError("IMA ADPCM data shorter than one block")
    return np.concatenate(out)


def encode_ima_wav(
    samples: "np.ndarray", block_align: int = 0
) -> tuple[bytes, int, int]:
    """(n,) or (n, nch) int16 → (data chunk, block_align,
    samples_per_block).  The step index carries across blocks (the
    standard encoder behavior); each block header re-anchors the
    predictor at the true first sample, so damage never propagates
    past a block."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if n < 1:
        raise ValueError("empty clip")
    if not block_align:
        block_align = 4 * nch + 252 * nch  # 505 samples/block, the usual size
    spb = ima_wav_samples_per_block(block_align, nch)
    # pad the tail block by repeating the last sample (decoders trim by
    # the fact chunk; decode_wav returns whole blocks, tests trim)
    pad = (-(n - 0)) % spb if n % spb else 0
    if n % spb:
        arr = np.vstack([arr, np.repeat(arr[-1:], pad, 0)])
    idxs = [0] * nch
    out = bytearray()
    for bs in range(0, len(arr), spb):
        block = arr[bs : bs + spb]
        preds = []
        for c in range(nch):
            preds.append(int(block[0, c]))
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibs: list[list[int]] = [[] for _ in range(nch)]
        for i in range(1, spb):
            for c in range(nch):
                nib, preds[c], idxs[c] = ima_encode_sample(
                    int(block[i, c]), preds[c], idxs[c]
                )
                nibs[c].append(nib)
        # pad each channel's nibble run to a multiple of 8 (4 bytes)
        for c in range(nch):
            while len(nibs[c]) % 8:
                nibs[c].append(0)
        groups = len(nibs[0]) // 8
        for g in range(groups):
            for c in range(nch):
                run = nibs[c][g * 8 : g * 8 + 8]
                for k in range(0, 8, 2):
                    out.append(run[k] | (run[k + 1] << 4))  # low nibble first
    return bytes(out), block_align, spb


# ---------------------------------------------------------------------
# Microsoft ADPCM (WAVE_FORMAT_ADPCM 0x0002)
# ---------------------------------------------------------------------

MS_COEFFS = ((256, 0), (512, -256), (0, 64), (192, 64), (240, 0),
             (460, -208), (392, -232))
MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
            768, 614, 512, 409, 307, 230, 230, 230)


def ms_samples_per_block(block_align: int, nch: int) -> int:
    if block_align < 7 * nch:
        raise ValueError("MS ADPCM block_align inconsistent with channels")
    return 2 + (block_align - 7 * nch) * 2 // nch


def _ms_step(nib: int, s1: int, s2: int, delta: int, c1: int, c2: int):
    signed = nib - 16 if nib >= 8 else nib
    pred = _clamp16(((s1 * c1 + s2 * c2) >> 8) + signed * delta)
    delta = max(16, (MS_ADAPT[nib] * delta) >> 8)
    return pred, delta


def decode_ms_adpcm(data: bytes, nch: int, block_align: int) -> "np.ndarray":
    """MS ADPCM data chunk → (n, nch) int16."""
    if nch < 1 or block_align <= 0:
        raise ValueError("bad MS ADPCM geometry")
    spb = ms_samples_per_block(block_align, nch)
    out = []
    for bs in range(0, len(data) - block_align + 1, block_align):
        block = data[bs : bs + block_align]
        pos = 0
        pidx = []
        for _c in range(nch):
            p = block[pos]
            pos += 1
            if p >= len(MS_COEFFS):
                raise ValueError("MS ADPCM predictor index out of range")
            pidx.append(p)
        deltas = list(struct.unpack_from(f"<{nch}h", block, pos))
        pos += 2 * nch
        s1 = list(struct.unpack_from(f"<{nch}h", block, pos))
        pos += 2 * nch
        s2 = list(struct.unpack_from(f"<{nch}h", block, pos))
        pos += 2 * nch
        chans = [[s2[c], s1[c]] for c in range(nch)]
        c1 = [MS_COEFFS[p][0] for p in pidx]
        c2 = [MS_COEFFS[p][1] for p in pidx]
        ch = 0
        for byte in block[pos:]:
            for nib in (byte >> 4, byte & 0xF):  # HIGH nibble first
                pred, deltas[ch] = _ms_step(
                    nib, s1[ch], s2[ch], deltas[ch], c1[ch], c2[ch]
                )
                s2[ch], s1[ch] = s1[ch], pred
                chans[ch].append(pred)
                ch = (ch + 1) % nch
        block_out = np.zeros((spb, nch), np.int16)
        for c in range(nch):
            block_out[:, c] = chans[c][:spb]
        out.append(block_out)
    if not out:
        raise ValueError("MS ADPCM data shorter than one block")
    return np.concatenate(out)


def encode_ms_adpcm(
    samples: "np.ndarray", block_align: int = 0
) -> tuple[bytes, int, int]:
    """(n,) or (n, nch) int16 → (data chunk, block_align,
    samples_per_block).  Per block the predictor is chosen best-of-7
    by reconstruction error (what real encoders do), the initial delta
    from the block's mean step — both stored in the header, so decode
    needs no convention beyond the spec."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if n < 2:
        raise ValueError("MS ADPCM needs at least 2 samples")
    if not block_align:
        block_align = 7 * nch + 249 * nch  # 500 samples/block
    spb = ms_samples_per_block(block_align, nch)
    if n % spb:
        arr = np.vstack([arr, np.repeat(arr[-1:], spb - n % spb, 0)])
    out = bytearray()
    for bs in range(0, len(arr), spb):
        block = arr[bs : bs + spb].astype(np.int64)
        best = None
        for p, (c1, c2) in enumerate(MS_COEFFS):
            err = int(
                np.abs(
                    block[2:] - ((block[1:-1] * c1 + block[:-2] * c2) >> 8)
                ).sum()
            )
            if best is None or err < best[0]:
                best = (err, p)
        pidx = [best[1]] * nch
        init_delta = []
        for c in range(nch):
            d = int(np.abs(np.diff(block[: min(len(block), 50), c])).mean() or 16)
            init_delta.append(max(16, min(32767, d)))
        # header
        for c in range(nch):
            out.append(pidx[c])
        deltas = list(init_delta)
        out += struct.pack(f"<{nch}h", *deltas)
        out += struct.pack(f"<{nch}h", *[int(block[1, c]) for c in range(nch)])
        out += struct.pack(f"<{nch}h", *[int(block[0, c]) for c in range(nch)])
        s1 = [int(block[1, c]) for c in range(nch)]
        s2 = [int(block[0, c]) for c in range(nch)]
        c1 = [MS_COEFFS[p][0] for p in pidx]
        c2 = [MS_COEFFS[p][1] for p in pidx]
        nibs = []
        for i in range(2, spb):
            for c in range(nch):
                base = (s1[c] * c1[c] + s2[c] * c2[c]) >> 8
                diff = int(block[i, c]) - base
                q = diff // deltas[c] if diff >= 0 else -((-diff) // deltas[c])
                q = max(-8, min(7, q))
                nib = q + 16 if q < 0 else q
                pred, deltas[c] = _ms_step(
                    nib, s1[c], s2[c], deltas[c], c1[c], c2[c]
                )
                s2[c], s1[c] = s1[c], pred
                nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for k in range(0, len(nibs), 2):
            out.append((nibs[k] << 4) | nibs[k + 1])
    return bytes(out), block_align, spb


# ---------------------------------------------------------------------
# QuickTime 'ima4' packets (MP4/MOV 'soun' tracks): 34-byte packets of
# 2-byte BE state preamble (predictor high 9 bits | step index low 7)
# + 32 data bytes = 64 samples, LOW nibble first; stereo round-robins
# whole packets per channel.
# ---------------------------------------------------------------------

IMA_QT_PACKET = 34
IMA_QT_SAMPLES = 64


def _sign16(v: int) -> int:
    return v - 65536 if v >= 32768 else v


def encode_ima_qt(samples: "np.ndarray") -> tuple[bytes, int]:
    """(n,) or (n, nch) int16 → (packet stream, packets per channel).
    The preamble stores the running predictor TRUNCATED to its high 9
    bits — and the encoder re-anchors its own state to that truncated
    value (what conformant ima4 encoders do), so the decoder stays in
    bitwise lockstep from any packet boundary."""
    arr = np.asarray(samples, np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if n < 1:
        raise ValueError("empty clip")
    if n % IMA_QT_SAMPLES:
        pad = IMA_QT_SAMPLES - n % IMA_QT_SAMPLES
        arr = np.vstack([arr, np.repeat(arr[-1:], pad, 0)])
    preds, idxs = [0] * nch, [0] * nch
    out = bytearray()
    for bs in range(0, len(arr), IMA_QT_SAMPLES):
        for c in range(nch):
            preamble = (preds[c] & 0xFF80) | (idxs[c] & 0x7F)
            out += struct.pack(">H", preamble & 0xFFFF)
            preds[c] = _sign16(preamble & 0xFF80)
            nibs = []
            for i in range(IMA_QT_SAMPLES):
                nib, preds[c], idxs[c] = ima_encode_sample(
                    int(arr[bs + i, c]), preds[c], idxs[c]
                )
                nibs.append(nib)
            for k in range(0, IMA_QT_SAMPLES, 2):
                out.append(nibs[k] | (nibs[k + 1] << 4))  # low nibble first
    return bytes(out), len(arr) // IMA_QT_SAMPLES


def decode_ima_qt(data: bytes, nch: int) -> "np.ndarray":
    """ima4 packet stream → (n, nch) int16."""
    if nch < 1:
        raise ValueError("bad channel count")
    if len(data) < IMA_QT_PACKET or len(data) % (IMA_QT_PACKET * nch):
        raise ValueError("ima4 stream is not whole channel-packet groups")
    groups = len(data) // (IMA_QT_PACKET * nch)
    out = np.zeros((groups * IMA_QT_SAMPLES, nch), np.int16)
    pos = 0
    for g in range(groups):
        for c in range(nch):
            (preamble,) = struct.unpack_from(">H", data, pos)
            pos += 2
            pred = _sign16(preamble & 0xFF80)
            index = preamble & 0x7F
            if index > 88:
                raise ValueError("ima4 step index out of range")
            row = g * IMA_QT_SAMPLES
            for k in range(32):
                byte = data[pos]
                pos += 1
                for nib in (byte & 0xF, byte >> 4):
                    pred, index = ima_decode_nibble(nib, pred, index)
                    out[row, c] = pred
                    row += 1
    return out
