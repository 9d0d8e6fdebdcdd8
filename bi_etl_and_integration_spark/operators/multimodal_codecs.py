"""Pure-stdlib media codecs (PNG via ``zlib``, WAV via ``wave``).

The container has no Pillow/ffmpeg, but a real decode path matters:
the multimodal operators' contract ("binary column in, typed features
out") is only proven end-to-end if SOME real format round-trips.  PNG
needs nothing beyond ``zlib`` + ``struct`` (spec: RFC 2083), WAV
nothing beyond the stdlib ``wave`` module — so these are full, honest
implementations, not stubs: ``decode_png`` handles bit-depth-8
grayscale / RGB / RGBA / palette with all five scanline filters, and
``encode_png`` writes spec-compliant output any external viewer opens.

Perf note: decode cost is per-image and Arrow-batched by the calling
``mapInPandas`` operators; the unfilter hot loops are vectorized per
scanline (sub/up via modular cumsum/add), with the sequential
average/Paeth filters falling back to a per-pixel loop — fine for the
feature-extraction batch shapes these operators target.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return bool(payload) and payload[:8] == _PNG_SIG


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        yield typ, data[pos + 8:pos + 8 + ln]
        if typ == b"IEND":
            return
        pos += 12 + ln


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, channels) uint8 array.

    Supports bit depth 8, color types 0/2/3/4/6, no interlace — the
    shapes :func:`encode_png` and common tooling produce.  Raises
    ``ValueError`` on non-PNG bytes and ``NotImplementedError`` on
    exotic variants, so callers can route to a quarantine stream."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    ihdr, idat, plte = None, [], None
    for typ, body in _chunks(payload):
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"PLTE":
            plte = body
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth}, color={ctype}, "
            f"interlace={interlace}); bit-depth-8 non-interlaced only")
    nch = _CHANNELS[ctype]
    stride = w * nch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes, data = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, line = int(ftypes[y]), data[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:      # Sub: per-channel modular prefix sum
            out[y] = np.cumsum(
                line.reshape(w, nch).astype(np.uint64), axis=0
            ).astype(np.uint8).reshape(stride)
        elif f == 2:      # Up
            out[y] = line + prev  # uint8 wraps mod 256
        elif f == 3:      # Average — sequential left dependency
            row = out[y]
            for x in range(stride):
                left = int(row[x - nch]) if x >= nch else 0
                row[x] = (int(line[x]) + (left + int(prev[x])) // 2) % 256
        elif f == 4:      # Paeth — sequential left dependency
            row = out[y]
            for x in range(stride):
                a = int(row[x - nch]) if x >= nch else 0
                c = int(prev[x - nch]) if x >= nch else 0
                row[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
    img = out.reshape(h, w, nch)
    if ctype == 3:        # palette -> RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        img = pal[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Encode an (h, w) or (h, w, channels) uint8 array as a
    spec-compliant PNG (filter 0, one IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, codec-free)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def image_feature_vector(img: np.ndarray) -> tuple[float, list[float]]:
    """(mean_byte, 8-dim feature) from decoded pixels: quadrant
    luminance means (4), channel means padded to 3, contrast (1) —
    deterministic, resolution-independent, all in [0, 1]."""
    px = img.astype(np.float64)
    lum = px.mean(axis=2)
    h, w = lum.shape
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    quads = [lum[:h2, :w2], lum[:h2, w2:], lum[h2:, :w2], lum[h2:, w2:]]
    qmeans = [float(q.mean()) / 255.0 if q.size else 0.0 for q in quads]
    ch = [float(px[:, :, i].mean()) / 255.0 if i < px.shape[2] else 0.0
          for i in range(3)]
    contrast = float(lum.std()) / 255.0
    return float(px.mean()), [*qmeans, *ch, contrast]


def decode_wav(payload: bytes) -> dict:
    """Decode a WAV container (stdlib ``wave``): PCM frames + params.
    Returns sample_rate, n_channels, n_frames, duration_ms and the
    samples as an (n_frames, n_channels) float64 array in [-1, 1]."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate, nch = wf.getframerate(), wf.getnchannels()
        width, n = wf.getsampwidth(), wf.getnframes()
        frames = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(frames, dtype=np.uint8)
             .astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2**31
    else:
        raise NotImplementedError(f"sample width {width} unsupported")
    x = x.reshape(-1, nch)
    return {"sample_rate": rate, "n_channels": nch, "n_frames": n,
            "duration_ms": int(n * 1000 / rate) if rate else 0,
            "samples": x}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode float samples in [-1, 1] (n, channels) as 16-bit PCM."""
    import io
    import wave
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_feature_vector(samples: np.ndarray) -> dict:
    """rms, zero-crossing rate and an 8-bin |amplitude| histogram from
    the first channel — the classic cheap audio-quality features."""
    x = samples[:, 0] if samples.ndim > 1 else samples
    if not len(x):
        return {"rms": 0.0, "zero_cross_rate": 0.0, "feature": [0.0] * 8}
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    hist, _ = np.histogram(np.abs(x), bins=8, range=(0.0, 1.0))
    return {"rms": rms, "zero_cross_rate": zcr,
            "feature": [float(v) / len(x) for v in hist]}
