"""FLAC reading via the native decoder (native/flac_decoder.cpp).

LibriSpeech ships 16-bit mono FLAC; the image has no soundfile/ffmpeg, so
audio loading goes through our own C++ decoder (ctypes C ABI, lazily
compiled like utils/native_ops.py).  There is no Python fallback — FLAC
bit-unpacking in pure Python would be ~100x slower than the corpus scan
itself; environments without g++ should convert to wav/npy instead.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "flac_decoder.cpp"
_SO = _NATIVE_DIR / "libflac_decoder.so"
_ENC_SRC = _NATIVE_DIR / "flac_encoder.cpp"
_ENC_SO = _NATIVE_DIR / "libflac_encoder.so"

_lib = None
_enc_lib = None
_build_err: str | None = None


def _load() -> ctypes.CDLL:
    global _lib, _build_err
    if _lib is not None:
        return _lib
    if _build_err is not None:
        raise RuntimeError(_build_err)
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.flac_stream_info.restype = ctypes.c_int
        lib.flac_stream_info.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.flac_decode_all.restype = ctypes.c_int64
        lib.flac_decode_all.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        _lib = lib
    except Exception as e:
        _build_err = f"native FLAC decoder unavailable: {e}"
        raise RuntimeError(_build_err) from e
    return _lib


def _load_encoder() -> ctypes.CDLL:
    """Native VERBATIM encoder (native/flac_encoder.cpp) — corpus
    fabrication at scale; same lazy g++ build as the decoder."""
    global _enc_lib
    if _enc_lib is not None:
        return _enc_lib
    if not _ENC_SO.exists() or (
        _ENC_SO.stat().st_mtime < _ENC_SRC.stat().st_mtime
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(_ENC_SRC), "-o", str(_ENC_SO)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(str(_ENC_SO))
    lib.flac_encode_verbatim_bound.restype = ctypes.c_int64
    lib.flac_encode_verbatim_bound.argtypes = [ctypes.c_int64,
                                               ctypes.c_int32]
    lib.flac_encode_verbatim.restype = ctypes.c_int64
    lib.flac_encode_verbatim.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    _enc_lib = lib
    return lib


def write_flac_verbatim(path: str | Path, samples: np.ndarray,
                        sample_rate: int = 16000,
                        blocksize: int = 4096) -> int:
    """Encode int16 mono ``samples`` as an uncompressed (VERBATIM) FLAC
    file; returns bytes written.  Lossless by construction — round-trips
    bit-exactly through read_flac_int (tested in tests/test_flac.py)."""
    samples = np.ascontiguousarray(samples, np.int16)
    assert samples.ndim == 1, "mono only"
    lib = _load_encoder()
    cap = int(lib.flac_encode_verbatim_bound(samples.size, blocksize))
    out = np.empty(cap, np.uint8)
    got = lib.flac_encode_verbatim(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        samples.size, sample_rate, blocksize,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if got < 0:
        raise ValueError("flac_encode_verbatim failed")
    with open(path, "wb") as f:
        out[:got].tofile(f)
    return int(got)


def stream_info(path: str | Path) -> dict:
    """STREAMINFO -> {n_samples, sample_rate, channels, bits} (no decode)."""
    data = Path(path).read_bytes()
    info = (ctypes.c_int64 * 4)()
    rc = _load().flac_stream_info(data, len(data), info)
    if rc != 0:
        raise ValueError(f"{path}: not a valid FLAC stream (rc={rc})")
    return {
        "n_samples": int(info[0]), "sample_rate": int(info[1]),
        "channels": int(info[2]), "bits": int(info[3]),
    }


def read_flac_int(path: str | Path) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC file -> (int32 samples [n, channels], sample_rate,
    bits_per_sample)."""
    data = Path(path).read_bytes()
    lib = _load()
    info = (ctypes.c_int64 * 4)()
    rc = lib.flac_stream_info(data, len(data), info)
    if rc != 0:
        raise ValueError(f"{path}: not a valid FLAC stream (rc={rc})")
    total, rate, channels, bits = (int(info[0]), int(info[1]),
                                   int(info[2]), int(info[3]))
    # STREAMINFO may legally report 0 total samples; fall back to a bound
    # from the compressed size (FLAC never expands 16-bit audio 4x).
    cap_per_ch = total if total > 0 else (len(data) * 4) // channels + 65536
    out = np.empty(cap_per_ch * channels, np.int32)
    got = lib.flac_decode_all(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.size,
    )
    if got < 0:
        raise ValueError(f"{path}: FLAC decode failed (rc={got})")
    return out[: got * channels].reshape(int(got), channels), rate, bits


def read_flac(path: str | Path) -> tuple[np.ndarray, int]:
    """Decode FLAC -> (float32 mono waveform in [-1, 1), sample_rate).

    Multichannel audio is averaged to mono (LibriSpeech itself is mono).
    """
    samples, rate, bits = read_flac_int(path)
    wav = samples.astype(np.float32) / np.float32(2 ** (bits - 1))
    if wav.shape[1] > 1:
        wav = wav.mean(axis=1)
    else:
        wav = wav[:, 0]
    return wav, rate


def flac_num_samples(path: str | Path) -> int:
    """Per-channel sample count from STREAMINFO (cheap, header-only).

    STREAMINFO may legally report 0 (unknown); fall back to a full decode
    in that case so manifest lengths are always real."""
    n = stream_info(path)["n_samples"]
    if n == 0:
        n = int(read_flac_int(path)[0].shape[0])
    return n
