"""GGUF checkpoint reading.

Counterpart of the reference's GGUF support
(`/root/reference/src/diffusers/models/model_loading_utils.py:644`
`load_gguf_checkpoint` + `quantizers/gguf/` dequant-on-the-fly backend).
Pure-python/numpy parser for GGUF v2/v3 — no gguf package dependency. The
quantized blocks are dequantized to float32 at load; pass a TPU
`QuantizationConfig` to `from_pretrained` to re-quantize into the int8 MXU
path (dequant-on-the-fly per layer is a CUDA-kernel pattern; on TPU the
weight-only int8 storage + fused dequant inside the matmul is the native
equivalent).

Format: https://github.com/ggerganov/ggml/blob/master/docs/gguf.md
Supported tensor types: F32, F16, BF16, Q8_0, Q4_0, Q4_1, Q5_0, Q5_1, Q4_K.
Remaining K-quants raise with a clear message.

``keep_q4_0=True`` keeps Q4_0 2D tensors in their native 4-bit grid as
`Q4Tensor` (int4 values + per-32-block f16 scales) instead of materializing
float32 — `ModelMixin.from_pretrained(gguf_file=...)` maps those losslessly
onto the TPU int4 weight-only path (`kernel` s4 + `kernel_scale_int4`),
the exact-grid analogue of the reference's GGUF dequant-on-the-fly
(`quantizers/gguf/utils.py`).
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO, Dict, Tuple

import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)

GGUF_MAGIC = b"GGUF"

# ggml_type enum (ggml.h)
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0, GGML_Q8_1 = 8, 9
GGML_BF16 = 30

GGML_Q4_K = 12
_K_QUANTS = {10: "Q2_K", 11: "Q3_K", 13: "Q5_K", 14: "Q6_K", 15: "Q8_K"}

# (block_elems, block_bytes) per quantized type
_BLOCK = {
    GGML_Q4_0: (32, 18),
    GGML_Q4_1: (32, 20),
    GGML_Q5_0: (32, 22),
    GGML_Q5_1: (32, 24),
    GGML_Q8_0: (32, 34),
    GGML_Q4_K: (256, 144),  # super-block: 2xf16 + 12B 6-bit scales/mins + 128B nibbles
}


class Q4Tensor:
    """Native-grid Q4_0 payload: ``q`` int4 values (ml_dtypes.int4, torch
    [out, in] orientation, = nibble-8) and ``scales`` f32 [out, in/32]."""

    def __init__(self, q: np.ndarray, scales: np.ndarray, shape: Tuple[int, ...]):
        self.q = q.reshape(shape)
        self.scales = scales
        self.shape = shape
        self.ndim = len(shape)

    def dequantize(self) -> np.ndarray:
        out, in_dim = self.shape
        qf = self.q.astype(np.float32).reshape(out, in_dim // 32, 32)
        return (qf * self.scales[..., None]).reshape(self.shape)

_METADATA_FMT = {0: "B", 1: "b", 2: "<H", 3: "<h", 4: "<I", 5: "<i", 6: "<f", 10: "<Q", 11: "<q", 12: "<d"}


def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _METADATA_FMT:
        fmt = _METADATA_FMT[vtype]
        return struct.unpack(fmt, f.read(struct.calcsize(fmt)))[0]
    if vtype == 7:  # bool
        return f.read(1)[0] != 0
    if vtype == 8:  # string
        return _read_str(f)
    if vtype == 9:  # array
        (elem_type,) = struct.unpack("<I", f.read(4))
        (count,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, elem_type) for _ in range(count)]
    raise ValueError(f"unknown GGUF metadata value type {vtype}")


def _dequant(data: np.ndarray, ggml_type: int, n_elems: int) -> np.ndarray:
    """Vectorized block dequantization → float32 [n_elems]."""
    if ggml_type == GGML_Q8_0:
        blocks = data.reshape(-1, 34)
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # [NB, 1]
        q = blocks[:, 2:].view(np.int8).astype(np.float32)  # [NB, 32]
        return (d * q).reshape(-1)[:n_elems]
    if ggml_type in (GGML_Q4_0, GGML_Q4_1):
        bb = _BLOCK[ggml_type][1]
        blocks = data.reshape(-1, bb)
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        off = 2
        if ggml_type == GGML_Q4_1:
            m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
            off = 4
        qs = blocks[:, off:]
        lo = (qs & 0x0F).astype(np.float32)
        hi = (qs >> 4).astype(np.float32)
        q = np.concatenate([lo, hi], axis=1)  # [NB, 32] ggml layout: low nibbles then high
        if ggml_type == GGML_Q4_0:
            out = d * (q - 8.0)
        else:
            out = d * q + m
        return out.reshape(-1)[:n_elems]
    if ggml_type in (GGML_Q5_0, GGML_Q5_1):
        bb = _BLOCK[ggml_type][1]
        blocks = data.reshape(-1, bb)
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        off = 2
        m = None
        if ggml_type == GGML_Q5_1:
            m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
            off = 4
        qh = blocks[:, off : off + 4].copy().view(np.uint32)  # [NB, 1] 32 high bits
        qs = blocks[:, off + 4 :]
        lo = (qs & 0x0F).astype(np.uint8)
        hi = (qs >> 4).astype(np.uint8)
        q = np.concatenate([lo, hi], axis=1).astype(np.int32)  # [NB, 32]
        shifts = np.arange(32, dtype=np.uint32)[None, :]
        high_bits = ((qh >> shifts) & 1).astype(np.int32)
        q = q | (high_bits << 4)
        if ggml_type == GGML_Q5_0:
            out = d * (q.astype(np.float32) - 16.0)
        else:
            out = d * q.astype(np.float32) + m
        return out.reshape(-1)[:n_elems]
    if ggml_type == GGML_Q4_K:
        # super-block of 256: y[64j+l] = d*sc[2j]*(q&0xF) - dmin*m[2j] (low
        # nibbles), next 32 from high nibbles with sc[2j+1]/m[2j+1]
        # (llama.cpp dequantize_row_q4_K + get_scale_min_k4)
        blocks = data.reshape(-1, 144)
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)  # [NB, 1]
        dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
        sm = blocks[:, 4:16].astype(np.uint8)  # [NB, 12] packed 6-bit scales/mins
        qs = blocks[:, 16:]  # [NB, 128]
        sc = np.empty((blocks.shape[0], 8), np.float32)
        mn = np.empty((blocks.shape[0], 8), np.float32)
        for j in range(8):
            if j < 4:
                sc[:, j] = (sm[:, j] & 63).astype(np.float32)
                mn[:, j] = (sm[:, j + 4] & 63).astype(np.float32)
            else:
                sc[:, j] = ((sm[:, j + 4] & 0x0F) | ((sm[:, j - 4] >> 6) << 4)).astype(np.float32)
                mn[:, j] = ((sm[:, j + 4] >> 4) | ((sm[:, j] >> 6) << 4)).astype(np.float32)
        lo = (qs & 0x0F).astype(np.float32).reshape(-1, 4, 32)  # [NB, chunk j, 32]
        hi = (qs >> 4).astype(np.float32).reshape(-1, 4, 32)
        # group index for lo-chunk j is 2j, for hi-chunk j is 2j+1
        y = np.empty((blocks.shape[0], 8, 32), np.float32)
        y[:, 0::2] = d[:, :, None] * sc[:, 0::2][..., None] * lo - dmin[:, :, None] * mn[:, 0::2][..., None]
        y[:, 1::2] = d[:, :, None] * sc[:, 1::2][..., None] * hi - dmin[:, :, None] * mn[:, 1::2][..., None]
        return y.reshape(-1)[:n_elems]
    raise ValueError(f"unhandled ggml type {ggml_type}")


def _q4_0_native(data: np.ndarray, shape: Tuple[int, ...]) -> Q4Tensor:
    """Q4_0 blocks → Q4Tensor keeping the exact 4-bit grid (q-8 values in
    [-8, 7], per-block f16 scale widened to f32)."""
    import ml_dtypes

    blocks = data.reshape(-1, 18)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)  # [NB]
    qs = blocks[:, 2:]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    q = np.concatenate([lo, hi], axis=1).astype(ml_dtypes.int4)  # [NB, 32]
    out, in_dim = shape
    return Q4Tensor(q.reshape(out, in_dim), d.reshape(out, in_dim // 32), shape)


def load_gguf_checkpoint(path: str, return_metadata: bool = False, keep_q4_0: bool = False):
    """Parse a .gguf file → dict[name, float32/float16 np.ndarray]
    (+ metadata dict when requested). With ``keep_q4_0``, 2D Q4_0 tensors
    whose row length divides 32 stay native-grid `Q4Tensor`s."""
    with open(path, "rb") as f:
        if f.read(4) != GGUF_MAGIC:
            raise ValueError(f"{path} is not a GGUF file")
        (version,) = struct.unpack("<I", f.read(4))
        if version < 2:
            raise ValueError(f"GGUF v{version} unsupported (need >= 2)")
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))

        metadata: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype,) = struct.unpack("<I", f.read(4))
            metadata[key] = _read_value(f, vtype)

        infos = []
        for _ in range(n_tensors):
            name = _read_str(f)
            (n_dims,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{n_dims}Q", f.read(8 * n_dims))
            ggml_type, offset = struct.unpack("<IQ", f.read(12))
            infos.append((name, dims, ggml_type, offset))

        alignment = int(metadata.get("general.alignment", 32))
        data_start = f.tell()
        data_start += (-data_start) % alignment

        tensors: Dict[str, np.ndarray] = {}
        for name, dims, ggml_type, offset in infos:
            shape = tuple(reversed(dims))  # ggml stores ne[0] fastest-varying
            n_elems = int(np.prod(shape)) if shape else 1
            f.seek(data_start + offset)
            if ggml_type == GGML_F32:
                arr = np.frombuffer(f.read(n_elems * 4), dtype=np.float32)
            elif ggml_type == GGML_F16:
                arr = np.frombuffer(f.read(n_elems * 2), dtype=np.float16)
            elif ggml_type == GGML_BF16:
                import ml_dtypes

                arr = np.frombuffer(f.read(n_elems * 2), dtype=ml_dtypes.bfloat16).astype(np.float32)
            elif ggml_type in _BLOCK:
                be, bb = _BLOCK[ggml_type]
                n_blocks = (n_elems + be - 1) // be
                raw = np.frombuffer(f.read(n_blocks * bb), dtype=np.uint8)
                if (keep_q4_0 and ggml_type == GGML_Q4_0 and len(shape) == 2
                        and shape[-1] % 32 == 0):
                    tensors[name] = _q4_0_native(raw, shape)
                    continue
                arr = _dequant(raw, ggml_type, n_elems)
            elif ggml_type in _K_QUANTS:
                raise NotImplementedError(
                    f"GGUF tensor {name!r} uses {_K_QUANTS[ggml_type]} (K-quant); "
                    "supported types: F32/F16/BF16/Q8_0/Q4_0/Q4_1/Q5_0/Q5_1/Q4_K"
                )
            else:
                raise ValueError(f"GGUF tensor {name!r}: unknown ggml type {ggml_type}")
            tensors[name] = arr.reshape(shape)

    logger.info("loaded %d tensors from GGUF %s (v%d)", len(tensors), path, version)
    if return_metadata:
        return tensors, metadata
    return tensors


# --- writer (test fixture + export path) ---

_NUMPY_TO_GGML = {np.dtype(np.float32): GGML_F32, np.dtype(np.float16): GGML_F16}


def _write_str(f: BinaryIO, s: str):
    b = s.encode("utf-8")
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


def quantize_q8_0(arr: np.ndarray) -> np.ndarray:
    """float array → Q8_0 block bytes (32-elem blocks: f16 scale + 32 int8)."""
    flat = arr.astype(np.float32).reshape(-1)
    pad = (-flat.size) % 32
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, 32)
    d = np.abs(blocks).max(axis=1, keepdims=True) / 127.0
    # quantize against the f16-rounded scale actually stored in the block
    d = np.maximum(d, 1e-12).astype(np.float16).astype(np.float32)
    q = np.clip(np.round(blocks / d), -127, 127).astype(np.int8)
    out = np.empty((blocks.shape[0], 34), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16).view(np.uint8)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def quantize_q4_0(arr: np.ndarray) -> np.ndarray:
    """float array → Q4_0 block bytes (32-elem blocks: f16 scale + 16 nibble
    bytes; ggml convention d = max/-8, q = x/d + 8 in [0, 15])."""
    flat = arr.astype(np.float32).reshape(-1)
    pad = (-flat.size) % 32
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, 32)
    # ggml picks the signed extreme so that extreme/d = -8
    amax_idx = np.argmax(np.abs(blocks), axis=1)
    ext = blocks[np.arange(blocks.shape[0]), amax_idx]
    d = ext / -8.0
    d = np.where(np.abs(d) < 1e-12, 1e-12, d).astype(np.float16).astype(np.float32)
    q = np.clip(np.round(blocks / d[:, None]) + 8, 0, 15).astype(np.uint8)
    out = np.empty((blocks.shape[0], 18), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)  # low nibbles first 16, high next 16
    return out.reshape(-1)


def save_gguf(path: str, tensors: Dict[str, np.ndarray], metadata: Dict[str, str] | None = None, quantize: str | None = None):
    """Write a GGUF v3 file (F32/F16 passthrough, optional Q8_0/Q4_0
    quantization of 2D+ tensors). Round-trip partner of `load_gguf_checkpoint`."""
    metadata = dict(metadata or {})
    alignment = 32
    metadata_items = [("general.alignment", 4, alignment)] + [(k, 8, v) for k, v in metadata.items()]

    entries = []  # (name, shape, ggml_type, payload_bytes)
    for name, arr in tensors.items():
        arr = np.asarray(arr)
        if quantize == "q8_0" and arr.ndim >= 2 and arr.size % 32 == 0:
            entries.append((name, arr.shape, GGML_Q8_0, quantize_q8_0(arr).tobytes()))
        elif quantize == "q4_0" and arr.ndim >= 2 and arr.size % 32 == 0:
            entries.append((name, arr.shape, GGML_Q4_0, quantize_q4_0(arr).tobytes()))
        else:
            if arr.dtype not in _NUMPY_TO_GGML:
                arr = arr.astype(np.float32)
            entries.append((name, arr.shape, _NUMPY_TO_GGML[arr.dtype], np.ascontiguousarray(arr).tobytes()))

    with open(path, "wb") as f:
        f.write(GGUF_MAGIC)
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<QQ", len(entries), len(metadata_items)))
        for key, vtype, value in metadata_items:
            _write_str(f, key)
            f.write(struct.pack("<I", vtype))
            if vtype == 4:
                f.write(struct.pack("<I", value))
            else:
                _write_str(f, str(value))
        offset = 0
        for name, shape, ggml_type, payload in entries:
            _write_str(f, name)
            dims = tuple(reversed(shape))
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack(f"<{len(dims)}Q", *dims))
            f.write(struct.pack("<IQ", ggml_type, offset))
            offset += len(payload) + ((-len(payload)) % alignment)
        pos = f.tell()
        f.write(b"\x00" * ((-pos) % alignment))
        for _, _, _, payload in entries:
            f.write(payload)
            f.write(b"\x00" * ((-len(payload)) % alignment))
