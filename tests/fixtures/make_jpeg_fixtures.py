"""Generate the checked-in baseline-JPEG fixtures from first principles.

A minimal spec-conformant SEQUENTIAL BASELINE encoder (SOF0, 8-bit,
all-ones quant tables, canonical fixed-length Huffman tables emitted as
DHT, optional 4:2:0 subsampling and restart markers) — enough to
produce real JPEG streams whose decoded pixels are analytically known:
with q=1, a flat 8x8 block round-trips EXACTLY (DC-only), and gradients
round-trip within IDCT rounding.  Run once; the .jpg outputs are
committed, this script is their provenance.

    python tests/fixtures/make_jpeg_fixtures.py
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.multimodal import (  # noqa: E402
    _ZIGZAG,
    _dct_matrix,
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _rgb_to_ycbcr(img: np.ndarray) -> list[np.ndarray]:
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [np.round(p).clip(0, 255) for p in (y, cb, cr)]


def _pad_edge(p: np.ndarray, hmult: int, wmult: int) -> np.ndarray:
    ph = -(-p.shape[0] // hmult) * hmult
    pw = -(-p.shape[1] // wmult) * wmult
    return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")


def _block_symbols(coeffs: np.ndarray, pred: int) -> tuple[list, int]:
    """One quantized zigzag block -> [(dc_or_ac, symbol, amp, s), ...]."""
    syms = []
    diff = int(coeffs[0]) - pred
    s = _category(diff)
    syms.append(("dc", s, _amplitude(diff, s), s))
    run = 0
    last_nz = max((i for i in range(1, 64) if coeffs[i]), default=0)
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            syms.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        s = _category(v)
        syms.append(("ac", (run << 4) | s, _amplitude(v, s), s))
        run = 0
    if last_nz < 63:
        syms.append(("ac", 0x00, 0, 0))  # EOB
    return syms, int(coeffs[0])


def encode_jpeg(
    img: np.ndarray, *, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode uint8 HxW (gray) or HxWx3 (RGB) as baseline JPEG, q=1."""
    M = _dct_matrix()
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        factors = [(1, 1)]
    else:
        planes = _rgb_to_ycbcr(img)
        factors = [(2, 2), (1, 1), (1, 1)] if subsampling == "420" else [
            (1, 1), (1, 1), (1, 1)
        ]
    h, w = img.shape[:2]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comp_planes = []
    for (fh, fv), p in zip(factors, planes):
        p = _pad_edge(p, 8 * vmax, 8 * hmax)  # pad at full-res first
        if (fh, fv) != (hmax, vmax):
            sh, sv = hmax // fh, vmax // fv
            p = np.round(
                p.reshape(p.shape[0] // sv, sv, p.shape[1] // sh, sh).mean(
                    axis=(1, 3)
                )
            )
        comp_planes.append(p)

    # pass 1: blocks in MCU-interleaved order + their symbol streams
    mcu_syms: list[list] = []
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and (my * mcux + mx) and (
                (my * mcux + mx) % restart_interval == 0
            ):
                preds = [0] * len(planes)
            syms: list = []
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        f = comp_planes[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        F = M @ f @ M.T
                        zz = np.array(
                            [int(round(F[r, c])) for r, c in _ZIGZAG],
                            dtype=np.int64,
                        )
                        bs, preds[ci] = _block_symbols(zz, preds[ci])
                        syms.extend(bs)
            mcu_syms.append(syms)

    dc_syms = sorted({s[1] for m in mcu_syms for s in m if s[0] == "dc"})
    ac_syms = sorted({s[1] for m in mcu_syms for s in m if s[0] == "ac"})
    dc_code = {s: i for i, s in enumerate(dc_syms)}
    ac_code = {s: i for i, s in enumerate(ac_syms)}
    assert len(dc_syms) < 255 and len(ac_syms) < 255

    def dht(tc: int, syms: list[int]) -> bytes:
        counts = [0] * 16
        counts[7] = len(syms)  # every code 8 bits, canonical 0..n-1
        body = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    qz = bytes([0]) + bytes([1] * 64)  # table 0, q=1 everywhere
    out += b"\xff\xdb" + struct.pack(">H", len(qz) + 2) + qz
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += dht(0, dc_syms)
    out += dht(1, ac_syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(
            ">H", restart_interval
        )
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    for mi, syms in enumerate(mcu_syms):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((mi // restart_interval - 1) % 8)])
        for kind, sym, amp, s in syms:
            bw.write(dc_code[sym] if kind == "dc" else ac_code[sym], 8)
            if s:
                bw.write(amp, s)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def fixture_images() -> dict[str, tuple[np.ndarray, dict]]:
    flat = np.empty((8, 16), dtype=np.uint8)
    flat[:, :8] = 100
    flat[:, 8:] = 200

    grad = np.empty((8, 8, 3), dtype=np.uint8)
    for y in range(8):
        for x in range(8):
            grad[y, x] = (16 * x + 8, 16 * y + 8, 255 - 16 * x)

    solid = np.empty((16, 16, 3), dtype=np.uint8)
    solid[:, :] = (70, 130, 200)

    ramp = np.empty((10, 24), dtype=np.uint8)
    for y in range(10):
        for x in range(24):
            ramp[y, x] = (10 * x + 5 * y) % 256

    return {
        "flat_gray.jpg": (flat, {}),
        "gradient_rgb_444.jpg": (grad, {"subsampling": "444"}),
        "flat_color_420.jpg": (solid, {"subsampling": "420"}),
        "ramp_gray_restart.jpg": (ramp, {"restart_interval": 2}),
    }


if __name__ == "__main__":
    outdir = os.path.dirname(os.path.abspath(__file__))
    for name, (img, kw) in fixture_images().items():
        data = encode_jpeg(img, **kw)
        with open(os.path.join(outdir, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")
