"""Test-side baseline-JPEG ENCODER (ITU-T T.81 sequential DCT,
Huffman): produces real JFIF byte streams for the decoder tests in
test_multimodal.py without any codec library.

Deliberately independent of the decoder's internals: the only shared
constant is the published zigzag scan order (copied literally here,
not imported, so an accidental edit on either side breaks the
round-trip instead of cancelling out). Huffman tables are built
canonically from the symbols each image actually emits — the DHT
segment carries them, so nothing depends on recalling the Annex K
defaults. With an all-ones quantization table the pipeline is
round-to-nearest lossless up to DCT float rounding (|err| <= 2), which
is what the tests assert.
"""

from __future__ import annotations

import math

import numpy as np

ZZ = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

Q_ONES = np.ones((8, 8), np.int32)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


_M = _dct_matrix()


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    return np.round(coef / q).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def align(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill


def _size(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _block_symbols(coef_zz: list[int], pred: int) -> list[tuple[str, int, int]]:
    """(kind, symbol, value) stream for one quantized block:
    kind 'dc' -> (size, diff), kind 'ac' -> (run<<4|size, value)."""
    out: list[tuple[str, int, int]] = []
    diff = coef_zz[0] - pred
    out.append(("dc", _size(diff), diff))
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coef_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = coef_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.append(("ac", 0xF0, 0))
            run -= 16
        out.append(("ac", (run << 4) | _size(v), v))
        run = 0
    if last_nz < 63:
        out.append(("ac", 0x00, 0))  # EOB
    return out


def _canonical(symbols: set[int]) -> tuple[bytes, bytes, dict[int, tuple[int, int]]]:
    """Valid canonical table over `symbols`: all codes one length,
    chosen so at least one code is unused (no all-ones code)."""
    syms = sorted(symbols)
    length = 1
    while (1 << length) <= len(syms):
        length += 1
    counts = bytearray(16)
    counts[length - 1] = len(syms)
    enc = {s: (i, length) for i, s in enumerate(syms)}
    return bytes(counts), bytes(syms), enc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), np.uint8)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]
    return padded


def encode(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    q_luma: np.ndarray = Q_ONES,
    q_chroma: np.ndarray = Q_ONES,
    restart: int = 0,
) -> bytes:
    """Encode a grayscale (y only) or 4:2:0 YCbCr (cb/cr at half
    resolution in each axis) baseline JPEG. Arrays are uint8 planes.
    """
    h, w = y.shape
    color = cb is not None
    if color:
        assert cr is not None and cb.shape == cr.shape
        assert cb.shape == (-(-h // 16) * 8, -(-w // 16) * 8), (
            "cb/cr must be ceil(h/16)x8 x ceil(w/16)x8 (4:2:0 padded)"
        )
    yp = _plane_blocks(y)
    if color:
        # luma padded to the MCU grid (16x16)
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        big = np.empty((ph, pw), np.uint8)
        big[: yp.shape[0], : yp.shape[1]] = yp
        if ph > yp.shape[0]:
            big[yp.shape[0] :, : yp.shape[1]] = yp[-1:, :]
        if pw > yp.shape[1]:
            big[:, yp.shape[1] :] = big[:, yp.shape[1] - 1 : yp.shape[1]]
        yp = big

    # ---- pass 1: quantized coefficients + symbol collection
    mcux = yp.shape[1] // (16 if color else 8)
    mcuy = yp.shape[0] // (16 if color else 8)
    comps: list[dict] = [{"q": q_luma, "H": 2 if color else 1, "V": 2 if color else 1, "plane": yp}]
    if color:
        comps.append({"q": q_chroma, "H": 1, "V": 1, "plane": cb})
        comps.append({"q": q_chroma, "H": 1, "V": 1, "plane": cr})

    def mcu_stream():
        preds = [0] * len(comps)
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and n_mcu and n_mcu % restart == 0:
                    yield ("rst", None, None)
                    preds = [0] * len(comps)
                n_mcu += 1
                for ci, c in enumerate(comps):
                    for by in range(c["V"]):
                        for bx in range(c["H"]):
                            yy = (my * c["V"] + by) * 8
                            xx = (mx * c["H"] + bx) * 8
                            blk = c["plane"][yy : yy + 8, xx : xx + 8]
                            coef = _fdct_quant(blk, c["q"])
                            zz = [int(coef.flat[ZZ[k]]) for k in range(64)]
                            syms = _block_symbols(zz, preds[ci])
                            preds[ci] = zz[0]
                            yield ("blk", ci, syms)

    dc_syms: list[set[int]] = [set() for _ in comps]
    ac_syms: list[set[int]] = [set() for _ in comps]
    recorded = []
    for kind, ci, syms in mcu_stream():
        recorded.append((kind, ci, syms))
        if kind == "blk":
            for sk, sym, _v in syms:
                if sk == "dc":
                    dc_syms[ci].add(sym)
                else:
                    ac_syms[ci].add(sym)
    # luma uses table id 0, both chroma share table id 1
    dc_groups = [dc_syms[0], set().union(*dc_syms[1:])] if color else [dc_syms[0]]
    ac_groups = [ac_syms[0], set().union(*ac_syms[1:])] if color else [ac_syms[0]]
    dc_tables = [_canonical(g or {0}) for g in dc_groups]
    ac_tables = [_canonical(g or {0}) for g in ac_groups]

    # ---- emit segments
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes((0xFF, marker)))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    def dqt(tid: int, q: np.ndarray) -> None:
        body = bytearray((tid,))
        for k in range(64):
            body.append(int(q.flat[ZZ[k]]))
        seg(0xDB, bytes(body))

    dqt(0, q_luma)
    if color:
        dqt(1, q_chroma)
    sof = bytearray((8,))
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comps))
    for ci, c in enumerate(comps):
        sof += bytes((ci + 1, (c["H"] << 4) | c["V"], 0 if ci == 0 else 1))
    seg(0xC0, bytes(sof))
    for tid, (counts, syms, _enc) in enumerate(dc_tables):
        seg(0xC4, bytes((0x00 | tid,)) + counts + syms)
    for tid, (counts, syms, _enc) in enumerate(ac_tables):
        seg(0xC4, bytes((0x10 | tid,)) + counts + syms)
    if restart:
        seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytearray((len(comps),))
    for ci in range(len(comps)):
        tid = 0 if ci == 0 else 1
        sos += bytes((ci + 1, (tid << 4) | tid))
    sos += bytes((0, 63, 0))
    seg(0xDA, bytes(sos))

    bw = _BitWriter()
    rst = 0
    for kind, ci, syms in recorded:
        if kind == "rst":
            bw.align()
            bw.out.extend(bytes((0xFF, 0xD0 + (rst & 7))))
            rst += 1
            continue
        tid = 0 if ci == 0 else 1
        dc_enc = dc_tables[tid][2]
        ac_enc = ac_tables[tid][2]
        for sk, sym, v in syms:
            code, ln = (dc_enc if sk == "dc" else ac_enc)[sym]
            bw.put(code, ln)
            s = sym & 15 if sk == "ac" else sym
            if sk == "dc":
                s = sym
            if s:
                bw.put(v if v >= 0 else v + (1 << s) - 1, s)
    bw.align()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
