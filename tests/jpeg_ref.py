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


# --- progressive (SOF2) encoder ------------------------------------------------
# Spectral selection + successive approximation per T.81 Annex G,
# EOB-run coding across blocks, per-scan canonical Huffman tables.
# Independent of the decoder for the same reason as the baseline
# encoder above: a convention drift on either side (sign-bit polarity,
# EOB-run bias, correction-bit order) breaks the round-trip instead of
# cancelling out.


def encode_progressive(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    q_luma: np.ndarray = Q_ONES,
    q_chroma: np.ndarray = Q_ONES,
    scans: list[tuple[list[int], int, int, int, int]] | None = None,
    restart: int = 0,
) -> bytes:
    """Encode a grayscale or 4:2:0 YCbCr PROGRESSIVE JPEG (same plane
    contract as :func:`encode`). ``scans`` is a list of
    ``(component_indices, Ss, Se, Ah, Al)``; the default script splits
    the DC term and two AC bands and sends two successive-approximation
    stages, so a decoder must get the first pass, refinement, EOB-run
    and ZRL paths all right. The scripts reconstruct every coefficient
    bit, so the decode must equal the baseline :func:`encode` decode of
    the same image exactly.
    """
    h, w = y.shape
    color = cb is not None
    yp = _plane_blocks(y)
    if color:
        assert cr is not None and cb.shape == cr.shape
        assert cb.shape == (-(-h // 16) * 8, -(-w // 16) * 8), (
            "cb/cr must be ceil(h/16)x8 x ceil(w/16)x8 (4:2:0 padded)"
        )
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        big = np.empty((ph, pw), np.uint8)
        big[: yp.shape[0], : yp.shape[1]] = yp
        if ph > yp.shape[0]:
            big[yp.shape[0] :, : yp.shape[1]] = yp[-1:, :]
        if pw > yp.shape[1]:
            big[:, yp.shape[1] :] = big[:, yp.shape[1] - 1 : yp.shape[1]]
        yp = big
    comps: list[dict] = [
        {"q": q_luma, "H": 2 if color else 1, "V": 2 if color else 1, "plane": yp, "tid": 0}
    ]
    if color:
        comps.append({"q": q_chroma, "H": 1, "V": 1, "plane": cb, "tid": 1})
        comps.append({"q": q_chroma, "H": 1, "V": 1, "plane": cr, "tid": 1})
    hmax = max(c["H"] for c in comps)
    vmax = max(c["V"] for c in comps)
    mcux = yp.shape[1] // (8 * hmax)
    mcuy = yp.shape[0] // (8 * vmax)
    for c in comps:
        gy, gx = c["plane"].shape[0] // 8, c["plane"].shape[1] // 8
        zz = np.zeros((gy, gx, 64), np.int64)
        for by in range(gy):
            for bx in range(gx):
                coef = _fdct_quant(c["plane"][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], c["q"])
                zz[by, bx] = [int(coef.flat[ZZ[k]]) for k in range(64)]
        c["zz"] = zz
        # non-interleaved block grid (T.81 A.2.2)
        cw = -(-(w * c["H"]) // hmax)
        ch = -(-(h * c["V"]) // vmax)
        c["nbx"], c["nby"] = -(-cw // 8), -(-ch // 8)

    if scans is None:
        if color:
            scans = [
                ([0, 1, 2], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([0], 6, 63, 0, 2),
                ([1], 1, 63, 0, 1),
                ([2], 1, 63, 0, 1),
                ([0, 1, 2], 0, 0, 1, 0),
                ([0], 1, 63, 2, 1),
                ([0], 1, 63, 1, 0),
                ([1], 1, 63, 1, 0),
                ([2], 1, 63, 1, 0),
            ]
        else:
            scans = [
                ([0], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0),
            ]

    def scan_events(comp_idx, s_lo, s_hi, ah, al):
        """-> (event list, {(cls, tid): symbol set}). Events are
        ("sym", (cls, tid), symbol) / ("bits", value, nbits) /
        ("rst",) in exact wire order."""
        ev: list[tuple] = []
        sym_sets: dict[tuple[str, int], set[int]] = {}

        def sym(cls, tid, s_):
            ev.append(("sym", (cls, tid), s_))
            sym_sets.setdefault((cls, tid), set()).add(s_)

        def bits(v, n):
            if n:
                ev.append(("bits", v & ((1 << n) - 1), n))

        if s_lo == 0:  # DC scan (may be interleaved)
            interleaved = len(comp_idx) > 1
            preds = {ci: 0 for ci in comp_idx}
            if interleaved:
                units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
            else:
                c0 = comps[comp_idx[0]]
                units = [(by, bx) for by in range(c0["nby"]) for bx in range(c0["nbx"])]
            for n_mcu, u in enumerate(units):
                if restart and n_mcu and n_mcu % restart == 0:
                    ev.append(("rst",))
                    preds = {ci: 0 for ci in comp_idx}
                for ci in comp_idx:
                    c = comps[ci]
                    blocks = (
                        [
                            (u[0] * c["V"] + by, u[1] * c["H"] + bx)
                            for by in range(c["V"])
                            for bx in range(c["H"])
                        ]
                        if interleaved
                        else [u]
                    )
                    for ry, rx in blocks:
                        v0 = int(c["zz"][ry, rx, 0])
                        if ah == 0:
                            v = v0 >> al  # arithmetic shift (T.81 G.1.2.1)
                            diff = v - preds[ci]
                            preds[ci] = v
                            s_ = _size(diff)
                            sym("dc", c["tid"], s_)
                            bits(diff if diff >= 0 else diff + (1 << s_) - 1, s_)
                        else:
                            bits((v0 >> al) & 1, 1)
            return ev, sym_sets

        # AC scan: exactly one component, non-interleaved raster order
        ci = comp_idx[0]
        c = comps[ci]
        tid = c["tid"]
        eob = {"run": 0, "bits": []}

        def flush():
            if eob["run"]:
                nb_ = eob["run"].bit_length() - 1
                sym("ac", tid, nb_ << 4)
                bits(eob["run"] - (1 << nb_), nb_)
                for b in eob["bits"]:
                    bits(b, 1)
                eob["run"], eob["bits"] = 0, []

        n_mcu = 0
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                if restart and n_mcu and n_mcu % restart == 0:
                    flush()
                    ev.append(("rst",))
                n_mcu += 1
                zzb = c["zz"][by, bx]
                if ah == 0:  # first pass: sign-magnitude point transform
                    vals = []
                    for k in range(s_lo, s_hi + 1):
                        cv = int(zzb[k])
                        mag = abs(cv) >> al
                        vals.append(mag if cv >= 0 else -mag)
                    last = max((ix for ix, v in enumerate(vals) if v), default=-1)
                    if last < 0:
                        eob["run"] += 1
                        if eob["run"] == 0x7FFF:
                            flush()
                        continue
                    flush()
                    r = 0
                    for ix in range(last + 1):
                        v = vals[ix]
                        if v == 0:
                            r += 1
                            continue
                        while r > 15:
                            sym("ac", tid, 0xF0)
                            r -= 16
                        s_ = _size(v)
                        sym("ac", tid, (r << 4) | s_)
                        bits(v if v >= 0 else v + (1 << s_) - 1, s_)
                        r = 0
                    if last < s_hi - s_lo:
                        eob["run"] += 1
                        if eob["run"] == 0x7FFF:
                            flush()
                else:  # refinement (libjpeg encode_mcu_AC_refine order)
                    absv = [abs(int(zzb[k])) >> al for k in range(s_lo, s_hi + 1)]
                    eobi = max((ix for ix, t in enumerate(absv) if t == 1), default=-1)
                    r = 0
                    br: list[int] = []  # correction bits pending emission
                    for ix, t in enumerate(absv):
                        if t == 0:
                            r += 1
                            continue
                        # ZRL only when a newly-nonzero coef still follows;
                        # trailing runs fold into the EOB run.
                        while r > 15 and ix <= eobi:
                            flush()
                            sym("ac", tid, 0xF0)
                            r -= 16
                            for b in br:
                                bits(b, 1)
                            br = []
                        if t > 1:  # history-nonzero: buffer one correction bit
                            br.append(t & 1)
                            continue
                        flush()
                        sym("ac", tid, (r << 4) | 1)
                        bits(1 if int(zzb[s_lo + ix]) > 0 else 0, 1)
                        for b in br:
                            bits(b, 1)
                        br = []
                        r = 0
                    if r > 0 or br:
                        eob["run"] += 1
                        eob["bits"].extend(br)
                        if eob["run"] == 0x7FFF:
                            flush()
        flush()
        return ev, sym_sets

    # ---- emit the stream
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes((0xFF, marker)))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    def dqt(tid_: int, q: np.ndarray) -> None:
        body = bytearray((tid_,))
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
    seg(0xC2, bytes(sof))
    if restart:
        seg(0xDD, restart.to_bytes(2, "big"))

    for comp_idx, s_lo, s_hi, ah, al in scans:
        ev, sym_sets = scan_events(comp_idx, s_lo, s_hi, ah, al)
        tables: dict[tuple[str, int], dict[int, tuple[int, int]]] = {}
        for key in sorted(sym_sets, key=str):
            counts, syms, enc = _canonical(sym_sets[key] or {0})
            tables[key] = enc
            cls_bit = 0x00 if key[0] == "dc" else 0x10
            seg(0xC4, bytes((cls_bit | key[1],)) + counts + syms)
        sos = bytearray((len(comp_idx),))
        for ci in comp_idx:
            tid_ = comps[ci]["tid"]
            sos += bytes((ci + 1, (tid_ << 4) | tid_))
        sos += bytes((s_lo, s_hi, (ah << 4) | al))
        seg(0xDA, bytes(sos))
        bw = _BitWriter()
        rstc = 0
        for e in ev:
            if e[0] == "rst":
                bw.align()
                bw.out.extend(bytes((0xFF, 0xD0 + (rstc & 7))))
                rstc += 1
            elif e[0] == "sym":
                code, ln = tables[e[1]][e[2]]
                bw.put(code, ln)
            else:
                bw.put(e[1], e[2])
        bw.align()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# --- 4-component (Adobe CMYK/YCCK) baseline encoder -----------------------------
# Independent of the decoder like the encoders above: plane padding,
# per-component sampling, the APP14 flag and the inverted-CMYK storage
# convention are all re-stated here from the public spec/libjpeg docs,
# so a convention drift on either side breaks the round-trip.


def encode_cmyk(
    planes: list[np.ndarray],
    h: int,
    w: int,
    samp: list[tuple[int, int]] | None = None,
    q: np.ndarray = Q_ONES,
    transform: int | None = 0,
    restart: int = 0,
) -> bytes:
    """Baseline 4-component JPEG per the Adobe convention. ``planes``
    are the four STORED (already-inverted, and for transform=2
    already-YCCK) uint8 channels; planes[i] must be the component's
    own resolution ``ceil(h*Vi/vmax) x ceil(w*Hi/hmax)`` (the encoder
    edge-pads to the MCU grid). ``transform`` writes the APP14 flag
    (None = omit the marker entirely — decoders must then assume
    plain CMYK)."""
    samp = samp or [(1, 1)] * 4
    assert len(planes) == 4 and len(samp) == 4
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = []
    for (H, V), p in zip(samp, planes):
        cw, ch_ = -(-(w * H) // hmax), -(-(h * V) // vmax)
        assert p.shape == (ch_, cw), (p.shape, (ch_, cw))
        padded = np.empty((mcuy * V * 8, mcux * H * 8), np.uint8)
        padded[:ch_, :cw] = p
        padded[ch_:, :cw] = p[ch_ - 1 : ch_, :]
        padded[:, cw:] = padded[:, cw - 1 : cw]
        comps.append({"q": q, "H": H, "V": V, "plane": padded})

    def mcu_stream():
        preds = [0] * 4
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and n_mcu and n_mcu % restart == 0:
                    yield ("rst", None, None)
                    preds = [0] * 4
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

    dc_set: set[int] = set()
    ac_set: set[int] = set()
    recorded = []
    for kind, ci, syms in mcu_stream():
        recorded.append((kind, ci, syms))
        if kind == "blk":
            for sk, sym, _v in syms:
                (dc_set if sk == "dc" else ac_set).add(sym)
    dc_counts, dc_syms, dc_enc = _canonical(dc_set or {0})
    ac_counts, ac_syms, ac_enc = _canonical(ac_set or {0})

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes((0xFF, marker)))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    if transform is not None:
        seg(0xEE, b"Adobe" + bytes((0, 100, 0, 0, 0, 0, transform)))
    body = bytearray((0,))
    for k in range(64):
        body.append(int(q.flat[ZZ[k]]))
    seg(0xDB, bytes(body))
    sof = bytearray((8,))
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(4)
    for ci, c in enumerate(comps):
        sof += bytes((ci + 1, (c["H"] << 4) | c["V"], 0))
    seg(0xC0, bytes(sof))
    seg(0xC4, bytes((0x00,)) + dc_counts + dc_syms)
    seg(0xC4, bytes((0x10,)) + ac_counts + ac_syms)
    if restart:
        seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytearray((4,))
    for ci in range(4):
        sos += bytes((ci + 1, 0x00))
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
        for sk, sym, v in syms:
            code, ln = (dc_enc if sk == "dc" else ac_enc)[sym]
            bw.put(code, ln)
            s = sym & 15 if sk == "ac" else sym
            if s:
                bw.put(v if v >= 0 else v + (1 << s) - 1, s)
    bw.align()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_multiscan(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    q_luma: np.ndarray = Q_ONES,
    q_chroma: np.ndarray = Q_ONES,
    restart: int = 0,
    tables_between: bool = False,
) -> bytes:
    """Baseline JPEG with ONE SCAN PER COMPONENT (T.81 A.2
    non-interleaved ordering) — the multi-scan sequential shape some
    encoders emit for 4:2:0. Same planes contract as :func:`encode`.
    Each component's scan covers its OWN block grid (ceil(cw/8) x
    ceil(ch/8)) in raster order with a per-scan DC predictor and,
    when ``restart`` is set, RST markers every ``restart`` data units.
    ``tables_between=True`` defers the chroma Huffman tables to
    between scan 1 and scan 2 (legal per T.81; exercises the
    decoder's inter-scan DHT handling).
    """
    h, w = y.shape
    color = cb is not None
    if color:
        assert cr is not None and cb.shape == cr.shape
        assert cb.shape == (-(-h // 16) * 8, -(-w // 16) * 8)
    comps: list[dict] = [
        {"q": q_luma, "H": 2 if color else 1, "V": 2 if color else 1, "plane": _plane_blocks(y)}
    ]
    if color:
        comps.append({"q": q_chroma, "H": 1, "V": 1, "plane": cb})
        comps.append({"q": q_chroma, "H": 1, "V": 1, "plane": cr})

    # per-component symbol streams, own raster order, per-scan pred
    per_comp: list[list] = []
    for c in comps:
        p = c["plane"]
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        pred, n, stream = 0, 0, []
        for by in range(nby):
            for bx in range(nbx):
                if restart and n and n % restart == 0:
                    stream.append(("rst", None))
                    pred = 0
                n += 1
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _fdct_quant(blk, c["q"])
                zz = [int(coef.flat[ZZ[k]]) for k in range(64)]
                stream.append(("blk", _block_symbols(zz, pred)))
                pred = zz[0]
        per_comp.append(stream)

    dc_syms: list[set[int]] = [set() for _ in comps]
    ac_syms: list[set[int]] = [set() for _ in comps]
    for ci, stream in enumerate(per_comp):
        for kind, syms in stream:
            if kind == "blk":
                for sk, sym, _v in syms:
                    (dc_syms if sk == "dc" else ac_syms)[ci].add(sym)
    dc_groups = [dc_syms[0], set().union(*dc_syms[1:])] if color else [dc_syms[0]]
    ac_groups = [ac_syms[0], set().union(*ac_syms[1:])] if color else [ac_syms[0]]
    dc_tables = [_canonical(g or {0}) for g in dc_groups]
    ac_tables = [_canonical(g or {0}) for g in ac_groups]

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

    def dht(cls: int, tid: int, table) -> None:
        counts, syms, _enc = table
        seg(0xC4, bytes(((cls << 4) | tid,)) + counts + syms)

    dqt(0, q_luma)
    if color:
        dqt(1, q_chroma)
    sof = bytearray((8,))
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comps))
    for ci, c in enumerate(comps):
        sof += bytes((ci + 1, (c["H"] << 4) | c["V"], 0 if ci == 0 else 1))
    seg(0xC0, bytes(sof))
    dht(0, 0, dc_tables[0])
    dht(1, 0, ac_tables[0])
    if color and not tables_between:
        dht(0, 1, dc_tables[1])
        dht(1, 1, ac_tables[1])
    if restart:
        seg(0xDD, restart.to_bytes(2, "big"))

    for ci, stream in enumerate(per_comp):
        if color and tables_between and ci == 1:
            dht(0, 1, dc_tables[1])
            dht(1, 1, ac_tables[1])
        tid = 0 if ci == 0 else 1
        seg(0xDA, bytes((1, ci + 1, (tid << 4) | tid, 0, 63, 0)))
        bw = _BitWriter()
        rst = 0
        dc_enc, ac_enc = dc_tables[tid][2], ac_tables[tid][2]
        for kind, syms in stream:
            if kind == "rst":
                bw.align()
                bw.out.extend(bytes((0xFF, 0xD0 + (rst & 7))))
                rst += 1
                continue
            for sk, sym, v in syms:
                code, ln = (dc_enc if sk == "dc" else ac_enc)[sym]
                bw.put(code, ln)
                s = sym & 15 if sk == "ac" else sym
                if s:
                    bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        bw.align()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
