"""Baseline JPEG (JFIF) codec — stdlib + numpy only.

Closes the last honest image stub in the multimodal path
(``operators/multimodal.py``): the container has no PIL/ffmpeg, so a
REAL compressed-image codec has to be built from the spec. Scope is
baseline sequential DCT, 8-bit, 3-component YCbCr, 4:4:4 sampling,
Huffman entropy coding:

- the ENCODER writes optimized canonical Huffman tables computed from
  the actual symbol statistics (the two-pass form of the spec's K.2
  code-length algorithm with the 16-bit cap adjustment) — no
  hardcoded Annex K tables to mistype;
- the DECODER is generic over the DHT segments in the stream, so it
  reads baseline 4:4:4 (or 4:2:0/4:2:2 via box upsampling) JPEGs
  beyond this encoder's output, provided the image uses ONE
  interleaved 3-component scan (the overwhelmingly common baseline
  layout; non-interleaved multi-scan files raise a clear
  ValueError and fall to the pipeline's marked stub path);
- DCT/IDCT are the orthonormal matrix form (``T @ B @ T.T``), exact
  inverses up to float rounding, so round-trip error is bounded by
  quantization alone (pinned by test).

Reference for the multimodal role: Zebra treats record payloads as
opaque bytes and filters extract what they understand
(/root/reference/index/recctrl.c dispatch); here the media column is
the opaque payload and this codec is one of the filters.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- tables


def _zigzag() -> np.ndarray:
    """The 64-entry zigzag index order, generated (not transcribed)."""
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        rows = rng if s % 2 else reversed(rng)
        for r in rows:
            order.append(r * 8 + (s - r))
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex-K-style base quantization tables are a quality baseline, not
# an interoperability surface (any table we write is carried in DQT),
# so a smooth synthetic ramp is fine and keeps the file typo-free.
_BASE_LUMA = (16 + 2.0 * (np.arange(8)[:, None] + np.arange(8)[None, :]) ** 1.5
              ).clip(1, 255).astype(np.int64)
_BASE_CHROMA = (17 + 4.0 * (np.arange(8)[:, None] + np.arange(8)[None, :]) ** 1.5
                ).clip(1, 255).astype(np.int64)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_BASE_LUMA, _BASE_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    t = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) * np.sqrt(0.25)
    t[0, :] = np.sqrt(1.0 / 8.0)
    return t


_T = _dct_matrix()


# ------------------------------------------------- huffman (encode)


def _code_lengths(freq_in: np.ndarray) -> np.ndarray:
    """JPEG K.2 optimal code lengths, capped at 16 bits. ``freq_in``
    has 256 symbol slots; slot 256 is the reserved symbol that keeps
    the all-ones code unused (required by the spec)."""
    freq = np.zeros(257, dtype=np.int64)
    freq[:256] = freq_in
    freq[256] = 1
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)
    while True:
        nz = np.nonzero(freq)[0]
        if nz.size < 2:
            break
        # two least-frequent chains (ties: higher symbol first, per
        # the reference algorithm's search order)
        order = nz[np.lexsort((-nz, freq[nz]))]
        c1, c2 = int(order[0]), int(order[1])
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] != -1:
            c1 = int(others[c1])
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] != -1:
            c2 = int(others[c2])
            codesize[c2] += 1
    return codesize


def _build_table(freq: np.ndarray) -> tuple[list[int], list[int]]:
    """(bits[1..16], huffval) — canonical JPEG table from symbol
    frequencies, including the >16-bit adjustment (Figure K.3)."""
    codesize = _code_lengths(freq)
    bits = np.zeros(33, dtype=np.int64)
    for cs in codesize:
        if cs > 0:
            bits[min(int(cs), 32)] += 1
    # push codes longer than 16 down into shorter slots
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # drop the reserved symbol's slot from the longest used length
    i = 16
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1
    syms = [s for s in range(256) if codesize[s] > 0]
    syms.sort(key=lambda s: (codesize[s], s))
    return [int(b) for b in bits[1:17]], syms


def _assign_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude-code) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


# ------------------------------------------------------- encoder


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """H×W float plane → (n_blocks, 8, 8) with edge replication."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = p.shape[0] // 8, p.shape[1] // 8
    return (p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(bh * bw, 8, 8))


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4, optimized
    Huffman tables)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError("image dimension exceeds JPEG's 16-bit "
                         "SOF0 height/width fields")
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    ql, qc = _quant_tables(quality)

    # forward DCT + quantize every block of every component
    comp_coefs = []
    for ci, plane in enumerate(planes):
        blocks = _component_blocks(plane) - 128.0
        coefs = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
        q = ql if ci == 0 else qc
        comp_coefs.append(
            np.round(coefs / q[None, :, :]).astype(np.int64))

    # symbol statistics (pass 1) and serialization (pass 2) share
    # this walk; collect (dc_sym, dc_bits), [(ac_sym, ac_bits)...]
    def walk(coefs: np.ndarray):
        zz = coefs.reshape(-1, 64)[:, ZIGZAG]
        prev_dc = 0
        for row in zz:
            dc = int(row[0])
            size, amp = _magnitude(dc - prev_dc)
            prev_dc = dc
            acs = []
            run = 0
            nz = np.nonzero(row[1:])[0]
            last = nz[-1] + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(row[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0, 0))  # ZRL
                    run -= 16
                s, a = _magnitude(v)
                acs.append(((run << 4) | s, s, a))
                run = 0
            if last < 63:
                acs.append((0x00, 0, 0))  # EOB
            yield (size, amp), acs

    dc_freq = [np.zeros(256, dtype=np.int64), np.zeros(256, dtype=np.int64)]
    ac_freq = [np.zeros(256, dtype=np.int64), np.zeros(256, dtype=np.int64)]
    for ci in range(3):
        t = 0 if ci == 0 else 1
        for (size, _amp), acs in walk(comp_coefs[ci]):
            dc_freq[t][size] += 1
            for sym, _s, _a in acs:
                ac_freq[t][sym] += 1

    dc_tabs = [_build_table(f) for f in dc_freq]
    ac_tabs = [_build_table(f) for f in ac_freq]
    dc_codes = [_assign_codes(*t) for t in dc_tabs]
    ac_codes = [_assign_codes(*t) for t in ac_tabs]

    bw = _BitWriter()
    # interleaved MCU order == per-component block order for 4:4:4
    # with a single scan per spec ordering: components interleave per
    # MCU (one 8x8 block each)
    walkers = [iter(walk(c)) for c in comp_coefs]
    n_blocks = comp_coefs[0].shape[0]
    for _ in range(n_blocks):
        for ci in range(3):
            t = 0 if ci == 0 else 1
            (size, amp), acs = next(walkers[ci])
            code, ln = dc_codes[t][size]
            bw.write(code, ln)
            if size:
                bw.write(amp, size)
            for sym, s, a in acs:
                code, ln = ac_codes[t][sym]
                bw.write(code, ln)
                if s:
                    bw.write(a, s)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(ql.reshape(-1)[ZIGZAG].tolist()))
    out += seg(0xFFDB, bytes([1]) + bytes(qc.reshape(-1)[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling (4:4:4)
    out += seg(0xFFC0, sof)
    for tclass, tid, (bits, vals) in (
            (0, 0, dc_tabs[0]), (0, 1, dc_tabs[1]),
            (1, 0, ac_tabs[0]), (1, 1, ac_tabs[1])):
        out += seg(0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits)
                   + bytes(vals))
    sos = bytes([3])
    for cid, tdc, tac in ((1, 0, 0), (2, 1, 1), (3, 1, 1)):
        sos += bytes([cid, (tdc << 4) | tac])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif nxt == 0xFF:
                # legal fill byte before a marker (B.1.1.2): discard
                # one 0xFF and retry — FF FF 00 is fill + stuffed FF
                # data, FF FF Dn is fill + restart, per libjpeg
                self.pos += 1
                return self._fill()
            elif 0xD0 <= nxt <= 0xD7:  # RST marker: skip, reset below
                raise _Restart()
            else:
                raise ValueError("unexpected marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def bit(self) -> int:
        return self.bits(1)


class _Restart(Exception):
    pass


def _decode_huff_tables(body: bytes) -> dict[tuple[int, int], tuple]:
    """DHT body → {(class, id): (maxcode, valptr, mincode, huffval)}"""
    tabs = {}
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        i += 1
        bits = list(body[i:i + 16])
        i += 16
        n = sum(bits)
        vals = list(body[i:i + n])
        i += n
        mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                valptr[ln] = k
                mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                maxcode[ln] = code - 1
            code <<= 1
        tabs[(tc, th)] = (mincode, maxcode, valptr, vals)
    return tabs


def _huff_decode(br: _BitReader, tab) -> int:
    mincode, maxcode, valptr, vals = tab
    code = br.bit()
    ln = 1
    while maxcode[ln] < code or maxcode[ln] == -1:
        ln += 1
        if ln > 16:
            raise ValueError("bad Huffman stream")
        code = (code << 1) | br.bit()
    return vals[valptr[ln] + code - mincode[ln]]


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB. Supports 8-bit
    3-component baseline with sampling factors 1 or 2 (box upsample)
    and restart intervals."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    while True:
        if payload[i] != 0xFF:
            raise ValueError("bad marker sync")
        # legal fill bytes: any number of 0xFF may pad before a marker
        # (B.1.1.2)
        while payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:
            raise ValueError("no scan data before EOI")
        ln = struct.unpack(">H", payload[i:i + 2])[0]
        body = payload[i + 2:i + ln]
        i += ln
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[j:j + 64], dtype=np.uint8)
                j += 64
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = zz
                qt[tq] = t.reshape(8, 8)
        elif marker == 0xC4:
            huff.update(_decode_huff_tables(body))
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            ns = body[0]
            if ns != 3:
                raise ValueError(
                    "non-interleaved / multi-scan baseline JPEG "
                    "unsupported (this decoder reads one interleaved "
                    "3-component scan)")
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c:3 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            break
        # else: APPn/COM — skip
    if comps is None:
        raise ValueError("no SOF before SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int64)
    scan_by_id = {cs: (tdc, tac) for cs, tdc, tac in scan}

    br = _BitReader(payload, i)
    pred = [0, 0, 0]
    mcu = 0
    while mcu < mcux * mcuy:
        try:
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(comps):
                tdc, tac = scan_by_id[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(br, huff[(0, tdc)])
                        diff = _extend(br.bits(s), s) if s else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, huff[(1, tac)])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block")
                            blk[k] = _extend(br.bits(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk[UNZIGZAG].reshape(8, 8)
            mcu += 1
            if restart_interval and mcu % restart_interval == 0 \
                    and mcu < mcux * mcuy:
                # byte-align and consume the RST marker; optional FF
                # fill bytes may pad before it (B.1.1.2). A missing
                # RSTn here means the entropy stream desynced — raise
                # like the other malformed-input paths instead of
                # decoding garbage coefficients.
                br.nbits = 0
                while (payload[br.pos] == 0xFF
                       and payload[br.pos + 1] == 0xFF):
                    br.pos += 1
                if not (payload[br.pos] == 0xFF
                        and 0xD0 <= payload[br.pos + 1] <= 0xD7):
                    raise ValueError("missing restart marker")
                br.pos += 2
                pred = [0, 0, 0]
        except _Restart:
            br.nbits = 0
            br.pos += 2
            pred = [0, 0, 0]

    planes = []
    for c in comps:
        q = qt[c["tq"]]
        de = c["coef"] * q[None, :, :]
        blocks = np.einsum("ji,njk,kl->nil", _T, de.astype(np.float64), _T)
        bh, bw_ = c["bh"], c["bw"]
        plane = (blocks.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw_ * 8)) + 128.0
        # box-upsample to full resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
