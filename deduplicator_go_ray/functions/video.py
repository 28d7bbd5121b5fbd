"""Pure-stdlib animated-GIF codec + real video frame kernel.

The container ships no video library (no ffmpeg/PyAV/cv2), so the
"real" video decode behind the multimodal actor-pool slot is
implemented from the public GIF89a specification (CompuServe GIF89a,
1990; also W3C-mirrored) — the one genuinely public animation format
decodable with nothing but the standard library: LZW-decompress each
image block (variable-width codes, 12-bit cap, clear/EOI), de-interlace
when flagged, and composite frames onto the logical-screen canvas
honoring per-frame regions, transparency, and disposal methods 0-3.
Anything that is not a GIF raises ``ValueError`` (surfaced in-band as
DECODE_ERROR by the stage, ≙ the reference's in-band hash-error rows,
files/hash.go:245-264).

``encode_gif`` is the matching minimal writer used by test fixtures:
a global palette built from the frames' actual colors and the classic
"emit a CLEAR code before the decoder's dictionary would grow past the
initial width" trick, so every code is written at ``min_code_size+1``
bits — bigger than a real encoder's output but byte-exact valid GIF.

Frame compositing semantics follow the spec + the de-facto rendering
rules every browser implements (disposal 2 restores the *frame region*
to transparent-or-background; disposal 3 restores the previous canvas).
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# interlace pass layout: (first row, stride) per GIF89a appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(data: bytes) -> bool:
    return data[:6] in _GIF_SIGS


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes (min+1 … 12
    bits), CLEAR resets the table, EOI ends the stream.

    Preallocated-array table (VERDICT r3 #6): every non-root table
    entry's string is a SUBSTRING OF THE OUTPUT ALREADY DECODED
    (consecutive codes emit consecutively, so entry k = prev's span
    plus its following byte — one contiguous slice), so the table is
    two flat int lists ``(start, length)`` into the output buffer and
    emitting an entry is a single C-speed bytearray slice copy.  The
    old table of materialized ``bytes`` objects allocated a fresh
    string per code (O(total output) bytes of churn); this is O(1)
    Python work per code."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    out = bytearray(n_pixels)
    out_pos = 0
    # table slots clear+2 … 4095; roots (< clear) emit their own byte
    starts = [0] * 4096
    lengths = [0] * 4096
    next_code = eoi + 1
    prev_start = -1
    prev_len = 0
    bitpos = 0
    total_bits = len(data) * 8
    # vectorized code extraction (profile: per-code int.from_bytes was
    # ~90% of decode wall on root-heavy streams): the code WIDTH only
    # changes when next_code reaches 1<<code_size, and the table grows
    # by exactly one per code (except the first after a clear), so the
    # number of upcoming same-width codes is known in advance — gather
    # that whole run in one numpy pass (3-byte little-endian window per
    # code), truncating at the first CLEAR/EOI (data-dependent resets).
    d = np.frombuffer(data, np.uint8).astype(np.int32)
    d = np.concatenate([d, np.zeros(3, np.int32)])  # 3-byte window pad
    pending: list[int] = []
    pend_i = 0
    while out_pos < n_pixels:
        if pend_i >= len(pending):
            if bitpos + code_size > total_bits:
                break
            limit = 1 << code_size
            if next_code < limit and code_size < 12:
                run = (limit - next_code) + (1 if prev_start < 0 else 0)
            else:
                run = 8192                  # width can no longer change
            run = min(run, (total_bits - bitpos) // code_size)
            if run <= 0:
                break
            if run >= 16:
                pos = bitpos + code_size * np.arange(run, dtype=np.int64)
                bi = pos >> 3
                word = d[bi] | (d[bi + 1] << 8) | (d[bi + 2] << 16)
                codes = (word >> (pos & 7).astype(np.int32)) \
                    & np.int32((1 << code_size) - 1)
                ctrl = np.nonzero((codes == clear) | (codes == eoi))[0]
                if ctrl.size:
                    codes = codes[:int(ctrl[0]) + 1]  # keep the control
                pending = codes.tolist()
            else:
                # short run (a clear-happy stream): per-batch numpy
                # overhead exceeds the scalar reads — extract inline
                pending = []
                bp = bitpos
                mask = (1 << code_size) - 1
                for _ in range(run):
                    i = bp >> 3
                    c = (int.from_bytes(data[i:i + 3], "little")
                         >> (bp & 7)) & mask
                    bp += code_size
                    pending.append(c)
                    if c == clear or c == eoi:
                        break
            pend_i = 0
        code = pending[pend_i]
        pend_i += 1
        bitpos += code_size
        if code == clear:
            next_code = eoi + 1
            code_size = min_code_size + 1
            prev_start = -1
            pending = []
            continue
        if code == eoi:
            break
        if prev_start < 0:
            if code >= clear:
                raise ValueError("LZW: first code after clear out of range")
            out[out_pos] = code
            prev_start, prev_len = out_pos, 1
            out_pos += 1
        else:
            if code < clear:                       # root: one byte
                ln = 1
                if out_pos < n_pixels:
                    out[out_pos] = code
            elif code < next_code:                 # known entry: copy span
                s = starts[code]
                ln = lengths[code]
                end = min(out_pos + ln, n_pixels)
                out[out_pos:end] = out[s:s + (end - out_pos)]
            elif code == next_code:                # KwK: prev + prev[0]
                ln = prev_len + 1
                end = min(out_pos + ln, n_pixels)
                ncopy = min(prev_len, end - out_pos)
                out[out_pos:out_pos + ncopy] = \
                    out[prev_start:prev_start + ncopy]
                if end - out_pos > prev_len:
                    # final byte = prev's FIRST byte (not a blind
                    # ln-byte slice: its last source index is out_pos
                    # itself, unwritten at snapshot time)
                    out[out_pos + prev_len] = out[prev_start]
            else:
                raise ValueError("LZW: code beyond table")
            # new table entry = prev's string + this entry's first
            # byte — contiguous in out because prev emitted just before
            if next_code < 4096:
                starts[next_code] = prev_start
                lengths[next_code] = prev_len + 1
                next_code += 1
            prev_start, prev_len = out_pos, ln
            out_pos += ln
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
            pending = []                   # width changed: re-extract
    if out_pos < n_pixels:
        raise ValueError(
            f"LZW: stream ended at {out_pos}/{n_pixels} pixels")
    return bytes(out[:n_pixels])


def decode_gif(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes → ``(frames, durations_ms)``: frames is an
    (N, H, W, 3) uint8 array of fully composited canvas snapshots (one
    per image block), durations the per-frame delay in ms (int32; a
    zero delay stays 0 — samplers treat it as a still)."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((sh, sw, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    frames: list[np.ndarray] = []
    durations: list[int] = []
    # pending graphic-control state (applies to the NEXT image block)
    disposal, delay_cs, trans_idx = 0, 0, -1

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                                   # trailer
            break
        if block == 0x21:                                   # extension
            label = data[pos]
            pos += 1
            sub: list[bytes] = []
            while True:
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                sub.append(data[pos:pos + ln])
                pos += ln
            if label == 0xF9 and sub:                       # graphic control
                gc = sub[0]
                disposal = (gc[0] >> 2) & 0x07
                delay_cs = int.from_bytes(gc[1:3], "little")
                trans_idx = gc[3] if gc[0] & 0x01 else -1
            continue
        if block != 0x2C:                                   # image descriptor
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipack = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if ipack & 0x80:                                    # local table
            n = 2 << (ipack & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("image block with no color table")
        min_code = data[pos]
        pos += 1
        chunks: list[bytes] = []
        while True:
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(data[pos:pos + ln])
            pos += ln
        idx = np.frombuffer(
            _lzw_decode(min_code, b"".join(chunks), w * h), np.uint8)
        idx = idx.reshape(h, w)
        if ipack & 0x40:                                    # interlaced
            de = np.empty_like(idx)
            src = 0
            for first, stride in _INTERLACE_PASSES:
                rows = range(first, h, stride)
                de[list(rows)] = idx[src:src + len(rows)]
                src += len(rows)
            idx = de

        saved = canvas.copy() if disposal == 3 else None
        # clip to the logical screen (malformed frames that overhang it)
        ch_, cw_ = min(h, sh - top), min(w, sw - left)
        if ch_ <= 0 or cw_ <= 0:
            raise ValueError("frame region outside logical screen")
        region = canvas[top:top + ch_, left:left + cw_]
        idx_c = idx[:ch_, :cw_]
        rgb = pal[np.minimum(idx_c, len(pal) - 1)]
        if trans_idx >= 0:
            opaque = idx_c != trans_idx
            region[opaque] = rgb[opaque]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        durations.append(delay_cs * 10)

        if disposal == 2:                                   # restore to bg
            bg = (gct[bg_idx] if gct is not None and bg_idx < len(gct)
                  else np.zeros(3, np.uint8))
            canvas[top:top + ch_, left:left + cw_] = bg
        elif disposal == 3 and saved is not None:           # restore previous
            canvas = saved
        disposal, delay_cs, trans_idx = 0, 0, -1

    if not frames:
        raise ValueError("GIF contains no image blocks")
    return np.stack(frames), np.asarray(durations, np.int32)


class _BitWriter:
    """LSB-first bit packer (the GIF LZW bit order)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def encode_gif(
    frames: "np.ndarray | list[np.ndarray]",
    durations_ms: "list[int] | None" = None,
    *,
    offsets: "list[tuple[int, int]] | None" = None,
    transparent: "list | None" = None,
    disposals: "list[int] | None" = None,
    interlace: bool = False,
    canvas_size: "tuple[int, int] | None" = None,
) -> bytes:
    """Fixture-grade GIF89a writer: (N, h, w, 3) uint8 frames → bytes.

    Per-frame ``offsets`` (left, top), ``transparent`` RGB triple
    (None = opaque; pixels of that color become transparent), and
    ``disposals`` exercise the decoder's compositing paths; the global
    palette is built from the frames' actual colors (≤ 256 distinct,
    by construction in fixtures)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    n = len(frames)
    durations_ms = durations_ms or [100] * n
    offsets = offsets or [(0, 0)] * n
    transparent = transparent if transparent is not None else [None] * n
    disposals = disposals or [1] * n
    if canvas_size is None:
        sw = max(o[0] + f.shape[1] for o, f in zip(offsets, frames))
        sh = max(o[1] + f.shape[0] for o, f in zip(offsets, frames))
    else:
        sw, sh = canvas_size

    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0)
    if len(colors) > 256:
        raise ValueError("fixture encoder: >256 distinct colors")
    # palette size = power of two ≥ max(len(colors), 4)
    bits = max(2, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[:len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += pal.tobytes()

    min_code = max(2, bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    # decoder's table grows by 1 per code after the first; clear before
    # it reaches 2**width so every code stays `width` bits
    max_run = (1 << width) - (eoi + 1) - 1

    for f, dur, (left, top), tr_rgb, disp in zip(
            frames, durations_ms, offsets, transparent, disposals):
        h, w = f.shape[:2]
        tr = lut[tuple(tr_rgb)] if tr_rgb is not None else -1
        out += b"\x21\xf9\x04"                              # GCE
        out += bytes([((disp & 7) << 2) | (1 if tr >= 0 else 0)])
        out += struct.pack("<H", dur // 10)
        out += bytes([tr if tr >= 0 else 0, 0])
        ipack = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, ipack)
        out += bytes([min_code])
        idx = np.array([[lut[tuple(px)] for px in row] for row in f],
                       np.uint8)
        if interlace:
            order = [r for first, stride in _INTERLACE_PASSES
                     for r in range(first, h, stride)]
            idx = idx[order]
        bw = _BitWriter()
        bw.write(clear, width)
        for k, code in enumerate(idx.reshape(-1).tolist()):
            if k and k % max_run == 0:
                bw.write(clear, width)
            bw.write(int(code), width)
        bw.write(eoi, width)
        payload = bw.done()
        for i in range(0, len(payload), 255):
            chunk = payload[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
