"""Generate resource/sRGB.icc -- a minimal valid ICC v2 display profile
for the sRGB color space, written from the ICC.1 spec (header + tag table
+ desc/wtpt/rXYZ/gXYZ/bXYZ/rTRC/gTRC/bTRC/cprt tags).

The reference ships resource/sRGB.icc for save_img's ICC embedding
(reference MetLib/fileio.py:85-131); that binary is not redistributable
here, so this emits an equivalent profile: sRGB primaries
Bradford-adapted to the D50 PCS, gamma-2.2 curve approximation.

Regenerate with: python tools/make_srgb_icc.py
"""

import os
import struct


def s15f16(x: float) -> bytes:
    return struct.pack(">i", round(x * 65536))


def xyz_tag(x: float, y: float, z: float) -> bytes:
    return b"XYZ " + b"\0" * 4 + s15f16(x) + s15f16(y) + s15f16(z)


def curv_gamma(g: float) -> bytes:
    # one-entry curveType = gamma in u8Fixed8
    return b"curv" + b"\0" * 4 + struct.pack(">I", 1) + struct.pack(
        ">H", round(g * 256))


def desc_tag(text: str) -> bytes:
    ascii_ = text.encode() + b"\0"
    return (b"desc" + b"\0" * 4 + struct.pack(">I", len(ascii_)) + ascii_
            + struct.pack(">I", 0) + struct.pack(">I", 0)   # unicode
            + struct.pack(">H", 0) + b"\0"                   # scriptcode
            + b"\0" * 67)


def text_tag(text: str) -> bytes:
    return b"text" + b"\0" * 4 + text.encode() + b"\0"


def build() -> bytes:
    # sRGB primaries Bradford-adapted to D50 (ICC PCS), per the spec's
    # sRGB annex values
    tags = [
        (b"desc", desc_tag("sRGB (MetDetPy-TPU minimal)")),
        (b"cprt", text_tag("public domain")),
        (b"wtpt", xyz_tag(0.9642, 1.0000, 0.8249)),
        (b"rXYZ", xyz_tag(0.4360, 0.2225, 0.0139)),
        (b"gXYZ", xyz_tag(0.3851, 0.7169, 0.0971)),
        (b"bXYZ", xyz_tag(0.1431, 0.0606, 0.7139)),
        (b"rTRC", curv_gamma(2.2)),
    ]
    # share one gamma curve for g/b
    trc = tags[-1][1]
    tags.append((b"gTRC", trc))
    tags.append((b"bTRC", trc))

    # layout: 128B header + tag table + payloads (4-byte aligned, shared
    # payloads deduped by content)
    table_size = 4 + 12 * len(tags)
    offsets: dict[bytes, int] = {}
    payload = b""
    entries = []
    base = 128 + table_size
    for sig, data in tags:
        if data in offsets:
            off = offsets[data]
        else:
            off = base + len(payload)
            offsets[data] = off
            payload += data + b"\0" * (-len(data) % 4)
        entries.append((sig, off, len(data)))
    size = base + len(payload)

    header = b"".join([
        struct.pack(">I", size),
        b"\0\0\0\0",                      # CMM
        struct.pack(">I", 0x02200000),    # version 2.2.0
        b"mntr", b"RGB ", b"XYZ ",
        struct.pack(">6H", 2026, 1, 1, 0, 0, 0),
        b"acsp",
        b"\0" * 4,                        # platform
        struct.pack(">I", 0),             # flags
        b"\0" * 4, b"\0" * 4,             # manufacturer, model
        b"\0" * 8,                        # attributes
        struct.pack(">I", 0),             # rendering intent: perceptual
        s15f16(0.9642) + s15f16(1.0) + s15f16(0.8249),  # PCS illuminant
        b"\0" * 4,                        # creator
        b"\0" * 44,                       # profile ID + reserved
    ])
    assert len(header) == 128, len(header)
    table = struct.pack(">I", len(tags)) + b"".join(
        sig + struct.pack(">II", off, ln) for sig, off, ln in entries)
    return header + table + payload


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "resource", "sRGB.icc")
    data = build()
    with open(out, "wb") as f:
        f.write(data)
    print(out, len(data), "bytes")
