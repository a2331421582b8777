"""DICOM tag dump (golden: reference tests/1.DCM.out).

The reference repo ships a DICOM golden pair but no dicom parser in
src/ — the fixture's rule was recovered from the bytes: for every data
element outside the file-meta group (0002), whose VR is a string type,
emit one line ``(gggg,eeee): value`` with the value stripped of
padding spaces/NULs (DICOM pads values to even length), lines joined
by break_line inside one paragraph (so the renderer's paragraph close
yields the golden's trailing blank line).

Wire format handled: 128-byte preamble + ``DICM`` magic, explicit-VR
little endian (the transfer syntax of the fixture, 1.2.840.10008.1.2.1
— and of most files in the wild); implicit-VR elements inside an
explicit file (private groups) are skipped by VR sniff.  Undefined
lengths (0xFFFFFFFF, sequences) stop the scan — pixel data follows.
"""

from __future__ import annotations

import struct

from docwire_spark.kernel import events as E

#: VRs whose values are character data (PS3.5 §6.2)
STRING_VRS = frozenset(
    ("AE", "AS", "CS", "DA", "DS", "DT", "IS", "LO", "LT", "PN", "SH",
     "ST", "TM", "UI", "UT")
)

#: explicit-VR types with a 12-byte header (2-byte reserved + 4-byte
#: length)
LONG_VRS = frozenset(("OB", "OW", "OF", "SQ", "UT", "UN"))


def is_dicom(data: bytes) -> bool:
    return len(data) >= 132 and data[128:132] == b"DICM"


def dicom_to_events(data: bytes):
    if not is_dicom(data):
        raise ValueError("not a DICOM file (missing DICM magic)")
    pos = 132
    n = len(data)
    lines: list[str] = []
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", data, pos)
        vr_raw = data[pos + 4:pos + 6]
        if vr_raw.isalpha() and vr_raw.isupper():
            vr = vr_raw.decode("ascii")
            if vr in LONG_VRS:
                if pos + 12 > n:
                    break
                (length,) = struct.unpack_from("<I", data, pos + 8)
                hdr = 12
            else:
                (length,) = struct.unpack_from("<H", data, pos + 6)
                hdr = 8
        else:  # implicit-VR element: 4-byte length, value skipped
            vr = ""
            (length,) = struct.unpack_from("<I", data, pos + 4)
            hdr = 8
        if length == 0xFFFFFFFF:  # undefined length (SQ/pixel data)
            break
        if group != 0x0002 and vr in STRING_VRS:
            val = data[pos + hdr:pos + hdr + length]
            lines.append(
                f"({group:04x},{elem:04x}): "
                + val.strip(b"\x00 ").decode("latin-1")
            )
        pos += hdr + length

    evs = [(E.DOCUMENT, None), (E.PARAGRAPH, None)]
    for k, line in enumerate(lines):
        if k:
            evs.append((E.BREAK_LINE, None))
        evs.append((E.TEXT, line))
    evs.append((E.CLOSE_PARAGRAPH, None))
    evs.append((E.CLOSE_DOCUMENT, None))
    return evs, {}
