"""
BGZF + BAM writing (the reverse of native/bam.cc's reader).

Used by the benchmark workload generator (bench_batch.synth) and tests;
also the building block for any future BAM-emitting op. Pure Python but
numpy-vectorized where it counts: fixed-layout record bodies assemble as
byte arrays, zlib does the deflate.

Format reference: SAMv1 spec (BAM §4.2, BGZF §3).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterable, List, Sequence, Tuple

import numpy as np

_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")

# base char -> BAM 4-bit nibble (=ACMGRSVTWYHKDBN)
_CHAR2NIB = np.zeros(256, np.uint8)
for i, ch in enumerate("=ACMGRSVTWYHKDBN"):
    _CHAR2NIB[ord(ch)] = i
    _CHAR2NIB[ord(ch.lower())] = i


def write_bgzf(path: str, payload: bytes, level: int = 6):
    """Write `payload` as BGZF (<=64 KiB members + EOF block)."""
    with open(path, "wb") as f:
        for i in range(0, len(payload), 60000):
            chunk = payload[i:i + 60000]
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            cdata = co.compress(chunk) + co.flush()
            xlen = 6
            bsize = 12 + xlen + len(cdata) + 8
            f.write(struct.pack("<BBBBIBBH", 0x1f, 0x8b, 8, 4, 0, 0,
                                0xff, xlen))
            f.write(struct.pack("<BBHH", 66, 67, 2, bsize - 1))
            f.write(cdata)
            f.write(struct.pack("<II", zlib.crc32(chunk) & 0xffffffff,
                                len(chunk)))
        f.write(_BGZF_EOF)


def bam_header(refs: Sequence[Tuple[str, int]],
               text: str = "@HD\tVN:1.6\tSO:coordinate\n") -> bytes:
    out = [b"BAM\x01", struct.pack("<i", len(text)), text.encode(),
           struct.pack("<i", len(refs))]
    for name, length in refs:
        nb = name.encode() + b"\x00"
        out.append(struct.pack("<i", len(nb)) + nb +
                   struct.pack("<i", length))
    return b"".join(out)


def bam_record(qname: str, flag: int, ref_id: int, pos: int, mapq: int,
               cigar: List[Tuple[int, str]], mate_ref_id: int,
               mate_pos: int, tlen: int, seq: str, qual: bytes,
               tags: bytes = b"") -> bytes:
    """One BAM record body (prefixed with its block_size)."""
    ops = "MIDNSHP=X"
    cig = b"".join(struct.pack("<I", (n << 4) | ops.index(op))
                   for n, op in cigar)
    qn = qname.encode() + b"\x00"
    l_seq = len(seq)
    nibs = _CHAR2NIB[np.frombuffer(seq.encode(), np.uint8)]
    if l_seq % 2:
        nibs = np.append(nibs, 0)
    seq4 = ((nibs[0::2] << 4) | nibs[1::2]).astype(np.uint8).tobytes()
    body = (struct.pack("<iiBBHHHiiii", ref_id, pos, len(qn), mapq,
                        4680, len(cigar), flag, l_seq, mate_ref_id,
                        mate_pos, tlen) +
            qn + cig + seq4 + qual + tags)
    return struct.pack("<i", len(body)) + body


def nm_tag(nm: int) -> bytes:
    return b"NMi" + struct.pack("<i", nm)
