"""
Input robustness: .bai-guided ranged decode and unsorted-BAM handling
(reference auto-sorts any input via samtools, samtools_ops.py:13-67;
its pooling extraction relies on indexed fetch, polymorpher.py:275-310).
"""

import gzip
import os
import struct
import zlib

import numpy as np
import pytest

from instrain_tpu.io.bam import decode_bam

D = "/root/reference/test/test_data/"
N5SUB = D + "N5_271_010G1_scaffold_min1000.fa-vs-N5_271_010G1.sorted.bam.sub"


def test_ranged_decode_matches_full():
    if not os.path.exists(N5SUB):
        pytest.skip("fixture missing")
    full = decode_bam(N5SUB, baq=False)
    rids = sorted(set(full.ref_id.tolist()))[:5]
    names = [full.ref_names[r] for r in rids]
    sub = decode_bam(N5SUB, baq=False, scaffolds=names)
    assert sub.ranged
    assert not full.ranged
    assert sub.n_records < full.n_records
    for nm, rid in zip(names, rids):
        rid2 = sub.name_to_ref_id[nm]
        fa = np.nonzero(full.ref_id == rid)[0]
        fb = np.nonzero(sub.ref_id == rid2)[0]
        assert len(fa) == len(fb), nm
        for f in ("pos", "flag", "mapq", "nm", "tlen", "mate_pos"):
            assert np.array_equal(getattr(full, f)[fa],
                                  getattr(sub, f)[fb]), (nm, f)
        for ia, ib in zip(fa.tolist(), fb.tolist()):
            ea = slice(full.ev_off[ia], full.ev_off[ia] + full.ev_len[ia])
            eb = slice(sub.ev_off[ib], sub.ev_off[ib] + sub.ev_len[ib])
            assert np.array_equal(full.ev_pos[ea], sub.ev_pos[eb])
            assert np.array_equal(full.ev_base[ea], sub.ev_base[eb])
            # post-tweak quals too: the overlap tweak is per-pair within
            # one scaffold, so the ranged subset reproduces it
            assert np.array_equal(full.ev_qual[ea], sub.ev_qual[eb])


def test_ranged_decode_no_index_falls_back(tmp_path, sars_bam):
    """Without a .bai, scaffolds= falls back to the full decode."""
    import shutil
    p = tmp_path / "noindex.bam"
    shutil.copy(sars_bam, p)
    bam = decode_bam(str(p), baq=False, scaffolds=["MT039887.1"])
    assert not bam.ranged
    assert bam.n_records > 0


def _write_bgzf(path, payload: bytes):
    with open(path, "wb") as f:
        for i in range(0, len(payload), 60000):
            chunk = payload[i:i + 60000]
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            cdata = co.compress(chunk) + co.flush()
            xlen = 6
            bsize = 12 + xlen + len(cdata) + 8
            f.write(struct.pack("<BBBBIBBH", 0x1f, 0x8b, 8, 4, 0, 0, 0xff,
                                xlen))
            f.write(struct.pack("<BBHH", 66, 67, 2, bsize - 1))
            f.write(cdata)
            f.write(struct.pack("<II", zlib.crc32(chunk) & 0xffffffff,
                                len(chunk)))
        f.write(bytes.fromhex("1f8b08040000000000ff0600424302001b0003"
                              "000000000000000000"))


def test_unsorted_bam_is_sorted_on_decode(tmp_path, sars_bam):
    """A position-shuffled BAM decodes to the same sorted record table
    (the decoder detects the violation and coordinate-sorts natively —
    reference behavior: samtools sort on any input)."""
    raw = gzip.open(sars_bam, "rb").read()
    assert raw[:4] == b"BAM\x01"
    l_text, = struct.unpack("<i", raw[4:8])
    p = 8 + l_text
    n_ref, = struct.unpack("<i", raw[p:p + 4]); p += 4
    for _ in range(n_ref):
        ln, = struct.unpack("<i", raw[p:p + 4])
        p += 4 + ln + 4
    header = raw[:p]
    recs = []
    while p + 4 <= len(raw):
        bs, = struct.unpack("<i", raw[p:p + 4])
        recs.append(raw[p:p + 4 + bs])
        p += 4 + bs
    rng = np.random.default_rng(0)
    order = rng.permutation(len(recs))
    shuffled = tmp_path / "shuffled.bam"
    _write_bgzf(str(shuffled), header + b"".join(recs[i] for i in order))

    a = decode_bam(sars_bam, baq=False, tweak_overlaps=False)
    b = decode_bam(str(shuffled), baq=False, tweak_overlaps=False)
    assert a.n_records == b.n_records
    # sorted positions identical
    assert np.array_equal(a.pos, b.pos)
    # record multisets identical
    ta = sorted(zip(a.pos.tolist(), a.flag.tolist(), a.mapq.tolist(),
                    a.nm.tolist(), a.tlen.tolist()))
    tb = sorted(zip(b.pos.tolist(), b.flag.tolist(), b.mapq.tolist(),
                    b.nm.tolist(), b.tlen.tolist()))
    assert ta == tb
    # pileup counts identical (no overlap tweak: tie order at equal
    # positions is input-order dependent, exactly as samtools sort is)
    qa = np.zeros(a.n_qnames, np.int32)
    qb = np.zeros(b.n_qnames, np.int32)
    ca = a.build_counts(0, qa, 1, int(a.ref_lens[0]))
    cb = b.build_counts(0, qb, 1, int(b.ref_lens[0]))
    assert np.array_equal(ca, cb)


def test_pooling_uses_ranged_path(monkeypatch):
    """compare pooling requests a scaffold-ranged decode."""
    if not os.path.exists(N5SUB):
        pytest.skip("fixture missing")
    import instrain_tpu.compare.pooling as pooling
    seen = {}
    orig = pooling.decode_bam

    def spy(path, **kw):
        bam = orig(path, **kw)
        seen["scaffolds"] = kw.get("scaffolds")
        seen["ranged"] = bam.ranged
        return bam

    monkeypatch.setattr(pooling, "decode_bam", spy)
    full = decode_bam(N5SUB, baq=False)
    rid = sorted(set(full.ref_id.tolist()))[0]
    name = full.ref_names[rid]
    rdic = {name: {q: 0 for q in full.qnames}}
    pooling.extract_snvs_from_bam(N5SUB, rdic, {name: {5, 10}})
    assert seen["scaffolds"] == [name]
    assert seen["ranged"]
