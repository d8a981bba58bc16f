"""BAM decode, FASTA parsing, and null model tests."""

import numpy as np
import pytest

from instrain_tpu.io import fasta
from instrain_tpu.io.bam import decode_bam
from instrain_tpu.kernels import nullmodel


def test_decode_sars(sars_bam, sars_ref_seq):
    b = decode_bam(sars_bam, ref_seqs={"MT039887.1": sars_ref_seq},
                   baq=False)
    assert b.ref_names == ["MT039887.1"]
    assert b.ref_lens[0] == 29879
    assert b.n_records == 28913
    assert len(b.qnames) == 14988
    assert (b.nm >= 0).all()          # NM tag present everywhere
    assert b.ev_pos.min() >= 0 and b.ev_pos.max() < 29879
    # events are per-record contiguous ranges
    assert (b.ev_off[1:] >= b.ev_off[:-1]).all()
    assert b.ev_off[-1] + b.ev_len[-1] == len(b.ev_pos)


def test_decode_small(small_bam):
    b = decode_bam(small_bam, baq=False, tweak_overlaps=False)
    assert b.n_records > 0
    assert len(b.ref_names) >= 1


def test_fasta_roundtrip(small_fasta):
    seqs = fasta.read_fasta(small_fasta)
    assert len(seqs) >= 1
    for name, seq in seqs.items():
        codes = fasta.seq_to_codes(seq)
        assert set(np.unique(codes)).issubset({0, 1, 2, 3, 4})
        assert fasta.codes_to_str(codes[:10]) == seq[:10].tobytes().decode()


def test_iterate_splits_reference_semantics():
    # exact contract of reference iterate_splits (profile/fasta.py:56-73)
    for s_len, window in [(10000, 10000), (10001, 10000), (25000, 10000),
                          (999, 10000), (20000, 10000), (29879, 10000)]:
        splits = list(fasta.iterate_splits(s_len, window))
        assert splits[0][0] == 0
        assert splits[-1][1] == s_len - 1
        covered = sum(e - s + 1 for s, e in splits)
        assert covered == s_len
        n_chunks = s_len // window + 1
        assert len(splits) == n_chunks


def test_scaffold_registry(small_fasta):
    reg = fasta.ScaffoldRegistry.from_fasta(small_fasta, window_length=5000)
    assert len(reg.names) >= 1
    name = reg.names[0]
    assert reg.length_of(name) == len(reg.codes[name])
    splits = reg.splits_of(name)
    assert splits[-1][1] == reg.length_of(name) - 1


def test_null_model_analytic_vs_file(ref_null_model):
    a = nullmodel.analytic_null_thresholds()
    f = nullmodel.load_null_model_file(ref_null_model)
    # same shape, same ballpark; bootstrap noise causes +-1 knife-edge diffs
    assert a.shape == f.shape
    # bootstrap noise causes knife-edge diffs, mostly +-1
    assert (np.abs(a[1:] - f[1:]) <= 1).mean() > 0.9
    assert (a[1:] == f[1:]).mean() > 0.55
    # monotone non-decreasing in coverage (within a few steps)
    assert a[10] <= a[100] <= a[1000] <= a[10000]


def test_baq_one_smoke():
    """BAQ caps qualities and never raises them."""
    from instrain_tpu.io.bam import baq_one
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 500).astype(np.uint8)
    # perfect-match read
    read = ref[100:250].copy()
    qual = np.full(150, 38, dtype=np.uint8)
    cigar = np.array([(150 << 4) | 0], dtype=np.uint32)
    out = baq_one(ref, 100, cigar, read, qual)
    assert out.shape == qual.shape
    assert (out <= qual).all()
    # high agreement -> most bases keep high quality
    assert (out >= 30).mean() > 0.9


def test_sam_nm_tag_beyond_many_tags(tmp_path):
    """NM:i is found regardless of how many optional tags precede it
    (the tag walk is unbounded; only the 11 mandatory fields are
    span-split)."""
    from instrain_tpu.io.bam import decode_bam
    tags = "\t".join(f"X{chr(65 + i % 26)}:i:{i}" for i in range(60))
    sam = tmp_path / "tags.sam"
    sam.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:s\tLN:100\n"
        f"r1\t99\ts\t1\t42\t10M\t=\t50\t60\tACGTACGTAC\tIIIIIIIIII\t{tags}"
        "\tNM:i:7\n"
        "r1\t147\ts\t50\t42\t10M\t=\t1\t-60\tACGTACGTAC\tIIIIIIIIII"
        "\tNM:i:3\n")
    bam = decode_bam(str(sam))
    assert bam.nm.tolist() == [7, 3]


def test_owned_array_lifetime_and_no_pinning(small_bam):
    """Decoded arrays are zero-copy views that keep the native buffer
    alive; derived arrays with fresh buffers do NOT pin it."""
    import gc
    from instrain_tpu.io.bam import decode_bam
    bam = decode_bam(small_bam)
    view = bam.ev_pos[:50]
    expected = view.copy()
    derived = bam.ev_pos.astype(np.int64)  # fresh buffer
    assert getattr(view, "_owner", None) is not None
    assert getattr(derived, "_owner", None) is None
    del bam
    gc.collect()
    np.testing.assert_array_equal(view, expected)
    # read-only protection
    import pytest
    with pytest.raises(ValueError):
        view[0] = 1
