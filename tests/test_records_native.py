"""Tests for the TSV record framework and native IO bridge."""

import dataclasses

import numpy as np
import pytest

from kiss_tpu.utils import codec, fasta, native, records, serializer


@dataclasses.dataclass
class Bed:
    chrom: str
    start: int
    end: int
    tags: list


def test_record_roundtrip(tmp_path):
    rows = [Bed("chr1", 10, 20, ["a", "b"]), Bed("chr2", 5, 9, [])]
    p = str(tmp_path / "x.bed")
    records.write_records(p, rows, header=["#hdr line"])
    header, got = records.read_records(Bed, p)
    assert header == ["#hdr line"]
    assert got[0].chrom == "chr1" and got[0].start == 10
    assert got[0].tags == ["a", "b"]
    assert got[1].end == 9


def test_native_matches_python_fasta():
    data = b">a desc\nACGTN\nacg\n>b\nTTTT\n"
    want = codec.to_istring("ACGTNACGTTTT")
    np.testing.assert_array_equal(fasta.read_sequence(data), want)
    if native.available():
        np.testing.assert_array_equal(native.parse_sequence(data), want)


def test_fastq_and_gzip():
    import gzip

    fq = b"@r1\nACGT\n+\nIIII\n@r2\nggcc\n+\nIIII\n"
    want = codec.to_istring("ACGTGGCC")
    np.testing.assert_array_equal(fasta.read_sequence(fq), want)
    np.testing.assert_array_equal(
        fasta.read_sequence(gzip.compress(fq)), want
    )


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_pack_dibits_matches():
    v = np.random.default_rng(0).integers(0, 4, 997).astype(np.int8)
    np.testing.assert_array_equal(
        native.pack_dibits(v), serializer.pack_dibits(v)
    )


def test_fold_native_matches():
    v = codec.to_istring("ACGTN" * 100)
    expect = codec.fold_to_acgt(v)
    buf = np.ascontiguousarray(v)
    if native.fold_acgt_inplace(buf):
        np.testing.assert_array_equal(buf, expect)
