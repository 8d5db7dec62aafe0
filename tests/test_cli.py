"""End-to-end CLI tests: the reference workloads 1-3 (SURVEY.md intro)
driven through the mirrored command surface."""

import struct

import numpy as np
import pytest

from kiss_tpu import cli
from kiss_tpu.utils import codec, fasta
from tests import oracle


@pytest.fixture(scope="module")
def fa_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    text = oracle.random_dna(20_000, seed=99)
    path = tmp / "ref.fa"
    fasta.write_fasta(path, [fasta.FastaRecord("chr1", text)])
    return str(path), text


def test_suffix_sort_command(fa_path, capsys):
    path, _ = fa_path
    assert cli.main(["suffix_sort", "-k", "64", path]) == 0
    assert (
        cli.main(
            ["suffix_sort", "-s", "prefix_doubling", "-k", "-1", path]
        )
        == 0
    )


def test_generic_rejected(fa_path):
    path, _ = fa_path
    with pytest.raises(SystemExit):
        cli.main(["suffix_sort", "-g", path])


def test_build_then_query(fa_path, tmp_path):
    path, text = fa_path
    assert cli.main(["fmindex_build", path]) == 0

    q = codec.to_string(text[500:511])
    assert cli.main(["fmindex_query", "-q", q, "-n", "3", path]) == 0

    # batch file: u32 len, u32 count, fixed-length ASCII patterns
    # (reference: include/command/fmindex_query.hpp:66-75)
    rng = np.random.default_rng(1)
    qlen, nq = 11, 40
    pats = []
    for _ in range(nq):
        p = int(rng.integers(0, len(text) - qlen))
        pats.append(codec.to_string(text[p : p + qlen]))
    bpath = tmp_path / "patterns.bin"
    with open(bpath, "wb") as f:
        f.write(struct.pack("<II", qlen, nq))
        for p in pats:
            f.write(p.encode())
    assert cli.main(["fmindex_query", "-b", str(bpath), path]) == 0


def test_version():
    assert cli.main(["-v"]) == 0
