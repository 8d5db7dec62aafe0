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


def test_suffix_sort_external_flag(fa_path):
    """--external routes through the out-of-core sorter (same contract,
    host-staged; the auto path for chm13-scale inputs)."""
    path, _ = fa_path
    assert cli.main(["suffix_sort", "--external", "-k", "64", path]) == 0


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


def test_fmindex_build_lookup_len_roundtrip(tmp_path, capsys):
    """--lookup-len writes the seed table into the archive and queries
    pick it up transparently (counts/positions unchanged)."""
    import numpy as np

    from kiss_tpu.cli import main
    from kiss_tpu.utils import codec, fasta

    rng = np.random.default_rng(5)
    text = rng.integers(0, 4, 3000).astype(np.int8)
    pat = codec.to_istring("GATTACAGA")
    text[700 : 700 + len(pat)] = pat
    text[2200 : 2200 + len(pat)] = pat
    fa = tmp_path / "ref.fa"
    fasta.write_fasta(str(fa), [fasta.FastaRecord("chr", text)])

    assert main(["fmindex_build", str(fa), "--lookup-len", "4"]) == 0
    assert main(["fmindex_query", str(fa), "-q", "GATTACAGA", "-n", "5"]) == 0
    # the loaded index derives lookup_len=4 from the archive
    from kiss_tpu.models.fm_index import FMIndex

    fmi = FMIndex(sa_intv=4)
    with open(str(fa) + ".fmi", "rb") as fin:
        fmi.load(fin)
    assert fmi.lookup_len == 4
    assert fmi.arrays.lookup.shape[0] == 4**4 + 1
    beg, end, _ = fmi.get_range(codec.to_istring("GATTACAGA"))
    assert end - beg == 2
    assert sorted(fmi.get_offsets(beg, end).tolist()) == [700, 2200]


def test_fmindex_build_k_flag(fa_path):
    """The reference declares -k on fmindex_build (reference:
    include/utils/options.hpp:133-141); here it is honored as the sort
    depth (-1 wraps to unbounded like suffix_sort, README.md:56)."""
    path, text = fa_path
    assert cli.main(["fmindex_build", "-k", "32", path]) == 0
    assert cli.main(["fmindex_query", "-q", codec.to_string(text[40:51]),
                     path]) == 0
    assert cli.main(["fmindex_build", "-k", "-1", path]) == 0


def _query_instance(monkeypatch, argv):
    """Run fmindex_query via the CLI, capturing the FMIndex instance so
    routing state (full_sa) is observable."""
    from kiss_tpu.models.fm_index import FMIndex

    seen = {}

    class Spy(FMIndex):
        def load(self, fin):
            out = super().load(fin)
            seen["fmi"] = self
            return out

    monkeypatch.setattr(cli, "FMIndex", Spy)
    assert cli.main(argv) == 0
    return seen["fmi"]


def test_provenance_sidecar_routes_locate(tmp_path, monkeypatch):
    """fmindex_build records full_sa in a `.meta` sidecar and
    fmindex_query routes locate through the fast per-row walk for
    full-sort archives, the BFS for bounded -k builds and sidecar-less
    (reference-written) archives, and honors --assume-full-sa
    (VERDICT r3 weak #3)."""
    import json
    import os

    from kiss_tpu.models import fm_index as fm

    # repeat-heavy corpus: walk-vs-BFS routing matters on long repeats
    unit = oracle.random_dna(13, seed=11)
    text = np.tile(unit, 1600)[:16_000]
    path = str(tmp_path / "rep.fa")
    fasta.write_fasta(path, [fasta.FastaRecord("chr1", text)])
    q = codec.to_string(text[26:37])

    # default build = full sort -> sidecar says full_sa -> fast walk
    assert cli.main(["fmindex_build", path]) == 0
    meta = fm.read_meta(path + ".fmi")
    assert meta is not None and meta["full_sa"] is True
    fmi = _query_instance(monkeypatch, ["fmindex_query", "-q", q, path])
    assert fmi.full_sa is True

    # sidecar lost (reference-binary archive): conservative BFS...
    os.remove(path + ".fmi" + fm.META_SUFFIX)
    fmi = _query_instance(monkeypatch, ["fmindex_query", "-q", q, path])
    assert fmi.full_sa is False
    # ...unless the user asserts provenance explicitly
    fmi = _query_instance(
        monkeypatch, ["fmindex_query", "--assume-full-sa", "-q", q, path]
    )
    assert fmi.full_sa is True

    # bounded-k build: sidecar records the bound; BFS routing stays
    assert cli.main(["fmindex_build", "-k", "32", path]) == 0
    meta = json.load(open(path + ".fmi" + fm.META_SUFFIX))
    assert meta["full_sa"] is False and meta["sort_len"] == 32
    fmi = _query_instance(monkeypatch, ["fmindex_query", "-q", q, path])
    assert fmi.full_sa is False


def test_batch_progress_log(fa_path, tmp_path, caplog):
    """Batch mode emits the reference's per-100k progress debug line
    'remain: N, time: T' (reference: include/command/
    fmindex_query.hpp:92-93)."""
    import logging

    path, text = fa_path
    assert cli.main(["fmindex_build", path]) == 0
    qlen, nq = 11, 16
    bpath = tmp_path / "pat.bin"
    with open(bpath, "wb") as f:
        f.write(struct.pack("<II", qlen, nq))
        for i in range(nq):
            f.write(codec.to_string(text[i : i + qlen]).encode())
    with caplog.at_level(logging.DEBUG, logger="kiss_tpu"):
        assert cli.main(
            ["fmindex_query", "-b", str(bpath), "--verbose", path]
        ) == 0
    msgs = [r.getMessage() for r in caplog.records]
    assert any(m.startswith("remain: 0, time: ") for m in msgs), msgs


def test_suffix_sort_stage_log_shape(tmp_path, caplog):
    """--verbose suffix_sort prints a per-stage timing table with stable
    names (the reference's per-phase spdlog stopwatches, reference:
    include/biovoltron/algo/sort/kiss1_core.hpp:244-267 /
    README.md:94-101 stage table)."""
    import logging
    import re

    # tandem-repeat text: 64-char-seed ties persist, so the wide round
    # actually runs (a random text resolves at the seed and skips it)
    unit = oracle.random_dna(13, seed=3)
    text = np.tile(unit, 2000)[:20_000]
    path = str(tmp_path / "rep.fa")
    fasta.write_fasta(path, [fasta.FastaRecord("chr1", text)])
    with caplog.at_level(logging.DEBUG, logger="kiss_tpu"):
        assert cli.main(["suffix_sort", "-k", "256", "--verbose", path]) == 0
    msgs = [r.getMessage() for r in caplog.records]
    pat = re.compile(r"^(seed_sort|wide_round|tail_refine).* elapsed \d+\.\d+$")
    staged = [m for m in msgs if pat.match(m)]
    # k=256 needs the 64-char seed plus at least one wide round
    assert any(m.startswith("seed_sort(chars=64)") for m in staged), msgs
    assert any(m.startswith("wide_round[0]") for m in staged), msgs
