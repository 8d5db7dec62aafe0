"""Conformance tests for the native LMS + induced-sort strategy
(`-s LMS_INDUCED`, csrc/kiss_lms.cpp).

Contract mirror of the reference's own (reference:
kiss_common.hpp:40-579 + tests/kiss.cpp:26-28): bounded k gives a
k-ordered permutation whose equal-k-prefix tie groups match the oracle's
structurally and in membership (order WITHIN a group unspecified, like
the reference's two strategies against each other -- test_golden.py);
k = -1 gives the unique full suffix array bit-identically.
"""

import numpy as np
import pytest

from kiss_tpu import cli
from kiss_tpu.ops.lms_native import LmsSorter
from kiss_tpu.utils import fasta, native
from tests import oracle

pytestmark = pytest.mark.skipif(
    native.lms_induced_sort(np.zeros(0, np.int8), 1) is None,
    reason="native library unavailable (no C++ toolchain)",
)

CORPORA = [
    ("random", oracle.random_dna(40_000, seed=3)),
    ("repeat", oracle.repeat_heavy_dna(30_000, unit=37, seed=4)),
    ("genome", oracle.genome_like_dna(50_000, ancestral=4096, seed=5)),
    ("tiny", oracle.random_dna(1, seed=6)),
    ("bytes", np.random.default_rng(7).integers(
        0, 256, 20_000).astype(np.int8)),
]


def _group_ids(text: np.ndarray, sa: np.ndarray, k: int) -> np.ndarray:
    n = len(text)
    pad = np.full(n + k, -1, np.int16)
    pad[:n] = np.asarray(text).astype(np.uint8)  # unsigned byte order
    win = np.lib.stride_tricks.sliding_window_view(pad, k)[: n + 1]
    keys = win[sa]
    neq = np.any(keys[1:] != keys[:-1], axis=1)
    return np.concatenate([[0], np.cumsum(neq)])


@pytest.mark.parametrize("name,text", CORPORA, ids=[c[0] for c in CORPORA])
def test_full_sort_bit_identical(name, text):
    sa = LmsSorter.get_suffix_array_dna(text, -1)
    ref = oracle.k_ordered_sa(np.asarray(text).astype(np.uint8), None)
    np.testing.assert_array_equal(sa, ref)


@pytest.mark.parametrize("name,text", CORPORA, ids=[c[0] for c in CORPORA])
@pytest.mark.parametrize("k", [1, 2, 16, 256])
def test_bounded_k_group_conformance(name, text, k):
    sa = LmsSorter.get_suffix_array_dna(text, k)
    ref = oracle.k_ordered_sa(np.asarray(text).astype(np.uint8), k)
    gids = _group_ids(text, ref, k)
    gids_ours = _group_ids(text, sa, k)
    # identical group structure (same k-prefix multiset order) ...
    np.testing.assert_array_equal(gids, gids_ours)
    # ... and same members within every tie group
    order_ref = np.lexsort((ref, gids))
    order_ours = np.lexsort((sa.astype(np.int64), gids_ours))
    np.testing.assert_array_equal(ref[order_ref], sa[order_ours])


def test_matches_device_strategy_at_group_level():
    """LMS_INDUCED vs the default device strategy: same tie groups, same
    members -- the cross-strategy conformance the reference's own two
    cores satisfy (test_golden.py shows they too differ within groups)."""
    from kiss_tpu.ops.suffix_sort import Kiss1Sorter

    text = oracle.genome_like_dna(30_000, ancestral=2048, seed=11)
    k = 32
    a = LmsSorter.get_suffix_array_dna(text, k)
    b = Kiss1Sorter.get_suffix_array_dna(text, k)
    ga, gb = _group_ids(text, a, k), _group_ids(text, b, k)
    np.testing.assert_array_equal(ga, gb)
    np.testing.assert_array_equal(
        a[np.lexsort((a, ga))], b[np.lexsort((b, gb))]
    )


def test_k_sorted_property_large():
    text = oracle.genome_like_dna(300_000, ancestral=8192, seed=12)
    sa = LmsSorter.get_suffix_array_dna(text, 64, num_threads=2)
    oracle.check_k_sorted(text, sa, 64)


def test_dtype_and_sentinel():
    text = oracle.random_dna(1000, seed=13)
    sa = LmsSorter.get_suffix_array(text, 8)
    assert sa.dtype == np.uint32
    assert sa[0] == len(text)


def test_invalid_k_rejected():
    with pytest.raises(ValueError):
        LmsSorter.get_suffix_array_dna(oracle.random_dna(100), 0)


def test_cli_lms_strategy(tmp_path):
    text = oracle.random_dna(5_000, seed=14)
    path = tmp_path / "ref.fa"
    fasta.write_fasta(path, [fasta.FastaRecord("chr1", text)])
    assert cli.main(
        ["suffix_sort", "-s", "lms_induced", "-k", "32", "-t", "2",
         str(path)]
    ) == 0


def test_cli_lms_never_autoroutes_external(tmp_path, monkeypatch):
    """Host-resident strategy: the device-memory auto-route must not
    send it to the out-of-core sorter (which ignores -s)."""
    called = {}
    monkeypatch.setenv("KISS_TPU_INCORE_CAP", "10")  # force "too big"
    import kiss_tpu.ops.external_sort as ext

    def boom(*a, **kw):  # pragma: no cover - failure path
        called["external"] = True
        raise AssertionError("LMS_INDUCED was routed out-of-core")

    monkeypatch.setattr(ext, "external_k_ordered_suffix_array", boom)
    text = oracle.random_dna(2_000, seed=15)
    path = tmp_path / "ref.fa"
    fasta.write_fasta(path, [fasta.FastaRecord("chr1", text)])
    assert cli.main(
        ["suffix_sort", "-s", "lms_induced", "-k", "16", str(path)]
    ) == 0
    assert "external" not in called
