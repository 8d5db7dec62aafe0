"""FM-index conformance tests.

The reference has NO FM-index tests (SURVEY.md section 4); these check
build/query/serialize against brute force and against an independent
numpy emulation of the reference data-structure layout.
"""

import io

import numpy as np
import pytest

from kiss_tpu.models.fm_index import FMIndex
from kiss_tpu.ops.suffix_sort import Kiss1Sorter
from tests import oracle


@pytest.fixture(scope="module")
def built():
    text = oracle.random_dna(30_000, seed=42)
    fmi = FMIndex(sa_intv=4, lookup_len=0).build(text)
    return text, fmi


def test_cnt_and_bwt(built):
    text, fmi = built
    n = len(text)
    sa = np.asarray(Kiss1Sorter.get_suffix_array_dna(text, -1)).astype(np.int64)
    # cnt[c] = 1 + #chars < c (reference: fm_index.hpp:303-307)
    totals = np.bincount(text, minlength=4)
    want_cnt = 1 + np.concatenate([[0], np.cumsum(totals)[:-1]])
    np.testing.assert_array_equal(np.asarray(fmi.arrays.cnt), want_cnt)
    # bwt[i] = text[sa[i]-1], 0 at sentinel row
    bwt_words = np.asarray(fmi.arrays.bwt_words)
    got_bwt = (
        bwt_words[np.arange(n + 1) // 16] >> (2 * (np.arange(n + 1) % 16))
    ) & 3
    want_bwt = np.where(sa == 0, 0, text[np.maximum(sa - 1, 0)])
    np.testing.assert_array_equal(got_bwt, want_bwt)
    assert int(fmi.arrays.pri) == int(np.nonzero(sa == 0)[0][0])


@pytest.mark.parametrize("qlen", [1, 5, 11, 20])
def test_count_and_locate_vs_bruteforce(built, qlen):
    text, fmi = built
    rng = np.random.default_rng(qlen)
    # half sampled from the text (guaranteed hits), half random
    queries = []
    for _ in range(30):
        p = int(rng.integers(0, len(text) - qlen))
        queries.append(text[p : p + qlen])
    for _ in range(30):
        queries.append(rng.integers(0, 4, qlen).astype(np.int8))
    queries = np.stack(queries)

    lens, positions, starts = fmi.batch_query(queries)
    for qi in range(len(queries)):
        want = oracle.search_all(text, queries[qi])
        got = np.sort(positions[starts[qi] : starts[qi + 1]])
        assert lens[qi] == len(want), f"count mismatch for query {qi}"
        np.testing.assert_array_equal(got, np.sort(want))


def test_batch_query_stats(built):
    text, fmi = built
    rng = np.random.default_rng(5)
    queries = []
    for _ in range(20):
        p = int(rng.integers(0, len(text) - 12))
        queries.append(text[p : p + 12])
    queries = np.stack(queries)
    total, checksum = fmi.batch_query_stats(queries)
    want_total, want_checksum = 0, 0
    for q in queries:
        hits = oracle.search_all(text, q)
        want_total += len(hits)
        want_checksum += int(hits.sum())
    assert total == want_total
    assert checksum == want_checksum


def test_fmtree(built):
    text, fmi = built
    q = text[2222 : 2222 + 13]
    np.testing.assert_array_equal(
        np.sort(fmi.fmtree(q)), np.sort(oracle.search_all(text, q))
    )


def test_single_query_interface(built):
    text, fmi = built
    q = text[1234 : 1234 + 15]
    beg, end, offs = fmi.get_range(q)
    assert offs == 0
    hits = fmi.get_offsets(beg, end)
    want = oracle.search_all(text, q)
    np.testing.assert_array_equal(np.sort(hits), np.sort(want))


def test_absent_pattern(built):
    text, fmi = built
    # a pattern absent from the text: count 0, no positions
    q = np.array([0, 1, 2, 3] * 6, dtype=np.int8)
    while len(oracle.search_all(text, q)):
        q = np.roll(q, 1)
        q[0] = 3
    beg, end, _ = fmi.get_range(q)
    assert beg == end
    assert len(fmi.get_offsets(beg, end)) == 0


def test_save_load_roundtrip(built):
    text, fmi = built
    buf = io.BytesIO()
    fmi.save(buf)
    raw = buf.getvalue()

    fmi2 = FMIndex(sa_intv=4, lookup_len=0).load(io.BytesIO(raw))
    assert fmi2 == fmi
    # query equivalence through the loaded index
    q = text[777 : 777 + 12]
    assert fmi2.get_range(q) == fmi.get_range(q)

    # re-serialization is byte-identical
    buf2 = io.BytesIO()
    fmi2.save(buf2)
    assert buf2.getvalue() == raw


def test_fmi_layout_sizes(built):
    """Validate the archive against the reference's exact byte layout
    (reference: fm_index.hpp:591-615, serializer.hpp:94-109)."""
    text, fmi = built
    N = len(text) + 1
    buf = io.BytesIO()
    fmi.save(buf)
    raw = buf.getvalue()
    expect = 16 + 4  # cnt_ + pri_
    expect += 8 + (N + 3) // 4  # bwt: size_t + ceil(N/4) bytes
    expect += 8 + (N // 256 + 1) * 16  # occ1
    expect += 8 + (N // 16 + 1) * 4  # occ2
    expect += 8 + ((N + 3) // 4) * 4  # sampled sa
    expect += 8 + 2 * 4  # lookup (LOOKUP_LEN=0 -> [0, N])
    expect += 8 + ((N + 63) // 64) * 8  # b_
    expect += 8 + (N // 64 + 1) * 4  # b_occ_
    assert len(raw) == expect


def test_lookup_table():
    text = oracle.random_dna(5_000, seed=7)
    fmi = FMIndex(sa_intv=4, lookup_len=4).build(text)
    lut = np.asarray(fmi.arrays.lookup)
    assert lut.shape[0] == 4**4 + 1
    assert (np.diff(lut) >= 0).all()  # reference asserts sorted
    # lookup-seeded search must agree with seedless search
    plain = FMIndex(sa_intv=4, lookup_len=0).build(text)
    rng = np.random.default_rng(0)
    queries = rng.integers(0, 4, (50, 9)).astype(np.int8)
    np.testing.assert_array_equal(
        fmi.get_ranges(queries)[0], plain.get_ranges(queries)[0]
    )
    np.testing.assert_array_equal(
        fmi.get_ranges(queries)[1], plain.get_ranges(queries)[1]
    )


def test_sa_intv_1():
    text = oracle.random_dna(3_000, seed=3)
    fmi = FMIndex(sa_intv=1, lookup_len=0).build(text)
    q = text[100:112]
    beg, end, offs = fmi.get_range(q)
    hits = fmi.get_offsets(beg, end)
    np.testing.assert_array_equal(
        np.sort(hits), np.sort(oracle.search_all(text, q))
    )


def test_lookup_table_absent_seeds_monotone():
    """Seeds absent from the text must store their sorted insertion
    point, keeping the table nondecreasing (the reference asserts this,
    fm_index.hpp:265-268); a stale early-stop value here produced
    beg > end ranges for absent patterns."""
    from tests import oracle

    text = oracle.random_dna(500, seed=11)
    fmi = FMIndex(sa_intv=4, lookup_len=6).build(text)
    lut = np.asarray(fmi.arrays.lookup).astype(np.int64)
    assert lut.shape[0] == 4**6 + 1
    assert (np.diff(lut) >= 0).all()
    # an absent pattern must report zero occurrences, not a bogus range
    import itertools

    present = {
        tuple(text[i : i + 6].tolist()) for i in range(len(text) - 5)
    }
    absent = next(
        p for p in itertools.product(range(4), repeat=6)
        if p not in present
    )
    q = np.array(absent, dtype=np.int8)
    beg, end, _ = fmi.get_range(q)
    assert end - beg == 0
    plain = FMIndex(sa_intv=4, lookup_len=0).build(text)
    for i in range(0, len(text) - 6, 17):
        q = text[i : i + 6]
        assert fmi.get_range(q)[:2] == plain.get_range(q)[:2]


def test_uint32_index_path():
    """chm13-scale texts (N >= 2**31) switch every index array to
    uint32 (fm_index._index_dtype); force_u32 exercises that whole
    build/query/serialize path on a small corpus and requires exact
    agreement with the default int32 path."""
    import jax.numpy as jnp

    text = oracle.random_dna(20_000, seed=99)
    fmi32 = FMIndex(sa_intv=4, lookup_len=3).build(text)
    fmiu = FMIndex(sa_intv=4, lookup_len=3, force_u32=True).build(text)
    a = fmiu.arrays
    for name in ("occ1", "cnt", "pri", "sa_samp", "b_occ", "lookup"):
        assert getattr(a, name).dtype == jnp.uint32, name
    # the fused gather tables are uint32 regardless of the index dtype
    assert a.lf_tab.dtype == jnp.uint32 and a.lf_tab.shape[1] == 5
    assert a.b_tab.dtype == jnp.uint32 and a.b_tab.shape[1] == 3

    rng = np.random.default_rng(12)
    queries = [
        text[int(p) : int(p) + 13]
        for p in rng.integers(0, len(text) - 13, 25)
    ] + [rng.integers(0, 4, 13).astype(np.int8) for _ in range(25)]
    queries = np.stack(queries)
    b32, e32, o32 = fmi32.get_ranges(queries)
    bu, eu, ou = fmiu.get_ranges(queries)
    np.testing.assert_array_equal(b32, bu.astype(np.int64))
    np.testing.assert_array_equal(e32, eu.astype(np.int64))
    np.testing.assert_array_equal(o32, ou)

    lens, positions, starts = fmiu.batch_query(queries)
    for qi in range(len(queries)):
        want = oracle.search_all(text, queries[qi])
        assert lens[qi] == len(want)
        np.testing.assert_array_equal(
            np.sort(positions[starts[qi] : starts[qi + 1]]), np.sort(want)
        )
    assert fmiu.batch_query_stats(queries) == fmi32.batch_query_stats(queries)

    # serialization is dtype-independent (the .fmi layout is u32 raw)
    import io as _io

    bufu, buf32 = _io.BytesIO(), _io.BytesIO()
    fmiu.save(bufu)
    fmi32.save(buf32)
    assert bufu.getvalue() == buf32.getvalue()
    # loading with force_u32 keeps the uint32 dtype and query behavior
    fmi_loaded = FMIndex(sa_intv=4, force_u32=True).load(
        _io.BytesIO(bufu.getvalue())
    )
    assert fmi_loaded.arrays.cnt.dtype == jnp.uint32
    q = text[500:513]
    assert fmi_loaded.get_range(q) == fmi32.get_range(q)


def test_packed_queries_match_unpacked(built):
    """get_range_packed_device == get_range_device on the same batch,
    across pattern lengths straddling the 16-symbol word boundary."""
    import jax.numpy as jnp

    from kiss_tpu.models.fm_index import (
        get_range_device,
        get_range_packed_device,
    )
    from kiss_tpu.ops import pack

    text, fmi = built
    rng = np.random.default_rng(7)
    for qlen in (1, 15, 16, 17, 33):
        queries = rng.integers(0, 4, (40, qlen)).astype(np.int8)
        want = get_range_device(fmi.arrays, jnp.asarray(queries), 0)
        qwords = pack.np_pack_queries_2bit(queries)
        got = get_range_packed_device(fmi.arrays, jnp.asarray(qwords), qlen, 0)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_packed_queries_lookup_seeding():
    """Packed search must seed from the lookup table identically."""
    import jax.numpy as jnp

    from kiss_tpu.models.fm_index import get_range_packed_device
    from kiss_tpu.ops import pack

    text = oracle.random_dna(20_000, seed=3)
    fmi = FMIndex(sa_intv=4, lookup_len=4).build(text)
    rng = np.random.default_rng(4)
    queries = rng.integers(0, 4, (50, 18)).astype(np.int8)
    beg, end, offs = fmi.get_ranges(queries)  # host path (packs internally)
    qwords = pack.np_pack_queries_2bit(queries)
    b2, e2, o2 = get_range_packed_device(
        fmi.arrays, jnp.asarray(qwords), 18, 4
    )
    np.testing.assert_array_equal(beg, np.asarray(b2))
    np.testing.assert_array_equal(end, np.asarray(e2))
    for qi in range(50):
        want = oracle.search_all(text, queries[qi])
        assert int(e2[qi] - b2[qi]) == len(want)


def test_ranges_chunked_splits(monkeypatch):
    """The chunked host path must agree with one-shot over chunk seams."""
    import kiss_tpu.models.fm_index as fm

    text = oracle.random_dna(10_000, seed=9)
    fmi = FMIndex(sa_intv=4, lookup_len=0).build(text)
    rng = np.random.default_rng(11)
    queries = rng.integers(0, 4, (1000, 9)).astype(np.int8)
    want = fmi.get_ranges(queries)
    monkeypatch.setattr(fm, "_Q_CHUNK", 256)
    got = fmi.get_ranges(queries)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
    occ, chk = fmi.batch_query_stats(queries)
    counts = sum(len(oracle.search_all(text, q)) for q in queries)
    assert occ == counts


def test_counts_matches_get_ranges(monkeypatch):
    """The count-only path (end - beg, async chunk pulls) must equal
    get_ranges' counts, across chunk seams and with lookup seeding."""
    import kiss_tpu.models.fm_index as fm

    text = oracle.random_dna(10_000, seed=9)
    for lookup_len in (0, 4):
        fmi = FMIndex(sa_intv=4, lookup_len=lookup_len).build(text)
        rng = np.random.default_rng(12)
        queries = rng.integers(0, 4, (1000, 9)).astype(np.int8)
        beg, end, _ = fmi.get_ranges(queries)
        monkeypatch.setattr(fm, "_Q_CHUNK", 256)
        got = fmi.counts(queries)
        assert got.dtype == np.uint32
        np.testing.assert_array_equal(got, (end - beg).astype(np.uint32))
    assert fmi.counts(np.empty((0, 9), np.int8)).size == 0


def test_bounded_sort_build_locates_via_bfs():
    """An index built from a 32-ordered SA (the reference CLI's own
    build shortcut, fm_index.hpp:384-386) is NOT per-row-LF-consistent
    on >=32-char repeats; locate must route through the range BFS and
    still match brute force (reference: fm_index.hpp:453-501)."""
    text = oracle.repeat_heavy_dna(6_000, unit=37, seed=3)
    fmi = FMIndex(sa_intv=4, lookup_len=0).build(text, sort_len=32)
    assert not fmi.full_sa
    rng = np.random.default_rng(5)
    queries = np.stack([
        text[p : p + 12]
        for p in rng.integers(0, len(text) - 12, 40)
    ])
    lens, positions, starts = fmi.batch_query(queries)
    want_occ, want_sum = 0, 0
    for qi in range(len(queries)):
        want = oracle.search_all(text, queries[qi])
        got = np.sort(positions[starts[qi] : starts[qi + 1]])
        np.testing.assert_array_equal(got, np.sort(want))
        want_occ += len(want)
        want_sum += int(want.sum())
    occ, checksum = fmi.batch_query_stats(queries)
    assert (occ, checksum) == (want_occ, want_sum)
    # single-range surface
    beg, end, offs = fmi.get_range(queries[0])
    assert offs == 0
    np.testing.assert_array_equal(
        np.sort(fmi.get_offsets(beg, end)),
        np.sort(oracle.search_all(text, queries[0])),
    )


def test_bfs_locate_matches_walk_on_full_sa(built):
    """On a fully sorted index both locate paths are exact; the BFS
    kernel must agree with the per-row walk (same sets, same stats)."""
    from kiss_tpu.models import fm_index as fm

    text, fmi = built
    rng = np.random.default_rng(11)
    queries = np.stack([
        text[p : p + 9]
        for p in rng.integers(0, len(text) - 9, 32)
    ])
    occ, checksum = fmi.batch_query_stats(queries)  # walk path
    beg, end, _ = fmi.get_ranges(queries)
    pos = fmi._bfs_positions(beg, end)
    assert len(pos) == occ
    assert int(pos.astype(np.int64).sum()) == checksum


def test_bounded_sort_build_bfs_sa_intv2():
    """Range-BFS locate at a different sampling interval (the BFS tree
    depth/width follow sa_intv)."""
    text = oracle.repeat_heavy_dna(4_000, unit=41, seed=13)
    fmi = FMIndex(sa_intv=2, lookup_len=0).build(text, sort_len=32)
    assert not fmi.full_sa
    rng = np.random.default_rng(7)
    queries = np.stack([
        text[p : p + 10] for p in rng.integers(0, len(text) - 10, 25)
    ])
    occ, checksum = fmi.batch_query_stats(queries)
    want_occ = want_sum = 0
    for q in queries:
        h = oracle.search_all(text, q)
        want_occ += len(h)
        want_sum += int(h.sum())
    assert (occ, checksum) == (want_occ, want_sum)
