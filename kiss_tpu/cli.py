"""Command-line interface mirroring the reference ``kISS`` binary.

Reference surface (reference: src/main.cpp:19-40,
include/utils/options.hpp:20-300): three subcommands with a two-stage
option parse, generic options ``-h -v -g -t --verbose``, positional FASTA
argument, and per-command flags. Same commands, same flags, same
defaults, same log lines here -- so scripts written against the
reference binary keep working.
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np

from kiss_tpu import BANNER, VERSION
from kiss_tpu.models import fm_index as fm_meta
from kiss_tpu.models.fm_index import FMIndex
from kiss_tpu.ops.suffix_sort import Kiss1Sorter, Kiss2Sorter
from kiss_tpu.utils import codec, fasta, timing

SORTING_ALGORITHMS = {
    "PARALLEL_SORTING": Kiss1Sorter,
    "PREFIX_DOUBLING": Kiss2Sorter,
}


def _add_generic(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "-g",
        "--generic",
        action="store_true",
        help="(Under construction) input contains bases other than ATCG",
    )
    p.add_argument(
        "-t",
        "--num_threads",
        type=int,
        default=0,
        metavar="NUM",
        help="number of threads (accepted for parity; the TPU mesh is "
        "the parallelism knob)",
    )
    p.add_argument(
        "--verbose", action="store_true", help="print more information"
    )
    p.add_argument(
        "--profile",
        metavar="DIR",
        help="write a jax.profiler device trace for this command to DIR "
        "(TPU-native analog of the reference's per-stage spdlog "
        "stopwatches)",
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="kISS", add_help=True)
    p.add_argument("-v", "--version", action="store_true", help="print version")
    sub = p.add_subparsers(dest="command")

    ss = sub.add_parser("suffix_sort", help="build a k-ordered suffix array")
    _add_generic(ss)
    ss.add_argument(
        "-k",
        "--kordered",
        type=int,
        default=256,
        metavar="NUM",
        help="sort each suffix by its first k characters; -1 = unbounded",
    )
    ss.add_argument(
        "-s",
        "--sorting-algorithm",
        dest="sorting_algorithm",
        type=str.upper,
        choices=sorted(SORTING_ALGORITHMS),
        default="PARALLEL_SORTING",
        metavar="ALGO",
        help="PARALLEL_SORTING: 64-char raw-word seed + 8-key rank "
        "rounds (kISS-1's bucketed direct sort re-expressed; the fast "
        "default). PREFIX_DOUBLING: 16-char super-char seed + 2-key "
        "doubling rounds (kISS-2's prefix doubling re-expressed). "
        "Identical output order either way (exact-k cut, position "
        "tiebreaks).",
    )
    ss.add_argument(
        "--external",
        action="store_true",
        help="use the out-of-core sorter (host-staged MSD buckets + "
        "batch device sorts): for texts too large for the in-core "
        "pipeline's device buffers (chm13-scale). Auto-selected above "
        "500M characters; this flag forces it.",
    )
    ss.add_argument("fasta", help="FASTA/text file path")

    fb = sub.add_parser("fmindex_build", help="build and save an FM-index")
    _add_generic(fb)
    fb.add_argument(
        "-k",
        "--kordered",
        type=int,
        default=None,
        metavar="NUM",
        help="sort depth of the underlying suffix array; -1 = unbounded. "
        "The reference declares this flag but hardcodes sort_len = 32 "
        "(reference: include/utils/options.hpp:133-141 vs "
        "fm_index.hpp:384-386); here it is honored as the sort depth. "
        "Default (omitted): a FULLY sorted SA, which keeps locate exact "
        "for every pattern length (see models/fm_index.py SORT_LEN note).",
    )
    fb.add_argument(
        "-l", "--lookup-len", type=int, default=0, dest="lookup_len",
        help="seed-table depth: precompute ranges of all 4^L length-L "
        "seeds so queries skip their last L backward-search steps "
        "(reference FMIndex LOOKUP_LEN parameter, fm_index.hpp:237-269; "
        "the reference CLI uses 0). Queries read it from the archive.",
    )
    fb.add_argument("fasta", help="FASTA/text file path")

    fq = sub.add_parser("fmindex_query", help="query a saved FM-index")
    _add_generic(fq)
    fq.add_argument(
        "--assume-full-sa",
        action="store_true",
        dest="assume_full_sa",
        help="treat the archive as built from a FULLY sorted suffix "
        "array: locate uses the fast per-row LF walk instead of the "
        "order-robust range BFS. Archives built by this tool's "
        "fmindex_build record this in a `.meta` sidecar and route "
        "automatically; the flag exists for archives whose sidecar was "
        "lost. WRONG positions on long repeats if the SA was only "
        "k-ordered (e.g. reference-binary archives, which are 32-ordered"
        " -- reference: fm_index.hpp:384-386).",
    )
    fq.add_argument("-q", "--query", type=str, help="single pattern to search")
    fq.add_argument(
        "-n", "--headn", type=int, default=10, metavar="NUM",
        help="print at most this many positions",
    )
    fq.add_argument(
        "-b", "--batch", type=str,
        help="binary pattern file: u32 query_len, u32 num_query, then "
        "fixed-length ASCII patterns",
    )
    fq.add_argument("fasta", help="FASTA/text file path")
    return p


def _read_folded(path: str) -> np.ndarray:
    """read_sequence + the c % 4 alphabet fold every command applies
    (reference: include/command/suffix_sort.hpp:29-33)."""
    seq = fasta.read_sequence(path)
    return codec.fold_to_acgt(seq)


def _reject_generic(args) -> None:
    if getattr(args, "generic", False):
        # reference: every command throws on --generic
        # (include/command/suffix_sort.hpp:26-28)
        raise SystemExit(
            "Generic sorting and indexing are currently not supported."
        )


# above this many characters the in-core pipeline's device buffers
# (~40 B/char across the seed sort) exceed a single chip; route the
# CLI to the out-of-core sorter (kiss_tpu/ops/external_sort.py)
EXTERNAL_THRESHOLD = 500_000_000


def suffix_sort_main(args) -> None:
    _reject_generic(args)
    seq = _read_folded(args.fasta)
    sorter = SORTING_ALGORITHMS[args.sorting_algorithm]
    ref = sorter.prepare_aligned_ref(seq)
    sw = timing.Stopwatch()
    if args.external or len(ref) >= EXTERNAL_THRESHOLD:
        from kiss_tpu.ops.external_sort import (
            external_k_ordered_suffix_array,
        )

        external_k_ordered_suffix_array(
            ref, args.kordered, verbose=timing.debug_enabled()
        )
    else:
        sorter.get_suffix_array_dna(ref, args.kordered, args.num_threads)
    timing.log_info(
        "n = %d, k = %d, suffix sorting elapsed %.6f",
        len(ref), args.kordered, sw.elapsed(),
    )


def fmindex_build_main(args) -> None:
    _reject_generic(args)
    seq = _read_folded(args.fasta)
    fmi = FMIndex(sa_intv=4, lookup_len=args.lookup_len)
    # -k omitted -> the full-sort default (None); -k N -> N-ordered SA
    # (-1 = unbounded, same wrap rule as suffix_sort, README.md:56)
    sort_len = args.kordered
    if sort_len is not None and sort_len < 0:
        sort_len = None
    fmi.build(seq, sort_len=sort_len)
    fmi_path = args.fasta + ".fmi"
    with open(fmi_path, "wb") as fout:
        fmi.save(fout)
    # provenance sidecar: lets fmindex_query route locate through the
    # fast per-row walk when (and only when) the source SA was fully
    # sorted (the `.fmi` bytes stay reference-compatible; see
    # models/fm_index.py SORT_LEN + META_SUFFIX notes)
    fm_meta.write_meta(
        fmi_path, full_sa=fmi.full_sa, sort_len=sort_len,
        lookup_len=args.lookup_len,
    )


def _ordinal(x: int) -> str:
    # reference: include/command/fmindex_query.hpp:42-53
    x %= 100
    if x // 10 == 1:
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(x % 10, "th")


def fmindex_query_main(args) -> None:
    _reject_generic(args)
    seq = _read_folded(args.fasta)
    fmi = FMIndex(sa_intv=4, lookup_len=0)
    fmi_path = args.fasta + ".fmi"
    with open(fmi_path, "rb") as fin:
        fmi.load(fin)
    # locate routing: the fast per-row walk is exact only over a fully
    # sorted source SA; trust the build-time sidecar (or the explicit
    # flag) -- otherwise stay on the order-robust BFS (correct for
    # reference-written 32-ordered archives)
    meta = fm_meta.read_meta(fmi_path)
    if args.assume_full_sa or (meta is not None and meta.get("full_sa")):
        fmi.full_sa = True

    if args.query:
        iq = codec.fold_to_acgt(codec.to_istring(args.query))
        beg, end, _ = fmi.get_range(iq)
        positions = fmi.get_offsets(beg, end)
        timing.log_info(
            "query = %s found %d times",
            codec.to_string(iq), len(positions),
        )
        for i in range(min(args.headn, len(positions))):
            loc = int(positions[i])
            timing.log_info(
                "The %d-%s position is %d, content of substring is %s",
                i + 1, _ordinal(i + 1), loc,
                codec.to_string(seq[loc : loc + len(iq)]),
            )

    if args.batch:
        with open(args.batch, "rb") as pfile:
            query_len, num_query = struct.unpack("<II", pfile.read(8))
            timing.log_info(
                "query_len: %d, num_query: %d", query_len, num_query
            )
            raw = pfile.read(query_len * num_query)
        buf = np.frombuffer(raw, dtype=np.uint8).reshape(num_query, query_len)
        queries = codec.fold_to_acgt(codec.to_istring(buf.reshape(-1))).reshape(
            num_query, query_len
        )
        # chunk boundaries land on remaining-count multiples of 100k so
        # the per-100k progress line matches the reference batch loop
        # (reference: include/command/fmindex_query.hpp:92-93 logs
        # "remain: {}, time: {}" whenever num_query % 100000 == 0)
        occ, checksum, elapsed = 0, 0, 0.0
        done = 0
        while done < num_query:
            step = num_query % 100_000 if done == 0 else 100_000
            step = step or min(100_000, num_query)
            sw = timing.Stopwatch()
            o, c = fmi.batch_query_stats(queries[done : done + step])
            elapsed += sw.elapsed()
            occ += o
            checksum += c
            done += step
            timing.log_debug("remain: %d, time: %s", num_query - done, elapsed)
        timing.log_info("searching time: %s seconds", elapsed)
        timing.log_info("number of matched locations: %d", occ)
        timing.log_info("location checksum: %d", checksum)


COMMANDS = {
    "suffix_sort": suffix_sort_main,
    "fmindex_build": fmindex_build_main,
    "fmindex_query": fmindex_query_main,
}


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.version:
        print(VERSION)
        return 0
    if not args.command:
        print(BANNER)
        parser.print_help()
        return 0
    timing.setup_logging(verbose=getattr(args, "verbose", False))
    from kiss_tpu.utils import compile_cache

    compile_cache.enable()
    profile_dir = getattr(args, "profile", None)
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            COMMANDS[args.command](args)
    else:
        COMMANDS[args.command](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
