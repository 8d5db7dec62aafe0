"""Generate golden suffix arrays from the REFERENCE implementation.

Compiles a tiny harness against the read-only reference headers at
/root/reference (with a no-op spdlog stand-in, since the vendored
submodule is empty in the mirror) and runs the real kISS-1/kISS-2
sorters on fixed corpora, writing compressed fixtures to tests/golden/.

Conformance facts these fixtures capture (see tests/test_golden.py):
  - for unbounded k (-1), kiss-tpu's SA is bit-identical to the
    reference's on every corpus;
  - for bounded k, the reference's tie order within equal-k-prefix
    groups is an emergent artifact of its induced sort -- its own two
    strategies disagree with each other -- so conformance is equality
    up to permutation within tie groups (plus exact group structure).
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

HARNESS_DIR = "/tmp/kiss_gold_harness"

SPDLOG_STUB = """\
#pragma once
#include <array>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <memory>
#include <string>
#include <string_view>
#include <vector>
#ifndef SPDLOG_DEBUG
#define SPDLOG_DEBUG(...) ((void)0)
#endif
#ifndef SPDLOG_INFO
#define SPDLOG_INFO(...) ((void)0)
#endif
namespace spdlog {
template <typename... Args> inline void debug(Args&&...) {}
template <typename... Args> inline void info(Args&&...) {}
struct stopwatch {
  std::chrono::steady_clock::time_point start =
      std::chrono::steady_clock::now();
  double elapsed() const { return 0.0; }
};
}
"""

HARNESS = """\
// Golden-output harness over the REFERENCE implementation:
//   gold kiss1|kiss2 <in.codes> <k> <out.sa>   -- suffix array (u32)
//   gold fmi         <in.codes> <_> <out.fmi>  -- FMIndex<4,u32> archive
//   gold query       <in.codes> <fmi> <patterns> -- batch query stats
#include <array>
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <ranges>
#include <string>
#include <vector>
#include <biovoltron/utility/istring.hpp>
#include <biovoltron/algo/sort/kiss1_sorter.hpp>
#include <biovoltron/algo/sort/kiss2_sorter.hpp>
#include <biovoltron/algo/align/exact_match/fm_index.hpp>

static std::vector<int8_t> read_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror("open"); exit(1); }
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  std::vector<int8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) exit(1);
  fclose(f);
  return buf;
}

int main(int argc, char** argv) {
  if (argc != 5) { fprintf(stderr, "usage: %s mode in arg out\\n", argv[0]); return 2; }
  std::string mode = argv[1];
  auto buf = read_file(argv[2]);
  auto ref = biovoltron::istring(buf.begin(), buf.end());

  if (mode == "kiss1" || mode == "kiss2") {
    size_t k = strtoull(argv[3], nullptr, 10);
    biovoltron::KISS1Sorter<uint32_t>::SA_t sa;
    if (mode == "kiss1") {
      auto S = biovoltron::KISS1Sorter<uint32_t>::prepare_aligned_ref(ref);
      sa = biovoltron::KISS1Sorter<uint32_t>::get_suffix_array_dna(S, k, 4);
    } else {
      auto S = biovoltron::KISS2Sorter<uint32_t>::prepare_aligned_ref(ref);
      sa = biovoltron::KISS2Sorter<uint32_t>::get_suffix_array_dna(S, k, 4);
    }
    FILE* g = fopen(argv[4], "wb");
    fwrite(sa.data(), 4, sa.size(), g);
    fclose(g);
    return 0;
  }

  if (mode == "fmi") {
    // mirror the CLI instantiation (reference: fmindex_build.hpp:27-34)
    auto fmi = biovoltron::FMIndex<4, uint32_t,
                                   biovoltron::KISS1Sorter<uint32_t>>{
      .LOOKUP_LEN = 0};
    fmi.build(ref);
    auto fout = std::ofstream{argv[4], std::ios::binary};
    fmi.save(fout);
    return 0;
  }

  if (mode == "query") {
    // batch query stats (reference: fmindex_query.hpp:66-99)
    auto fmi = biovoltron::FMIndex<4, uint32_t,
                                   biovoltron::KISS1Sorter<uint32_t>>{
      .LOOKUP_LEN = 0};
    auto fin = std::ifstream{argv[3], std::ios::binary};
    fmi.load(fin);
    auto pats = read_file(argv[4]);
    uint32_t qlen, nq;
    memcpy(&qlen, pats.data(), 4); memcpy(&nq, pats.data() + 4, 4);
    size_t occ = 0, checksum = 0;
    for (uint32_t i = 0; i < nq; i++) {
      auto seed = biovoltron::istring(
          pats.begin() + 8 + (size_t)i * qlen,
          pats.begin() + 8 + (size_t)(i + 1) * qlen);
      auto [beg, end, offs] = fmi.get_range(seed);
      auto positions = fmi.get_offsets(beg, end);
      occ += positions.size();
      for (auto v : positions) checksum += v;
    }
    printf("occ %zu checksum %zu\\n", occ, checksum);
    return 0;
  }
  return 2;
}
"""


def build_harness() -> str:
    os.makedirs(os.path.join(HARNESS_DIR, "spdlog"), exist_ok=True)
    with open(os.path.join(HARNESS_DIR, "spdlog", "spdlog.h"), "w") as f:
        f.write(SPDLOG_STUB)
    with open(os.path.join(HARNESS_DIR, "spdlog", "stopwatch.h"), "w") as f:
        f.write('#pragma once\n#include "spdlog.h"\n')
    src = os.path.join(HARNESS_DIR, "gold.cpp")
    with open(src, "w") as f:
        f.write(HARNESS)
    exe = os.path.join(HARNESS_DIR, "gold")
    tbb = "/usr/lib/x86_64-linux-gnu/libtbb.so.12.8"
    link = os.path.join(HARNESS_DIR, "libtbb.so")
    if not os.path.exists(link) and os.path.exists(tbb):
        os.symlink(tbb, link)
    subprocess.run(
        [
            "g++", "-std=c++20", "-O2", "-mavx", "-mavx2", "-mlzcnt",
            "-mbmi", "-fopenmp", "-I", HARNESS_DIR,
            "-I", "/root/reference/include", src, "-o", exe,
            "-L", HARNESS_DIR, "-ltbb",
        ],
        check=True,
    )
    return exe


def run_gold(exe: str, algo: str, text: np.ndarray, k: int) -> np.ndarray:
    inp = os.path.join(HARNESS_DIR, "in.codes")
    out = os.path.join(HARNESS_DIR, "out.sa")
    text.astype(np.int8).tofile(inp)
    kk = str(k) if k >= 0 else "18446744073709551615"
    subprocess.run([exe, algo, inp, kk, out], check=True)
    return np.fromfile(out, dtype=np.uint32)


def make_patterns(text: np.ndarray, nq: int, qlen: int, seed: int) -> bytes:
    """Binary batch pattern file holding raw codes (header: u32 qlen,
    u32 nq -- reference: fmindex_query.hpp:66-75)."""
    import struct

    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(text) - qlen, nq)
    pats = text[starts[:, None] + np.arange(qlen)[None, :]]
    return struct.pack("<II", qlen, nq) + pats.astype(np.int8).tobytes()


def run_fmi(exe: str, text: np.ndarray) -> bytes:
    inp = os.path.join(HARNESS_DIR, "in.codes")
    out = os.path.join(HARNESS_DIR, "out.fmi")
    text.astype(np.int8).tofile(inp)
    subprocess.run([exe, "fmi", inp, "0", out], check=True)
    with open(out, "rb") as f:
        return f.read()


def run_query(exe: str, text: np.ndarray, patterns: bytes):
    inp = os.path.join(HARNESS_DIR, "in.codes")
    fmi = os.path.join(HARNESS_DIR, "out.fmi")
    pf = os.path.join(HARNESS_DIR, "pats.bin")
    text.astype(np.int8).tofile(inp)
    subprocess.run([exe, "fmi", inp, "0", fmi], check=True)
    with open(pf, "wb") as f:
        f.write(patterns)
    res = subprocess.run(
        [exe, "query", inp, fmi, pf], check=True, capture_output=True,
        text=True,
    )
    parts = res.stdout.split()
    return int(parts[1]), int(parts[3])


def main() -> None:
    import oracle

    exe = build_harness()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden",
    )
    os.makedirs(outdir, exist_ok=True)
    corpora = {
        "random4k": oracle.random_dna(4003, seed=1),
        "repeat3k": oracle.repeat_heavy_dna(3000, unit=37, seed=3),
        "genome20k": oracle.genome_like_dna(20_000, ancestral=1 << 12, seed=2),
    }
    for name, text in corpora.items():
        blobs = {"text": text}
        for k in (16, 32, 256, -1):
            for algo in ("kiss1", "kiss2"):
                blobs[f"sa_{algo}_k{k}"] = run_gold(exe, algo, text, k)
        # FM-index archive from the reference binary + batch query stats
        blobs["fmi"] = np.frombuffer(run_fmi(exe, text), dtype=np.uint8)
        patterns = make_patterns(text, nq=64, qlen=12, seed=9)
        occ, checksum = run_query(exe, text, patterns)
        blobs["patterns"] = np.frombuffer(patterns, dtype=np.uint8)
        blobs["query_stats"] = np.array([occ, checksum], dtype=np.int64)
        path = os.path.join(outdir, f"{name}.npz")
        np.savez_compressed(path, **blobs)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
