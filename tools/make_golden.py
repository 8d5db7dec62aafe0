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
// Golden-output harness: runs the REFERENCE kISS sorters on a raw int8
// code file and writes the uint32 suffix array.
#include <array>
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <ranges>
#include <string>
#include <vector>
#include <biovoltron/utility/istring.hpp>
#include <biovoltron/algo/sort/kiss1_sorter.hpp>
#include <biovoltron/algo/sort/kiss2_sorter.hpp>

int main(int argc, char** argv) {
  if (argc != 5) { fprintf(stderr, "usage: %s kiss1|kiss2 in k out\\n", argv[0]); return 2; }
  std::string algo = argv[1];
  FILE* f = fopen(argv[2], "rb");
  if (!f) { perror("open"); return 1; }
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  std::vector<int8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != (size_t)n) return 1;
  fclose(f);
  auto ref = biovoltron::istring(buf.begin(), buf.end());
  size_t k = strtoull(argv[3], nullptr, 10);
  biovoltron::KISS1Sorter<uint32_t>::SA_t sa;
  if (algo == "kiss1") {
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
        path = os.path.join(outdir, f"{name}.npz")
        np.savez_compressed(path, **blobs)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
