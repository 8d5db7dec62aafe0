"""Repeatable real-chip CLI exercise (VERDICT r3 weak #7).

Drives the actual ``python -m kiss_tpu`` CLI as subprocesses on the
real TPU against a 100 kbp corpus with planted patterns, and checks:

  - suffix_sort (default strategy, PREFIX_DOUBLING, and --external,
    incl. an arbitrary bounded k = 100 through the external raw-tail
    path, VERDICT r4 #1);
  - fmindex_build writes `.fmi` + `.meta` sidecar;
  - single query reports every planted position exactly;
  - batch query occ/checksum equal the brute-force oracle;
  - absent pattern, --generic rejection, bad -k probes;
  - serve mode: one process answers repeated queries, with the
    second query under the 15 s target (VERDICT r4 #8 -- the
    per-invocation jit compile mitigation).

Appends a PASS/FAIL table to experiments/results_cli_e2e.md. Run from
the repo root: ``python experiments/cli_e2e_tpu.py`` (~5-15 min: each CLI
invocation pays jit compile + tunnel warmup; far longer if the host
CPUs are contended -- compile runs on the host).
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

ROWS: list[tuple[str, str, float]] = []


def run(name, argv, timeout=1800):
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, "-m", "kiss_tpu", *argv],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    dt = time.perf_counter() - t0
    out = p.stdout + p.stderr
    ROWS.append((name, "ran", dt))
    return p.returncode, out


def check(name, cond, detail=""):
    ROWS[-1] = (ROWS[-1][0], "PASS" if cond else f"FAIL {detail}",
                ROWS[-1][2])
    if not cond:
        print(f"FAIL: {name}: {detail}", file=sys.stderr)
    return cond


def main() -> int:
    from kiss_tpu.utils import codec, fasta
    from tests.oracle import search_all

    tmp = tempfile.mkdtemp(prefix="kiss_cli_")
    rng = np.random.default_rng(123)
    text = rng.integers(0, 4, 100_000).astype(np.int8)
    pat = codec.to_istring("GATTACAGATTACA")
    planted = (5_000, 42_000, 99_000)
    for p in planted:
        text[p : p + len(pat)] = pat
    fa = os.path.join(tmp, "ref.fa")
    fasta.write_fasta(fa, [fasta.FastaRecord("chr1", text)])

    qlen, nq = 12, 200
    starts = rng.integers(0, len(text) - qlen, nq)
    pats = [codec.to_string(text[s : s + qlen]) for s in starts]
    pats[7] = "GGGGGGGGGGGG"
    bpath = os.path.join(tmp, "patterns.bin")
    with open(bpath, "wb") as f:
        f.write(struct.pack("<II", qlen, nq))
        for p in pats:
            f.write(p.encode())
    occ = chk = 0
    for p in pats:
        pos = search_all(text, codec.to_istring(p))
        occ += len(pos)
        chk += int(np.sum(pos))

    ok = True
    rc, out = run("suffix_sort k=256", ["suffix_sort", "-k", "256", fa])
    ok &= check("suffix_sort", rc == 0 and "suffix sorting elapsed" in out,
                out[-300:])
    rc, out = run("suffix_sort PREFIX_DOUBLING",
                  ["suffix_sort", "-s", "prefix_doubling", "-k", "256", fa])
    ok &= check("prefix_doubling", rc == 0, out[-300:])
    rc, out = run("suffix_sort --external",
                  ["suffix_sort", "--external", "-k", "256", fa])
    ok &= check("external", rc == 0, out[-300:])
    # arbitrary bounded k (not a multiple of the 64-char seed): the
    # external raw-tail round path (VERDICT r4 #1) on the real chip
    rc, out = run("suffix_sort --external -k 100",
                  ["suffix_sort", "--external", "-k", "100", fa])
    ok &= check("external k=100", rc == 0
                and "suffix sorting elapsed" in out, out[-300:])
    # round-5 native host strategy (csrc/kiss_lms.cpp): runs off-device
    rc, out = run("suffix_sort LMS_INDUCED -k 100",
                  ["suffix_sort", "-s", "lms_induced", "-k", "100",
                   "-t", "2", fa])
    ok &= check("lms_induced k=100", rc == 0
                and "suffix sorting elapsed" in out, out[-300:])

    rc, out = run("fmindex_build", ["fmindex_build", fa])
    ok &= check(
        "build+sidecar",
        rc == 0 and os.path.exists(fa + ".fmi")
        and os.path.exists(fa + ".fmi.meta"),
        out[-300:],
    )

    rc, out = run("query planted",
                  ["fmindex_query", "-q", "GATTACAGATTACA", "-n", "5", fa])
    ok &= check(
        "planted positions",
        rc == 0 and "found 3 times" in out
        and all(f"position is {p}," in out for p in planted),
        out[-500:],
    )

    rc, out = run("query batch", ["fmindex_query", "-b", bpath, fa])
    ok &= check(
        "batch occ+checksum",
        rc == 0 and f"matched locations: {occ}" in out
        and f"location checksum: {chk}" in out,
        out[-400:],
    )

    rc, out = run("query absent",
                  ["fmindex_query", "-q", "C" * 22, fa])
    ok &= check("absent pattern", rc == 0 and "found 0 times" in out,
                out[-300:])
    rc, out = run("-g rejected", ["suffix_sort", "-g", fa])
    ok &= check("generic rejected",
                rc != 0 and "not supported" in out, out[-200:])
    rc, out = run("bad -k", ["suffix_sort", "-k", "zzz", fa])
    ok &= check("bad -k", rc != 0 and "invalid int" in out, out[-200:])

    # ---- serve mode: compile once, answer many (VERDICT r4 #8) ----
    import select

    def _readline_timeout(stream, timeout_s):
        r, _, _ = select.select([stream], [], [], timeout_s)
        return stream.readline() if r else ""

    t0 = time.perf_counter()
    errf = open(os.path.join(tmp, "serve.err"), "w")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sp = subprocess.Popen(
        [sys.executable, "-m", "kiss_tpu", "serve", "--warm", "14",
         "-n", "3", fa],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=errf,
        text=True, cwd=repo,
    )
    ROWS.append(("serve startup+warm", "ran", 0.0))
    times = []
    try:
        # a dead server (OOM, crash during warmup) must not crash the
        # harness before the PASS/FAIL table is written: every pipe op
        # is guarded, and a broken pipe just records a FAIL row
        ready = _readline_timeout(sp.stdout, 1200)
        t_ready = time.perf_counter() - t0
        ROWS[-1] = (ROWS[-1][0], ROWS[-1][1], t_ready)
        ok &= check("serve ready", ready.strip() == "ready", repr(ready))
        for i in range(2):
            sp.stdin.write("GATTACAGATTACA\n")
            sp.stdin.flush()
            line = _readline_timeout(sp.stdout, 600)
            if not line.startswith("ok "):
                times.append(float("inf"))
                break
            times.append(float(line.split()[1]))
        sp.stdin.write("quit\n")
        sp.stdin.flush()
        sp.wait(timeout=120)
    except (BrokenPipeError, OSError, subprocess.TimeoutExpired) as e:
        ROWS[-1] = (ROWS[-1][0], f"FAIL {type(e).__name__}", ROWS[-1][2])
        ok = False
    finally:
        if sp.poll() is None:
            sp.kill()
        errf.close()
    ROWS.append(("serve 2nd query", "ran",
                 times[1] if len(times) > 1 else float("inf")))
    # the VERDICT r4 #8 target: repeated queries under ~15 s
    ok &= check(
        "serve 2nd query < 15 s",
        len(times) == 2 and times[1] < 15.0,
        f"times={times}",
    )

    dev = "unknown"
    try:
        import jax

        dev = str(jax.devices()[0])
    except Exception:
        pass
    md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "results_cli_e2e.md")
    with open(md, "a") as f:
        f.write(f"\n## Run {time.strftime('%Y-%m-%d %H:%M')} on {dev}\n\n")
        f.write("| probe | result | seconds |\n|---|---|---|\n")
        for name, res, dt in ROWS:
            f.write(f"| {name} | {res} | {dt:.1f} |\n")
    print("ALL PASS" if ok else "FAILURES", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
