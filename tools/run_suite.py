"""Run the full test suite in chunked pytest subprocesses.

One long-lived pytest process accumulates hundreds of XLA:CPU compiled
programs and eventually SEGFAULTS inside ``backend_compile_and_load``
(observed at ~47% of a 146-test run, exit 139, RSS well under the box's
RAM). Root cause: each compiled program adds several small mmap'd
sections and the kernel's default vm.max_map_count (65530) runs out —
raise it (sysctl -w vm.max_map_count=1048576) or use this runner, the
one-command way to run EVERYTHING at any map-count limit:
it partitions the test files into a few chunks, runs each in a fresh
subprocess, and aggregates the results.

Usage: python tools/run_suite.py [--chunks 4] [-q] [extra pytest args]
Exit status: 0 iff every chunk passed.
"""
import argparse
import glob
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=4)
    args, extra = ap.parse_known_args()

    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    if not files:
        raise SystemExit("no test files found")
    # balance by file size (a proxy for runtime): biggest first, assign to
    # the currently-lightest chunk
    chunks = [[] for _ in range(max(1, args.chunks))]
    loads = [0] * len(chunks)
    for f in sorted(files, key=os.path.getsize, reverse=True):
        i = loads.index(min(loads))
        chunks[i].append(f)
        loads[i] += os.path.getsize(f)

    env = dict(os.environ)
    totals = {"passed": 0, "failed": 0, "error": 0, "skipped": 0}
    rc_all = 0
    t0 = time.time()
    for i, chunk in enumerate(c for c in chunks if c):
        cmd = [sys.executable, "-m", "pytest", *chunk, "-q", *extra]
        print(f"[chunk {i + 1}/{len(chunks)}] {len(chunk)} files",
              flush=True)
        r = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True,
                           text=True)
        tail = (r.stdout or "").strip().splitlines()
        summary = tail[-1] if tail else ""
        print(f"  {summary}", flush=True)
        if r.returncode != 0:
            rc_all = 1
            print(r.stdout[-4000:], file=sys.stderr)
            print(r.stderr[-2000:], file=sys.stderr)
        for key in totals:
            m = re.search(rf"(\d+) {key}", summary)
            if m:
                totals[key] += int(m.group(1))
    dt = time.time() - t0
    print(f"TOTAL: {totals['passed']} passed, {totals['failed']} failed, "
          f"{totals['error']} error, {totals['skipped']} skipped "
          f"in {dt:.0f}s")
    sys.exit(rc_all)


if __name__ == "__main__":
    main()
