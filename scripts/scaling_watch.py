"""Window-watcher: fire quiet-gated scaling sessions when the host is good.

The r5 sandbox host suffers hypervisor-level throughput collapses that the
guest cannot see in load average (vmstat 100% idle while the no-Spark
probe halves) — sessions P3/P4 were polluted mid-level by one.  This
watcher probes every ~75s and launches one bench_scaling.py session only
after TWO consecutive probes meet the absolute floors; it keeps going
until `--sessions` sessions come back ADMITTED (every level's window held
through its post-probe) or the deadline passes.

It refuses to probe/launch while a pytest run is alive (suite contention
would both slow the suite and pollute the session).

Usage:
    python scripts/scaling_watch.py --sessions 3 --prefix P5 \
        --corpus /tmp/scaling_corpus_shared/pages.parquet
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_ceiling import run as ceiling_run  # noqa: E402


def pytest_alive() -> bool:
    out = subprocess.run(
        ["pgrep", "-f", "pytest"], capture_output=True, text=True
    )
    return bool(out.stdout.strip())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=3)
    ap.add_argument("--prefix", default="P5", help="first session name; "
                    "subsequent ones increment the trailing number")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--floor-lo", type=float, default=9.3)
    ap.add_argument("--floor-hi", type=float, default=26.0)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--n-docs", type=int, default=1_500_000)
    ap.add_argument("--deadline-min", type=float, default=240.0)
    args = ap.parse_args()

    lo_c, hi_c = (int(x) for x in args.levels.split(","))
    head, num = args.prefix[0], int(args.prefix[1:])
    deadline = time.time() + args.deadline_min * 60
    admitted = 0
    consecutive_good = 0
    while admitted < args.sessions and time.time() < deadline:
        if pytest_alive():
            print("pytest alive; standing down", flush=True)
            time.sleep(120)
            continue
        p_lo = ceiling_run(lo_c, tasks=32)
        p_hi = ceiling_run(hi_c, tasks=32)
        good = p_lo >= args.floor_lo and p_hi >= args.floor_hi
        print(
            f"watch probe: {lo_c}={p_lo:.2f} {hi_c}={p_hi:.2f} "
            f"good={good} streak={consecutive_good}",
            flush=True,
        )
        if not good:
            consecutive_good = 0
            time.sleep(75)
            continue
        consecutive_good += 1
        if consecutive_good < 2:
            time.sleep(45)
            continue
        consecutive_good = 0
        name = f"{head}{num}"
        num += 1
        out_json = f"BENCH/scaling_r5_session{name}.json"
        env = dict(
            os.environ,
            SCALING_REPEATS="1",
            SCALING_CORPUS=args.corpus,
            SCALING_LEVELS=args.levels,
            SCALING_MIN_PROBE_LO=str(args.floor_lo),
            SCALING_MIN_PROBE_HI=str(args.floor_hi),
            SCALING_PROBE_BUDGET_SEC="900",
            SCALING_OUT=out_json,
        )
        print(f"launching session {name}", flush=True)
        subprocess.run(
            [sys.executable, "bench_scaling.py", str(args.n_docs)],
            cwd=REPO,
            env=env,
            timeout=5400,
        )
        try:
            with open(os.path.join(REPO, out_json)) as f:
                d = json.load(f)
            ok = bool(d.get("admitted"))
        except (OSError, ValueError):
            ok = False
        admitted += 1 if ok else 0
        print(
            f"session {name}: admitted={ok} "
            f"raw={d.get('scaling_efficiency') if ok else '-'} "
            f"({admitted}/{args.sessions} admitted)",
            flush=True,
        )
        time.sleep(30)
    print(f"done: {admitted} admitted sessions", flush=True)


if __name__ == "__main__":
    main()
