"""Hardware parallel-scaling ceiling calibration.

The north rule asks for indexing-throughput scaling efficiency >= 0.8 from N
to 4N executors.  Efficiency is bounded above by what the MACHINE delivers
for embarrassingly parallel work: this script runs the engine's own analysis
chain (the dominant per-doc CPU) over identical synthetic docs through a
plain multiprocessing.Pool — no Spark, no shuffle, no stage barriers — at 8
and 32 workers, and reports the ratio.  Whatever it prints is the ceiling
any Spark job can reach on this host; BENCH/BASELINE.md reports the index
build's efficiency both raw and relative to this ceiling.

Usage: python bench_ceiling.py   (writes BENCH/cpu_ceiling.json)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def work(seed: int) -> int:
    from apache___solr_spark.analysis.chain import analyze
    import random

    rng = random.Random(seed)
    words = ["alpha%d" % i for i in range(500)]
    n = 0
    for _ in range(3000):
        text = " ".join(rng.choice(words) for _ in range(400))
        n += len(analyze(text))
    return n


def run(workers: int, tasks: int = 128) -> float:
    with mp.Pool(workers) as p:
        t0 = time.time()
        p.map(work, range(tasks), chunksize=1)
        return tasks / (time.time() - t0)


def _touch_gib(gib: int) -> int:
    """Touch `gib` GiB of fresh anonymous memory (1 GiB chunks), then free."""
    import numpy as np

    for _ in range(gib):
        a = np.empty(1 << 30, dtype=np.uint8)
        a[::4096] = 1
        del a
    return gib


def prefault(gib: int = 96, workers: int = 8) -> float:
    """Fault-in `gib` GiB of guest memory and return the wall seconds.

    On a snapshot-resumed / lazily-backed VM, the FIRST touch of each
    guest-physical page since resume goes through the hypervisor's fault
    path at a globally-serialized ~0.5-3 GB/s (measured r5: cold 4k
    fault-in 0.57 GB/s single-thread, THP-madvise 0.05 GB/s, while
    PRE-TOUCHED memory moves at ~300 GB/s aggregate) — which makes the
    first heavy run after resume measure the host, not the code.  Touching
    most of guest RAM once up front moves that cost out of the measured
    window.  Measured effect on the 1.5M-doc local[32] index build:
    266 s -> 126 s from prefault alone (BENCH/BASELINE.md round 5)."""
    with mp.Pool(workers) as p:
        t0 = time.time()
        p.map(_touch_gib, [max(1, gib // workers)] * workers)
        return time.time() - t0


def fault_probe(mb: int = 512) -> float:
    """GB/s to first-touch `mb` MiB of fresh anonymous memory, single
    thread — the virtualization fault-path health metric that the compute
    probe (cache-resident, allocation-free) cannot see.  Recorded in every
    scaling session so a fault-path collapse is attributable."""
    import numpy as np

    sz = mb << 20
    a = np.empty(sz, dtype=np.uint8)
    t0 = time.time()
    a[::4096] = 1
    return sz / (time.time() - t0) / 1e9


def main() -> None:
    samples = {8: [], 32: []}
    for _ in range(2):
        for w in (8, 32):
            tp = run(w)
            samples[w].append(round(tp, 2))
            print(f"workers={w} throughput={tp:.2f} tasks/s")
    best8, best32 = max(samples[8]), max(samples[32])
    ceiling = round(best32 / best8 / 4.0, 3)
    out = {
        "throughput_8_workers": samples[8],
        "throughput_32_workers": samples[32],
        "speedup_8_to_32": round(best32 / best8, 2),
        "ceiling_efficiency": ceiling,
        "workload": "engine analysis chain, multiprocessing, no Spark",
    }
    print(json.dumps(out, indent=2))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cpu_ceiling.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
