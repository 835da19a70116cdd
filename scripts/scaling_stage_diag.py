"""Per-stage scaling diagnostic for the index build.

Runs the SAME build_index job at two parallelism levels (fresh JVM each) on
the same corpus and reports, per level:

- per-stage wall seconds (from the stage checkpoint manifests)
- total wall seconds
- process-tree CPU seconds (getrusage self+children captures the JVM and
  every Python worker, since they are all children of the driver process)
- effective cores = cpu_sec / wall_sec

Effective cores is the number that explains local-mode efficiency losses
that would NOT exist on a real cluster: at local[4] the JVM's GC, shuffle
and parquet codec threads run on cores beyond the 4 task slots, so the
"4-core" level actually consumes >4 cores of machine and its throughput is
inflated, deflating measured N->4N efficiency.  A real 4-executor cluster
gives each executor its own helper threads on its own host.

Usage: python scripts/scaling_stage_diag.py [n_docs] [lo,hi]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
LO, HI = (
    (int(x) for x in sys.argv[2].split(",")) if len(sys.argv) > 2 else (4, 16)
)

_CHILD = r"""
import json, os, resource, sys, tempfile, time
sys.path.insert(0, "@REPO@")
from apache___solr_spark.session import get_spark
from apache___solr_spark.index.builder import build_index, IndexPaths
from apache___solr_spark.index import checkpoint as ckpt

cores = int(sys.argv[1]); pages_path = sys.argv[2]
spark = get_spark(f"stagediag-{cores}", cores=cores)
out = tempfile.mkdtemp(prefix=f"stagediag_idx_{cores}_")
idx = os.path.join(out, "idx")
t0 = time.time()
paths = build_index(spark, pages_path, idx)
wall = time.time() - t0
ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
# The JVM and Python workers are still alive (children), so RUSAGE_CHILDREN
# misses them until exit: sum live utime+stime over every process whose
# ancestry includes us, plus RUSAGE_CHILDREN for already-reaped workers.
def tree_cpu_all(root):
    hz = os.sysconf("SC_CLK_TCK")
    procs = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rest = f.read().rsplit(") ", 1)[1].split()
            procs[int(d)] = (int(rest[1]), (int(rest[11]) + int(rest[12])) / hz)
        except (OSError, IndexError, ValueError):
            continue
    keep = {root}
    grew = True
    while grew:
        grew = False
        for pid, (ppid, _) in procs.items():
            if ppid in keep and pid not in keep:
                keep.add(pid)
                grew = True
    return sum(procs[p][1] for p in keep if p in procs)

cpu_live = tree_cpu_all(os.getpid())  # includes self's live utime+stime
cpu_dead = ru_c.ru_utime + ru_c.ru_stime
stages = {}
for name in ("analyzed_raw", "numbering", "analyzed", "docs", "postings", "dictionary"):
    m = ckpt.load_manifest(os.path.join(idx, name))
    if m:
        stages[name] = m["wall_sec"]
n = spark.read.parquet(pages_path).count()
print("RESULT " + json.dumps({
    "cores": cores,
    "build_sec": round(wall, 2),
    "docs_per_sec": round(n / wall, 1),
    "stages": stages,
    "stage_sum": round(sum(stages.values()), 2),
    "cpu_sec": round(cpu_live + cpu_dead, 1),
    "effective_cores": round((cpu_live + cpu_dead) / wall, 2),
}))
spark.stop()
"""


def run_level(cores: int, pages_path: str) -> dict | None:
    script = _CHILD.replace("@REPO@", REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), pages_path],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(out.stdout[-2000:])
    print(out.stderr[-3000:])
    return None


def main() -> None:
    pages = os.environ.get("SCALING_CORPUS", "")
    if not pages:
        from apache___solr_spark.corpus import write_pages_parquet

        work = tempfile.mkdtemp(prefix="stagediag_corpus_")
        pages = os.path.join(work, "pages.parquet")
        write_pages_parquet(
            pages, n_docs=N_DOCS, seed=42, n_jobs=os.cpu_count() or 8
        )
        print(f"corpus: {pages}")
    results = {}
    for cores in (HI, LO):  # hi first: shortest + most contention-sensitive
        r = run_level(cores, pages)
        print(json.dumps(r, indent=1))
        results[cores] = r
    if results.get(LO) and results.get(HI):
        lo, hi = results[LO], results[HI]
        ratio = HI / LO
        print("\nper-stage scaling (lo_wall / hi_wall, ideal = %.1f):" % ratio)
        for k in lo["stages"]:
            lw, hw = lo["stages"][k], hi["stages"].get(k, float("nan"))
            print(
                f"  {k:14s} lo={lw:8.2f}s hi={hw:8.2f}s speedup={lw / hw:5.2f} "
                f"eff={(lw / hw) / ratio:.2f}"
            )
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
        print(
            f"\ntotal: lo={lo['build_sec']}s hi={hi['build_sec']}s "
            f"raw_eff={eff:.3f}"
        )
        print(
            f"effective cores: lo={lo['effective_cores']} (slots={LO}) "
            f"hi={hi['effective_cores']} (slots={HI})"
        )
        slot_eff = (
            (hi["docs_per_sec"] / hi["effective_cores"])
            / (lo["docs_per_sec"] / lo["effective_cores"])
        )
        print(
            "per-consumed-core efficiency (throughput per effective core, "
            f"hi/lo): {slot_eff:.3f}"
        )


if __name__ == "__main__":
    main()
