"""Benchmark harness.

Default mode: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}`` (driver contract).

``--scaling`` mode: evidence for the north rule's two-cluster-size criterion
inside a single machine — the same feature-assembly job on the same input at
two parallelism levels (local[8] vs local[32]); reports turns/sec at both and
scaling efficiency = (thr32/thr8)/(32/8), written to BENCH/BASELINE.md.
Each level runs in its own subprocess (a JVM can't change master in-flight).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "lag_lead",
    "ffill",
    "sessionize",
    "rolling_mean",
    "rollup",
    "topk_per_user",
    "asof_union",
    "asof_cogroup",
    "roc_auc",
    "infgain_equalfreq",
    "chi2_stat",
    "dedup_exact",
    "token_count",
    "text_quality",
    "cosine_topk",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else -1.0


def run_bench() -> None:
    import __spark_entry__ as entrymod
    from recipeselectors_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    qs = entrymod.queries()

    # warm the JVM + parquet footer cache once with a trivial action
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()  # force full execution
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    # flagship assembly throughput (turns/sec) over the events-derived table
    from recipeselectors_spark.operators import assembly
    from recipeselectors_spark.sources import transcripts as T

    tx = T.events_as_transcripts(spark, SF_DIR).drop("value")
    t0 = time.time()
    n_turns = assembly.assemble_features(tx).count()
    dt = time.time() - t0
    timings["assemble_features"] = round(dt, 3)
    total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "turns_per_sec": round(n_turns / dt, 1),
            }
        )
    )
    spark.stop()


def _worker(cpus: int) -> None:
    """Measure assembly throughput at a given parallelism (subprocess)."""
    from recipeselectors_spark.operators import assembly
    from recipeselectors_spark.session import get_spark
    from recipeselectors_spark.sources import transcripts as T

    spark = get_spark(
        app_name=f"scale{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    tx = T.events_as_transcripts(spark, SF_DIR).drop("value").cache()
    n = tx.count()  # warm cache: isolate compute from input decode
    t0 = time.time()
    n_turns = assembly.assemble_features(tx).count()
    dt = time.time() - t0
    print(json.dumps({"cpus": cpus, "turns": n_turns, "sec": round(dt, 4)}))
    spark.stop()


def run_scaling(levels=(8, 32), repeats: int = 3) -> None:
    results = {}
    for cpus in levels:
        best = None
        for _ in range(repeats):
            out = subprocess.run(
                [sys.executable, __file__, "--worker", str(cpus)],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[cpus] = best

    lo, hi = levels
    thr = {c: results[c]["turns"] / results[c]["sec"] for c in levels}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    report = {
        "sf_dir": SF_DIR,
        "levels": {
            str(c): {
                "turns": results[c]["turns"],
                "sec": results[c]["sec"],
                "turns_per_sec": round(thr[c], 1),
            }
            for c in levels
        },
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8 from N to 4N (north rule)",
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            "# BENCH/BASELINE — scaling-efficiency evidence\n\n"
            "Sandbox protocol for the north rule's two-cluster-size criterion\n"
            "(no real cluster available): the same feature-assembly job\n"
            "(`assemble_features` over the events-derived transcript table,\n"
            f"input `{SF_DIR}`, cached in memory so compute — not parquet\n"
            "decode — is measured) at two parallelism levels, best of\n"
            f"{repeats} runs each.\n\n"
            "| parallelism | turns | wall sec | turns/sec |\n"
            "|---|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {results[c]['turns']} | {results[c]['sec']}"
                f" | {round(thr[c], 1)} |\n"
                for c in levels
            )
            + f"\n**Scaling efficiency (N={lo} → 4N={hi}):** "
            f"(thr{hi}/thr{lo}) / ({hi}/{lo}) = **{round(eff, 3)}** "
            "(criterion ≥ 0.8).\n"
        )


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        run_bench()
