"""Two-parallelism scaling benchmark (BASELINE.md §3 protocol).

The north rule's two-cluster-size criterion (N vs 4N executors,
efficiency >= 0.8) cannot use a real cluster in this sandbox; per the
driver protocol we run the SAME job on the SAME input at local[8] and
local[32] and report throughput at both plus scaling efficiency.

Each parallelism level runs in its own subprocess (fresh JVM) so
nothing is shared but the input parquet. The run asserts both levels
produce IDENTICAL query outputs (docIDs + bitwise float32 scores) —
the determinism contract that makes cluster-size changes safe.

Usage:
    python tools/scaling_bench.py            # full run, prints report
    python tools/scaling_bench.py --docs 200000
Internal:
    python tools/scaling_bench.py --worker --cpus N --pages DIR --out F
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_LOW, N_HIGH = 8, 32


def query_set():
    """~60 queries spanning the df spectrum: high-df content words,
    specials, deep-tail words, plus AND/OR/MSM combinations."""
    from lucene_solr_spark.fixtures.pages import _BASE_VOCAB, _tail_word
    from lucene_solr_spark.search.query import BooleanAnd, BooleanOr, TermQuery

    qs = []
    for w in _BASE_VOCAB[:20]:
        qs.append(TermQuery(w))
    qs += [TermQuery("café"), TermQuery("42"), TermQuery("o'neil's")]
    for i in (0, 7, 70, 700, 7000):
        qs.append(TermQuery(_tail_word(i)))
    v = _BASE_VOCAB
    for i in range(0, 20, 2):
        qs.append(BooleanAnd((v[i], v[i + 1])))
    for i in range(0, 18, 3):
        qs.append(BooleanOr((v[i], v[i + 1], v[i + 2])))
    for i in range(0, 12, 3):
        qs.append(BooleanOr((v[i], v[i + 1], v[i + 2]), min_should_match=2))
    qs += [
        BooleanAnd(("query", "value", "data")),
        BooleanAnd(("sort", "merge", _tail_word(3))),
    ]
    return qs


def worker(cpus: int, pages_dir: str, out_file: str) -> None:
    from lucene_solr_spark.session import apply_worker_malloc_env

    apply_worker_malloc_env()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"lss-scale-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "60g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    src = spark.read.parquet(pages_dir)
    n_docs = src.count()
    ix_dir = tempfile.mkdtemp(prefix=f"lss_scale_ix{cpus}_")
    try:
        t0 = time.perf_counter()
        build_index(
            spark,
            src,
            ix_dir,
            IndexConfig(
                n_shards=8,
                segs_per_shard=8,
                id_col="url",
                text_col="text",
                sharding="hash",
            ),
            resume=False,
        )
        t_build = time.perf_counter() - t0

        s = IndexSearcher(spark, ix_dir)
        qs = {f"q{i:02d}": q for i, q in enumerate(query_set())}
        s.search(list(qs.values())[0], k=10).collect()  # warm
        # batched search (search_many): all queries in one Spark job —
        # the production shape for query serving on Spark; repeated to
        # get a stable rate
        REPS = 5
        t0 = time.perf_counter()
        for _ in range(REPS):
            rows = s.search_many(qs, k=20).collect()
        t_query = (time.perf_counter() - t0) / REPS
        by_qid: dict[str, list] = {}
        for r in rows:
            by_qid.setdefault(r.qid, []).append((r.doc_id, float(r.score)))
        results = [by_qid.get(qid, []) for qid in sorted(qs)]

        # output fingerprint: doc ids + bitwise float32 scores
        h = hashlib.sha256()
        for rs in results:
            for d, sc in rs:
                import numpy as np

                h.update(int(d).to_bytes(8, "little"))
                h.update(np.float32(sc).tobytes())
        with open(out_file, "w") as fh:
            json.dump(
                {
                    "cpus": cpus,
                    "n_docs": int(n_docs),
                    "build_sec": t_build,
                    "docs_per_sec": n_docs / t_build,
                    "query_sec": t_query,
                    "qps": len(qs) / t_query,
                    "results_sha": h.hexdigest(),
                },
                fh,
            )
    finally:
        shutil.rmtree(ix_dir, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=int(os.environ.get("LSS_SCALE_DOCS", "100000")))
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--pages", type=str)
    ap.add_argument("--out", type=str)
    args = ap.parse_args()

    if args.worker:
        worker(args.cpus, args.pages, args.out)
        return

    pages_dir = os.path.join(tempfile.gettempdir(), f"lss_scale_pages_{args.docs}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        print(f"generating {args.docs} pages -> {pages_dir}", file=sys.stderr)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from lucene_solr_spark.fixtures.pages import generate_pages

        generate_pages(spark, args.docs, 32).write.mode("overwrite").parquet(pages_dir)
        spark.stop()

    # hardware ceiling: how well does a pure-CPU workload itself scale
    # N -> 4N on this box (frequency scaling + steal put this below 1.0;
    # pipeline efficiency should be judged against it)
    def cpu_ceiling() -> float:
        def run(n: int) -> float:
            code = "x=0\nfor i in range(30_000_000): x+=i"
            t0 = time.perf_counter()
            ps = [subprocess.Popen([sys.executable, "-c", code]) for _ in range(n)]
            for p in ps:
                p.wait()
            return n / (time.perf_counter() - t0)

        lo, hi = run(N_LOW), run(N_HIGH)
        return (hi / lo) / (N_HIGH / N_LOW)

    ceiling = cpu_ceiling()

    reports = {}
    for cpus in (N_LOW, N_HIGH):
        out_file = os.path.join(tempfile.gettempdir(), f"lss_scale_r{cpus}.json")
        print(f"running local[{cpus}] ...", file=sys.stderr)
        subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--worker",
                "--cpus",
                str(cpus),
                "--pages",
                pages_dir,
                "--out",
                out_file,
            ],
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        with open(out_file) as fh:
            reports[cpus] = json.load(fh)

    lo, hi = reports[N_LOW], reports[N_HIGH]
    identical = lo["results_sha"] == hi["results_sha"]
    build_eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (N_HIGH / N_LOW)
    query_eff = (hi["qps"] / lo["qps"]) / (N_HIGH / N_LOW)
    print(
        json.dumps(
            {
                "n_docs": lo["n_docs"],
                "index": {
                    f"docs_per_sec@{N_LOW}": round(lo["docs_per_sec"], 1),
                    f"docs_per_sec@{N_HIGH}": round(hi["docs_per_sec"], 1),
                    "scaling_efficiency": round(build_eff, 3),
                },
                "query": {
                    f"qps@{N_LOW}": round(lo["qps"], 2),
                    f"qps@{N_HIGH}": round(hi["qps"], 2),
                    "scaling_efficiency": round(query_eff, 3),
                },
                "outputs_identical": identical,
                "cpu_ceiling_efficiency": round(ceiling, 3),
                "index_eff_vs_ceiling": round(build_eff / ceiling, 3),
                "query_eff_vs_ceiling": round(query_eff / ceiling, 3),
                "build_sec": {str(N_LOW): round(lo["build_sec"], 1), str(N_HIGH): round(hi["build_sec"], 1)},
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
