"""Benchmark harness (driver contract).

Runs the headline engine pipelines at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Mirrors the reference's byTask harness metrics (rec/s per task —
lucene/benchmark/.../byTask/tasks/ReportTask.java:66): we report
index-build seconds (Populate task analog) and per-query seconds
(Search task analog). Extra context fields (docs_per_sec, qps, cores)
are additive; the driver reads metric/value/queries/sf.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from lucene_solr_spark.session import apply_worker_malloc_env

    apply_worker_malloc_env()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lss-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import (
        BooleanAnd,
        BooleanNot,
        BooleanOr,
        TermQuery,
    )
    from lucene_solr_spark.search.searcher import IndexSearcher

    queries: dict[str, float] = {}
    t_start = time.perf_counter()

    # ---- index build (Populate task analog): fresh build, timed ----
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = src.count()
    out = tempfile.mkdtemp(prefix="lss_bench_idx_")
    try:
        t0 = time.perf_counter()
        build_index(
            spark,
            src,
            out,
            IndexConfig(
                n_shards=8,
                segs_per_shard=4,
                id_col="doc_id",
                text_col="text",
                sharding="range_int",
            ),
            resume=False,
        )
        t_build = time.perf_counter() - t0
        queries["index_build"] = round(t_build, 4)

        # serving mode: pin postings/norms/dictionary in executor
        # memory (the open-IndexReader analog — reference SearchTasks
        # reuse one reader over OS-cached segment files)
        searcher = IndexSearcher(spark, out).preload()

        # ---- search tasks (micro-standard.alg Search analog) ----
        qset = {
            "q_term": TermQuery("table"),
            "q_term_low": TermQuery("vector"),
            "q_and2": BooleanAnd(("scan", "table")),
            "q_and3": BooleanAnd(("fast", "slow", "value")),
            "q_or3": BooleanOr(("customer", "spark", "vector")),
            "q_or_msm2": BooleanOr(("customer", "spark", "vector"), min_should_match=2),
            "q_not": BooleanNot(("table",), ("scan",)),
        }
        # warm once (JVM/Arrow code paths), then time best-of-3 per
        # query (the reference harness also reports multi-round runs,
        # byTask/package-info.java:687-691 — single-shot wall time on a
        # shared host swings 30-60%, documented in BENCH.md §2)
        #
        # Serving conf: AQE OFF for the point-query legs. A warm
        # serving query is a fixed three-stage plan over pinned,
        # pre-partitioned frames with zero exchanges — AQE's
        # per-stage re-planning only adds latency there (~0.2 s/query
        # measured at sf0.1). Analytics/ops legs re-enable it below
        # (skew joins, coalescing). Real deployments split serving vs
        # batch session confs the same way.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # three warm queries reach JIT/codegen steady state (the first
        # 1-2 executions of the cogroup path still compile; the
        # reference harness likewise reports post-warmup rounds), and
        # one explicit GC drains the index-build garbage so the first
        # timed legs don't pay a collection pause
        for _ in range(3):
            searcher.search(TermQuery("table"), k=20).collect()
        spark._jvm.System.gc()
        n_q = 0
        t_search = 0.0
        for name, q in qset.items():
            best = None
            for _ in range(5):
                t0 = time.perf_counter()
                searcher.search(q, k=20).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            queries[name] = round(best, 4)
            t_search += best
            n_q += 1

        # ---- batched QPS (the intended serving shape: search_many
        # evaluates the whole query set in ONE Spark job; per-query
        # wall time above is dominated by fixed job overhead) ----
        vocab = ["table", "scan", "spark", "window", "vector", "customer",
                 "key", "order", "sort", "merge", "batch", "stream", "hash",
                 "join", "filter", "group", "agg", "row", "column", "value"]
        batch: dict = {}
        for i, t in enumerate(vocab):
            batch[f"t{i}"] = TermQuery(t)
            batch[f"a{i}"] = BooleanAnd((t, vocab[(i + 1) % len(vocab)]))
            batch[f"o{i}"] = BooleanOr(
                (t, vocab[(i + 3) % len(vocab)], vocab[(i + 7) % len(vocab)])
            )
        searcher.search_many({"w": TermQuery("table")}, k=20).collect()
        t_batch = None
        for _ in range(2):  # best-of-2 (one big job; see note above)
            t0 = time.perf_counter()
            searcher.search_many(batch, k=20).collect()
            dt = time.perf_counter() - t0
            t_batch = dt if t_batch is None or dt < t_batch else t_batch
        queries["q_batch60"] = round(t_batch, 4)
        spark.conf.set("spark.sql.adaptive.enabled", "true")

        # ---- training-data ops (documents/embeddings tables) ----
        try:
            from lucene_solr_spark.ops import bench_ops

            for name, sec in bench_ops(spark, sf_dir).items():
                queries[name] = round(sec, 4)
        except ImportError:
            pass

        total = time.perf_counter() - t_start
        print(
            json.dumps(
                {
                    "metric": "index-build + BM25 top-k query wall time",
                    "value": round(total, 4),
                    "unit": "sec",
                    "queries": queries,
                    "sf": sf_dir,
                    "context": {
                        "n_docs": int(n_docs),
                        "index_docs_per_sec": round(n_docs / t_build, 2),
                        "search_qps": round(n_q / t_search, 2) if t_search else None,
                        "batched_qps": round(len(batch) / t_batch, 2),
                        "cores": cpus,
                        "spark": spark.version,
                    },
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
