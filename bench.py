"""Benchmark harness.

Runs the headline pipelines at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "triples": {name: count}, "triples_per_sec": ...}

The headline query materializes the KG from a deterministic synthetic
source-repositories corpus (repo, path, commit, lang, content) derived
from the lineitem table — the input shape from BASELINE.json input_hint.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession
    # shuffle spill on tmpfs: local-mode shuffles 5+ GB through
    # spark.local.dir; on /dev/shm that's memory-speed instead of the
    # root disk (measured ~20% off the dedup-bound pipelines)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR",
                               "/dev/shm/spark_graft_local"
                               if os.path.isdir("/dev/shm") else "/tmp")
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName("morph-xr2rml-spark-bench")
        .config("spark.local.dir", local_dir)
        .config("spark.ui.showConsoleProgress", "false")
        # fixed across parallelism levels so the scaling comparison sees
        # identical plans; AQE coalesces what's too fine
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # the sf0.1 parquet files are single small files: without a low
        # split size every downstream explode/parse inherits 1-2 input
        # partitions and parallelism dies — this is the 100TB-mindset knob
        # (there it's the opposite: keep splits near 128MB)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # NOT 32g+: this box (VM) punishes cold heap pages — the same
        # pipeline measured 8s@16c with a 12g heap vs 28s with 64g; a
        # right-sized heap keeps G1 regions warm
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _rep() -> int:
    """Deterministic input replication factor for scaling runs (the
    sandbox's scale knob: the sf0.1 jobs are too small to amortize fixed
    costs, so the scaling protocol measures at REP× the data)."""
    return int(os.environ.get("SPARK_GRAFT_SCALE_REP", "1"))


def _replicated(df, offset_cols: list[str]):
    """REP deterministic copies with entity keys offset (key*REP + r) so
    joins and subjects stay consistent and dedup doesn't collapse them.

    The repartition happens on the BASE rows, before the explode: the
    small sf parquet files yield a handful of input splits, and an
    explode placed before the shuffle would (a) run the fan-out in that
    narrow map stage — a parallelism ceiling no core count can lift —
    and (b) shuffle REP× the bytes.  Measured: moving the shuffle ahead
    of the explode cut the control pipeline 2× at 4 cores and took
    4→16-core efficiency from 0.38 to 0.86."""
    from pyspark.sql import functions as F
    rep = _rep()
    if rep <= 1:
        return df
    out = df.repartition(64) \
            .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
    for c in offset_cols:
        out = out.withColumn(c, F.col(c) * rep + F.col("_r"))
    return out.drop("_r")


def repo_corpus(spark, sf_dir: str):
    """Deterministic synthetic source-repositories table
    (repo, path, commit, lang, content) from lineitem: one JSON document
    per order with nested lineitems."""
    from pyspark.sql import functions as F
    from morph_xr2rml_spark.examples import orderdocs_df
    li = _replicated(spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
                     ["l_orderkey"])
    docs = orderdocs_df(spark, sf_dir, lineitem=li)
    return docs.select(
        F.lit("corpus/orders").alias("repo"),
        F.concat(F.lit("orderdocs/"),
                 F.md5(F.col("content")).substr(1, 2), F.lit("/"),
                 F.md5(F.col("content")), F.lit(".json")).alias("path"),
        F.sha1(F.col("content")).alias("commit"),
        F.lit("json").alias("lang"),
        F.col("content"),
    )


def corpus_path(sf_dir: str) -> str:
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return f"/tmp/spark_graft_corpus_sf{sf}_x{_rep()}.parquet"


def ensure_scaled_tables(spark, sf_dir: str) -> str:
    """Replicated documents/embeddings parquet for the ops bench queries
    (doc_id/vec_id offset), written once; returns the dir to use as the
    ops' sf_dir.  REP=1 → just the original dir."""
    rep = _rep()
    if rep <= 1:
        return sf_dir
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = f"/tmp/spark_graft_tables_sf{sf}_x{rep}"
    for name, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        path = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            _replicated(df, [key]).repartition(64) \
                .write.mode("overwrite").parquet(path)
    return out


def ensure_corpus(spark, sf_dir: str) -> str:
    """Materialize the synthetic repo corpus to parquet once (untimed
    setup — a real corpus is a stored table, not generated per query)."""
    path = corpus_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # fixed partition count so both scaling runs see identical input
        # with enough splits for the widest parallelism level
        repo_corpus(spark, sf_dir).repartition(64) \
            .write.mode("overwrite").parquet(path)
    return path


def q_kg_repo_corpus(spark, sf_dir: str):
    """Headline: materialization over the canonical repo table through the
    auto-router — this mapping's paths are static, so it compiles to the
    JSON-native tier (from_json + explode + concat; zero Python)."""
    from morph_xr2rml_spark.api import materialize_auto
    from morph_xr2rml_spark.examples import LINEITEM_JSON_MAPPING
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.sources import SourceCatalog

    corpus = spark.read.parquet(corpus_path(sf_dir))
    catalog = SourceCatalog().register_collection("orderdocs", corpus)
    mapping = MappingDocument.from_text(LINEITEM_JSON_MAPPING)
    return materialize_auto(spark, mapping, catalog=catalog)


def q_kg_repo_corpus_translate(spark, sf_dir: str):
    """Translation stage alone (dedup deferred): the executor-scaling
    protocol's probe.  At cluster scale the one global dedup exchange
    distributes across nodes; the per-executor scaling question is about
    this stage, so it gets its own bench entry."""
    from morph_xr2rml_spark.api import materialize_auto
    from morph_xr2rml_spark.examples import LINEITEM_JSON_MAPPING
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.sources import SourceCatalog

    corpus = spark.read.parquet(corpus_path(sf_dir))
    catalog = SourceCatalog().register_collection("orderdocs", corpus)
    mapping = MappingDocument.from_text(LINEITEM_JSON_MAPPING)
    return materialize_auto(spark, mapping, catalog=catalog, dedup=False)


def q_kg_repo_corpus_pyudf(spark, sf_dir: str):
    """Same pipeline forced through the Arrow/Python document compiler —
    the fallback tier for dynamic JSONPaths; kept in the bench to track
    the gap between the tiers."""
    from morph_xr2rml_spark.engine import materialize
    from morph_xr2rml_spark.examples import LINEITEM_JSON_MAPPING
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.sources import SourceCatalog

    corpus = spark.read.parquet(corpus_path(sf_dir))
    catalog = SourceCatalog().register_collection("orderdocs", corpus)
    mapping = MappingDocument.from_text(LINEITEM_JSON_MAPPING)
    return materialize(spark, mapping, catalog)


SKEW_MAPPING = """
@prefix rr:  <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex:  <http://example.com/> .
<#Child>
    xrr:logicalSource [ xrr:query "db.skewchild.find({})" ];
    rr:subjectMap [ rr:template "http://example.org/item/{$.uid}" ];
    rr:predicateObjectMap [ rr:predicate ex:dim;
      rr:objectMap [ rr:parentTriplesMap <#Dim>;
                     rr:joinCondition [ rr:child "$.k"; rr:parent "$.k" ] ] ].
<#Dim>
    xrr:logicalSource [ xrr:query "db.skewdim.find({})" ];
    rr:subjectMap [ rr:template "http://example.org/dim/{$.k}" ].
"""


def q_kg_skew_join(spark, sf_dir: str):
    """Hot-key refobjectmap join (north-star skew case): ~50% of child
    rows share ONE parent key (Zipf head).  Runs through the document
    engine with explicit key salting; AQE skew-join is on as backstop."""
    from pyspark.sql import functions as F
    from morph_xr2rml_spark.engine import materialize
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.sources import SourceCatalog

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # deterministic Zipf-ish key: half the rows hit key 0
    k = F.when(F.pmod(F.col("l_orderkey"), F.lit(10)) < 5, F.lit(0)) \
         .otherwise(F.pmod(F.col("l_orderkey"), F.lit(997)))
    child = li.select(F.to_json(F.struct(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("uid"),
        k.alias("k"))).alias("content")).repartition(64)
    dim = spark.range(0, 997).select(
        F.to_json(F.struct(F.col("id").alias("k"))).alias("content"))
    catalog = (SourceCatalog()
               .register_collection("skewchild", child)
               .register_collection("skewdim", dim))
    mapping = MappingDocument.from_text(SKEW_MAPPING)
    return materialize(spark, mapping, catalog, salt_partitions=8)


def _tpch_scaled_tables(spark, sf_dir: str):
    from morph_xr2rml_spark.examples import tpch_tables
    tables = tpch_tables(spark, sf_dir)
    if _rep() > 1:
        tables["orders"] = _replicated(tables["orders"],
                                       ["o_orderkey", "o_custkey"])
        tables["customer"] = _replicated(tables["customer"], ["c_custkey"])
    return tables


def q_kg_tpch(spark, sf_dir: str):
    from morph_xr2rml_spark.examples import kg_tpch_triples
    return kg_tpch_triples(spark, sf_dir,
                           tables=_tpch_scaled_tables(spark, sf_dir))


def q_kg_tpch_translate(spark, sf_dir: str):
    """kg_tpch minus the global dedup exchange — the executor-scaling
    decomposition probe (scan → term concat → ROM equi-joins → union),
    mirroring kg_repo_corpus_translate."""
    from morph_xr2rml_spark.examples import kg_tpch_triples
    return kg_tpch_triples(spark, sf_dir,
                           tables=_tpch_scaled_tables(spark, sf_dir),
                           dedup=False)


def q_sparql_point_pushdown(spark, sf_dir: str):
    """Selective SPARQL answering through the r5 pushdown path: the
    point query + comparison FILTER compile to ONE filtered orders scan
    (TM elimination + literal-comparison inversion) instead of
    materializing the KG first — the latency class a point query should
    have regardless of corpus size."""
    from morph_xr2rml_spark.examples import TPCH_KG_MAPPING, tpch_tables
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.rewrite import answer_tabular

    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    return answer_tabular(
        spark, mapping, tpch_tables(spark, sf_dir),
        "PREFIX ex: <http://example.com/>\n"
        "SELECT ?o ?p WHERE { ?o ex:totalPrice ?p . "
        "FILTER(?p > 400000.0) }")


def q_sparql_mixed_pushdown(spark, sf_dir: str):
    """Mixed relational + document answering through answer_auto (r6):
    one derivation routed per tier — numeric FILTER → parquet-side
    predicate on the customer scan, literal constant → composed find()
    on the order documents — joined across the tiers with NO evaluator
    dedup (both sides provably duplicate-free)."""
    from morph_xr2rml_spark.api import answer_auto
    from morph_xr2rml_spark.examples import (MIXED_KG_MAPPING,
                                             orderflat_catalog, tpch_tables)
    from morph_xr2rml_spark.model import MappingDocument

    mapping = MappingDocument.from_text(MIXED_KG_MAPPING)
    return answer_auto(
        spark, mapping,
        "PREFIX ex: <http://example.com/>\n"
        'SELECT ?o ?c ?n WHERE { ?o ex:placedBy ?c ; ex:status "F" . '
        "?c ex:name ?n ; ex:acctbal ?a . FILTER(?a > 9000.0) }",
        catalog=orderflat_catalog(spark, sf_dir),
        tables={"customer": tpch_tables(spark, sf_dir)["customer"]})


def q_sparql_agg_pushdown(spark, sf_dir: str):
    """Aggregate pushdown (r6, aggpush.py): the GROUP BY compiles
    straight onto the customer scan — pruned 3-column ReadSchema, no
    per-POM union, no dedup exchange, map-side partial aggregation —
    instead of rendering the whole KG's term strings and parsing the
    numerics back out.  The analytics-latency class: aggregate cost
    tracks the one scanned table, not the corpus."""
    from morph_xr2rml_spark.examples import TPCH_KG_MAPPING, tpch_tables
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.rewrite import answer_tabular

    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    return answer_tabular(
        spark, mapping, tpch_tables(spark, sf_dir),
        "PREFIX ex: <http://example.com/>\n"
        "SELECT ?seg (COUNT(*) AS ?n) (SUM(?b) AS ?s) (AVG(?b) AS ?a) "
        "WHERE { ?c ex:segment ?seg . ?c ex:acctbal ?b } "
        "GROUP BY ?seg ORDER BY ?seg")


def q_sparql_join_agg_pushdown(spark, sf_dir: str):
    """Aggregate-over-join pushdown (late r6): the reference's flagship
    analytics shape (orders -> customer grouped by a customer
    attribute) compiles to two pruned scans + a broadcast hash join on
    the RAW key + one aggregate — no term string is rendered before an
    exchange, the orders subject template never renders at all."""
    from morph_xr2rml_spark.examples import TPCH_KG_MAPPING, tpch_tables
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.rewrite import answer_tabular

    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    return answer_tabular(
        spark, mapping, tpch_tables(spark, sf_dir),
        "PREFIX ex: <http://example.com/>\n"
        "SELECT ?seg (COUNT(?o) AS ?n) (SUM(?p) AS ?tot) WHERE { "
        "?o a ex:Order . ?o ex:placedBy ?c . ?o ex:totalPrice ?p . "
        "?c ex:segment ?seg } GROUP BY ?seg ORDER BY ?seg")


def q_sparql_subquery_topk(spark, sf_dir: str):
    """Subquery pushdown (late r6): top spenders by name.  The nested
    SELECT partial-aggregates the orders scan per customer BEFORE any
    join, then broadcast-joins the name pool under
    TakeOrderedAndProject — the KG is never materialized."""
    from morph_xr2rml_spark.examples import TPCH_KG_MAPPING, tpch_tables
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.rewrite import answer_tabular

    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    return answer_tabular(
        spark, mapping, tpch_tables(spark, sf_dir),
        "PREFIX ex: <http://example.com/>\n"
        "SELECT ?name ?t WHERE { ?c ex:name ?name . "
        "{ SELECT ?c (SUM(?p) AS ?t) WHERE { ?o ex:placedBy ?c . "
        "?o ex:totalPrice ?p } GROUP BY ?c } } "
        "ORDER BY DESC(?t) LIMIT 10")


def q_sparql_graph_pushdown(spark, sf_dir: str):
    """Graph-position pushdown (late r6): a constant GRAPH against a
    graph TEMPLATE inverts to a parquet PushedFilter on the render
    column (EqualTo(n_regionkey,2)) and drops every graph-less TM from
    the plan — the named-graph point-query latency class."""
    from morph_xr2rml_spark.examples import GRAPH_KG_MAPPING, tpch_tables
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.rewrite import answer_tabular

    mapping = MappingDocument.from_text(GRAPH_KG_MAPPING)
    return answer_tabular(
        spark, mapping, tpch_tables(spark, sf_dir),
        "PREFIX ex: <http://example.com/>\n"
        "SELECT ?s ?n WHERE { GRAPH <http://example.org/g/2> "
        "{ ?s ex:name ?n } } ORDER BY ?s")


def queries():
    q = {
        "kg_repo_corpus": q_kg_repo_corpus,
        "kg_repo_corpus_translate": q_kg_repo_corpus_translate,
        "kg_repo_corpus_pyudf": q_kg_repo_corpus_pyudf,
        "kg_tpch": q_kg_tpch,
        "kg_tpch_translate": q_kg_tpch_translate,
        "kg_skew_join": q_kg_skew_join,
        "sparql_point_pushdown": q_sparql_point_pushdown,
        "sparql_mixed_pushdown": q_sparql_mixed_pushdown,
        "sparql_agg_pushdown": q_sparql_agg_pushdown,
        "sparql_join_agg_pushdown": q_sparql_join_agg_pushdown,
        "sparql_subquery_topk": q_sparql_subquery_topk,
        "sparql_graph_pushdown": q_sparql_graph_pushdown,
    }
    try:
        from morph_xr2rml_spark.ops import registry
        q.update(registry.bench_queries())
    except ImportError:
        pass
    return q


# Idle-box single-thread spin reference for THIS VM class (measured
# 173-175 ms across quiet runs).  VERDICT r4: two clean same-code runs
# differed 14% while the spin itself drifted 26% (VM steal / frequency) —
# the load-average flag can't see per-core speed drift, so the headline
# is ALSO reported normalized by the run's own spin speed:
#   tps_normalized = tps * (spin_ms / SPIN_NOMINAL_MS)
# i.e. a run on a temporarily slow CPU gets its throughput credited back
# proportionally.  Cross-run comparisons should use the normalized value;
# the raw value stays the ground truth for absolute throughput.
SPIN_NOMINAL_MS = 174.0


def _spin_ms(n: int = 4_000_000) -> float:
    """Single-thread CPU calibration: wall time of a fixed pure-Python
    loop.  On an idle box this is stable to a few %; a shared-host load
    burst (the r3 ghost regression: 20.9s vs 11.3s on identical code)
    inflates it visibly."""
    t0 = time.perf_counter()
    s = 0
    for i in range(n):
        s += i
    return (time.perf_counter() - t0) * 1000.0


def host_load_probe() -> dict:
    return {"loadavg": [round(x, 2) for x in os.getloadavg()],
            "spin_ms": round(_spin_ms(), 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # host-noise self-labeling (VERDICT r3 item 2): sample load BEFORE any
    # of our own work starts, and a spin calibration before/after —
    # external load bursts on this shared box have produced 2-3× ghost
    # regressions with zero local CPU consumers
    load_before = host_load_probe()
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_corpus(spark, sf_dir)
    ops_dir = ensure_scaled_tables(spark, sf_dir)

    # min-of-3 (VERDICT r4 item 3): iteration 1 includes JIT warmup and
    # iterations bounce ±15-30% on this shared VM; the min is the least
    # noise-inflated sample
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    times: dict[str, float] = {}
    counts: dict[str, int] = {}
    spreads: dict[str, float] = {}
    for name, fn in queries().items():
        qdir = sf_dir if name.startswith("kg_") else ops_dir
        samples = []
        for _ in range(iters):
            t0 = time.time()
            df = fn(spark, qdir)
            counts[name] = df.count()
            samples.append(time.time() - t0)
        times[name] = round(min(samples), 3)
        # relative spread of the non-warmup samples — the run's own
        # repeatability evidence (iteration 1 is JIT warmup, excluded)
        tail = samples[1:] or samples
        spreads[name] = round(max(tail) / min(tail) - 1.0, 3)

    load_after = host_load_probe()
    # noisy = the box was already busy before we started (load that isn't
    # ours), or single-thread speed degraded >40% across the run
    noisy = (load_before["loadavg"][0] > 4.0
             or load_after["spin_ms"] > 1.4 * load_before["spin_ms"])

    total = round(sum(times.values()), 3)
    headline_tps = (round(counts["kg_repo_corpus"] / times["kg_repo_corpus"])
                    if times.get("kg_repo_corpus") else None)
    # spin normalization: credit back per-core speed drift so two clean
    # runs of the same code agree (see SPIN_NOMINAL_MS)
    run_spin = min(load_before["spin_ms"], load_after["spin_ms"])
    spin_factor = run_spin / SPIN_NOMINAL_MS
    sorted_spreads = sorted(spreads.values())
    print(json.dumps({
        "metric": "kg_materialization_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "triples": counts,
        "triples_per_sec_headline": headline_tps,
        "triples_per_sec_headline_normalized":
            round(headline_tps * spin_factor) if headline_tps else None,
        "spin_factor": round(spin_factor, 3),
        "repeatability": {
            "iters": iters,
            "per_query_rel_spread": spreads,
            "median_rel_spread": round(
                sorted_spreads[len(sorted_spreads) // 2], 3)
            if sorted_spreads else None,
        },
        "host_load_before": load_before,
        "host_load_after": load_after,
        "host_noise_suspected": noisy,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
