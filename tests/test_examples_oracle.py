"""Engine-vs-DuckDB-oracle agreement at sf0.001 — a local pre-run of the
driver's CORRECTNESS gate (same comparison: row count + sorted value set)."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchall()


def _compare(spark, spark_df, oracle_sql):
    got = sorted(tuple(str(x) if x is not None else None for x in row)
                 for row in spark_df.collect())
    want = sorted(tuple(str(x) if x is not None else None for x in row)
                  for row in _duck(oracle_sql))
    assert len(got) == len(want), f"row count: spark={len(got)} duck={len(want)}"
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"first mismatches: {mismatches[:5]}"


def test_kg_tpch_matches_oracle(spark):
    from morph_xr2rml_spark.examples import kg_tpch_oracle_sql, kg_tpch_triples
    _compare(spark, kg_tpch_triples(spark, SF_DIR), kg_tpch_oracle_sql())


def test_kg_lineitem_json_matches_oracle(spark):
    from morph_xr2rml_spark.examples import (kg_lineitem_json_oracle_sql,
                                             kg_lineitem_json_triples)
    _compare(spark, kg_lineitem_json_triples(spark, SF_DIR),
             kg_lineitem_json_oracle_sql())


def test_sparql_queries_match_oracle(spark):
    from morph_xr2rml_spark import examples
    for name in examples.SPARQL_QUERIES:
        df = examples.make_sparql_query(name)(spark, SF_DIR)
        _compare(spark, df, examples.sparql_oracle_sql(name))


def test_sparql_graph_quads_matches_oracle(spark):
    from morph_xr2rml_spark.examples import (SPARQL_GRAPH_QUADS_SQL,
                                             sparql_graph_quads)
    _compare(spark, sparql_graph_quads(spark, SF_DIR),
             SPARQL_GRAPH_QUADS_SQL)


def test_sparql_from_dataset_matches_oracle(spark):
    from morph_xr2rml_spark.examples import (SPARQL_FROM_DATASET_SQL,
                                             sparql_from_dataset)
    _compare(spark, sparql_from_dataset(spark, SF_DIR),
             SPARQL_FROM_DATASET_SQL)
