"""Independent-oracle fuzzing: seeded random SPARQL queries paired with
GENERATED DuckDB SQL over the `kg_tpch_triples_cte()` triple replication.

The other fuzz batteries (test_pushdown_fuzz.py) check the REWRITER
against our own evaluator — a shared-evaluator bug passes both sides.
Here the oracle is a different engine entirely (DuckDB executing
mechanically generated SQL joins over the CTE triple set), so evaluator
join/filter/aggregate semantics are exercised independently, on shapes
nobody hand-picked.  Both the evaluator path (SparqlEngine over the
materialized pool) and the pushdown path (answer_tabular) must match.

Restricted to shapes with an exact 1:1 SQL rendering: required BGP
chains, constant subjects/objects, numeric-comparison and STRSTARTS and
IN filters, OPTIONAL (fresh-object left extensions -> LEFT JOIN),
FILTER (NOT) EXISTS (-> correlated [NOT] EXISTS), DISTINCT, GROUP BY +
COUNT/COUNT DISTINCT/MIN/MAX/SUM, total-order ORDER BY + LIMIT.  Numeric cells compare at 1e-6 relative
(SUM reassociation)."""

import random

import duckdb
import pytest

from morph_xr2rml_spark.examples import (TPCH_KG_MAPPING,
                                         kg_tpch_triples_cte, tpch_tables)
from morph_xr2rml_spark.model import MappingDocument
from morph_xr2rml_spark.native import NativeCompiler
from morph_xr2rml_spark.rewrite import answer_tabular
from morph_xr2rml_spark.sparql import SparqlEngine

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "orders")
EX = "http://example.com/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
            "HOUSEHOLD", "NOSUCH"]
STATUSES = ["O", "F", "P"]

# (predicate, subject entity, object kind) — the TPCH KG vocabulary
# object kinds: iri / plain / decimal
VOCAB = {
    "customer": [("segment", "plain"), ("name", "plain"),
                 ("acctbal", "decimal"), ("inNation", "iri")],
    "order": [("status", "plain"), ("totalPrice", "decimal"),
              ("placedBy", "iri")],
    "nation": [("name", "plain"), ("inRegion", "iri")],
    "region": [("name", "plain")],
}
CLASSES = {"customer": "Customer", "order": "Order",
           "nation": "Nation", "region": "Region"}
# iri-valued predicate → target entity
TARGET = {"inNation": "nation", "placedBy": "customer",
          "inRegion": "region"}


class Gen:
    """One seeded random query: internal pattern list + filters +
    modifiers, rendered to BOTH SPARQL and DuckDB SQL."""

    def __init__(self, seed: int):
        self.r = random.Random(seed)
        self.pats = []          # (s_term, pred_iri, o_term)
        self.filters = []       # ("numcmp"|"strstarts"|"in", var, ...)
        self.var_kind = {}      # var -> plain|decimal|iri (object vars)
        self.numeric_vars = []
        self.plain_vars = []

    def v(self, base):
        name = base
        k = 2
        while name in self.var_kind:
            name = f"{base}{k}"
            k += 1
        return name

    def entity_patterns(self, ent: str, svar: str, depth: int = 0):
        r = self.r
        self.var_kind.setdefault(svar, "iri")
        picks = r.sample(VOCAB[ent], k=r.randint(1, len(VOCAB[ent])))
        if r.random() < 0.4:
            self.pats.append((("var", svar), RDF_TYPE,
                              ("iri", EX + CLASSES[ent])))
        for pred, kind in picks:
            p_iri = EX + pred
            if kind == "iri":
                tgt = TARGET[pred]
                if r.random() < 0.5 and depth < 2:
                    ovar = self.v(tgt[0])
                    self.var_kind[ovar] = "iri"
                    self.pats.append((("var", svar), p_iri, ("var", ovar)))
                    self.entity_patterns(tgt, ovar, depth + 1)
                else:
                    key = r.choice([0, 1, 3, 7, 999999])
                    self.pats.append((("var", svar), p_iri,
                                      ("iri", f"http://example.org/{tgt}/{key}")))
            elif kind == "plain":
                if pred == "segment" and r.random() < 0.5:
                    self.pats.append((("var", svar), p_iri,
                                      ("lit", f'"{r.choice(SEGMENTS)}"')))
                elif pred == "status" and r.random() < 0.5:
                    self.pats.append((("var", svar), p_iri,
                                      ("lit", f'"{r.choice(STATUSES)}"')))
                else:
                    ovar = self.v(pred[0] + "v")
                    self.var_kind[ovar] = "plain"
                    self.plain_vars.append((ovar, pred))
                    self.pats.append((("var", svar), p_iri, ("var", ovar)))
            else:
                ovar = self.v(pred[0] + "n")
                self.var_kind[ovar] = "decimal"
                self.numeric_vars.append(ovar)
                self.pats.append((("var", svar), p_iri, ("var", ovar)))

    def gen_filters(self):
        r = self.r
        for var in self.numeric_vars:
            if r.random() < 0.6:
                op = r.choice(["<", ">", "<=", ">="])
                val = r.choice(["0", "1000.0", "5000", "150000.0"])
                self.filters.append(("numcmp", var, op, val))
        for var, pred in self.plain_vars:
            if pred == "name" and r.random() < 0.4:
                pfx = r.choice(["Customer#0000000", "NATION_1", "ZZZ"])
                self.filters.append(("strstarts", var, pfx))
            elif pred == "segment" and r.random() < 0.4:
                a, b = r.sample(SEGMENTS, 2)
                self.filters.append(("in", var, [a, b]))

    def build(self):
        r = self.r
        root = r.choice(["customer", "order", "nation"])
        root_var = self.v(root[0])
        self.entity_patterns(root, root_var)
        self.gen_filters()

        # OPTIONAL: fresh-object left extensions on the root subject
        self.optionals = []      # (svar, pred_iri, ovar)
        if r.random() < 0.4:
            pred, kind = r.choice(
                [(p, k) for p, k in VOCAB[root] if k != "iri"])
            ovar = self.v("opt")
            self.var_kind[ovar] = kind
            self.optionals.append((root_var, EX + pred, ovar))
        # FILTER (NOT) EXISTS probes on the root subject
        self.exists = []         # (positive, svar, pred_iri, obj_term)
        if r.random() < 0.35:
            positive = r.random() < 0.5
            if root == "customer":
                obj = ("lit", f'"{r.choice(SEGMENTS)}"') \
                    if r.random() < 0.6 else None
                self.exists.append((positive, root_var,
                                    EX + "segment", obj))
            elif root == "order":
                obj = ("lit", f'"{r.choice(STATUSES)}"') \
                    if r.random() < 0.6 else None
                self.exists.append((positive, root_var,
                                    EX + "status", obj))
            else:
                self.exists.append((positive, root_var,
                                    EX + "inRegion", None))

        all_vars = [v for v in self.var_kind]
        agg = None
        group_var = None
        if r.random() < 0.4:
            candidates = [v for v, k in self.var_kind.items()
                          if k == "plain"]
            if candidates:
                group_var = r.choice(candidates)
                kind = r.choice(["count", "countv", "countd",
                                 "minn", "sumn"])
                if kind in ("minn", "sumn") and not self.numeric_vars:
                    kind = "count"
                if kind == "count":
                    agg = ("COUNT", None, False)
                elif kind == "countv":
                    agg = ("COUNT", r.choice(all_vars), False)
                elif kind == "countd":
                    agg = ("COUNT", r.choice(all_vars), True)
                elif kind == "minn":
                    agg = (r.choice(["MIN", "MAX"]),
                           r.choice(self.numeric_vars), False)
                else:
                    agg = ("SUM", r.choice(self.numeric_vars), False)
        if agg:
            proj = [group_var]
        else:
            proj = r.sample(all_vars, min(len(all_vars), r.randint(1, 3)))
        distinct = (not agg) and r.random() < 0.4
        limit = r.randint(3, 12) if (not agg and r.random() < 0.3) else None
        return self._render(proj, distinct, agg, group_var, limit)

    # -- rendering --------------------------------------------------------
    def _render(self, proj, distinct, agg, group_var, limit):
        # SPARQL text
        def sterm(t):
            k, v = t
            if k == "var":
                return f"?{v}"
            if k == "iri":
                return f"<{v}>"
            return v  # lit carries quotes

        lines = [f"{sterm(s)} <{p}> {sterm(o)} ." for s, p, o in self.pats]
        for sv, p_iri, ov in self.optionals:
            lines.append(f"OPTIONAL {{ ?{sv} <{p_iri}> ?{ov} }}")
        for positive, sv, p_iri, obj in self.exists:
            kw = "EXISTS" if positive else "NOT EXISTS"
            ob = sterm(obj) if obj is not None else "?exo"
            lines.append(f"FILTER {kw} {{ ?{sv} <{p_iri}> {ob} }}")
        for f in self.filters:
            if f[0] == "numcmp":
                lines.append(f"FILTER(?{f[1]} {f[2]} {f[3]})")
            elif f[0] == "strstarts":
                lines.append(f'FILTER(STRSTARTS(?{f[1]}, "{f[2]}"))')
            else:
                ins = ", ".join(f'"{x}"' for x in f[2])
                lines.append(f"FILTER(?{f[1]} IN ({ins}))")
        sel = " ".join(f"?{v}" for v in proj)
        if agg:
            func, var, dist = agg
            inner = "*" if var is None else \
                ("DISTINCT ?" + var if dist else "?" + var)
            sel += f" ({func}({inner}) AS ?agg)"
        head = "SELECT " + ("DISTINCT " if distinct else "") + sel
        body = "\n  ".join(lines)
        sparql = f"{head} WHERE {{\n  {body}\n}}"
        order_cols = list(proj) + (["agg"] if agg else [])
        if agg:
            sparql += f" GROUP BY ?{group_var}"
        sparql += " ORDER BY " + " ".join(f"?{c}" for c in order_cols)
        if limit:
            sparql += f" LIMIT {limit}"

        # DuckDB SQL over the CTE
        var_col: dict = {}
        joins, wheres = [], []
        for i, (s, p, o) in enumerate(self.pats):
            t = f"t{i}"
            conds = [f"{t}.pred = '<{p}>'"]
            for term, col in ((s, f"{t}.subj"), (o, f"{t}.obj")):
                k, v = term
                if k == "var":
                    if v in var_col:
                        conds.append(f"{col} = {var_col[v]}")
                    else:
                        var_col[v] = col
                elif k == "iri":
                    conds.append(f"{col} = '<{v}>'")
                else:
                    lit = v.replace("'", "''")
                    conds.append(f"{col} = '{lit}'")
            if i == 0:
                joins.append("triples t0")
                wheres.extend(conds)
            else:
                joins.append(f"JOIN triples {t} ON "
                             + " AND ".join(conds))

        def lex(col):
            return f"regexp_extract({col}, '^\"([^\"]*)', 1)"

        def num(col):
            return f"CAST({lex(col)} AS DOUBLE)"

        for k, (sv, p_iri, ov) in enumerate(self.optionals):
            t = f"o{k}"
            joins.append(f"LEFT JOIN triples {t} ON {t}.pred = '<{p_iri}>' "
                         f"AND {t}.subj = {var_col[sv]}")
            var_col[ov] = f"{t}.obj"
        for k, (positive, sv, p_iri, obj) in enumerate(self.exists):
            sub = (f"SELECT 1 FROM triples e{k} WHERE "
                   f"e{k}.pred = '<{p_iri}>' AND e{k}.subj = {var_col[sv]}")
            if obj is not None:
                lit = obj[1].replace("'", "''")
                sub += f" AND e{k}.obj = '{lit}'"
            wheres.append(("EXISTS (" if positive else "NOT EXISTS (")
                          + sub + ")")
        for f in self.filters:
            col = var_col[f[1]]
            if f[0] == "numcmp":
                wheres.append(f"{num(col)} {f[2]} {f[3]}")
            elif f[0] == "strstarts":
                wheres.append(f"{lex(col)} LIKE '{f[2]}%'")
            else:
                ins = ", ".join(f"'\"{x}\"'" for x in f[2])
                wheres.append(f"{col} IN ({ins})")

        sel_cols = [f"{var_col[v]} AS {v}" for v in proj]
        if agg:
            func, var, dist = agg
            if var is None:
                sel_cols.append("COUNT(*) AS agg")
            elif func == "COUNT":
                d = "DISTINCT " if dist else ""
                sel_cols.append(f"COUNT({d}{var_col[var]}) AS agg")
            else:
                sel_cols.append(f"{func}({num(var_col[var])}) AS agg")
        # ORDER BY mirrors the engine's SPARQL §15.4 term keys
        # (term_order_keys: rank, numeric value NULLS FIRST, lexical) so
        # LIMIT cuts at the same boundary in both engines
        num_re = (r"\^\^<http://www\.w3\.org/2001/XMLSchema#(integer|"
                  r"decimal|double|float|long|int|short|byte)>$")

        def order_keys(c):
            rank = (f"(CASE WHEN {c} IS NULL THEN 0 "
                    f"WHEN {c} LIKE '_:%' THEN 1 "
                    f"WHEN {c} LIKE '<%' THEN 2 ELSE 3 END)")
            nval = (f"(CASE WHEN regexp_matches({c}, '{num_re}') THEN "
                    f"CAST({lex(c)} AS DOUBLE) END) NULLS FIRST")
            lexv = (f"(CASE WHEN {c} LIKE '<%' THEN "
                    f"regexp_replace({c}, '^<|>$', '', 'g') "
                    f"WHEN {c} LIKE '\"%' THEN {lex(c)} ELSE {c} END)")
            return [rank, nval, lexv]

        sql_keys = []
        for c in order_cols:
            if c == "agg":
                sql_keys.append("agg")
            else:
                sql_keys.extend(order_keys(var_col[c]))
        sql = "SELECT " + ("DISTINCT " if distinct else "") \
            + ", ".join(sel_cols) + "\nFROM " + "\n".join(joins)
        if wheres:
            sql += "\nWHERE " + " AND ".join(wheres)
        if agg:
            sql += f"\nGROUP BY {var_col[group_var]}"
        if distinct:
            # DISTINCT forbids ordering by non-projected expressions:
            # wrap and order the projection by the same term keys
            inner = sql
            sql_keys = []
            for c in order_cols:
                sql_keys.extend([c] if c == "agg" else order_keys(c))
            sql = f"SELECT * FROM (\n{inner}\n) d"
        sql += "\nORDER BY " + ", ".join(sql_keys)
        if limit:
            sql += f" LIMIT {limit}"
        return sparql, sql, bool(limit)


def _norm(rows):
    out = []
    for r in rows:
        cells = []
        for x in r:
            if x is None:
                cells.append(None)
            elif isinstance(x, (int, float)):
                cells.append(round(float(x), 6))
            else:
                cells.append(str(x))
        out.append(tuple(cells))
    return out


@pytest.fixture(scope="module")
def env(spark):
    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    tables = tpch_tables(spark, SF_DIR)
    pool = NativeCompiler(spark, mapping, tables,
                          fuse_projections=False).triples(dedup=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return mapping, tables, SparqlEngine(pool), con


SEEDS = list(range(9001, 9051))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vs_duckdb_oracle(spark, env, seed):
    mapping, tables, engine, con = env
    sparql, sql, has_limit = Gen(seed).build()
    q = "PREFIX ex: <http://example.com/>\n" + sparql
    want = _norm(con.execute(kg_tpch_triples_cte() + "\n" + sql)
                 .fetchall())
    # evaluator path (materialized pool) — LIMIT queries compare as a
    # subset-of-tied-order only if the order is total; projections here
    # always order by every output column, so both engines agree
    got_eval = _norm(r for r in engine.sql(q).collect())
    assert got_eval == want, \
        f"evaluator divergence (seed {seed})\nSPARQL:\n{q}\nSQL:\n{sql}"
    # pushdown path
    got_push = _norm(r for r in
                     answer_tabular(spark, mapping, tables, q).collect())
    assert got_push == want, \
        f"pushdown divergence (seed {seed})\nSPARQL:\n{q}\nSQL:\n{sql}"
