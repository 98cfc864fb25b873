#!/usr/bin/env python3
"""Measures the TRUE near-dup pair curve of a (scaled) documents
corpus — the r12 verdict-1 instrument. Two readings:

1. EXACT count of >=0.5 3-gram-Jaccard pairs, by distinct-gram
   self-join (a pair at tau >= 0.5 must share a gram; grams with
   df > cap are excluded and reported — a pair sharing ONLY
   ultra-common boilerplate grams is not cloning evidence, the
   dedup_containment doctrine). This is the denominator every
   pair-bound operator's growth must be graded against.
2. Sampled cross-copy Jaccard for scaled corpora (the r11 9000/9000
   methodology): for src doc d and copy k, Jaccard(d, d + k*maxdoc).
   Rotated mode reads ~1.0 (every copy pair is a true near-dup —
   pair count ~ n_src * C(factor, 2)); independent mode must read
   ~0 (pair count ~ factor * the 1x count).

Usage: pair_density.py <dir> [--cross src_dir factor] [--cap N]
"""
import sys
import duckdb

args = sys.argv[1:]
d = args[0]
cap = 1000
cross = None
if "--cap" in args:
    cap = int(args[args.index("--cap") + 1])
if "--cross" in args:
    i = args.index("--cross")
    cross = (args[i + 1], int(args[i + 2]))

con = duckdb.connect()
con.execute(f"SET threads TO 16")

GRAMS = """
  SELECT doc_id, unnest(list_distinct(gl)) AS g FROM (
    SELECT doc_id,
      [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       for i in range(1, greatest(len(w) - 1, 1))] AS gl
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM '{p}')
    WHERE len(w) >= 3)
"""

n_docs = con.execute(f"SELECT count(*) FROM '{d}/documents.parquet'").fetchone()[0]
print(f"corpus: {d}  docs={n_docs}  df_cap={cap}", flush=True)

con.execute(f"CREATE TABLE grams AS {GRAMS.format(p=d + '/documents.parquet')}")
con.execute("CREATE TABLE gcard AS SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id")
con.execute("CREATE TABLE df AS SELECT g, count(*) AS df FROM grams GROUP BY g")
capped = con.execute(f"SELECT count(*) FROM df WHERE df > {cap}").fetchone()[0]
print(f"grams excluded by df cap: {capped} "
      f"(of {con.execute('SELECT count(*) FROM df').fetchone()[0]} distinct)", flush=True)

pairs = con.execute(f"""
  WITH shared AS (
    SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS sh
    FROM grams a
    JOIN df USING (g)
    JOIN grams b USING (g)
    WHERE a.doc_id < b.doc_id AND df.df <= {cap}
    GROUP BY 1, 2)
  SELECT count(*) FROM shared
  JOIN gcard gi ON gi.doc_id = shared.i
  JOIN gcard gj ON gj.doc_id = shared.j
  WHERE sh >= 0.5 * (gi.n + gj.n - sh)""").fetchone()[0]
print(f"TRUE >=0.5-jaccard pairs: {pairs}", flush=True)

if cross:
    src, factor = cross
    maxdoc = con.execute(
        f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
    res = con.execute(f"""
      WITH g AS (SELECT doc_id, list(g) AS gs FROM grams GROUP BY doc_id),
      sample AS (
        SELECT s.doc_id AS src_id, k.k AS copy,
          s.doc_id + k.k * {maxdoc} AS copy_id
        FROM (SELECT doc_id FROM '{src}/documents.parquet'
              USING SAMPLE reservoir(1000 ROWS) REPEATABLE (42)) s,
             (SELECT unnest(range(1, {factor})) AS k) k),
      jac AS (
        SELECT src_id, copy,
          CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
            / NULLIF(len(list_distinct(a.gs || b.gs)), 0) AS j
        FROM sample
        JOIN g a ON a.doc_id = sample.src_id
        JOIN g b ON b.doc_id = sample.copy_id)
      SELECT count(*) AS n,
        sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS neardup,
        avg(j) AS mean_j, max(j) AS max_j
      FROM jac""").fetchone()
    n, nd, mj, mx = res
    print(f"cross-copy sample: {n} pairs, {nd} at >=0.5 jaccard "
          f"(mean {mj:.4f}, max {mx:.4f})", flush=True)
