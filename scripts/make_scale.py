#!/usr/bin/env python3
"""Dev-only generator for the sf0.5-equivalent scaling spot-check
(SURVEY §4 / BENCH_NOTES scaling table): replicates the driver-shipped
sf0.1 tables FACTOR times with key shifts, so the headline iterative
operators can be timed at ~5x rows without touching /root/testdata.

Documents get a per-copy word ROTATION (not verbatim duplication), so
EXACT dedup stays non-trivial — but measure before assuming more: on
the ~54-word synthetic docs a rotation changes only the ~2(k-1)
boundary shingles, so cross-copy pairs are still NEAR-dups (r11
ground truth: 9000/9000 sampled same-source copy pairs at 10x have
3-gram Jaccard >= 0.5, mean 0.91 — true pairs ~ n_src * C(factor,2),
i.e. ~1600x the 1x pair count at factor 10; r8 measured the 5x slice
of the same curve as 116x). Scaled-corpus wall-clock growth for
pair-bound operators must be adjudicated against THAT pair curve,
not against the data factor. Embeddings densify the same way (copies
are 1e-3-nudged, cosine ~1).

Mode `independent` (r12, the verdict-1 de-densification): each copy is
an INDEPENDENT corpus with the 1x corpus's natural near-dup density,
so pair-bound operators should read near-LINEAR directly — no
pair-curve adjudication needed. Documents: copy i maps every token
through a copy-specific VOCABULARY PERMUTATION (rank under one keyed
hash ordering -> rank under another). Within a copy every Jaccard
relation of the 1x corpus is preserved EXACTLY (a bijection on tokens
is a bijection on shingles), so the natural near-dups replicate at
natural density; across copies two shingles collide only if n
consecutive tokens all map to the same images — vanishing. Embeddings:
copy i applies a copy-specific SIGNED DIMENSION PERMUTATION (an
orthogonal transform: within-copy dot products and norms are exact,
cross-copy cosines decorrelate to the isotropic background). True
pair count therefore grows ~factor x (vs ~n_src * C(factor,2) in
rotated mode); verify with scripts/pair_density.py.

Mode `heaps` (r13, the verdict-3 vocabulary-growth lever): documents
follow `independent`'s per-copy bijection (within-copy Jaccard
structure exact, cross-copy pairs vanishing — the pair curve stays
linear), but copy i's TARGET vocabulary is drawn from a GROWING pool
so the corpus-wide type count follows Heaps' law T(n) ~ T1 * sqrt(n/n1)
(beta = 0.5): copy i introduces ceil(T1*(sqrt(i+1)-sqrt(i))) fresh
tokens (source words + a copy suffix, so length stats stay close) and
reuses a seeded sample of the existing pool for the rest. The
`independent` mode keeps ONE 31-token vocab at every factor, so
per-gram df grows ~factor and gram-join candidates follow sum(df^2) —
the r12 dedup_ngram_jaccard 17x reading is that corpus pathology, not
the operator; `heaps` is the realistic-vocabulary instrument that
separates the two. Non-document tables transform as in `independent`.

Usage: make_scale.py [factor] [outdir] [rotated|independent|heaps] [tables]
       (defaults: 5 /tmp/sf0.5 rotated all-tables; `tables` is a
       comma list, e.g. `embeddings` for a vectors-only corpus — the
       r14 300x SemDeDup probe needs 600k vectors but not 180M
       lineitem rows)
"""
import sys, os, random, math
import duckdb

factor = int(sys.argv[1]) if len(sys.argv) > 1 else 5
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.5"
mode = sys.argv[3] if len(sys.argv) > 3 else "rotated"
assert mode in ("rotated", "independent", "heaps"), mode
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
def want(t):
    return only is None or t in only
src = "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

def copies(sql_per_copy):
    return "\nUNION ALL\n".join(sql_per_copy(i) for i in range(factor))

# documents: shift doc_id; per-copy text transform depends on mode
maxdoc = con.execute(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
# n_chars is recomputed (= length(text), the testdata invariant) since
# both transforms re-join words on single spaces; dropping it broke
# every op that reads the stored length column (the 10x sweep's 3
# failures)
if mode == "rotated" and want("documents"):
    # rotate words by i (breaks shingles across copies, but boundary
    # shingles only: cross-copy pairs stay TRUE near-dups — see header)
    con.execute(f"""COPY (
      SELECT doc_id, text, lang, source, length(text) AS n_chars FROM (
      {copies(lambda i: f'''
        SELECT doc_id + {i * maxdoc} AS doc_id,
          CASE WHEN {i} = 0 THEN text ELSE
            array_to_string(list_concat(w[{i}+1:], w[1:{i}]), ' ') END AS text,
          lang, source
        FROM (SELECT *, string_split(text, ' ') AS w FROM '{src}/documents.parquet')''')})
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
elif want("documents"):
    # independent: per-copy vocabulary permutation (copy 0 = identity).
    # vocab ordered by hash(word||'a{i}') pairs positionally with vocab
    # ordered by hash(word||'b{i}') — a bijection on the token set.
    # heaps: same bijection trick, but the TARGET side is a per-copy
    # vocab drawn from a pool growing as T1*sqrt(copies) (see header).
    con.execute(f"CREATE TABLE vocab AS SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM '{src}/documents.parquet'")
    nvocab = con.execute("SELECT count(*) FROM vocab").fetchone()[0]
    print(f"vocab: {nvocab} distinct tokens", flush=True)
    src_vocab = [r[0] for r in con.execute("SELECT word FROM vocab ORDER BY word").fetchall()]
    pool = list(src_vocab)  # heaps: cumulative type pool (copy 0 = identity)
    heaps_rng = random.Random(20260816)
    parts = []
    for i in range(factor):
        if i == 0:
            parts.append(f"""
              SELECT doc_id, text, lang, source
              FROM '{src}/documents.parquet'""")
            continue
        if mode == "heaps":
            target_types = round(nvocab * math.sqrt(i + 1))
            fresh = [f"{src_vocab[j % nvocab]}q{i}x{j}"
                     for j in range(max(0, target_types - len(pool)))]
            reuse = heaps_rng.sample(pool, nvocab - len(fresh))
            copy_vocab = fresh + reuse
            pool.extend(fresh)
            heaps_rng.shuffle(copy_vocab)
            # escape quotes: a source token carrying a single quote
            # would otherwise break the inline VALUES list (r13 advice)
            vals = ", ".join(f"({r + 1}, '{w.replace(chr(39), chr(39) * 2)}')"
                             for r, w in enumerate(copy_vocab))
            con.execute(f"""CREATE OR REPLACE TABLE map_{i} AS
              SELECT a.word, b.mapped FROM
                (SELECT word, row_number() OVER (ORDER BY md5(word || 'a{i}')) AS r FROM vocab) a
                JOIN (VALUES {vals}) b(r, mapped) USING (r)""")
        else:
            con.execute(f"""CREATE OR REPLACE TABLE map_{i} AS
              SELECT a.word, b.word AS mapped FROM
                (SELECT word, row_number() OVER (ORDER BY md5(word || 'a{i}')) AS r FROM vocab) a
                JOIN
                (SELECT word, row_number() OVER (ORDER BY md5(word || 'b{i}')) AS r FROM vocab) b
                USING (r)""")
        parts.append(f"""
          SELECT doc_id + {i * maxdoc} AS doc_id,
            array_to_string(list(mapped ORDER BY pos), ' ') AS text,
            any_value(lang) AS lang, any_value(source) AS source
          FROM (
            SELECT doc_id, lang, source,
              generate_subscripts(w, 1) AS pos, unnest(w) AS word
            FROM (SELECT *, string_split(text, ' ') AS w
                  FROM '{src}/documents.parquet')) t
          JOIN map_{i} USING (word)
          GROUP BY doc_id""")
    union = "\nUNION ALL\n".join(parts)
    con.execute(f"""COPY (
      SELECT doc_id, text, lang, source, length(text) AS n_chars
      FROM ({union})
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")

# embeddings: shift vec_id; per-copy vector transform depends on mode
maxvec = con.execute(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
if mode == "rotated" and want("embeddings"):
    # nudge each copy by a tiny per-copy constant so vectors are
    # distinct but the cluster geometry survives (copies stay cos~1)
    con.execute(f"""COPY (
      {copies(lambda i: f'''
        SELECT vec_id + {i * maxvec} AS vec_id,
          list_transform(embedding, x -> CAST(x + {i} * 1e-3 AS FLOAT)) AS embedding,
          label
        FROM '{src}/embeddings.parquet' ''')}
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
elif want("embeddings"):
    # independent: signed dimension permutation per copy (orthogonal —
    # within-copy geometry exact, cross-copy cosines decorrelated)
    def emb_expr(i):
        if i == 0:
            return "embedding"
        rng = random.Random(1000 + i)
        perm = list(range(64))
        rng.shuffle(perm)
        signs = [rng.choice([-1, 1]) for _ in range(64)]
        terms = ", ".join(
            f"CAST(embedding[{perm[j] + 1}] * {signs[j]} AS FLOAT)"
            for j in range(64))
        return f"list_value({terms})"
    con.execute(f"""COPY (
      {copies(lambda i: f'''
        SELECT vec_id + {i * maxvec} AS vec_id,
          {emb_expr(i)} AS embedding,
          label
        FROM '{src}/embeddings.parquet' ''')}
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

# orders/lineitem: shift order keys per copy; customer/supplier/part key
# spaces stay SHARED so the bipartite graphs densify the way a bigger
# warehouse's do (same dims, more facts)
maxord = con.execute(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
if want("orders"):
    con.execute(f"""COPY (
      {copies(lambda i: f"SELECT o_orderkey + {i * maxord} AS o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM '{src}/orders.parquet'")}
    ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
if want("lineitem"):
    con.execute(f"""COPY (
      {copies(lambda i: f"SELECT l_orderkey + {i * maxord} AS l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'")}
    ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

# events: shift event_id AND user_id per copy — more USERS with the
# same per-user session structure (a bigger site), never the same user
# replayed 10x at identical timestamps (which would plant pathological
# same-(user, ts) collisions in every sessionize/funnel/window op).
# Timestamps stay in the original range so dt-layout and windowed ops
# see denser days, not a longer calendar. (r11 — before this, events
# copied through unchanged and the event families never scaled.)
maxev = con.execute(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
maxusr = con.execute(f"SELECT max(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
if want("events"):
    con.execute(f"""COPY (
      {copies(lambda i: f'''
        SELECT event_id + {i * maxev} AS event_id, ts,
          user_id + {i * maxusr} AS user_id, event_type, value, props
        FROM '{src}/events.parquet' ''')}
    ) TO '{out}/events.parquet' (FORMAT PARQUET)""")

# small tables copy through unchanged (dims are dims at any scale)
for t in ["region", "nation", "customer", "supplier", "part"]:
    if want(t):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

for t in ["documents", "embeddings", "orders", "lineitem", "events"]:
    if want(t):
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)
