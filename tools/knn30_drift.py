#!/usr/bin/env python3
"""Fill the 30x drift cell for text_jaccard_knn_capped (round-13 verdict
task 5): top-1 agreement + mean |top-1 score drift| of the capped knn twin
vs the exact key at the 30x point, with QUERY sampling instead of pair
sampling — the deterministic 10% doc subsample (doc_id % 10 = 0) is the
query set, the FULL corpus is the candidate set, so each sampled query's
top-1 is its TRUE top-1 (not a subsample artifact) and the symmetric
0.5 B-row pair frame never materializes (pair enumeration is restricted
to rows incident to a query: ~1/10 of the posting self-join).

DuckDB is legitimate as the 30x engine for the same reason as the
round-13 drift rows: both knn keys are oracle-green (Spark ≡ DuckDB on
the semantics), and the SQL below mirrors the committed oracles (same
residue rule, same cap rule, same inter >= 2 gate, same
(jac DESC, nbr ASC) tie-break).

Usage: knn30_drift.py [docsGlob]   (default: the 30x ScaleGen corpus at
       /tmp/graft_sf3_docs/documents.parquet/*.parquet; regen via
       sbt "Test/runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf3_docs 30 documents")
"""
import sys, time

import duckdb

P = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/graft_sf3_docs/documents.parquet/*.parquet"

con = duckdb.connect()
con.execute("PRAGMA temp_directory='/tmp/duck_tmp'")
con.execute("PRAGMA memory_limit='48GB'")
con.execute("PRAGMA threads=24")
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{P}')")

# the oracle's positional hex->BIGINT decode of md5 chars 1..8
RES = lambda h: "( " + " + ".join(
    f"(CAST(strpos('0123456789abcdef', substr({h}, {i+1}, 1)) AS BIGINT) - 1) * {16**(7-i)}"
    for i in range(8)) + " )"

t0 = time.time()
con.execute("""
CREATE TEMP TABLE s AS
WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS sh
FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i FROM t)""")
con.execute("CREATE TEMP TABLE n AS SELECT doc_id, count(*) AS n FROM s GROUP BY 1")
con.execute("CREATE TEMP TABLE d AS SELECT sh, count(*) AS df FROM s GROUP BY 1")
cap = con.execute("SELECT greatest(16, least(512, 2 * (CAST(sum(df) AS BIGINT)"
                  " // count(*)))) FROM d").fetchone()[0]
print(f"index built {time.time()-t0:.0f}s df_cap={cap}", flush=True)

t0 = time.time()
con.execute(f"""
CREATE TEMP TABLE sc AS
SELECT doc_id, sh FROM (
  SELECT s.doc_id, s.sh, d.df,
    md5('tswp42:' || s.sh || ':' || CAST(s.doc_id AS VARCHAR)) AS h
  FROM s JOIN d USING (sh))
WHERE df <= {cap} OR {RES('h')} % df < {cap}""")
print(f"capped index {time.time()-t0:.0f}s", flush=True)

# top-1 per sampled query over the FULL candidate set; mirrors the knn
# oracle's sym/r CTEs with the query restriction pushed into the mine
for name, src in [("exact", "s"), ("capped", "sc")]:
    t0 = time.time()
    con.execute(f"""
    CREATE TEMP TABLE top1_{name} AS
    WITH p AS (
      SELECT q.doc_id AS qid, c.doc_id AS nbr, count(*) AS inter
      FROM {src} q JOIN {src} c ON q.sh = c.sh AND q.doc_id <> c.doc_id
      WHERE q.doc_id % 10 = 0
      GROUP BY 1, 2),
    j AS (
      SELECT qid, nbr, inter / (x.n + y.n - inter) AS jac
      FROM p JOIN n x ON qid = x.doc_id JOIN n y ON nbr = y.doc_id
      WHERE inter >= 2)
    SELECT qid, nbr, jac FROM (
      SELECT qid, nbr, jac,
        row_number() OVER (PARTITION BY qid ORDER BY jac DESC, nbr) AS rk
      FROM j) WHERE rk = 1""")
    cnt = con.execute(f"SELECT count(*) FROM top1_{name}").fetchone()[0]
    print(f"{name} top1 queries {cnt} {time.time()-t0:.0f}s", flush=True)

agree, drift, common = con.execute("""
SELECT avg(CASE WHEN e.nbr = c.nbr THEN 1.0 ELSE 0.0 END),
       avg(abs(e.jac - c.jac)), count(*)
FROM top1_exact e JOIN top1_capped c USING (qid)""").fetchone()
only_e = con.execute("""SELECT count(*) FROM top1_exact e
  WHERE NOT EXISTS (SELECT 1 FROM top1_capped c WHERE c.qid = e.qid)""").fetchone()[0]
print(f"knn30: common={common} exact_only={only_e} "
      f"top1_agree={agree:.4f} mean_drift={drift:.6f}", flush=True)
