#!/usr/bin/env python3
"""Regenerate CORRECTNESS_SF1.json — the standing 10x oracle pin (round-13
verdict task 4: every plan-changed key gets a 10x hash pin, not only sf0.1).

Usage:
  correctness_sf1.py <outJson> <verifyOut1>:<sfDir1> [<verifyOut2>:<sfDir2> ...]

Each <verifyOutN> is a `graft.Verify` dump (parquet per key + oracle_sql.json)
taken against <sfDirN>; all keys found across the dumps are compared against
DuckDB exactly like tools/preflight.py (columns sorted by name, rows sorted,
repr-compared, then verdict booleans per key) and merged into one JSON.

Protocol (two corpora, both from ScaleGen over /root/testdata/sf0.1):
  /tmp/graft_sf1c : 10x CONTINUOUS-VALUE events (+ sf0.1 relational tables) —
      the value-domain stress for the two-level window machines and the
      bootstrap densify;  ScaleGen ... 10 continuous-events
  /tmp/graft_sf1  : plain 10x corpus — the df-cap stress for the capped
      miner family and layout keys;  ScaleGen ... 10
"""
import sys, json, glob, os, hashlib

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(repr(v) for v in row)
                  for row in df.itertuples(index=False, name=None))


def run(out_json, dumps):
    result = {"_meta": {
        "purpose": ("standing 10x oracle pin: plan-changed and new keys are "
                    "hash-verified at the 10x point each round, not only sf0.1"),
        "regen": "tools/correctness_sf1.py " + " ".join(
            [out_json] + [f"{o}:{s}" for o, s in dumps]),
        "corpora": {o: s for o, s in dumps},
    }}
    for out, sf in dumps:
        con = duckdb.connect()
        con.execute("PRAGMA temp_directory='/tmp/duck_tmp'")
        con.execute("PRAGMA memory_limit='48GB'")
        for t in TABLES:
            p = f"{sf}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            if not glob.glob(p):
                print(f"skip view {t} (no {p})")
                continue
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        oracle = json.load(open(f"{out}/oracle_sql.json"))
        keys = sorted(d for d in os.listdir(out)
                      if os.path.isdir(f"{out}/{d}"))
        for name in keys:
            row = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None, "err": None}
            try:
                sdf = con.execute(
                    f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
                ddf = con.execute(oracle[name]).fetchdf()
                row["spark_rows"], row["oracle_rows"] = len(sdf), len(ddf)
                row["rows_match"] = len(sdf) == len(ddf)
                row["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
                if row["rows_match"] and row["schema_match"]:
                    hs = hashlib.sha256(repr(normalize(sdf)).encode()).hexdigest()
                    hd = hashlib.sha256(repr(normalize(ddf)).encode()).hexdigest()
                    row["hash_match"] = hs == hd
            except Exception as e:
                row["err"] = str(e)[:300]
            # round-13 ADVICE: a key present in two dumps must not let the
            # second dump's verdict silently mask the first's — error out
            # (dump key sets are disjoint by protocol) and record which
            # corpus each verdict came from.
            if name in result:
                raise SystemExit(
                    f"duplicate key {name!r}: already verified against "
                    f"{result[name]['corpus']}, seen again in {out} ({sf})")
            row["corpus"] = sf
            result[name] = row
            print(("PASS" if row["hash_match"] else "FAIL"), name,
                  row["spark_rows"], flush=True)
        con.close()
    n_fail = sum(1 for k, v in result.items()
                 if k != "_meta" and not v["hash_match"])
    json.dump(result, open(out_json, "w"), indent=1)
    print(f"wrote {out_json}: {len(result) - 1} keys, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    out_json = sys.argv[1]
    dumps = [a.rsplit(":", 1) for a in sys.argv[2:]]
    sys.exit(run(out_json, [(o, s) for o, s in dumps]))
