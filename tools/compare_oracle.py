#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT part of the library).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in outDir, executes the corresponding oracle SQL
from oracle_sql.json in DuckDB over the same sfDir tables, and compares
row count, schema (column names), and a hash of the sorted row values.

Usage: python3 tools/compare_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "nan"
        # full round-trip precision; FP stability comes from the
        # engine-side round(...) at the output boundary
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


# Oracle output columns must have hash-stable renderings across every
# DuckDB fetch path. An uncast sum() yields HUGEINT, which some drivers
# render float-ish ("123.0") while Spark longs render bare ("123") — the
# exact class of red row that shipped in r7. Keep this list to types whose
# textual form is identical everywhere. FLOAT and TIMESTAMP are included
# on empirical evidence: both widen/render identically on the pyarrow and
# DuckDB sides and their queries (randproj_vectors, e1_window_agg) were
# hash-green through the driver's own gate in r7.
HASH_STABLE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                     "VARCHAR", "DOUBLE", "FLOAT", "BOOLEAN", "TIMESTAMP"}


def check_oracle_types(con, name, sql):
    """Return list of (col, type) pairs whose type is NOT hash-stable."""
    rel = con.sql(sql)
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        # Lists are rejected outright (not just unstable elements): the
        # driver's compare sorts with pandas, which cannot order array
        # cells (the r8 mm_image_decode red row). Explode instead.
        if t not in HASH_STABLE_TYPES:
            bad.append((col, t))
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    # Upfront type-discipline pass over EVERY oracle (even one whose dump
    # failed or is missing): an uncast sum() must fail the run, loudly.
    type_bad = set()
    for qname, sql in sorted(oracles.items()):
        try:
            bad_types = check_oracle_types(con, qname, sql)
        except Exception:
            continue  # execution errors surface in the compare loop
        if bad_types:
            type_bad.add(qname)
            results[qname] = {
                "status": "oracle_type_unstable",
                "bad_columns": [f"{c}: {t}" for c, t in bad_types],
                "ok": False}
    # A query that FAILED in graft.Verify has no parquet dir — iterating
    # over dirs alone would silently skip it and report "N/N OK". Seed
    # every verify_status entry as failed first; successful compares
    # overwrite theirs.
    status_path = os.path.join(out_dir, "verify_status.json")
    if os.path.exists(status_path):
        with open(status_path) as f:
            for qname, ok in json.load(f).items():
                if not ok:
                    results[qname] = {"status": "verify_failed", "ok": False}

    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        # A verify-failed query stays failed: a stale parquet dir left in a
        # reused out_dir must not flip the entry back to OK.
        if results.get(name, {}).get("status") == "verify_failed":
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        tbl = pq.read_table(files[0]) if len(files) == 1 else \
            pq.read_table(qdir)
        spark_cols = list(tbl.schema.names)
        spark_rows = [tuple(r[c] for c in spark_cols)
                      for r in tbl.to_pylist()]
        if name not in oracles:
            results[name] = {"status": "rows_only",
                             "rows": len(spark_rows),
                             "ok": len(spark_rows) > 0}
            continue
        if name in type_bad:
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            results[name] = {"status": "oracle_error", "error": str(e)[:300],
                             "ok": False}
            continue
        sc, dc = sorted(spark_cols), sorted(duck_cols)
        schema_ok = sc == dc
        rows_ok = len(spark_rows) == len(duck_rows)
        hash_ok = False
        if schema_ok and rows_ok:
            hs = table_hash(spark_cols, spark_rows)
            hd = table_hash(duck_cols, duck_rows)
            hash_ok = hs == hd
        results[name] = {"status": "compared", "schema_ok": schema_ok,
                         "rows_spark": len(spark_rows),
                         "rows_duck": len(duck_rows),
                         "hash_ok": hash_ok,
                         "ok": schema_ok and rows_ok and hash_ok}
        if not results[name]["ok"] and schema_ok and rows_ok:
            # print first few differing rows for debugging
            ss = set("|".join(norm_val(v) for v in r) for r in
                     [tuple(r[i] for i in sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])) for r in spark_rows])
            ds = set("|".join(norm_val(v) for v in r) for r in
                     [tuple(r[i] for i in sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])) for r in duck_rows])
            only_s = list(ss - ds)[:3]
            only_d = list(ds - ss)[:3]
            results[name]["only_spark"] = only_s
            results[name]["only_duck"] = only_d
        elif not schema_ok:
            results[name]["spark_cols"] = sc
            results[name]["duck_cols"] = dc

    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{n_ok}/{len(results)} OK")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
