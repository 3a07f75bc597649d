#!/usr/bin/env python3
"""Self-test for compare_oracle.check_oracle_types (NOT part of the library).

Asserts the type-discipline guard trips on a deliberately uncast DuckDB
sum() (HUGEINT — the exact r7 red-row class) and stays quiet on the cast
form. Run: python3 tools/test_type_guard.py
"""
import duckdb
from compare_oracle import check_oracle_types

con = duckdb.connect()
con.execute("CREATE TABLE t AS SELECT range AS x FROM range(10)")

bad = check_oracle_types(con, "uncast", "SELECT sum(x) AS s FROM t")
assert bad and bad[0][1] == "HUGEINT", f"guard missed uncast sum(): {bad}"

bad = check_oracle_types(
    con, "cast", "SELECT CAST(sum(x) AS BIGINT) AS s FROM t")
assert not bad, f"guard false-positive on cast sum(): {bad}"

bad = check_oracle_types(
    con, "decimal", "SELECT avg(x) AS a, CAST(x AS DECIMAL(10,2)) AS d FROM t GROUP BY x")
assert [c for c, _ in bad] == ["d"], f"DOUBLE avg ok, DECIMAL must trip: {bad}"

print("type-guard self-test OK")
