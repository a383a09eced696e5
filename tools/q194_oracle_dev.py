#!/usr/bin/env python3
"""Dev harness for the grid-blocked q194 DBSCAN oracle.

Compares the new blocked oracle against the known-good quadratic one at
sf0.01 (where the quadratic form finishes), then times the blocked form
at sf0.1 (where the quadratic form DNFs).
"""
import sys, time, duckdb

R = 40000
R2 = R * R
MINPTS = 6

POINTS = """
  SELECT c_custkey AS k,
    (c_custkey % 80) * 10000 + (c_custkey * 7 % 10000) AS lat,
    (c_custkey * 3 % 170) * 10000 + (c_custkey * 13 % 10000) AS lon
  FROM customer
"""

OLD = f"""WITH RECURSIVE p AS ({POINTS}),
e AS (
  SELECT a.k AS ak, b.k AS bk FROM p a JOIN p b ON a.k <> b.k
  WHERE (a.lat - b.lat) * (a.lat - b.lat) +
        (a.lon - b.lon) * (a.lon - b.lon) <= {R2}),
deg AS (
  SELECT p.k, count(e.bk) AS nb FROM p
  LEFT JOIN e ON e.ak = p.k GROUP BY p.k),
core AS (SELECT k FROM deg WHERE nb + 1 >= {MINPTS}),
ce AS (
  SELECT ak, bk FROM e
  WHERE ak IN (SELECT k FROM core) AND bk IN (SELECT k FROM core)),
reach AS (
  SELECT k AS a, k AS b FROM core
  UNION
  SELECT r.a, ce.bk FROM reach r JOIN ce ON ce.ak = r.b),
corerep AS (SELECT a AS k, min(b) AS rep FROM reach GROUP BY a),
borderrep AS (
  SELECT e.ak AS k, min(cr.rep) AS rep
  FROM e JOIN corerep cr ON cr.k = e.bk
  WHERE e.ak NOT IN (SELECT k FROM core)
  GROUP BY e.ak),
assigned AS (
  SELECT k, rep, 'core' AS role FROM corerep
  UNION ALL
  SELECT k, rep, 'border' AS role FROM borderrep),
sizes AS (SELECT rep, count(*) AS n FROM assigned GROUP BY rep)
SELECT a.k AS c_custkey, a.role,
  CAST(a.rep AS BIGINT) AS cluster_rep,
  CAST(s.n AS BIGINT) AS cluster_size
FROM assigned a JOIN sizes s ON s.rep = a.rep
UNION ALL
SELECT p.k AS c_custkey, 'noise' AS role,
  CAST(-1 AS BIGINT) AS cluster_rep, CAST(0 AS BIGINT) AS cluster_size
FROM p
WHERE p.k NOT IN (SELECT k FROM assigned)"""


def hook_jump(i):
    prev = f"l{i-1}"
    return f"""h{i} AS MATERIALIZED (
  SELECT l.k, min(least(l.rep, coalesce(n.rep, l.rep))) AS rep
  FROM {prev} l LEFT JOIN ce ON ce.ak = l.k
  LEFT JOIN {prev} n ON n.k = ce.bk
  GROUP BY l.k),
l{i} AS MATERIALIZED (SELECT a.k, b.rep FROM h{i} a JOIN h{i} b ON b.k = a.rep)"""


def new_oracle(rounds):
    cc = ",\n".join(hook_jump(i) for i in range(1, rounds + 1))
    return f"""WITH p AS ({POINTS}),
g AS MATERIALIZED (SELECT k, lat, lon, lat // {R} AS cx, lon // {R} AS cy FROM p),
off(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                       (1,-1),(1,0),(1,1)),
probe AS (SELECT k, lat, lon, cx + dx AS cx, cy + dy AS cy
          FROM g CROSS JOIN off),
e AS MATERIALIZED (
  SELECT a.k AS ak, b.k AS bk
  FROM probe a JOIN g b ON a.cx = b.cx AND a.cy = b.cy
  WHERE a.k <> b.k
    AND (a.lat - b.lat) * (a.lat - b.lat) +
        (a.lon - b.lon) * (a.lon - b.lon) <= {R2}),
deg AS (
  SELECT p.k, count(e.bk) AS nb FROM p
  LEFT JOIN e ON e.ak = p.k GROUP BY p.k),
core AS MATERIALIZED (SELECT k FROM deg WHERE nb + 1 >= {MINPTS}),
ce AS MATERIALIZED (
  SELECT ak, bk FROM e
  WHERE ak IN (SELECT k FROM core) AND bk IN (SELECT k FROM core)),
l0 AS MATERIALIZED (SELECT k, k AS rep FROM core),
{cc},
corerep AS (SELECT k, rep FROM l{rounds}),
borderrep AS (
  SELECT e.ak AS k, min(cr.rep) AS rep
  FROM e JOIN corerep cr ON cr.k = e.bk
  WHERE e.ak NOT IN (SELECT k FROM core)
  GROUP BY e.ak),
assigned AS (
  SELECT k, rep, 'core' AS role FROM corerep
  UNION ALL
  SELECT k, rep, 'border' AS role FROM borderrep),
sizes AS (SELECT rep, count(*) AS n FROM assigned GROUP BY rep)
SELECT a.k AS c_custkey, a.role,
  CAST(a.rep AS BIGINT) AS cluster_rep,
  CAST(s.n AS BIGINT) AS cluster_size
FROM assigned a JOIN sizes s ON s.rep = a.rep
UNION ALL
SELECT p.k AS c_custkey, 'noise' AS role,
  CAST(-1 AS BIGINT) AS cluster_rep, CAST(0 AS BIGINT) AS cluster_size
FROM p
WHERE p.k NOT IN (SELECT k FROM assigned)"""


def run(con, sql):
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    return sorted(rows), time.time() - t0


def main():
    sf001 = "/root/testdata/sf0.01"
    sf01 = "/root/testdata/sf0.1"
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    con = duckdb.connect()
    con.execute(f"CREATE TABLE customer AS SELECT * FROM read_parquet('{sf001}/customer.parquet')")
    old_rows, old_t = run(con, OLD)
    new_rows, new_t = run(con, new_oracle(rounds))
    print(f"sf0.01: old {old_t:.2f}s ({len(old_rows)} rows), "
          f"new[{rounds}r] {new_t:.2f}s ({len(new_rows)} rows), "
          f"match={old_rows == new_rows}")

    # convergence check: rounds vs rounds+3 must agree at both sfs
    more_rows, _ = run(con, new_oracle(rounds + 3))
    print(f"sf0.01 convergence: {rounds} vs {rounds+3} rounds "
          f"match={new_rows == more_rows}")

    con2 = duckdb.connect()
    con2.execute(f"CREATE TABLE customer AS SELECT * FROM read_parquet('{sf01}/customer.parquet')")
    big_rows, big_t = run(con2, new_oracle(rounds))
    big_more, big_more_t = run(con2, new_oracle(rounds + 3))
    print(f"sf0.1: new[{rounds}r] {big_t:.2f}s ({len(big_rows)} rows), "
          f"[{rounds+3}r] {big_more_t:.2f}s, "
          f"converged={big_rows == big_more}")


if __name__ == "__main__":
    main()
