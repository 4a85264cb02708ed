#!/usr/bin/env python3
"""Float-ranking oracle audit — the r17 m10-class detector.

The r16/r17 driver red row (m10_segment_ann_indexed) was caused by a
failure class NO number of local verify reruns can see: the query's
routing argmax had 32 pairs of EXACTLY-equal cosine doubles, equal only
under one DuckDB build's `list_inner_product` accumulation order — on
the driver's build some ties resolved as strict inequalities the other
way, flipping cell assignments and the final top-3. A local green is
therefore only evidence when the ordering-deciding doubles are
ENGINE-BUILD-STABLE.

This tool makes that property checkable locally, three ways:

1. AUDIT (default): runs the per-query probes Verify dumps as
   `audit_sql.json` (SparkEntry.auditSql — built from the SAME CTE
   chains as the correctness oracles). Each probe emits rows
   (stage, n_ties, min_gap, integer_exact). Verdict per stage:
     - FAIL  iff (n_ties > 0 OR min_gap < 1e-9) AND integer_exact = 0
       -- exact ties / knife-edge gaps in raw-float ranking: the next
          driver red row waiting to happen;
     - PASS with a note when ties exist but the operands are in the
       integer-exact class (|x| <= 2^20 integer-valued doubles,
       <= 4096 dims): every partial sum of a dot product is then an
       exact integer < 2^53, so ANY build/SIMD/threading derives
       bit-identical doubles and ties break on the deterministic
       id/cid column identically everywhere.

2. --dual: runs every audited query's correctness oracle twice in one
   DuckDB build -- default threading vs SET threads=1 -- and diffs the
   two result frames (oracle-vs-oracle instability = the m10 class
   caught red-handed; one build cannot exercise the SIMD/version axis,
   which is why the static audit above is the primary detector).

3. --selftest: regenerates the PRE-FIX m10 chain (r17's raw-float
   routing cosines over the raw fixed-point centroids) and asserts
   this tool FLAGS it -- proving the detector actually detects the
   class that escaped to the driver twice.

Usage:
    python3 tools/oracleaudit.py <sfdir> <verify-outdir>
    python3 tools/oracleaudit.py --dual <sfdir> <verify-outdir>
    python3 tools/oracleaudit.py --selftest <sfdir>
"""
import sys, json, glob, os

GAP_FLOOR = 1e-9


def connect(sfdir, threads=None):
    import duckdb
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads={threads}")
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def verdict_rows(rows):
    """(n_fail, printable per-stage lines) for one query's audit rows."""
    fails, lines = 0, []
    for stage, n_ties, min_gap, integer_exact in rows:
        risky = (n_ties or 0) > 0 or (min_gap is not None and min_gap < GAP_FLOOR)
        if risky and not integer_exact:
            fails += 1
            lines.append(f"  FAIL {stage}: n_ties={n_ties} min_gap={min_gap} "
                         f"(raw-float ranking with ties/knife-edge gaps -- "
                         f"engine-build-divergent, the m10 class)")
        elif risky:
            lines.append(f"  pass {stage}: n_ties={n_ties} min_gap={min_gap} "
                         f"(ties present but operands integer-exact -- benign)")
        else:
            lines.append(f"  pass {stage}: n_ties={n_ties} min_gap={min_gap}")
    return fails, lines


def audit(sfdir, outdir):
    con = connect(sfdir)
    audits = json.load(open(f"{outdir}/audit_sql.json"))
    fail = 0
    for name, sql in sorted(audits.items()):
        try:
            rows = con.sql(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: audit error {e}")
            fail += 1
            continue
        nf, lines = verdict_rows(rows)
        fail += nf
        print(f"{'FAIL' if nf else 'PASS'} {name}")
        for ln in lines:
            print(ln)
    print(f"\nfloat-ranking audit: {'FAIL' if fail else 'PASS'} "
          f"({len(audits)} queries, {fail} risky stages)")
    return 1 if fail else 0


def dual(sfdir, outdir):
    """Same correctness oracle, two thread configs, must agree exactly."""
    import pandas as pd
    audits = json.load(open(f"{outdir}/audit_sql.json"))
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con_a = connect(sfdir)            # default threading
    con_b = connect(sfdir, threads=1)  # serial
    fail = 0
    for name in sorted(audits):
        sql = oracles.get(name)
        if sql is None:
            continue
        a = con_a.sql(sql).df()
        b = con_b.sql(sql).df()
        a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
        b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS {name}: threads=N == threads=1 ({len(a)} rows)")
        except AssertionError:
            print(f"FAIL {name}: oracle output DIFFERS between thread configs "
                  f"-- ordering doubles are not engine-stable")
            fail += 1
    print(f"\ndual-config oracle check: {'FAIL' if fail else 'PASS'}")
    return 1 if fail else 0


# ---------------------------------------------------------------- selftest

M10_SOURCE = ("SELECT doc_id*1000 + sg AS id, [ coalesce(fl[i+1], 0)::DOUBLE for i in "
              "range(0, 16) ] AS v FROM (SELECT doc_id, sg, list(ws ORDER BY fi) AS fl "
              "FROM (SELECT doc_id, fi, ws, sum(cut) OVER (PARTITION BY doc_id ORDER BY "
              "fi ROWS UNBOUNDED PRECEDING) AS sg FROM (SELECT doc_id, fi, ws, CASE WHEN "
              "abs(ws - lag(ws) OVER (PARTITION BY doc_id ORDER BY fi)) > 150 THEN 1 "
              "ELSE 0 END AS cut FROM (SELECT doc_id, fi, list_sum(b[fi*16+1 : "
              "least(fi*16+16, len(b))])::BIGINT AS ws FROM (SELECT doc_id, "
              "unnest(range(0, (length(text)+15)//16)) AS fi, "
              "list_transform(range(1, length(text)+1), i -> ascii(substr(text, i, 1))"
              "::BIGINT) AS b FROM documents WHERE doc_id % 20 = 0)))) GROUP BY 1, 2)")


def integer_exact_check(rel, col):
    return (f"(SELECT CASE WHEN count(*) = 0 THEN 1 ELSE 0 END FROM {rel} "
            f"WHERE len({col}) > 4096 OR list_max([CASE WHEN x <> floor(x) OR "
            f"abs(x) > 1048576.0 THEN 1.0 ELSE 0.0 END FOR x IN {col}]) > 0)")


def prefix_m10_audit_sql(nlist=16, rounds=2):
    """The r17 (PRE-FIX) m10 routing chain, byte-equivalent numerics:
    training fixed-point is floor(x * 2^20) on the UN-normalized vector
    (m10's window sums reach ~4080, so centroid coordinates reach ~2^32
    -- far outside the exact-dot budget) and the routing cosine consumes
    the RAW doubles. The audit over it must report the measured exact
    ties AND integer_exact = 0 -> FAIL."""
    round_ctes = []
    for r in range(1, rounds + 1):
        prev = f"c{r-1}"
        round_ctes.append(f"""cdn{r} AS (SELECT cid, cfd, sqrt(list_inner_product(cfd, cfd)) AS cfn
          FROM (SELECT cid, [x::DOUBLE FOR x IN f] AS cfd FROM {prev})),
sims{r} AS (
  SELECT p.id, p.f, c.cid,
         list_inner_product(p.v, c.cfd) / (p.nrm * c.cfn) AS csim
  FROM pn p, cdn{r} c),
asg{r} AS (
  SELECT id, f, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
    FROM sims{r}) WHERE rn = 1),
sums{r} AS (
  SELECT cid, t.i AS i, sum(f[t.i])::BIGINT AS sx, count(*) AS cnt
  FROM asg{r}, unnest(range(1, len(f) + 1)) AS t(i) GROUP BY cid, t.i),
nw{r} AS (SELECT cid, list(sx // cnt ORDER BY i) AS f FROM sums{r} GROUP BY cid),
c{r} AS (SELECT p.cid, coalesce(nw.f, p.f) AS f FROM {prev} p LEFT JOIN nw{r} nw USING (cid))""")
    rc = ",\n".join(round_ctes)
    return f"""WITH e AS ({M10_SOURCE}),
n AS (SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
fx AS (SELECT id, [floor(x * 1048576.0)::BIGINT FOR x IN v] AS f FROM e),
pn AS (SELECT n.id, n.v, n.nrm, fx.f FROM n JOIN fx USING (id)),
c0 AS (SELECT row_number() OVER (ORDER BY md5('cent:' || id), id) - 1 AS cid, f
       FROM (SELECT id, f FROM fx ORDER BY md5('cent:' || id), id LIMIT {nlist})),
{rc},
cdnF AS (SELECT cid, cfd, sqrt(list_inner_product(cfd, cfd)) AS cfn
         FROM (SELECT cid, [x::DOUBLE FOR x IN f] AS cfd FROM c{rounds})),
simsF AS (
  SELECT n.id, n.v, n.nrm, c.cid,
         list_inner_product(n.v, c.cfd) / (n.nrm * c.cfn) AS csim
  FROM n, cdnF c),
rankedF AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS crn
  FROM simsF),
agap AS (
  SELECT id, max(CASE WHEN crn = 1 THEN csim END)
           - max(CASE WHEN crn = 2 THEN csim END) AS g
  FROM rankedF WHERE crn <= 2 GROUP BY id HAVING count(*) = 2),
xc AS (SELECT LEAST({integer_exact_check("n", "v")},
              {integer_exact_check("cdnF", "cfd")})::INTEGER AS ok)
SELECT 'routing' AS stage,
       (SELECT count(*) FROM agap WHERE g = 0)::BIGINT AS n_ties,
       coalesce((SELECT min(g) FROM agap), 1.0) AS min_gap,
       (SELECT ok FROM xc) AS integer_exact"""


def selftest(sfdir):
    con = connect(sfdir)
    rows = con.sql(prefix_m10_audit_sql()).fetchall()
    nf, lines = verdict_rows(rows)
    for ln in lines:
        print(ln)
    if nf:
        print("\nselftest PASS: the detector FLAGS the pre-fix m10 chain "
              f"(found {rows[0][1]} exact routing ties in non-exact operands)")
        return 0
    print("\nselftest FAIL: the pre-fix m10 chain was NOT flagged -- "
          "the detector is blind to the class it exists for")
    return 1


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--selftest":
        sys.exit(selftest(args[1]))
    if args and args[0] == "--dual":
        sys.exit(dual(args[1], args[2]))
    if len(args) < 2:
        print(__doc__)
        sys.exit(2)
    rc = audit(args[0], args[1])
    sys.exit(rc)
