#!/usr/bin/env python3
"""Segmented DuckDB replay of the ann_ivf oracle for replica corpora
too large for the monolithic unrolled-CTE query (r100: 97.7 GiB OOM).

Dev-only measurement tool (oracle_check.py's sibling). The monolithic
oracle's memory hog is the Lloyd ASSIGNMENT window: ts x c_{r-1} is
(train-sample rows) x (K cells) wide rows per round -- ~100M at r100's
K=1562. But the computation decomposes exactly:

 - the per-round assignment is a PER-VEC argmax (each train vector
   ranks all K centroids independently), so it chunks by vec_id with
   no cross-chunk interaction;
 - the per-cell mean numerators/denominators are exact BIGINT lattice
   sums -- associative, so per-chunk partials combine to the identical
   totals;
 - each round's centroid table is MATERIALIZED to parquet and the next
   round (a fresh bounded query) reads it back, exactly like the
   monolith's `c$r AS MATERIALIZED` handoff;
 - the corpus cell assignment (the two-level routed branch past the
   256-cell gate) is again a per-vec argmax -- chunked the same way.

Every segment computes the same SQL expressions over the same rows as
the monolith (same lattice arithmetic, same tie-breaks); the segments
only change WHERE materialization boundaries fall, which DuckDB's own
MATERIALIZED hints already do inside the monolith. The final probe +
re-rank query (metadata-sized candidates) runs in one piece over the
materialized centroids/cells and the result is compared bit-exactly
to the Spark dump (oracle_check's norm + compare, imported).

Usage:
  python3 tools/ivf_segmented_replay.py <sfDir> <verifyOutDir> [--chunks N]

Validate the tool itself at a scale where the monolith works (e.g.
/tmp/r20): the segmented result must match BOTH the Spark dump and
the monolithic oracle.

Typing hazard the segmentation introduces (and this tool guards):
DuckDB SUM(BIGINT) returns HUGEINT, parquet has no int128, so a
COPY of a raw partial sum silently lands as DOUBLE — and
`DOUBLE // BIGINT` is TRUE division, not the monolith's HUGEINT
integer division. The partial sums are therefore CAST to BIGINT at
every parquet boundary (they are lattice sums bounded by
|ts|·KM_LAT ≪ 2^63) so `s // n` stays the same truncating integer
division the monolith and the engine compute. First caught at r100:
the fractional means drifted every centroid by ~1e-6, which flipped
a 3.3e-7-margin round-2 train assignment, materially moved two
cells, and swapped one probe for one query (qid 450).
"""
import argparse
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import norm  # noqa: E402

import pandas as pd  # noqa: E402

# engine constants mirrored from the library (SimilaritySearch /
# Clustering) -- the same values SparkEntry bakes into the oracle SQL
PQ_LATTICE = 10000
KM_LAT = 1000000
DIM = 64
IVF_MIN, IVF_TARGET, IVF_MAX = 64, 128, 16384
TRAIN_PER_CELL = 64
FLAT_GATE = 256
KMEANS_ITERS = 2
NPROBE = 4
TOPK = 10
MAXQ = 32  # queries: vec_id % 50 == 0 AND vec_id < 50*32


def con_with_limits(tmp_dir):
    con = duckdb.connect()
    mem = os.environ.get("ORACLE_MEM", "64GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp_dir}'")
    con.execute("SET max_temp_directory_size='"
                + os.environ.get("ORACLE_TMP_MAX", "60GB") + "'")
    return con


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("verify_out")
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--work", default=None,
                    help="work dir for parquet handoffs (default <verify_out>/ivf_seg)")
    args = ap.parse_args()
    work = args.work or os.path.join(args.verify_out, "ivf_seg")
    os.makedirs(work, exist_ok=True)
    tmp = os.path.join(work, ".duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    C = args.chunks
    t_start = time.time()

    def pq(name):
        return os.path.join(work, name + ".parquet")

    def log(msg):
        print(f"[ivf_seg +{time.time() - t_start:7.1f}s] {msg}", flush=True)

    # ---- stage A: base frames (cheap -- no K-wide windows) ----
    con = con_with_limits(tmp)
    con.execute(f"""
      COPY (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM read_parquet('{args.sf_dir}/embeddings.parquet')
            WHERE embedding IS NOT NULL)
      TO '{pq("e")}' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{pq('e')}')").fetchone()[0]
    k = min(IVF_MAX, max(IVF_MIN, n // IVF_TARGET))
    con.execute(f"""
      COPY (SELECT vec_id AS cid, v AS cv FROM (
              SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
              FROM read_parquet('{pq("e")}') WHERE vec_id % 50 = 7)
            WHERE rn <= {k})
      TO '{pq("c0")}' (FORMAT PARQUET)""")
    sc = con.execute(f"SELECT COUNT(*) FROM read_parquet('{pq('c0')}')").fetchone()[0]
    m = max(1, (n + max(1, TRAIN_PER_CELL * sc) - 1) // max(1, TRAIN_PER_CELL * sc))
    con.execute(f"""
      COPY (SELECT vec_id, v FROM read_parquet('{pq("e")}') WHERE vec_id % {m} = 0)
      TO '{pq("ts")}' (FORMAT PARQUET)""")
    nts = con.execute(f"SELECT COUNT(*) FROM read_parquet('{pq('ts')}')").fetchone()[0]
    con.close()
    log(f"stage A: n={n} k={k} (seeds={sc}) train stride m={m} |ts|={nts}")

    # ---- stage B: Lloyd rounds, assignment chunked by vec_id % C ----
    for r in range(1, KMEANS_ITERS + 1):
        parts = []
        for i in range(C):
            conr = con_with_limits(tmp)
            part = os.path.join(work, f"s{r}_part{i}.parquet")
            conr.execute(f"""
              COPY (
                WITH tsc AS (SELECT vec_id, v FROM read_parquet('{pq("ts")}')
                             WHERE vec_id % {C} = {i}),
                cprev AS (SELECT cid, cv FROM read_parquet('{pq(f"c{r-1}")}')),
                a AS (SELECT vec_id, cid FROM (
                    SELECT tsc.vec_id, c.cid,
                      ROW_NUMBER() OVER (PARTITION BY tsc.vec_id
                        ORDER BY list_cosine_similarity(tsc.v, c.cv) DESC, c.cid) AS rk
                    FROM tsc, cprev c)
                  WHERE rk = 1)
                SELECT a.cid, dd.d AS pos,
                    CAST(SUM(CAST(floor(tsc.v[dd.d + 1] * {KM_LAT} + 0.5)
                      AS BIGINT)) AS BIGINT) AS s,
                    COUNT(*) AS n
                FROM a JOIN tsc ON tsc.vec_id = a.vec_id, range(0, {DIM}) dd(d)
                GROUP BY 1, 2)
              TO '{part}' (FORMAT PARQUET)""")
            conr.close()
            parts.append(part)
        conm = con_with_limits(tmp)
        conm.execute(f"""
          COPY (
            WITH st AS (SELECT cid, pos, CAST(SUM(s) AS BIGINT) AS s,
                          CAST(SUM(n) AS BIGINT) AS n
                        FROM read_parquet({parts!r}) GROUP BY 1, 2),
            mr AS (SELECT cid,
                     list(CAST(s // n AS DOUBLE) / {KM_LAT} ORDER BY pos) AS mv
                   FROM st GROUP BY cid)
            SELECT c.cid, COALESCE(mr.mv, c.cv) AS cv
            FROM read_parquet('{pq(f"c{r-1}")}') c LEFT JOIN mr USING (cid))
          TO '{pq(f"c{r}")}' (FORMAT PARQUET)""")
        conm.close()
        log(f"round {r}: centroids c{r} written ({C} assignment chunks)")

    cN = pq(f"c{KMEANS_ITERS}")

    # ---- stage C: corpus cell assignment (gate-conditional, chunked) ----
    # coarse tier + owners are K-sized (tiny) -- one query
    conc = con_with_limits(tmp)
    conc.execute(f"""
      COPY (SELECT cid, cv, ROW_NUMBER() OVER (ORDER BY cid) - 1 AS fi
            FROM read_parquet('{cN}'))
      TO '{pq("cells_fr")}' (FORMAT PARQUET)""")
    conc.execute(f"""
      COPY (SELECT fi AS ci, cv FROM read_parquet('{pq("cells_fr")}'),
              (SELECT GREATEST(1, CAST(CEIL(SQRT(CAST({k} AS DOUBLE))) AS BIGINT)) AS step)
            WHERE fi % step = 0)
      TO '{pq("cells_co")}' (FORMAT PARQUET)""")
    if k > FLAT_GATE:
        conc.execute(f"""
          COPY (SELECT fi, ci FROM (
                  SELECT f.fi, c.ci, ROW_NUMBER() OVER (PARTITION BY f.fi
                    ORDER BY list_cosine_similarity(f.cv, c.cv) DESC, c.ci) AS rk
                  FROM read_parquet('{pq("cells_fr")}') f,
                       read_parquet('{pq("cells_co")}') c)
                WHERE rk = 1)
          TO '{pq("cells_ow")}' (FORMAT PARQUET)""")
    conc.close()
    cell_parts = []
    for i in range(C):
        coni = con_with_limits(tmp)
        part = os.path.join(work, f"cells_part{i}.parquet")
        if k > FLAT_GATE:
            coni.execute(f"""
              COPY (
                WITH ec AS (SELECT vec_id, v FROM read_parquet('{pq("e")}')
                            WHERE vec_id % {C} = {i}),
                p2 AS (SELECT vec_id, ci FROM (
                    SELECT s.vec_id, c.ci, ROW_NUMBER() OVER (PARTITION BY s.vec_id
                      ORDER BY list_cosine_similarity(s.v, c.cv) DESC, c.ci) AS rk
                    FROM ec s, read_parquet('{pq("cells_co")}') c)
                  WHERE rk <= 2)
                SELECT vec_id, cid FROM (
                    SELECT p.vec_id, f.cid, ROW_NUMBER() OVER (PARTITION BY p.vec_id
                      ORDER BY list_cosine_similarity(ev.v, f.cv) DESC, f.cid) AS rk
                    FROM p2 p JOIN read_parquet('{pq("cells_ow")}') o ON o.ci = p.ci
                      JOIN read_parquet('{pq("cells_fr")}') f ON f.fi = o.fi
                      JOIN ec ev ON ev.vec_id = p.vec_id)
                  WHERE rk = 1)
              TO '{part}' (FORMAT PARQUET)""")
        else:
            coni.execute(f"""
              COPY (
                WITH ec AS (SELECT vec_id, v FROM read_parquet('{pq("e")}')
                            WHERE vec_id % {C} = {i})
                SELECT vec_id, cid FROM (
                    SELECT s.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY s.vec_id
                      ORDER BY list_cosine_similarity(s.v, c.cv) DESC, c.cid) AS rk
                    FROM ec s, read_parquet('{pq("cells_fr")}') c)
                  WHERE rk = 1)
              TO '{part}' (FORMAT PARQUET)""")
        coni.close()
        cell_parts.append(part)
    log(f"stage C: corpus assignment written ({C} chunks, "
        f"{'two-level' if k > FLAT_GATE else 'flat'} branch)")

    # ---- stage D: probes + re-rank (candidates are metadata-sized) ----
    conf = con_with_limits(tmp)
    got = conf.execute(f"""
      WITH e AS (SELECT vec_id, v FROM read_parquet('{pq("e")}')),
      cells AS (SELECT vec_id, cid FROM read_parquet({cell_parts!r})),
      q AS (SELECT vec_id AS qid FROM e
        WHERE vec_id % 50 = 0 AND vec_id < {50 * MAXQ}),
      qp AS (SELECT qid, cid FROM (
          SELECT q.qid, c.cid,
            ROW_NUMBER() OVER (PARTITION BY q.qid
              ORDER BY list_cosine_similarity(eq.v, c.cv) DESC, c.cid) AS rk
          FROM q JOIN e eq ON eq.vec_id = q.qid,
               read_parquet('{cN}') c)
        WHERE rk <= {NPROBE}),
      scd AS (SELECT qp.qid, cells.vec_id,
          list_cosine_similarity(eq.v, ec.v) AS rawsim
        FROM cells JOIN qp ON cells.cid = qp.cid
          JOIN e eq ON eq.vec_id = qp.qid
          JOIN e ec ON ec.vec_id = cells.vec_id
        WHERE cells.vec_id <> qp.qid),
      r AS (SELECT qid, vec_id, rawsim,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rawsim DESC, vec_id) AS rk
        FROM scd)
      SELECT qid, vec_id AS nid, CAST(rk AS BIGINT) AS rank,
             ROUND(rawsim, 6) AS sim
      FROM r WHERE rk <= {TOPK}
      ORDER BY qid, rank""").fetchdf()
    conf.close()
    log(f"stage D: final result {len(got)} rows")

    # ---- compare to the Spark dump, bit-exactly (oracle_check norm) ----
    exp = norm(got)
    spark = norm(pd.read_parquet(os.path.join(args.verify_out, "ann_ivf")))
    if list(exp.columns) != list(spark.columns):
        print(f"FAIL ann_ivf(segmented): columns {list(spark.columns)} != {list(exp.columns)}")
        sys.exit(1)
    if len(exp) != len(spark):
        print(f"FAIL ann_ivf(segmented): rows {len(spark)} != {len(exp)}")
        sys.exit(1)
    for c in exp.columns:
        e_col, g_col = exp[c], spark[c]
        if e_col.dtype.kind == "f" or g_col.dtype.kind == "f":
            ok = (e_col.astype("float64").map(lambda v: v.hex() if v == v else "nan")
                  == g_col.astype("float64").map(lambda v: v.hex() if v == v else "nan"))
        else:
            ok = (e_col == g_col) | (e_col.isna() & g_col.isna())
        if not ok.all():
            i = int((~ok).idxmax())
            print(f"FAIL ann_ivf(segmented): col {c} row {i}: "
                  f"spark={spark[c][i]!r} duck={exp[c][i]!r}")
            sys.exit(1)
    print(f"OK   ann_ivf segmented replay ({len(exp)} rows, k={k}, "
          f"chunks={C}, {time.time() - t_start:.1f}s)")


if __name__ == "__main__":
    main()
