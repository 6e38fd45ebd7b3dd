#!/usr/bin/env python3
"""Build an R-times replicated corpus for scaling-slope measurement.

Dev-only measurement tool (not part of the shipped library, like
oracle_check.py): the driver ships sf0.001/0.01/0.1, so the largest
measurable slope is 10x. This replicates sf0.1 R times into a /tmp
directory as R DISJOINT key universes -- every key column is offset by
replica*stride so all FK joins stay consistent and each replica is a
parallel world -- giving a (10*R)x point against sf0.01 for the
operators whose 100 TB behavior matters most (candidate-pair dedup,
graph loops, span dedup).

Document texts: EVERY word gets a per-replica suffix -- a bijective
vocabulary mapping, so each replica's internal duplicate/shingle/span
structure is preserved exactly while cross-replica texts share no
words at all (no shingles, k-grams, or sub-tau edit pairs). This keeps
duplicate DENSITY constant as the corpus grows, which is the honest
scaling model; a mere appended tag word was measured to leave every
doc with R-1 cross-replica near-copies (distance 1!) and blow
candidate-pair operators up x R^2 -- an artifact of the replication,
not a property of the operators. Timestamps, floats and categorical
columns are kept verbatim.

Usage: python3 tools/make_scale.py <src_sf_dir> <out_dir> <replicas>
"""
import sys

import duckdb

STRIDE = 10_000_000

# key columns to offset per table (FK graph stays consistent because
# every end of every FK gets the same replica offset)
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src, out, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)
    for table, keys in KEYS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')").fetchall()]
        selects = []
        for r in range(reps):
            proj = []
            for c in cols:
                if c in keys:
                    proj.append(f"{c} + {r * STRIDE} AS {c}")
                elif table == "documents" and c == "text":
                    proj.append(
                        f"regexp_replace(text, '(\\S+)', '\\1x{r}', 'g') AS text")
                else:
                    proj.append(c)
            selects.append(
                f"SELECT {', '.join(proj)} FROM read_parquet('{src}/{table}.parquet')")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
