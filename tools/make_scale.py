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

Document texts: each replica applies a per-replica CHARACTER bijection
(a Caesar rotation of the letter alphabet; replica 0 is the identity),
so each replica's internal duplicate/shingle/span/edit structure is
preserved EXACTLY (all lengths, offsets and alignments unchanged)
while any cross-replica substring containing at least one letter is
replica-unique. This keeps duplicate DENSITY constant as the corpus
grows, which is the honest scaling model. Two earlier schemes were
measured and rejected as replication artifacts:
 - an appended tag word left every doc with R-1 cross-replica
   near-copies (distance 1!) and blew candidate-pair operators up
   x R^2;
 - a per-WORD suffix ('customer' -> 'customerx16') was word-level
   disjoint but NOT character-level disjoint: fixed-offset slice
   blocking (dedup_fuzzy's PassJoin segments) truncated the suffix
   digits out of the slice (' customerx' identical in all replicas),
   merging blocks across replicas -- candidates measured 29.8x at
   R=20 where linear is 20x.
Letter rotation is immune to both: every slice differs per replica at
every letter position. Limit: R <= 26 distinct rotations.

Embeddings: each replica applies a per-replica SIGNED DIMENSION
PERMUTATION (replica 0 = identity). A signed permutation is an
orthogonal transform, so every within-replica dot product, norm and
cosine is preserved EXACTLY (the replica's internal near-dup/ANN
structure is bit-identical up to float associativity), while a vector
and its cross-replica images have cosines distributed ~N(0, 1/dim) --
no artificial cross-replica near-dups (every vector otherwise gets
R-1 exact clones at cosine 1.0, which blows up the ANN/semantic-dedup
family quadratically, the vector analogue of the tag-word artifact).

Timestamps, floats and categorical columns are kept verbatim.

Usage: python3 tools/make_scale.py <src_sf_dir> <out_dir> <replicas>
"""
import argparse
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


LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def rotated(r: int) -> tuple[str, str]:
    """(from, to) alphabets for DuckDB translate() at replica r
    (cycles past 26 — see the R > 26 warning in main)."""
    r = r % 26
    lo = LOWER[r:] + LOWER[:r]
    return LOWER + UPPER, lo + lo.upper()


def signed_perm_sql(r: int, dim: int, elem_cast: str) -> str:
    """DuckDB expression applying replica r's signed dimension
    permutation to the 1-based `embedding` list (NULL stays NULL)."""
    if r == 0:
        return "embedding"
    import random
    rnd = random.Random(1000 + r)
    perm = list(range(1, dim + 1))
    rnd.shuffle(perm)
    elems = ", ".join(
        f"(embedding[{p}] * {rnd.choice([1, -1])})::{elem_cast}" for p in perm)
    return f"CASE WHEN embedding IS NULL THEN NULL ELSE [{elems}] END"


def main() -> None:
    # argparse (round-15 fix): the old raw sys.argv[1..3] positional
    # read silently corrupted parsing when --embedding-only preceded
    # the positionals (src became the flag string instead of the
    # opt-in engaging).
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("src", help="source sf dir (parquet tables)")
    ap.add_argument("out", help="output corpus dir")
    ap.add_argument("reps", type=int, help="replication factor R")
    ap.add_argument("--embedding-only", action="store_true",
                    help="allow R > 26 (text rotations cycle past 26; "
                         "the corpus is valid for embedding/ANN only)")
    ns = ap.parse_args()
    src, out, reps = ns.src, ns.out, ns.reps
    # Letter rotations are pairwise-everywhere-distinct only up to 26
    # (a Latin-square bound: no larger family of permutations of one
    # alphabet disagrees at every position). Past 26 the rotations
    # CYCLE (r mod 26), so replicas 26 apart share identical text —
    # cross-replica duplicate artifacts return for the TEXT families.
    # Embedding signed-permutations have no such bound (dim! maps),
    # so an R > 26 corpus is valid for the EMBEDDING/ANN families
    # only; keep text-family scale points at R <= 26.
    # R > 26 therefore requires the EXPLICIT --embedding-only opt-in
    # (the r13 advisory: a stderr warning alone let a scripted caller
    # build a text corpus with byte-identical replicas 26 apart and
    # trust text-family dedup measurements on it), and the corpus dir
    # gets a TEXT_ROTATIONS_CYCLE marker file text-family tooling can
    # check.
    if reps > 26 and not ns.embedding_only:
        sys.exit(f"ERROR: R={reps} > 26 — text rotations cycle past 26, so "
                 "this corpus would carry byte-identical text replicas. "
                 "Pass --embedding-only to build it for embedding/ANN "
                 "measurements only.")
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)
    if reps > 26:
        with open(os.path.join(out, "TEXT_ROTATIONS_CYCLE"), "w") as f:
            f.write(f"R={reps} > 26: text replicas cycle r % 26 — "
                    "embedding/ANN measurements only\n")
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
                    frm, to = rotated(r)
                    proj.append(f"translate(text, '{frm}', '{to}') AS text")
                elif table == "embeddings" and c == "embedding":
                    dim, = con.execute(
                        f"SELECT len(embedding) FROM read_parquet('{src}/{table}.parquet') "
                        "WHERE embedding IS NOT NULL LIMIT 1").fetchone()
                    proj.append(
                        f"{signed_perm_sql(r, dim, 'FLOAT')} AS embedding")
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
