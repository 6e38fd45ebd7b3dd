#!/usr/bin/env python3
"""Cross-engine property fuzz: seeded corpus perturbation.

Dev-only tool. Generates a random-but-contract-preserving perturbation
of an sf dir (bootstrap resampling + lattice-preserving jitter +
planted ties/duplicates) so the full oracle surface can be replayed
on corpora the fixed sf dirs can't reach — tie-break drift, duplicate
pileups, resampled key distributions. Referential structure is kept
(dims untouched; lineitem groups follow their resampled order), money
and value jitter stays on the 2-decimal lattice, and doc texts mutate
at word granularity so every text-derived lattice (shingles, hashes,
frame energies) gets fresh values.

Usage:
  python3 tools/fuzz_corpus.py <seed> <srcSfDir> <outDir> [clustered]
then run the standard chain on <outDir>:
  sbt "runMain graft.Verify <outDir> <verifyOut>"
  python3 tools/oracle_check.py <outDir> <verifyOut>

The optional `clustered` mode (round 11) replaces the embedding
bootstrap with a few TIGHT Gaussian blobs around corpus-sampled
centers — the distribution real embedding dumps have (near-uniform
fuzz corpora are the IVF quantizer's EASIEST case; clustered mass in
few cells is its worst). Labels become the blob index, so
label-consuming ops (proto_prune) see coherent classes too. All other
tables fuzz exactly as in the default mode.
"""
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    seed, src, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def T(t):
        return con.execute(f"SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchdf()

    def W(t, df_or_table):
        if not isinstance(df_or_table, pa.Table):
            df = df_or_table
            # micro-precision timestamps: pandas' default ns precision
            # becomes TIMESTAMP(NANOS) in parquet, which the engine's
            # nanosAsLong conf surfaces as BIGINT for every column
            # except the events.ts special case
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime64"):
                    df[c] = df[c].astype("datetime64[us]")
            df_or_table = pa.Table.from_pandas(df, preserve_index=False)
        pq.write_table(df_or_table, f"{out}/{t}.parquet")

    # dimensions ship unchanged: the fuzz targets fact/doc distributions,
    # not referential integrity
    for t in ["region", "nation", "customer", "supplier", "part"]:
        W(t, T(t))

    # documents: bootstrap + word-level mutations + planted exact dups
    d = T("documents")
    n = 300
    idx = rng.integers(0, len(d), n)
    texts = [str(x) for x in d.text.values[idx]]
    for i in range(n):
        r = rng.random()
        ws = texts[i].split()
        if r < 0.15 and len(ws) > 3:
            ws.pop(int(rng.integers(0, len(ws))))
            texts[i] = " ".join(ws)
        elif r < 0.30:  # exact duplicate of another sampled doc (ties)
            texts[i] = texts[int(rng.integers(0, n))]
        elif r < 0.40 and ws:
            ws.append(ws[int(rng.integers(0, len(ws)))])
            texts[i] = " ".join(ws)
    W("documents", pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "text": texts,
        "lang": d.lang.values[rng.integers(0, len(d), n)],
        "source": d.source.values[rng.integers(0, len(d), n)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64")}))

    # events: bootstrap, second-lattice ts jitter, small user pool (ties),
    # cent-lattice value jitter
    e = T("events")
    m = 2000
    ei = rng.integers(0, len(e), m)
    W("events", pd.DataFrame({
        "event_id": np.arange(m, dtype="int64"),
        "ts": pd.to_datetime(e.ts.values[ei])
            + pd.to_timedelta(rng.integers(-300, 301, m), unit="s"),
        "user_id": rng.integers(0, 40, m).astype("int64"),
        "event_type": e.event_type.values[rng.integers(0, len(e), m)],
        "value": np.round(e.value.values[ei] + rng.integers(-200, 201, m) * 0.01, 2),
        "props": e.props.values[rng.integers(0, len(e), m)]}))

    # orders: bootstrap with fresh keys, day-lattice date jitter,
    # cent-lattice price jitter; lineitem groups follow their order
    o = T("orders")
    li = T("lineitem")
    no = 800
    oi = rng.integers(0, len(o), no)
    orders = pd.DataFrame({
        "o_orderkey": np.arange(no, dtype="int64"),
        "o_custkey": o.o_custkey.values[rng.integers(0, len(o), no)],
        "o_orderstatus": o.o_orderstatus.values[rng.integers(0, len(o), no)],
        "o_totalprice": np.round(
            o.o_totalprice.values[oi] + rng.integers(-500, 501, no) * 0.01, 2),
        "o_orderdate": pd.to_datetime(o.o_orderdate.values[oi])
            + pd.to_timedelta(rng.integers(-30, 31, no), unit="D"),
        "o_orderpriority": o.o_orderpriority.values[rng.integers(0, len(o), no)]})
    W("orders", orders)
    groups = dict(tuple(li.groupby("l_orderkey")))
    parts = []
    for new_key, old_key in zip(range(no), o.o_orderkey.values[oi]):
        g = groups.get(old_key)
        if g is None:
            continue
        g = g.copy()
        g["l_orderkey"] = np.int64(new_key)
        parts.append(g)
    lif = pd.concat(parts, ignore_index=True)
    lif["l_quantity"] = np.maximum(
        1.0, lif.l_quantity.values + rng.integers(-2, 3, len(lif)))
    lif["l_extendedprice"] = np.round(
        lif.l_extendedprice.values + rng.integers(-500, 501, len(lif)) * 0.01, 2)
    lif["l_shipdate"] = pd.to_datetime(lif.l_shipdate.values) \
        + pd.to_timedelta(rng.integers(-30, 31, len(lif)), unit="D")
    W("lineitem", lif)

    em = T("embeddings")
    k = 400
    clustered = len(sys.argv) > 4 and sys.argv[4] == "clustered"
    if clustered:
        # a few TIGHT Gaussian blobs around corpus-sampled centers:
        # the real-embedding-dump shape (and the IVF quantizer's worst
        # case — mass concentrates in few cells). float32 throughout;
        # labels = blob index so label consumers see coherent classes.
        n_blobs = 6
        centers = [np.asarray(em.embedding.values[j], dtype=np.float32)
                   for j in rng.integers(0, len(em), n_blobs)]
        blob = rng.integers(0, n_blobs, k)
        vecs = [(centers[b] + rng.normal(0.0, 0.02, len(centers[b]))
                 .astype(np.float32)).astype(np.float32) for b in blob]
        labels = blob.astype("int32")
    else:
        # bootstrap + 1/256-lattice float32 jitter (exact in both
        # engines' doubles)
        vi = rng.integers(0, len(em), k)
        vecs = []
        for j in vi:
            v = np.asarray(em.embedding.values[j], dtype=np.float32)
            if rng.random() < 0.5:
                v = (v + rng.integers(-8, 9, len(v)).astype(np.float32) / 256.0) \
                    .astype(np.float32)
            vecs.append(v)
        labels = em.label.values[rng.integers(0, len(em), k)].astype("int32")
    W("embeddings", pa.table({
        "vec_id": pa.array(np.arange(k, dtype="int64")),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels)}))
    print(f"fuzz corpus seed={seed}"
          + (" clustered" if clustered else "") + f" written to {out}")


if __name__ == "__main__":
    main()
