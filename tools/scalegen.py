#!/usr/bin/env python3
"""Deterministic 10x (or Fx) upscaler for the driver-generated testdata.

Produces an sf-dir F times the source, preserving each query family's
statistical structure instead of naively duplicating rows (naive copies
would plant cross-copy EXACT duplicates, quadratically exploding every
dedup/ANN query and its oracle):

- region/nation (dims): copied as-is.
- customer/supplier/part/orders/lineitem/events: F generations with
  per-generation key offsets (offset = gen * (max_key + 1)), foreign
  keys re-pointed at the same generation -> join fan-outs and
  selectivities match the source exactly.
- documents: gen 0 verbatim; gen > 0 re-tokenized (every whitespace
  token suffixed with g<gen>) so the intra-generation near-duplicate
  structure is preserved while cross-generation Jaccard is 0.
- embeddings: gen 0 verbatim; gen > 0 fresh unit-norm gaussians from a
  fixed seed (cross-generation cosine ~ 0 at 64 dims, so no spurious
  near-dup pairs; labels keep the source distribution).

Schemas (incl. events' TIMESTAMP(NANOS)) are byte-identical to the
source: columns are rebuilt with the original arrow types.

Usage: python3 tools/scalegen.py <srcDir> <dstDir> <factor> [tables]
  tables: optional comma-separated subset (e.g. "documents") for
  big-factor single-family probes.
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.compute  # registers pa.compute (not implicit on newer pyarrow)
import pyarrow.parquet as pq

src, dst, F = sys.argv[1], sys.argv[2], int(sys.argv[3])
# optional 4th arg: comma-separated table subset (e.g. "documents") —
# big-factor probes of one query family shouldn't pay for a 10+ GB
# lineitem they never read
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
os.makedirs(dst, exist_ok=True)


def wanted(name):
    return ONLY is None or name in ONLY


def read(name):
    return pq.read_table(f"{src}/{name}.parquet")


def write(name, table):
    # small row groups so Spark can split the single file: one 6M-row
    # group would make every scan stage a single task regardless of
    # spark.sql.files.maxPartitionBytes
    pq.write_table(table, f"{dst}/{name}.parquet", row_group_size=262144)
    print(f"{name}: {table.num_rows} rows")


def offset_col(t, col, off):
    arr = pa.compute.add(t.column(col), off).cast(t.schema.field(col).type)
    return t.set_column(t.schema.get_field_index(col), t.schema.field(col), arr)


def replicate(name, key_steps):
    """key_steps: {col: step} — per-gen offset = gen * step."""
    t = read(name)
    gens = []
    for g in range(F):
        tg = t
        for col, step in key_steps.items():
            if g > 0:
                tg = offset_col(tg, col, g * step)
        gens.append(tg)
    write(name, pa.concat_tables(gens))


for dim in ("region", "nation"):
    if wanted(dim):
        write(dim, read(dim))

if any(wanted(t) for t in ("customer", "supplier", "part", "orders", "lineitem", "events")):
    CUST = int(pa.compute.max(read("customer").column("c_custkey")).as_py()) + 1
    SUPP = int(pa.compute.max(read("supplier").column("s_suppkey")).as_py()) + 1
    PART = int(pa.compute.max(read("part").column("p_partkey")).as_py()) + 1
    ORD = int(pa.compute.max(read("orders").column("o_orderkey")).as_py()) + 1
    EV = int(pa.compute.max(read("events").column("event_id")).as_py()) + 1
    USR = int(pa.compute.max(read("events").column("user_id")).as_py()) + 1

    if wanted("customer"):
        replicate("customer", {"c_custkey": CUST})
    if wanted("supplier"):
        replicate("supplier", {"s_suppkey": SUPP})
    if wanted("part"):
        replicate("part", {"p_partkey": PART})
    if wanted("orders"):
        replicate("orders", {"o_orderkey": ORD, "o_custkey": CUST})
    if wanted("lineitem"):
        replicate("lineitem", {"l_orderkey": ORD, "l_partkey": PART, "l_suppkey": SUPP})
    if wanted("events"):
        replicate("events", {"event_id": EV, "user_id": USR})

# documents: re-tokenized per generation
if wanted("documents"):
    docs = read("documents")
    DOC = int(pa.compute.max(docs.column("doc_id")).as_py()) + 1
    texts = docs.column("text").to_pylist()
    gens = [docs]
    for g in range(1, F):
        suf = f"g{g}"
        new_texts = [" ".join(w + suf for w in t.split(" ")) for t in texts]
        tg = docs.set_column(docs.schema.get_field_index("doc_id"), docs.schema.field("doc_id"),
                             pa.compute.add(docs.column("doc_id"), g * DOC).cast(pa.int64()))
        tg = tg.set_column(tg.schema.get_field_index("text"), tg.schema.field("text"),
                           pa.array(new_texts, type=pa.string()))
        tg = tg.set_column(tg.schema.get_field_index("n_chars"), tg.schema.field("n_chars"),
                           pa.array([len(t) for t in new_texts], type=pa.int64()))
        gens.append(tg)
    write("documents", pa.concat_tables(gens))

# embeddings: fresh unit gaussians per generation
if wanted("embeddings"):
    emb = read("embeddings")
    VEC = int(pa.compute.max(emb.column("vec_id")).as_py()) + 1
    dims = len(emb.column("embedding")[0])
    n = emb.num_rows
    gens = [emb]
    for g in range(1, F):
        rs = np.random.RandomState(1000 + g)
        v = rs.normal(size=(n, dims))
        v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
        vec_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dims, dims, dtype=np.int32)),
            pa.array(v.reshape(-1)))
        tg = emb.set_column(emb.schema.get_field_index("vec_id"), emb.schema.field("vec_id"),
                            pa.compute.add(emb.column("vec_id"), g * VEC).cast(pa.int64()))
        tg = tg.set_column(tg.schema.get_field_index("embedding"), tg.schema.field("embedding"),
                           vec_col.cast(emb.schema.field("embedding").type))
        gens.append(tg)
    write("embeddings", pa.concat_tables(gens))
print(f"done: {dst} at {F}x {src}")
