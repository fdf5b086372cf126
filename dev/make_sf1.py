#!/usr/bin/env python3
"""Generate a 10x (sf1) tier from the driver's read-only sf0.1 parquet.

Replication rules keep every invariant the gates rely on:
  - small dims (region, nation, supplier, part) stay IDENTICAL — dims grow
    slower than facts, and oracle literals (nation keys 0..24, part keys)
    keep resolving;
  - fact/corpus tables replicate 10x with per-replica key offsets, foreign
    keys remapped with the SAME offsets so every replica is referentially
    closed against the shared dims (replica 0 is bit-identical sf0.1);
  - document text gets per-replica marker tokens (r<k>/s<k>) so replicas
    are near- but not exact-duplicates — exact duplication would grow LSH
    bucket joins quadratically, which no real 10x crawl does;
  - embeddings get one deterministic float32 nudge per replica (coordinate
    k%64 += k*0.001) for the same reason on the vector side;
  - arrow schemas are preserved byte-for-byte (events stays timestamp[ns],
    order/lineitem dates stay timestamp[ms]) — both engines read the same
    bits, so every oracle stays exact by construction.

Usage: python3 dev/make_sf1.py [src_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/graft_sf1
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
K = 10

C_OFF = 1_000_000      # customer keys (sf0.1 max ~15k)
O_OFF = 10_000_000     # order keys (sf0.1 max ~600k)
E_OFF = 100_000_000    # event ids
U_OFF = 1_000_000      # user ids
D_OFF = 1_000_000      # doc ids
V_OFF = 1_000_000      # vec ids


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet", row_group_size=1 << 17)
    print(f"{name}: {table.num_rows} rows")


def shifted(table, offsets, k):
    """Replica k: add k*off to each named int column, schema unchanged."""
    cols = []
    for i, field in enumerate(table.schema):
        col = table.column(i)
        if field.name in offsets and k > 0:
            col = pa.chunked_array(
                [pa.compute.add(c, offsets[field.name] * k) for c in col.chunks])
        cols.append(col)
    return pa.table(cols, schema=table.schema)


def replicate(name, offsets, mutate=None):
    base = read(name)
    parts = []
    for k in range(K):
        t = shifted(base, offsets, k)
        if mutate is not None and k > 0:
            t = mutate(t, k)
        parts.append(t)
    write(name, pa.concat_tables(parts))


def mutate_documents(t, k):
    # marker tokens keep text ASCII and non-empty; replicas become
    # near-duplicates (shingle sets shift), not exact ones
    text = pa.compute.binary_join_element_wise(
        f"r{k}", t.column("text"), f"s{k}", " ")
    cols = [text if f.name == "text" else t.column(i)
            for i, f in enumerate(t.schema)]
    return pa.table(cols, schema=t.schema)


def mutate_embeddings(t, k):
    emb = t.column("embedding").combine_chunks()
    values = emb.values.to_numpy(zero_copy_only=False).copy().astype(np.float32)
    dim = 64
    # one coordinate per replica nudged deterministically (float32 math)
    values[k % dim::dim] += np.float32(k * 0.001)
    fixed = pa.ListArray.from_arrays(
        emb.offsets, pa.array(values, type=pa.float32()))
    cols = [pa.chunked_array([fixed]) if f.name == "embedding" else t.column(i)
            for i, f in enumerate(t.schema)]
    return pa.table(cols, schema=t.schema)


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    for dim in ["region", "nation", "supplier", "part"]:
        write(dim, read(dim))
    replicate("customer", {"c_custkey": C_OFF})
    replicate("orders", {"o_orderkey": O_OFF, "o_custkey": C_OFF})
    replicate("lineitem", {"l_orderkey": O_OFF})
    replicate("events", {"event_id": E_OFF, "user_id": U_OFF})
    replicate("documents", {"doc_id": D_OFF}, mutate_documents)
    replicate("embeddings", {"vec_id": V_OFF}, mutate_embeddings)


if __name__ == "__main__":
    main()
