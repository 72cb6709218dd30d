#!/usr/bin/env python3
"""Deterministic scale-up of a driver-generated testdata dir.

Usage: python3 tools/gen_scale.py <srcSfDir> <outDir> <copies>

Produces <copies>x the source volume by unioning key-shifted copies of
every table (copy 0 is the identity). All parquet physical types are
preserved exactly as pyarrow reads them -- including events.ts
TIMESTAMP(NANOS), which a Spark rewrite would downgrade -- so every
reader (Spark batch, Spark streaming schema, DuckDB oracle views) sees
the same types at every scale factor.

Key shifts keep referential integrity: each copy's orders reference that
copy's customers, lineitems that copy's orders/parts/suppliers. nation
and region are TPC-H fixed tables and are not scaled. documents get a
per-copy text prefix (cross-copy texts remain near-duplicates -- at
scale the dedup family should see real duplicate mass); embeddings get a
tiny deterministic first-component perturbation so cross-copy vectors
are near- but not exact-identical (no top-k ties).
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

OFF = 100_000_000  # key offset per copy; divisible by every modulus the
                   # gated queries use (20, 1000, ...), far under 2^63/2

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
NO_SCALE = ["nation", "region"]


def shifted(table: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return table
    t = table
    for c in SHIFT_COLS[name]:
        idx = t.schema.get_field_index(c)
        t = t.set_column(idx, t.schema.field(idx),
                         pc.add(t.column(c), i * OFF))
    if name == "documents":
        idx = t.schema.get_field_index("text")
        t = t.set_column(idx, t.schema.field(idx),
                         pc.binary_join_element_wise(f"c{i} ", t.column("text"), ""))
    if name == "embeddings":
        col = t.column("embedding").combine_chunks()
        # perturb ONLY the first component of each vector: list flatten ->
        # add i*1e-3 at list offsets positions
        arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        values = arr.values.to_numpy(zero_copy_only=False).copy()
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        values[offsets[:-1]] += i * 1e-3
        new = pa.ListArray.from_arrays(arr.offsets,
                                       pa.array(values, type=arr.values.type))
        idx = t.schema.get_field_index("embedding")
        t = t.set_column(idx, t.schema.field(idx), new)
    return t


def main():
    src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(out, exist_ok=True)
    for name in NO_SCALE:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (not scaled)")
    for name in SHIFT_COLS:
        t = pq.read_table(f"{src}/{name}.parquet")
        big = pa.concat_tables([shifted(t, name, i) for i in range(copies)])
        # preserve the source's physical schema (e.g. ts TIMESTAMP(NANOS))
        pq.write_table(big.cast(t.schema), f"{out}/{name}.parquet",
                       coerce_timestamps=None)
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()
