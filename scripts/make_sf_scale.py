#!/usr/bin/env python
"""Generate a larger benchmark scale factor by key-shifted replication.

The driver ships sf0.001/sf0.01/sf0.1; the bench needs a non-trivial
scale point (sf1) so micro-batch fixed costs stop dominating and join/
shuffle strategies are actually exercised. Each copy i shifts every
surrogate key by i*OFFSET, so keys stay unique AND referential
integrity is preserved (orders.o_custkey of copy i points at customer
copy i, etc.). Fixed-size dims (region, nation) are copied verbatim,
like TPC-H. Schemas are preserved exactly (pyarrow round-trip, incl.
events' nanosecond timestamps).

Usage: python scripts/make_sf_scale.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 <repo>/testdata_sf1
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: keys shifted per copy; all other columns replicate verbatim.
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_VERBATIM = ["region", "nation"]
OFFSET = 1_000_000_000


def replicate(src: str, dst: str, table: str, factor: int) -> None:
    t = pq.read_table(os.path.join(src, f"{table}.parquet"))
    keys = set(KEY_COLS[table])
    copies = []
    for i in range(factor):
        arrays = []
        for name in t.column_names:
            col = t[name].combine_chunks()
            if name in keys and i > 0:
                col = pc.add(col, pa.scalar(i * OFFSET, type=col.type))
            arrays.append(col)
        copies.append(pa.Table.from_arrays(arrays, schema=t.schema))
    pq.write_table(
        pa.concat_tables(copies), os.path.join(dst, f"{table}.parquet")
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(here, "testdata_sf1")
    os.makedirs(dst, exist_ok=True)
    for tb in COPY_VERBATIM:
        shutil.copy(os.path.join(src, f"{tb}.parquet"), dst)
    for tb in KEY_COLS:
        replicate(src, dst, tb, factor)
        print(f"{tb}: x{factor}")
    # provenance marker (written LAST, so a crashed partial run never
    # looks complete): downstream tools that MUTATE a corpus in place —
    # probe_stream_state._densify rewrites ids and texts — require it,
    # so they can never be pointed at a dataset this script didn't
    # build (r11 advice).
    with open(os.path.join(dst, ".make_sf_scale"), "w") as fh:
        fh.write(f"factor={factor} src={os.path.abspath(src)}\n")


if __name__ == "__main__":
    main()
