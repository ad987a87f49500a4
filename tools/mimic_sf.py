"""Build a larger-scale mimic of the driver's testdata for LOCAL
measurement only (never committed as data, never read by gates).

The driver's sf1.0 tables are single parquet files with ~10^6-row row
groups; this reproduces that shape by upsampling an existing sf dir
K-fold with primary-key remapping (id' = id + copy * stride) so 1:1
joins stay 1:1 and pmod-derived synthetic fields keep their
distributions. Non-key columns are repeated verbatim — fine for
walls, not for new-content semantics.

argv: src_sf_dir dst_dir K
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column remapped per copy; tables absent here are copied verbatim
KEYS = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(f"{src}/{name}.parquet")
        key = KEYS.get(name)
        if key is None or k == 1:
            out = t
        else:
            stride = pc.max(t[key]).as_py() + 1
            parts = []
            for i in range(k):
                if i == 0:
                    parts.append(t)
                else:
                    shifted = pc.add(t[key], i * stride)
                    cols = [
                        shifted if c == key else t[c] for c in t.column_names
                    ]
                    parts.append(pa.table(cols, names=t.column_names))
            out = pa.concat_tables(parts)
        pq.write_table(
            out,
            f"{dst}/{name}.parquet",
            row_group_size=1_000_000,
            compression="snappy",
        )
        print(name, out.num_rows)


if __name__ == "__main__":
    main()
