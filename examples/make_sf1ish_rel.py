"""Generate a ~10x relational fixture for scale-stepping queries that
read the TPC-H-ish tables (orders / lineitem / customer) rather than
documents/embeddings (those use examples/make_sf1ish.py).

Writes $SF1ISH_REL_DIR (default /tmp/sf1ish_rel): 10 key-offset replicas
of customer, orders, lineitem and part; every other sf0.1 table is
copied (supplier joins fan out 10x — same suppliers, 10x flow; the
derived partsupp scales with part automatically, and the part-key
stride is rounded up to a multiple of the supplier count so each
replica's parts map onto the SAME supplier set — structural identity
holds for partsupp-keyed joins too, not just direct FK joins).

Why key-offset replication is an honest 10x:
- replica k adds k * (max_key + 1) to c_custkey / o_orderkey /
  p_partkey (and to o_custkey / l_orderkey / l_partkey / ps_partkey
  consistently — FK owners replicate with their referents, so no
  replica dangles), so each replica is
  a disjoint, structurally identical copy — join fan-outs, group sizes
  and per-order basket shapes are preserved exactly, never inflated.
- attributes (dates, prices, priorities, balances, segments) are left
  unchanged, so calendar-bounded frames (daily series) keep the SAME
  row count while their inputs grow 10x — exactly the bounded-frame
  contract the fold/window queries claim — and scale-free statistics
  (t-closeness EMD: every count scales by 10, the distance is a ratio)
  must come out bit-identical to the 1x run, which doubles as an
  end-to-end invariance oracle at 10x.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1ISH_REL_DIR", "/tmp/sf1ish_rel")
# 10 = the standard step; SF1ISH_REL_REPLICAS=100 builds the 100x point
REPLICAS = int(os.environ.get("SF1ISH_REL_REPLICAS", "10"))

# table -> columns that must shift per replica (column -> offset source).
# Every shifted foreign key's OWNER table is replicated with the same
# offset, so no replica dangles: lineitem.l_partkey joins its replica's
# part/partsupp copy with the exact 1x fan-out. l_suppkey / ps_suppkey
# stay unshifted (supplier is NOT replicated — supplier joins fan out
# 10x per supplier, which is the honest reading of "same suppliers,
# 10x the order flow").
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    # partsupp has no parquet — it is DERIVED from part x supplier
    # (queries/tpch_partsupp.py::PARTSUPP_SQL), so replicating part
    # scales the derived partsupp consistently for free
    "part": {"p_partkey": "p_partkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": None,  # supplier table is NOT replicated: keep as-is
    },
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name.removesuffix(".parquet") not in KEYED:
            shutil.copy(os.path.join(SRC, name), os.path.join(DST, name))

    # offsets come from the MAX of the column that owns each key space
    tables = {t: pq.read_table(os.path.join(SRC, f"{t}.parquet")) for t in KEYED}
    # The derived partsupp assigns ps_suppkey = (p_partkey + i) % |S|
    # (queries/tpch_partsupp.py::PARTSUPP_SQL), so the part-key stride
    # must be ≡ 0 (mod |S|) or each replica's parts land on a DIFFERENT
    # supplier set and Q9/Q20's composite (ps_partkey, ps_suppkey) =
    # (l_partkey, l_suppkey) join matches a different lineitem subset
    # per replica (ADVICE r9) — round the stride up to a multiple of
    # the (unreplicated) supplier count. ps_availqty/ps_supplycost
    # still vary per replica (their moduli 9999/99900 are attribute
    # mixers, not join keys — per-part variation exists at 1x too).
    scount = pq.read_metadata(os.path.join(SRC, "supplier.parquet")).num_rows
    part_stride = (
        max(
            pc.max(tables["part"]["p_partkey"]).as_py(),
            pc.max(tables["lineitem"]["l_partkey"]).as_py(),
        )
        + 1
    )
    part_stride = -(-part_stride // scount) * scount
    own_max = {
        "c_custkey": pc.max(tables["customer"]["c_custkey"]).as_py(),
        "o_orderkey": pc.max(tables["orders"]["o_orderkey"]).as_py(),
        # p_partkey owns the part-key space: lineitem can reference a
        # strict subset of part, so the part-side max is the safe base;
        # stored as stride-1 so `off = k * (own_max + 1)` below stays
        # uniform across key spaces
        "p_partkey": part_stride - 1,
    }
    for t, cols in KEYED.items():
        src = tables[t]
        # stream replica-by-replica: at 100x the concatenated lineitem
        # (600M rows) would not fit in one in-memory Arrow table
        out_path = os.path.join(DST, f"{t}.parquet")
        writer = pq.ParquetWriter(out_path, src.schema)
        total = 0
        for k in range(REPLICAS):
            arrays = []
            for field in src.schema:
                col = src[field.name]
                owner = cols.get(field.name, "__not_keyed__")
                if owner is None or owner == "__not_keyed__":
                    arrays.append(col)
                else:
                    off = k * (own_max[owner] + 1)
                    arrays.append(
                        pc.add(col, pa.scalar(off, type=field.type)).cast(
                            field.type
                        )
                    )
            part = pa.table(arrays, schema=src.schema)
            writer.write_table(part)
            total += part.num_rows
        writer.close()
        print(t, src.num_rows, "->", total)


if __name__ == "__main__":
    main()
