#!/usr/bin/env python3
"""Materialize an N-x scaled copy of a fixture dir for the large-scale soak.

Usage: python3 tools/make_scaled_sf.py SRC_DIR DST_DIR COPIES

Scaling contract (mirrors the in-repo scalers the ScalingSpec uses):
- fact/dim keys are offset per copy with FK consistency (customer/orders/
  lineitem/part/supplier key families move together), nations/regions stay
  shared (10x more customers across the same 25 nations);
- documents are token-salted per copy (r{i}x prefix, the Dedup.saltedCopies
  transform) so true-dup mass grows linearly, not quadratically;
- embeddings are rotated per copy (orthogonal, the Similarity.rotatedCopies
  transform) preserving each copy's internal cosine structure;
- events keep their TIMESTAMP(NANOS) physical type (written via pyarrow;
  DuckDB would silently downcast to micros and break graft.core.Tables).

Copy 0 is the unmodified base everywhere.
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

CMAX, OMAX, PMAX, SMAX, EMAX, UMAX, DMAX, VMAX = (
    10**7, 10**8, 10**7, 10**6, 10**9, 10**7, 10**7, 10**7)


def main(src: str, dst: str, copies: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def write(table: str, copy_sql) -> None:
        parts = " UNION ALL ".join(copy_sql(i) for i in range(copies))
        con.sql(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):  # shared dims, single copy
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: shared")

    write("customer", lambda i: f"""
        SELECT c_custkey + {i * CMAX} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM '{src}/customer.parquet'""")
    write("supplier", lambda i: f"""
        SELECT s_suppkey + {i * SMAX} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM '{src}/supplier.parquet'""")
    write("part", lambda i: f"""
        SELECT p_partkey + {i * PMAX} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice FROM '{src}/part.parquet'""")
    write("orders", lambda i: f"""
        SELECT o_orderkey + {i * OMAX} AS o_orderkey,
               o_custkey + {i * CMAX} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'""")
    write("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * OMAX} AS l_orderkey,
               l_partkey + {i * PMAX} AS l_partkey,
               l_suppkey + {i * SMAX} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""")
    bs = "\\"  # f-string expressions cannot contain a literal backslash
    write("documents", lambda i: f"""
        SELECT doc_id + {i * DMAX} AS doc_id,
               {"text" if i == 0 else f"regexp_replace(text, '([A-Za-z0-9]+)', 'r{i}x{bs}1', 'g')"} AS text,
               lang, source, n_chars FROM '{src}/documents.parquet'""")
    def emb_expr(i: int) -> str:
        # The fixture dim is 64, so there are only 64 distinct circular
        # shifts — beyond copy 63 a plain rotation would REPEAT copy
        # (i - 64) exactly and the cross-copy duplicate mass would stop
        # being linear. Negating the second lap (another orthogonal
        # transform: internal cosine structure preserved, cross-lap
        # cosines flipped negative, i.e. below any positive threshold)
        # keeps every copy distinct up to 128 copies.
        rot = i % 64
        e = "embedding" if rot == 0 else f"embedding[{rot + 1}:] || embedding[:{rot}]"
        if i >= 64:
            e = f"list_transform({e}, x -> -x)"
        return f"CAST({e} AS FLOAT[])"

    write("embeddings", lambda i: f"""
        SELECT vec_id + {i * VMAX} AS vec_id,
               {emb_expr(i)} AS embedding,
               label FROM '{src}/embeddings.parquet'""")

    # events via pyarrow: preserve timestamp[ns] (Tables.load contract)
    base = pq.read_table(f"{src}/events.parquet")
    chunks = []
    for i in range(copies):
        t = base
        t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pc.add(t.column("event_id"), i * EMAX))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(t.column("user_id"), i * UMAX))
        chunks.append(t)
    allev = pa.concat_tables(chunks)
    pq.write_table(allev, f"{dst}/events.parquet")
    print(f"events: {allev.num_rows} rows ({allev.schema.field('ts').type})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
