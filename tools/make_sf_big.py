#!/usr/bin/env python3
"""Synthesize a larger measurement dataset (~sfN) by replicating
/root/testdata/sf0.1 with shifted keys — for round-9 perf experiments
only (the driver's own large-SF data comes from its generator; this
local stand-in has the same row counts/shapes so plan behaviour and
timings are representative).  Never used by bench.py or any query.

Usage: python tools/make_sf_big.py /root/sfbig [replicas=10]
"""

import os
import sys

import duckdb


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")

    def gen(table, sql):
        dst = os.path.join(out, table + ".parquet")
        if os.path.exists(dst):
            print("skip", dst)
            return
        parts = " UNION ALL ".join(
            sql.format(r=r, src=os.path.join(src, table + ".parquet"))
            for r in range(reps))
        con.execute(
            "COPY (%s) TO '%s' (FORMAT PARQUET, COMPRESSION ZSTD)"
            % (parts, dst))
        print("wrote", dst)

    # key-shifted replicas; text/embedding perturbed per replica so
    # dedup/LSH group sizes stay realistic instead of 10x clones
    gen("lineitem",
        "SELECT l_orderkey + {r}*10000000 AS l_orderkey, l_partkey, "
        "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        "FROM '{src}'")
    gen("orders",
        "SELECT o_orderkey + {r}*10000000 AS o_orderkey, "
        "o_custkey + {r}*1000000 AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority FROM '{src}'")
    gen("customer",
        "SELECT c_custkey + {r}*1000000 AS c_custkey, "
        "c_name || '-r{r}' AS c_name, c_nationkey, c_acctbal, "
        "c_mktsegment FROM '{src}'")
    gen("events",
        "SELECT event_id + {r}*100000000 AS event_id, ts, "
        "user_id + {r}*1000000 AS user_id, event_type, value, props "
        "FROM '{src}'")
    gen("documents",
        "SELECT doc_id + {r}*100000000 AS doc_id, "
        "CASE WHEN {r} = 0 THEN text ELSE text || ' r{r}' END AS text, "
        "lang, source, n_chars FROM '{src}'")
    gen("embeddings",
        "SELECT vec_id + {r}*1000000 AS vec_id, "
        "list_transform(embedding, x -> CAST(x + {r} * 1e-4 AS FLOAT)) "
        "AS embedding, label FROM '{src}'")
    for small in ("nation", "region", "supplier", "part"):
        dst = os.path.join(out, small + ".parquet")
        if not os.path.exists(dst):
            con.execute("COPY (SELECT * FROM '%s') TO '%s' "
                        "(FORMAT PARQUET)" %
                        (os.path.join(src, small + ".parquet"), dst))
            print("wrote", dst)


if __name__ == "__main__":
    main()
