"""Materialize a salted 10x replica of an sf dir so the FROZEN bench.py
can be exercised at the driver's escalation scale (sf1.0-equivalent row
counts) even when only sf0.1 is mounted locally.

Salting follows tools/bench_r06_scale.py (slices stay structurally
realistic instead of collapsing into identical copies):
- documents: slice r offsets doc_id by r*10^7 and suffixes every token
  with 'x{r}' (slices share no tokens; per-slice dup structure identical);
- embeddings: slice r offsets vec_id by r*10^6 and shifts every dimension
  by 0.01*r (direction changes, bucket structure stays realistic);
- facts (lineitem/orders/customer): keys offset per slice consistently
  (orderkey r*10^7, custkey r*10^6) so every join keeps its semantics;
  dims (region/nation/supplier/part) are NOT scaled — the star shape;
- events: event_id offset r*10^7, user_id offset r*10^5 (10x the user
  population, same per-user activity).

This is a PERF harness, not an oracle fixture: thresholds derived from
MAX(doc_id) land differently than a true sf1.0 would, which changes
nothing about the measured operator shapes.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, functions as F

from chapterbridge_ocr_worker_spark.conf import get_spark


def _union_slices(mk, factor: int) -> DataFrame:
    out = mk(0)
    for r in range(1, factor):
        out = out.unionByName(mk(r))
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscaled/sf1.0s"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-scaled-sf", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    def read(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    def write(df, name):
        # the driver's testdata tables are single parquet FILES (the
        # streaming queries symlink them as files), so flatten the write:
        # one part file, moved to {dst}/{name}.parquet as a plain file
        import glob
        import shutil

        tmp = f"{dst}/_tmp_{name}"
        # bound row groups to 16 MB: a coalesce(1) write otherwise lands
        # one giant row group, and parquet splits are row-group-granular —
        # a single-task scan would misrepresent the driver's file layout
        df.coalesce(1).write.option(
            "parquet.block.size", 16 * 1024 * 1024
        ).mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        final = f"{dst}/{name}.parquet"
        if os.path.isdir(final):
            shutil.rmtree(final)
        shutil.move(part, final)
        shutil.rmtree(tmp, ignore_errors=True)

    docs = read("documents")
    write(
        _union_slices(
            lambda r: docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{r}").alias("text"),
                "lang",
                "source",
                F.col("n_chars"),
            ),
            factor,
        ),
        "documents",
    )

    emb = read("embeddings")
    write(
        _union_slices(
            lambda r: emb.select(
                (F.col("vec_id") + F.lit(r * 1_000_000)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.lit(0.01 * r).cast("float")
                ).alias("embedding"),
                "label",
            ),
            factor,
        ),
        "embeddings",
    )

    li = read("lineitem")
    write(
        _union_slices(
            lambda r: li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(r * 10_000_000)
            ),
            factor,
        ),
        "lineitem",
    )

    orders = read("orders")
    write(
        _union_slices(
            lambda r: orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(r * 10_000_000)
            ).withColumn("o_custkey", F.col("o_custkey") + F.lit(r * 1_000_000)),
            factor,
        ),
        "orders",
    )

    cust = read("customer")
    write(
        _union_slices(
            lambda r: cust.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(r * 1_000_000)
            ),
            factor,
        ),
        "customer",
    )

    ev = read("events")
    write(
        _union_slices(
            lambda r: ev.withColumn(
                "event_id", F.col("event_id") + F.lit(r * 10_000_000)
            ).withColumn("user_id", F.col("user_id") + F.lit(r * 100_000)),
            factor,
        ),
        "events",
    )

    for name in ("region", "nation", "supplier", "part"):
        write(read(name), name)

    print(f"scaled x{factor}: {src} -> {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
