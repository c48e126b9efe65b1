"""Builder basics: load, join, aggregate, order — clauses in any order.

Run: python examples/01_builder_basics.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from elusion_spark import CustomDataFrame, get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()

orders = CustomDataFrame.new(f"{sf}/orders.parquet", "o", spark)
customer = CustomDataFrame.new(f"{sf}/customer.parquet", "c", spark).broadcast()

result = (
    orders
    .order_by(["total_price"], ["DESC"])        # order of clauses is free
    .agg(["CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,9))) AS DOUBLE) AS total_price",
          "COUNT(*) AS n_orders"])
    .join(customer, ["o.o_custkey = c.c_custkey"], "INNER")
    .select(["c.c_mktsegment"])
    .group_by_all()
    .having("COUNT(*) > 10")
    .elusion("by_segment")
)
result.display()
result.explain()  # broadcast join + partial/final agg, filter pushed down
