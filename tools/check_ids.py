"""Ad-hoc: run driver-style oracle comparison for a subset of ids.

Usage: python tools/check_ids.py id1 id2 ...   (env SPARK_GRAFT_TEST_SF_DIR)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from data_ingestor_and_features_creator_spark import plans
from data_ingestor_and_features_creator_spark.session import get_spark
from tests.oracle_compare import assert_same_result, duck_fetch

plans.load_all()
sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark()
duck = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

fail = 0
for name in sys.argv[1:]:
    fn = plans.QUERIES[name]
    df = fn(spark, sf_dir)
    if name not in plans.ORACLES:
        n = df.count()
        print(f"{name}: rows-only, {n} rows, schema={df.columns}")
        continue
    spark_pdf = df.toPandas()
    duck_pdf = duck_fetch(duck, plans.ORACLES[name])
    try:
        assert_same_result(
            name, list(spark_pdf.columns),
            list(spark_pdf.itertuples(index=False, name=None)),
            list(duck_pdf.columns),
            list(duck_pdf.itertuples(index=False, name=None)))
        print(f"{name}: OK ({len(spark_pdf)} rows)")
    except AssertionError as e:
        fail += 1
        print(f"{name}: FAIL — {str(e)[:500]}")
sys.exit(1 if fail else 0)
