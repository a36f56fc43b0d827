"""Engine façade: register + sql + table access."""

from sparkflow_spark.engine import Engine


def test_engine_facade(spark, sf_dir):
    eng = Engine(spark).register(sf_dir)
    assert eng.table("region").count() == 5
    row = eng.sql("SELECT COUNT(*) AS c FROM lineitem").first()
    assert row["c"] > 0
    joined = eng.sql(
        "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey"
    )
    assert joined.count() == 25
