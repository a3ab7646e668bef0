

def test_dedup_doc_lines_map_only_and_totality(spark):
    from pyspark.sql import functions as F

    from hdk_spark.operators.text import dedup_doc_lines

    df = spark.createDataFrame(
        [(0, "a\nb\na\nc\nb"), (1, None), (2, ""), (3, "x\nx\nx")],
        "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in dedup_doc_lines(df).collect()}
    assert got[0]["text"] == "a\nb\nc" and got[0]["n_removed"] == 2
    assert got[1]["text"] is None and got[1]["n_lines"] == 0
    assert got[2]["text"] == "" and got[2]["n_removed"] == 0
    assert got[3]["text"] == "x" and got[3]["n_removed"] == 2
    p = dedup_doc_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Generate" not in p  # map-only
