"""Python UDTF surface (Spark 3.5+) — ↔ reference set-returning
functions in FROM (recurring tuples, README.md:1521-1535)."""

import pytest


def test_python_udtf_explode_ngrams(spark):
    try:
        from pyspark.sql.functions import udtf
    except ImportError:
        pytest.skip("pyspark.sql.functions.udtf unavailable")

    from pyspark.sql.functions import lit

    @udtf(returnType="ngram: string, pos: int")
    class BigramUDTF:
        def eval(self, text: str):
            toks = text.split()
            for i in range(len(toks) - 1):
                yield f"{toks[i]} {toks[i+1]}", i

    spark.udtf.register("bigrams", BigramUDTF)
    rows = spark.sql(
        "SELECT * FROM bigrams('a b c d')"
    ).collect()
    assert [(r.ngram, r.pos) for r in rows] == [
        ("a b", 0),
        ("b c", 1),
        ("c d", 2),
    ]

    # lateral application over a table
    from tests.conftest import SF_SMALL

    spark.read.parquet(f"{SF_SMALL}/documents.parquet").createOrReplaceTempView(
        "docs_udtf"
    )
    n = spark.sql(
        """
        SELECT count(*) AS n
        FROM docs_udtf, LATERAL bigrams(text) b
        WHERE doc_id < 10
        """
    ).collect()[0].n
    assert n > 0
