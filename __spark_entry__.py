"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()``   — one entry per implemented operator (SURVEY.md §2 plus
                  the training-data pipeline ops), each running the REAL
                  nutch_spark operator over inputs derived from the
                  driver's parquet tables.
``oracle_sql()``— DuckDB-runnable ANSI SQL twins (see nutch_spark/gate.py
                  for the derivation strategy and float discipline).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: generate a fetchlist from a frontier derived from the
    sf0.001 tables — due-filter, per-host cap, topN window selection
    (the north star's 'window-ranked DataFrame selection')."""
    from nutch_spark.gate import q_generate

    return q_generate(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nutch_spark.gate import CRAWL_QUERIES

    regs: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in CRAWL_QUERIES.items()
    }
    try:
        from nutch_spark.pipeline.gate import PIPELINE_QUERIES

        regs.update({name: fn for name, (fn, _sql) in PIPELINE_QUERIES.items()})
    except ImportError:
        pass
    return regs


def oracle_sql() -> dict[str, str]:
    from nutch_spark.gate import CRAWL_QUERIES

    out = {
        name: sql for name, (_fn, sql) in CRAWL_QUERIES.items() if sql
    }
    try:
        from nutch_spark.pipeline.gate import PIPELINE_QUERIES

        out.update(
            {name: sql for name, (_fn, sql) in PIPELINE_QUERIES.items() if sql}
        )
    except ImportError:
        pass
    return out
