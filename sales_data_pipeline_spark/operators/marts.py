"""Mart queries: customer monthly spend + sales-team incentive.

The reference computes both marts as window-sum + distinct
(reference: customer_mart_sql_tranform_write.py:10-27,
sales_mart_sql_transformation_file.py:11-39). The engine's default is
the one-shuffle groupBy rewrite (identical results because every kept
column is functionally dependent on the grouping keys — asserted by
tests); ``strict_compat=True`` replays the window+distinct literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sales_data_pipeline_spark.functions.scalars import full_name, money, month_bucket

_MONEY_OUT = "decimal(10,2)"  # mart DDL type (table_scripts.sql:154,165-166)


def customer_monthly_mart(enriched: DataFrame, strict_compat: bool = False) -> DataFrame:
    """One row per (customer_id, sales_month): full_name, address,
    phone_number, total_sales (reference: customer_mart...py:10-27)."""
    base = enriched.select(
        "customer_id",
        full_name("first_name", "last_name"),
        "address",
        "phone_number",
        month_bucket("sales_date", "sales_date_month"),
        money("total_cost").alias("_cost"),
    )
    if strict_compat:
        w = Window.partitionBy("customer_id", "sales_date_month")
        return (
            base.withColumn("total_sales", F.sum("_cost").over(w).cast(_MONEY_OUT))
            .drop("_cost")
            .distinct()
        )
    return (
        base.groupBy("customer_id", "full_name", "address", "phone_number", "sales_date_month")
        .agg(F.sum("_cost").cast(_MONEY_OUT).alias("total_sales"))
    )


def sales_team_mart(enriched: DataFrame, strict_compat: bool = False) -> DataFrame:
    """One row per (store_id, sales_person_id, sales_month) with rank and
    1%-of-total incentive for rank 1 within (store_id, sales_month) —
    ties all paid (rank(), not row_number: SURVEY §2j.4). Reference:
    sales_mart_sql_transformation_file.py:11-39."""
    base = enriched.select(
        "store_id",
        "sales_person_id",
        full_name("sales_person_first_name", "sales_person_last_name"),
        month_bucket("sales_date", "sales_month"),
        money("total_cost").alias("_cost"),
    )
    if strict_compat:
        w = Window.partitionBy("store_id", "sales_person_id", "sales_month")
        totals = (
            base.withColumn("total_sales", F.sum("_cost").over(w).cast(_MONEY_OUT))
            .drop("_cost")
            .distinct()
        )
    else:
        totals = base.groupBy(
            "store_id", "sales_person_id", "full_name", "sales_month"
        ).agg(F.sum("_cost").cast(_MONEY_OUT).alias("total_sales"))
    rank_w = Window.partitionBy("store_id", "sales_month").orderBy(
        F.col("total_sales").desc()
    )
    # decimal×decimal keeps the 1% exact: total_sales(10,2) × 0.01(3,2)
    # → (.,4) with no binary-float detour, so the final HALF_UP cast
    # rounds the true value — a double multiply diverges at .xx5 ties
    import decimal as _decimal

    one_pct = F.lit(_decimal.Decimal("0.01"))
    return (
        totals.withColumn("rnk", F.rank().over(rank_w))
        .withColumn(
            "incentive",
            F.when(
                F.col("rnk") == 1, (F.col("total_sales") * one_pct).cast(_MONEY_OUT)
            ).otherwise(F.lit(0).cast(_MONEY_OUT)),
        )
        .drop("rnk")
    )
