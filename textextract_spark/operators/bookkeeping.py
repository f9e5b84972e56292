"""The reference's relational bookkeeping model rebuilt as set-based Spark
(SURVEY.md §3.2 quota/usage accounting path) over deterministic synthetic
fixtures (FIXTURES.md §5 — users / subscription_plans / subscriptions /
usage_stats mirroring backend/database/migrations/create_tables.sql).

The reference walks this path per request with N+1 lookups and client-side
sums (/root/reference/backend/database/models.py:247-308); here the WHOLE
path — active subscription (W3) -> plan join (J1) -> anniversary billing
window (F10, models.py:183-224) -> period usage sum (P4+A1) -> quota CASE
(P5) — is one DataFrame statement evaluated for every user at once.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

# the three seed plans of create_tables.sql:124-129
PLANS = [
    (1, "free", 0.00, 20, 2),
    (2, "basic", 4.99, 200, 5),
    (3, "advance", 9.99, 500, 10),
]


def make_bookkeeping(spark: SparkSession, n_users: int = 100,
                     seed: int = 7, today: str = "2025-06-15"):
    """Deterministic users/plans/subscriptions/usage_stats DataFrames."""
    rng = random.Random(seed)
    today_d = dt.date.fromisoformat(today)

    users = [(u, f"user{u}@example.com",
              rng.choice(["free", "basic", "advance"]),
              rng.randint(0, 30)) for u in range(n_users)]
    users_df = spark.createDataFrame(
        users, "user_id INT, email STRING, plan_type STRING, "
               "credit_requests INT")

    plans_df = spark.createDataFrame(
        PLANS, "plan_id INT, name STRING, price DOUBLE, "
               "max_requests_per_month INT, device_limit INT")

    subs = []
    sid = 0
    for u in range(n_users):
        n_subs = rng.randint(0, 2)
        for k in range(n_subs):
            start = today_d - dt.timedelta(days=rng.randint(10, 400))
            status = rng.choice(["active", "active", "cancelled",
                                 "free_tier"])
            end = (start + dt.timedelta(days=rng.choice([30, 90, 365]))
                   if status != "active" or rng.random() < 0.3 else None)
            subs.append((sid, u, rng.randint(1, 3), status,
                         dt.datetime.combine(start, dt.time()),
                         dt.datetime.combine(end, dt.time()) if end else None))
            sid += 1
    subs_df = spark.createDataFrame(
        subs, "sub_id INT, user_id INT, plan_id INT, status STRING, "
              "start_date TIMESTAMP, end_date TIMESTAMP")

    usage = []
    for u in range(n_users):
        for d in range(90):
            day = today_d - dt.timedelta(days=d)
            if rng.random() < 0.6:
                usage.append((u, dt.datetime.combine(day, dt.time()),
                              rng.randint(1, 9)))
    usage_df = spark.createDataFrame(
        usage, "user_id INT, date TIMESTAMP, requests_count INT")
    return users_df, plans_df, subs_df, usage_df


def anniversary_window(subs: DataFrame, today_col) -> DataFrame:
    """F10 (models.py:183-224): the current billing period is the monthly
    window anchored on the subscription start day-of-month.

    months_elapsed = floor(months_between(today, start)); period_start =
    start + months_elapsed months; period_end = period_start + 1 month.
    add_months clamps day-31 anchors to month length exactly like the
    reference's manual day arithmetic.
    """
    months = F.floor(F.months_between(today_col, F.col("start_date")))
    return (subs.withColumn("period_start",
                            F.add_months(F.col("start_date"), months))
                .withColumn("period_end",
                            F.add_months(F.col("start_date"), months + 1)))


def can_make_request(users: DataFrame, plans: DataFrame, subs: DataFrame,
                     usage: DataFrame, today: str) -> DataFrame:
    """The full §3.2 path for every user in one statement.

    Semantics from models.py:247-308: pick the latest active subscription
    (W3); expired (end_date < now) or cancelled -> fall back to credits;
    otherwise compare this billing period's usage sum against the plan's
    monthly cap; on cap overflow fall back to credit_requests > 0.
    """
    today_col = F.to_timestamp(F.lit(today))

    w = Window.partitionBy("user_id").orderBy(F.desc("start_date"),
                                              F.desc("sub_id"))
    latest_sub = (subs.filter(F.col("status") == "active")
                  .withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))
    sub_plan = (latest_sub.join(F.broadcast(plans), "plan_id", "left")
                .transform(lambda d: anniversary_window(d, today_col)))

    period_usage = (usage.join(
        sub_plan.select("user_id", "period_start", "period_end"),
        "user_id")
        .filter((F.col("date") >= F.col("period_start"))
                & (F.col("date") < F.col("period_end")))
        .groupBy("user_id")
        .agg(F.sum("requests_count").alias("period_requests")))

    expired = (F.col("end_date").isNotNull()
               & (F.col("end_date") < today_col))
    return (users.join(sub_plan.select(
                "user_id", "name", "max_requests_per_month", "end_date",
                "period_start", "period_end"), "user_id", "left")
            .join(period_usage, "user_id", "left")
            .withColumn("period_requests",
                        F.coalesce(F.col("period_requests"), F.lit(0)))
            .withColumn(
                "decision",
                F.when(F.col("name").isNull() | expired,
                       F.when(F.col("credit_requests") > 0,
                              F.lit("allow:credit"))
                        .otherwise(F.lit("deny:no_subscription")))
                 .when(F.col("period_requests")
                       < F.col("max_requests_per_month"),
                       F.lit("allow:quota"))
                 .when(F.col("credit_requests") > 0, F.lit("allow:credit"))
                 .otherwise(F.lit("deny:quota_exhausted")))
            .select("user_id", "plan_type", "credit_requests",
                    "period_requests", "decision")
            .orderBy("user_id"))
