"""§3.2 quota path vs a row-at-a-time Python oracle that mimics the
reference's per-request logic (models.py:247-308) — the set-based Spark
statement must agree user-by-user."""

import datetime as dt

import pytest

from textextract_spark.operators.bookkeeping import (
    can_make_request,
    make_bookkeeping,
)

TODAY = "2025-06-15"


@pytest.fixture(scope="module")
def tables(spark):
    users, plans, subs, usage = make_bookkeeping(spark, n_users=60, seed=7,
                                                 today=TODAY)
    return (users, plans, subs, usage,
            [r.asDict() for r in users.collect()],
            {r.plan_id: r.asDict() for r in plans.collect()},
            [r.asDict() for r in subs.collect()],
            [r.asDict() for r in usage.collect()])


def _add_months(d: dt.datetime, n: int) -> dt.datetime:
    # clamp-to-month-length semantics (Spark add_months / reference F10)
    month = d.month - 1 + n
    year = d.year + month // 12
    month = month % 12 + 1
    last = [31, 29 if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
            else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][month - 1]
    return d.replace(year=year, month=month, day=min(d.day, last))


def _oracle(user, plans, subs, usage, today):
    """Row-at-a-time reimplementation of models.py:247-308."""
    mine = sorted((s for s in subs
                   if s["user_id"] == user["user_id"]
                   and s["status"] == "active"),
                  key=lambda s: (s["start_date"], s["sub_id"]),
                  reverse=True)
    sub = mine[0] if mine else None
    credit_ok = user["credit_requests"] > 0
    if sub is None or (sub["end_date"] is not None
                       and sub["end_date"] < today):
        return "allow:credit" if credit_ok else "deny:no_subscription"
    plan = plans[sub["plan_id"]]
    # anniversary window
    months = 0
    while _add_months(sub["start_date"], months + 1) <= today:
        months += 1
    # months_between floor semantics: start + months <= today < +1 month
    pstart = _add_months(sub["start_date"], months)
    pend = _add_months(sub["start_date"], months + 1)
    used = sum(u["requests_count"] for u in usage
               if u["user_id"] == user["user_id"]
               and pstart <= u["date"] < pend)
    if used < plan["max_requests_per_month"]:
        return "allow:quota"
    return "allow:credit" if credit_ok else "deny:quota_exhausted"


def test_quota_path_matches_oracle(spark, tables):
    users, plans_df, subs, usage, urows, plans, srows, usrows = tables
    today = dt.datetime.fromisoformat(TODAY)
    got = {r.user_id: r.decision
           for r in can_make_request(users, plans_df, subs, usage,
                                     TODAY).collect()}
    assert len(got) == len(urows)
    for u in urows:
        expected = _oracle(u, plans, srows, usrows, today)
        assert got[u["user_id"]] == expected, \
            f"user {u['user_id']}: spark={got[u['user_id']]} " \
            f"oracle={expected}"
