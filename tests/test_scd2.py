"""SCD2 dimension history: version opening/closing, deletes, time travel."""

from __future__ import annotations

from iowa_liquor_sales_spark.operators.scd import as_of, scd2_apply, scd2_init


def test_scd2_lifecycle(spark):
    day1 = spark.createDataFrame(
        [("S1", "Store One", "Ames"), ("S2", "Store Two", "Ely")],
        ["store", "name", "city"],
    )
    hist = scd2_init(day1, "2026-01-01")

    # Day 2: S1 changes city, S2 unchanged, S3 appears.
    day2 = spark.createDataFrame(
        [("S1", "Store One", "Des Moines"), ("S2", "Store Two", "Ely"),
         ("S3", "Store Three", "Ames")],
        ["store", "name", "city"],
    )
    hist = scd2_apply(hist, day2, "store", "2026-01-02")

    cur = {(r["store"], r["city"]) for r in hist.filter("is_current").collect()}
    assert cur == {("S1", "Des Moines"), ("S2", "Ely"), ("S3", "Ames")}
    s1 = hist.filter("store = 'S1'").orderBy("valid_from").collect()
    assert [r["city"] for r in s1] == ["Ames", "Des Moines"]
    assert s1[0]["valid_to"].isoformat() == "2026-01-02" and not s1[0]["is_current"]

    # Day 3: S2 disappears (tracked delete).
    day3 = day2.filter("store <> 'S2'")
    hist = scd2_apply(hist, day3, "store", "2026-01-03")
    assert hist.filter("is_current").count() == 2
    s2 = hist.filter("store = 'S2'").head()
    assert not s2["is_current"] and s2["valid_to"].isoformat() == "2026-01-03"

    # Time travel: the world as of Jan 1 / Jan 2.
    assert {
        (r["store"], r["city"]) for r in as_of(hist, "2026-01-01").collect()
    } == {("S1", "Ames"), ("S2", "Ely")}
    assert {
        (r["store"], r["city"]) for r in as_of(hist, "2026-01-02").collect()
    } == {("S1", "Des Moines"), ("S2", "Ely"), ("S3", "Ames")}


def test_scd2_idempotent_same_snapshot(spark):
    snap = spark.createDataFrame([("S1", "A")], ["store", "name"])
    hist = scd2_init(snap, "2026-01-01")
    again = scd2_apply(hist, snap, "store", "2026-01-02")
    assert again.count() == 1  # nothing changed -> no new versions
    assert again.filter("is_current").count() == 1
