from __future__ import annotations

from pyspark.sql import functions as F

from arrowhouse_spark.operators.sampling import cap_per_key
from arrowhouse_spark.operators.text import chat_turns


def test_cap_per_key_is_deterministic_and_bounded(spark):
    rows = [(i, "hot" if i < 90 else "cold") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, src string")
    kept = cap_per_key(df, key_col="src", id_col="id", max_rows=10)
    a = sorted(r["id"] for r in kept.collect())
    b = sorted(r["id"] for r in kept.collect())  # re-run: same set
    assert a == b
    by_src = kept.groupBy("src").count().collect()
    counts = {r["src"]: r["count"] for r in by_src}
    assert counts["hot"] == 10 and counts["cold"] == 10
    # under-cap keys keep everything
    kept_all = cap_per_key(df, key_col="src", id_col="id", max_rows=1000)
    assert kept_all.count() == 100


def test_cap_per_key_salt_changes_selection(spark):
    df = spark.range(200).withColumn("src", F.lit("s"))
    a = {r["id"] for r in cap_per_key(df, "src", "id", 20, salt="a").collect()}
    b = {r["id"] for r in cap_per_key(df, "src", "id", 20, salt="b").collect()}
    assert len(a) == len(b) == 20
    assert a != b  # different draws, same mechanism


def _turns(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return [
        (r["turn_idx"], r["role"], r["content"], r["n_words"])
        for r in chat_turns(df).orderBy("turn_idx").collect()
    ]


def test_chat_turns_basic_parse(spark):
    got = _turns(spark, "system: be brief\nuser: hi there\nassistant: hello")
    assert got == [
        (0, "system", "be brief", 2),
        (1, "user", "hi there", 2),
        (2, "assistant", "hello", 1),
    ]


def test_chat_turns_multiline_content_and_prose_colons(spark):
    # content spanning lines, containing a line that merely LOOKS like a
    # role ("userland: ..." is not a marker; "user:" without space is not)
    text = (
        "user: first line\nsecond line\nuserland: not a marker\n"
        "assistant: reply\nuser:no-space stays"
    )
    got = _turns(spark, text)
    assert got[0][1] == "user"
    assert "second line" in got[0][2] and "userland: not a marker" in got[0][2]
    assert got[1][1] == "assistant"
    assert "user:no-space stays" in got[1][2]
    assert len(got) == 2


def test_chat_turns_empty_content(spark):
    got = _turns(spark, "user: \nassistant: ok")
    assert got[0] == (0, "user", "", 0)
    assert got[1] == (1, "assistant", "ok", 1)
