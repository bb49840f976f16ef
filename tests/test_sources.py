"""JSONL/CSV corpus sources: explicit-schema reads, corrupt-line
quarantine, and atomic ingest into engine tables."""

import pytest

from opentick_spark import sources as S


@pytest.fixture()
def engine(spark, tmp_path):
    from opentick_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute("create database src")
    eng.use("src")
    return eng


def test_jsonl_roundtrip_with_quarantine(spark, engine, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "body": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "body": "bonjour", "lang": "fr"}\n'
        "this line is not json at all\n"
        '{"doc_id": 3, "body": "ciao", "lang": "it"}\n'
    )
    engine.execute(
        "create table docs(doc_id bigint, body text, lang text, "
        "primary key(doc_id))"
    )
    n_bad = S.ingest_jsonl(
        engine, "src", "docs", str(p),
        schema="doc_id long, body string, lang string",
    )
    assert n_bad == 1
    rows = engine.execute_rows("select * from docs")
    assert rows == [(1, "hello world", "en"), (2, "bonjour", "fr"), (3, "ciao", "it")]


def test_jsonl_failfast_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nnot json\n')
    df = S.read_jsonl(spark, str(p), schema="a long", bad_record_col=None)
    with pytest.raises(Exception, match="FAILFAST|Malformed|corrupt"):
        df.collect()


def test_jsonl_missing_value_columns_padded(spark, engine, tmp_path):
    p = tmp_path / "sparse.jsonl"
    p.write_text('{"doc_id": 10, "body": "t"}\n')
    engine.execute(
        "create table sparse(doc_id bigint, body text, lang text, "
        "primary key(doc_id))"
    )
    S.ingest_jsonl(
        engine, "src", "sparse", str(p), schema="doc_id long, body string"
    )
    assert engine.execute_rows("select * from sparse") == [(10, "t", None)]


def test_jsonl_extra_column_rejected(spark, engine, tmp_path):
    p = tmp_path / "extra.jsonl"
    p.write_text('{"doc_id": 1, "body": "t", "oops": 5}\n')
    engine.execute(
        "create table narrow(doc_id bigint, body text, primary key(doc_id))"
    )
    with pytest.raises(ValueError, match="oops"):
        S.ingest_jsonl(
            engine, "src", "narrow", str(p),
            schema="doc_id long, body string, oops long",
        )


def test_csv_read_with_schema(spark, tmp_path):
    p = tmp_path / "events.csv"
    p.write_text("user_id,value\n1,2.5\n2,3.5\nbroken-row-no-comma\n")
    df = S.read_csv(spark, str(p), schema="user_id long, value double")
    good, bad = S.split_corrupt(df)
    assert sorted(map(tuple, good.collect())) == [(1, 2.5), (2, 3.5)]
    assert bad.count() == 1


def test_csv_infer_for_exploration(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = S.read_csv(spark, str(p), schema="infer")
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}
