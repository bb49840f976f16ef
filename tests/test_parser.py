"""Parser tests mirroring parser_test.go's accept/reject cases."""

import pytest

from opentick_spark.dialect import ast
from opentick_spark.dialect.parser import parse
from opentick_spark.errors import OpentickError


def test_select_star():
    node = parse("select * from test where sec=1 and interval=2 limit -5")
    assert isinstance(node, ast.Select)
    assert node.cols is None
    assert node.table.name == "test"
    assert node.limit == -5
    assert [(c.lhs, c.op, c.rhs) for c in node.where] == [
        ("sec", "=", 1),
        ("interval", "=", 2),
    ]


def test_select_adj_funcs():
    # parser_test.go:10-88 style: adj funcs with params and placeholders
    node = parse(
        "select tm, adj(open), adj_px(close), adj_vol(v, true) from d.t "
        "where sec=? and tm>='2018-01-01' and tm<'2019-01-01'"
    )
    assert node.table.db == "d" and node.table.name == "t"
    assert node.cols[0].name == "tm"
    assert node.cols[1].func.name == "ADJ" and node.cols[1].func.col == "open"
    assert node.cols[2].func.name == "ADJ_PX"
    assert node.cols[3].func.params == [True]
    assert node.where[0].rhs is ast.PLACEHOLDER
    assert node.where[1].rhs == "2018-01-01"


def test_create_table():
    node = parse(
        "create table if not exists d.test(sec int, interval int, tm timestamp, "
        "open double, primary key(sec, interval, tm))"
    )
    assert isinstance(node, ast.CreateTable)
    assert node.if_not_exists
    assert node.cols == [
        ("sec", "int"),
        ("interval", "int"),
        ("tm", "timestamp"),
        ("open", "double"),
    ]
    assert node.pk == ["sec", "interval", "tm"]


def test_insert_and_delete():
    node = parse("insert into t(a, b, c) values(1, 2.5, ?)")
    assert isinstance(node, ast.Insert)
    assert node.cols == ["a", "b", "c"]
    assert node.values[:2] == [1, 2.5]
    assert node.values[2] is ast.PLACEHOLDER
    node = parse("delete from t where a=1 and b>2")
    assert isinstance(node, ast.Delete)


def test_ddl_statements():
    assert isinstance(parse("create database if not exists db1"), ast.CreateDatabase)
    assert isinstance(parse("drop table d.t"), ast.DropTable)
    assert isinstance(parse("drop database d"), ast.DropDatabase)
    n = parse("alter table d.t rename to t2")
    assert isinstance(n, ast.RenameTable) and n.new_name == "t2"
    n = parse("alter table d.t rename column a to b")
    assert isinstance(n, ast.RenameColumn) and (n.old, n.new) == ("a", "b")


def test_reject_bad_type():
    # parser_test.go:99-118: unknown data type rejected
    with pytest.raises(OpentickError):
        parse("create table t(a int2, primary key(a))")
    with pytest.raises(OpentickError):
        parse("select from t")
    with pytest.raises(OpentickError):
        parse("select * from t where a != 1")


def test_negative_number_literals():
    node = parse("select * from t where a>-5 limit -2")
    assert node.where[0].rhs == -5
    assert node.limit == -2


def test_string_forms():
    node = parse("select * from t where a='x' and b=\"y\"")
    assert node.where[0].rhs == "x"
    assert node.where[1].rhs == "y"
