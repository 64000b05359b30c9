import pytest

from blockchain_etl_spark.functions.rules import RuleSyntaxError, rule_filter, rule_to_sql
from blockchain_etl_spark.operators.alerts import RuleSet


@pytest.mark.parametrize(
    "rule,sql_frag",
    [
        ("value > 100 and event_type == 'purchase'", "AND"),
        ("event_type in ['signup','error']", "IN"),
        ("event_type =~ 'pur.*'", "RLIKE"),
        ("not (value < 10)", "NOT"),
        ("value > 100 ? 'big' : 'small'", "CASE WHEN"),
        ("wei2eth(value) > 0.5", "1e18"),
        ("safe_round(value, 2) == 9.64", "round"),
    ],
)
def test_rule_translation(rule, sql_frag):
    assert sql_frag in rule_to_sql(rule)


def test_rule_filter_semantics(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_all = df.count()
    big = df.filter(rule_filter("value > 100 and event_type == 'purchase'")).count()
    oracle = df.filter((df.value > 100) & (df.event_type == "purchase")).count()
    assert 0 < big < n_all and big == oracle

    regex = df.filter(rule_filter("event_type =~ '^(sign|err).*'")).count()
    oracle2 = df.filter(df.event_type.rlike("^(sign|err).*")).count()
    assert regex == oracle2

    member = df.filter(rule_filter("event_type in ['signup', 'error']")).count()
    assert member == regex  # same predicate, two spellings

    tern = (
        df.selectExpr(f"{rule_to_sql(chr(118)+'alue > 100 ? 1 : 0')} AS t")
        .groupBy("t").count().count()
    )
    assert tern == 2


def test_rule_set_side_outputs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rs = RuleSet(
        {
            "big_purchase": "event_type == 'purchase' and value > 150",
            "any_error": "event_type == 'error'",
        }
    )
    outs = rs.side_outputs(df)
    assert set(outs) == {"big_purchase", "any_error"}
    assert outs["any_error"].count() == df.filter("event_type = 'error'").count()
    tagged = rs.tag(df)
    assert tagged.filter("rule_any_error").count() == outs["any_error"].count()


def test_bad_rules_raise():
    for bad in ["value >", "foo(1)", "a ==", "x in [1,", "@@"]:
        with pytest.raises(RuleSyntaxError):
            rule_to_sql(bad)
