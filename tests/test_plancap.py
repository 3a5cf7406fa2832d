"""plancap.stamp must be a strict no-op unless explicitly enabled —
it sits on benched paths (m07/m10/m12/m13 serve legs, st15/st20 history
fetches, hidden_write), so an always-on capture would tax every bench
row with a plan render + JVM round-trip."""

from serverless_datalake_aws_spark import plancap


def test_stamp_noop_without_env(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CAPTURE_PLANS", raising=False)
    plancap.CAPTURED.clear()
    plancap.stamp("off", spark.range(3))
    assert plancap.CAPTURED == {}


def test_stamp_captures_formatted_plan(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CAPTURE_PLANS", "1")
    plancap.CAPTURED.clear()
    plancap.stamp("on", spark.range(3).groupBy().count())
    text = plancap.CAPTURED["on"]
    assert "Physical Plan" in text
    assert "HashAggregate" in text
