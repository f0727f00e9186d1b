"""PII redaction op tests."""

from __future__ import annotations


def test_redact_pii_masks_and_counts(spark):
    from lucene_solr_spark.ops.pii import redact_pii

    rows = [
        (0, "mail me at john.doe+x@sub.example.co.uk or jane@ex.org now"),
        (1, "call +1-555-0123 or (44)20-7946-0958 today"),
        (2, "server 192.168.0.1 and 10.0.0.254 are up"),
        (3, "no pii here, just words and the number 42"),
        (4, "mixed: a@b.io then 8.8.8.8 then +33-1-2345-6789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}

    assert got[0].n_emails == 2 and "<EMAIL>" in got[0].text_redacted
    assert "john" not in got[0].text_redacted
    assert got[1].n_phones == 2 and "<PHONE>" in got[1].text_redacted
    assert "0123" not in got[1].text_redacted
    assert got[2].n_ipv4 == 2
    assert got[2].text_redacted == "server <IP> and <IP> are up"
    assert (
        got[3].n_emails == got[3].n_ipv4 == got[3].n_phones == 0
        and got[3].text_redacted == rows[3][1]
    )
    assert (
        got[4].n_emails == got[4].n_ipv4 == got[4].n_phones == 1
        and got[4].text_redacted == "mixed: <EMAIL> then <IP> then <PHONE>"
    )


def test_redact_pii_plan_is_map_only(spark):
    from lucene_solr_spark.ops.pii import redact_pii

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
