"""PII redaction (operators/pii.py): staged redaction order, counts,
and the no-PII identity path."""

from __future__ import annotations

from notjusthtml_searchengine_spark.operators.pii import pii_redact


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = pii_redact(df).collect()
    return {r["doc_id"]: r for r in out}


def test_all_three_kinds(spark):
    got = _run(
        spark,
        [
            (
                1,
                "write to bob.smith+x@mail.example.org or ping "
                "192.168.1.200 or call 555-123-4567 today",
            )
        ],
    )[1]
    assert got["redacted"] == (
        "write to <EMAIL> or ping <IP> or call <PHONE> today"
    )
    assert (got["n_emails"], got["n_ips"], got["n_phones"]) == (1, 1, 1)


def test_no_pii_is_identity(spark):
    got = _run(spark, [(2, "nothing personal here at all")])[2]
    assert got["redacted"] == "nothing personal here at all"
    assert (got["n_emails"], got["n_ips"], got["n_phones"]) == (0, 0, 0)


def test_email_pass_consumes_its_digits_first(spark):
    # the host's dotted digit runs go with the e-mail, never re-counted
    got = _run(spark, [(3, "mail u9@h10.h11.h12.example end")])[3]
    assert got["redacted"] == "mail <EMAIL> end"
    assert (got["n_emails"], got["n_ips"], got["n_phones"]) == (1, 0, 0)


def test_all_digit_host_is_an_ip_not_an_email(spark):
    # no alpha TLD => not an e-mail; the dotted quad is still an IP
    got = _run(spark, [(6, "mail 9@10.11.12.13 end")])[6]
    assert got["redacted"] == "mail 9@<IP> end"
    assert (got["n_emails"], got["n_ips"], got["n_phones"]) == (0, 1, 0)


def test_multiple_hits_and_dotted_phone(spark):
    got = _run(
        spark,
        [(4, "a@b.co c@d.io 10.0.0.1 10.0.0.2 555.000.1234")],
    )[4]
    assert got["redacted"] == "<EMAIL> <EMAIL> <IP> <IP> <PHONE>"
    assert (got["n_emails"], got["n_ips"], got["n_phones"]) == (2, 2, 1)


def test_word_boundary_guards_ip(spark):
    # digits embedded in a longer dotted run are not a bounded IPv4
    got = _run(spark, [(5, "version v1.2.3.4x stays")])[5]
    assert got["n_ips"] == 0
    assert got["redacted"] == "version v1.2.3.4x stays"
