"""PII redaction (ext/redact.py)."""

from __future__ import annotations

from pyspark.sql import Row

from lakehouse_tools_spark.ext.redact import redact


def _run(spark, text):
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    return redact(df).collect()[0]


def test_redacts_each_kind(spark):
    r = _run(
        spark,
        "mail bob.smith+x@corp.example.org, ssn 123-45-6789, call 415-555-2671 now",
    )
    assert r.redacted == "mail <EMAIL>, ssn <SSN>, call <PHONE> now"
    assert (r.n_email, r.n_ssn, r.n_phone) == (1, 1, 1)


def test_ssn_not_eaten_by_phone(spark):
    # phone-shaped scan must not clip an SSN: order ssn-before-phone
    r = _run(spark, "id 123-45-6789 end")
    assert r.redacted == "id <SSN> end"
    assert (r.n_ssn, r.n_phone) == (1, 0)


def test_email_with_digits_not_clipped(spark):
    r = _run(spark, "reach 123.456.7890abc@mail.example.com please")
    assert r.redacted == "reach <EMAIL> please"
    assert (r.n_email, r.n_phone) == (1, 0)


def test_clean_text_untouched(spark):
    r = _run(spark, "no pii here, just 42 numbers and words.")
    assert r.redacted == "no pii here, just 42 numbers and words."
    assert (r.n_email, r.n_ssn, r.n_phone) == (0, 0, 0)


def test_multiple_matches_counted(spark):
    r = _run(spark, "a@b.co c@d.org and 650-555-1234 650-555-9999")
    assert r.n_email == 2 and r.n_phone == 2
    assert r.redacted == "<EMAIL> <EMAIL> and <PHONE> <PHONE>"
