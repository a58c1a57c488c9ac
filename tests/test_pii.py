"""PII scrub: counts on original text, ordered redaction, vectorized."""

import pyarrow as pa
import ray.data

from lucene_net_ray.stages.textstats import pii_scrub


def test_pii_scrub_vectors():
    rows = [
        # two emails, one phone, one ip
        (1, "mail a.b@x.org or c@y.io call 12-345-678-9012 from 10.0.0.1"),
        # nothing to scrub
        (2, "no pii here at all"),
        # ip only; dotted email local part must not feed the ip pattern
        (3, "john.smith.iv@corp.example.com then 192.168.001.255"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )
    out = {r["doc_id"]: r for r in pii_scrub(ds).take_all()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ip"]) == (2, 1, 1)
    assert out[1]["scrubbed"] == "mail <EMAIL> or <EMAIL> call <PHONE> from <IP>"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ip"]) == (0, 0, 0)
    assert out[2]["scrubbed"] == rows[1][1]
    assert out[3]["n_email"] == 1 and out[3]["n_ip"] == 1
    assert out[3]["scrubbed"] == "<EMAIL> then <IP>"


def test_pii_scrub_custom_patterns():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": ["ssn 123-45-6789 ok"]})
    )
    out = pii_scrub(
        ds, patterns={"ssn": r"\d{3}-\d{2}-\d{4}"}, order=("ssn",)
    ).take_all()[0]
    assert out["n_ssn"] == 1 and out["scrubbed"] == "ssn <SSN> ok"
