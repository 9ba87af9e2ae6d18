"""Checksum-validated PII (operators/pii.py): Luhn correctness on
known-valid/invalid cards, phone rejection, duplicate candidates."""

from __future__ import annotations

import pandas as pd
import pytest

from data_quality_check_spark.operators.pii import luhn_card_report


def _luhn_py(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d = d * 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@pytest.fixture(scope="module")
def pii_docs(spark):
    pdf = pd.DataFrame({
        "image_id": ["a", "b", "c", "d", "e", "f"],
        "caption": [
            "pay with 4539 1488 0343 6467 now",      # valid visa (16)
            "pay with 4539 1488 0343 6468 now",      # last digit off
            "call +1 227 1027 37 today",             # 10-digit phone
            "amex 3782 822463 10005 works",          # valid amex (15)
            "twice 4539 1488 0343 6467 and 4539 1488 0343 6467",
            None,                                     # null caption
        ],
    })
    return spark.createDataFrame(pdf)


def test_luhn_oracle_parity():
    assert _luhn_py("4539148803436467")
    assert not _luhn_py("4539148803436468")
    assert _luhn_py("378282246310005")


def test_luhn_valid_and_invalid(spark, pii_docs):
    out = luhn_card_report(pii_docs).toPandas()
    by = out.set_index("image_id", drop=False)
    assert bool(by.loc["a"].valid) and by.loc["a"].masked == "****6467"
    assert not bool(by.loc["b"].valid)                     # checksum
    assert not bool(by.loc["c"].valid)                     # 10 digits
    assert int(by.loc["c"].n_digits) == 10
    assert bool(by.loc["d"].valid) and int(by.loc["d"].n_digits) == 15
    assert "f" not in set(out.image_id)                    # null text


def test_luhn_duplicate_candidates_stay_separate(spark, pii_docs):
    out = luhn_card_report(pii_docs).toPandas()
    dups = out[out.image_id == "e"]
    assert len(dups) == 2
    assert dups.valid.all() and (dups.n_digits == 16).all()
