"""Reference-parity gate: triple P/R and byte-identical text on a
slice of the annotated eval corpus (full 149-doc run: eval_parity.py).
Skipped cleanly when the reference corpus is not present."""

import os

import pytest

from ctinexus_spark.evaluation import ANNOTATION_DIR, evaluate_parity

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ANNOTATION_DIR), reason="reference annotation corpus not available"
)


def test_parity_slice(spark):
    report = evaluate_parity(spark, limit=25)
    assert report.n_docs == 25
    assert report.n_gold > 0
    assert report.precision >= 0.95, report.as_dict()
    assert report.recall >= 0.95, report.as_dict()
    assert report.text_identical_docs == report.n_docs, report.as_dict()
